"""combined_fields, EQL sequence, scan/pagination, remaining aggs."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.aggs.translate import (
    adjacency_matrix,
    auto_date_histogram,
    diversified_sampler,
    matrix_stats,
    median_absolute_deviation,
    scripted_metric,
)
from elasticsearch_spark.ops.eql import sequence
from elasticsearch_spark.ops.scan import (
    paginate,
    reindex,
    slice_scan,
    terminate_after,
    track_total_hits,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["events", "lineitem", "orders", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_eql_sequence_two_steps(events, duck):
    types = [r["event_type"] for r in events.select("event_type").distinct().collect()]
    a, b = sorted(types)[:2]
    got = sequence(events, [a, b], maxspan_seconds=3600 * 24).select(
        "user_id", "id_0", "id_1"
    ).collect()
    want = duck.execute(f"""
        WITH a AS (SELECT user_id, ts, event_id FROM events WHERE event_type = '{a}'),
        b AS (SELECT user_id, ts, event_id FROM events WHERE event_type = '{b}'),
        j AS (
          SELECT a.user_id, a.event_id AS id_0, b.event_id AS id_1,
                 row_number() OVER (PARTITION BY a.user_id, a.event_id
                                    ORDER BY b.ts ASC, b.event_id ASC) AS rn
          FROM a JOIN b ON a.user_id = b.user_id
          WHERE b.ts > a.ts AND epoch(b.ts) - epoch(a.ts) <= 86400)
        SELECT user_id, id_0, id_1 FROM j WHERE rn = 1
    """).fetchall()
    assert sorted((r["user_id"], r["id_0"], r["id_1"]) for r in got) == sorted(want)
    assert got, "expected at least one matched sequence"


def test_eql_three_steps_ordered(events):
    types = sorted(
        r["event_type"] for r in events.select("event_type").distinct().collect()
    )[:3]
    out = sequence(events, types, maxspan_seconds=10**9).collect()
    for r in out:
        assert r["ts_0"] < r["ts_1"] < r["ts_2"]


def test_eql_pipes(events):
    from elasticsearch_spark.ops.eql import pipe

    types = sorted(
        r["event_type"] for r in
        events.select("event_type").distinct().collect())[:2]
    m = sequence(events, types, maxspan_seconds=10**9)
    all_rows = sorted((r["ts_0"], r["id_0"]) for r in m.collect())
    head = pipe(m, "head", 3).collect()
    assert [(r["ts_0"], r["id_0"]) for r in head] == all_rows[:3]
    tail = pipe(m, "tail", 3).collect()
    assert [(r["ts_0"], r["id_0"]) for r in tail] == all_rows[::-1][:3]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pipe(m, "nope", 1)


def test_eql_hot_key_no_quadratic_blowup(spark):
    """One bot-like key with 10^5 events per step: the as-of window scan
    must complete in seconds (the old equi-join materialized 10^10
    pairs). Also checks correctness of the dense-key result: every 'a'
    event except the last chains to the immediately following 'b'."""
    import time

    n = 100_000
    df = spark.range(n).select(
        F.lit(1).alias("user_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
        F.col("id").alias("event_id"),
    )
    t0 = time.time()
    out = sequence(df, ["a", "b"], maxspan_seconds=10)
    cnt = out.count()
    wall = time.time() - t0
    # every even id chains to id+1 (1s later, within maxspan)
    assert cnt == n // 2
    first = out.orderBy("id_0").limit(3).collect()
    assert [(r["id_0"], r["id_1"]) for r in first] == [(0, 1), (2, 3), (4, 5)]
    assert wall < 60, f"hot-key sequence took {wall:.1f}s — quadratic path?"


def test_slice_scan_partitions(docs):
    total = docs.count()
    parts = [slice_scan(docs, i, 4).count() for i in range(4)]
    assert sum(parts) == total
    ids0 = [r["doc_id"] for r in slice_scan(docs, 0, 4).collect()]
    assert all(i % 4 == 0 for i in ids0)


def test_paginate(docs):
    ordered = docs.orderBy("doc_id")
    p2 = paginate(ordered, from_=10, size=5).collect()
    assert [r["doc_id"] for r in p2] == list(range(10, 15))


def test_track_total_hits(docs):
    assert track_total_hits(docs, threshold=10000) == {
        "value": docs.count(), "relation": "eq",
    }
    capped = track_total_hits(docs, threshold=7)
    assert capped == {"value": 7, "relation": "gte"}


def test_terminate_after(docs):
    out = terminate_after(docs, 3)
    cnt = out.count()
    nparts = docs.rdd.getNumPartitions()
    assert cnt <= 3 * nparts
    assert cnt >= 3  # at least one partition had >= 3 rows


def test_reindex(docs, tmp_path, spark):
    dest = str(tmp_path / "reindexed")
    reindex(
        docs, dest,
        transform=lambda d: d.withColumn("text_len", F.length("text")),
        query={"term": {"lang": "en"}},
    )
    out = spark.read.parquet(dest)
    assert out.count() == docs.filter(F.col("lang") == "en").count()
    assert "text_len" in out.columns


def test_update_by_query_painless_script(docs, tmp_path, spark):
    """_update_by_query with a painless script compiles to one
    projection (no per-doc interpreter)."""
    dest = str(tmp_path / "updated")
    reindex(
        docs, dest,
        query={"term": {"lang": "en"}},
        script={"fields": {
            "n_chars": "doc['n_chars'].value + params.bump",
            "flagged": "doc['n_chars'].value > 500 ? 'long' : 'short'",
        }, "params": {"bump": 7}},
    )
    out = spark.read.parquet(dest)
    src = docs.filter(F.col("lang") == "en")
    want = {r["doc_id"]: r["n_chars"] + 7 for r in src.collect()}
    got = {r["doc_id"]: r["n_chars"] for r in out.collect()}
    assert got == want
    for r in out.collect():
        assert r["flagged"] == ("long" if want[r["doc_id"]] - 7 > 500
                                else "short")


def test_adjacency_matrix(events, duck):
    out = adjacency_matrix(
        events,
        {"click": {"term": {"event_type": "click"}},
         "big": {"range": {"value": {"gte": 50}}}},
    ).collect()
    got = {r["key"]: r["doc_count"] for r in out}
    w_click = duck.execute("SELECT count(*) FROM events WHERE event_type='click'").fetchone()[0]
    w_big = duck.execute("SELECT count(*) FROM events WHERE value >= 50").fetchone()[0]
    w_both = duck.execute(
        "SELECT count(*) FROM events WHERE event_type='click' AND value >= 50"
    ).fetchone()[0]
    assert got["click"] == w_click and got["big"] == w_big
    assert got.get("click&big", got.get("big&click")) == w_both


def test_mad(spark, duck):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = median_absolute_deviation(li, "l_extendedprice").collect()[0]["mad"]
    want = duck.execute("""
        SELECT quantile_cont(abs(l_extendedprice -
          (SELECT quantile_cont(l_extendedprice, 0.5) FROM lineitem)), 0.5)
        FROM lineitem
    """).fetchone()[0]
    assert math.isclose(got, want, rel_tol=1e-9)


def test_matrix_stats(spark, duck):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = matrix_stats(li, ["l_quantity", "l_extendedprice", "l_discount"]).collect()[0]
    want = duck.execute("""
        SELECT covar_samp(l_quantity, l_extendedprice),
               corr(l_quantity, l_extendedprice),
               corr(l_extendedprice, l_discount)
        FROM lineitem
    """).fetchone()
    assert math.isclose(got["cov_l_quantity_l_extendedprice"], want[0], rel_tol=1e-9)
    assert math.isclose(got["corr_l_quantity_l_extendedprice"], want[1], rel_tol=1e-9)
    assert math.isclose(got["corr_l_extendedprice_l_discount"], want[2], rel_tol=1e-9)


def test_diversified_sampler(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = diversified_sampler(
        orders, "o_orderpriority", "o_totalprice",
        max_docs_per_value=2, shard_size=6, tie_col="o_orderkey",
    ).collect()
    per_key: dict = {}
    for r in out:
        per_key[r["o_orderpriority"]] = per_key.get(r["o_orderpriority"], 0) + 1
    assert all(v <= 2 for v in per_key.values())
    assert len(out) <= 6


def test_scripted_metric(spark, duck):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    def sum_of_squares(pdf):
        import pandas as pd

        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "ss": [(pdf["l_quantity"] ** 2).sum()],
        })

    got = {
        r["l_returnflag"]: r["ss"]
        for r in scripted_metric(
            li, ["l_returnflag"], sum_of_squares, "l_returnflag string, ss double"
        ).collect()
    }
    want = dict(duck.execute(
        "SELECT l_returnflag, sum(l_quantity * l_quantity) FROM lineitem GROUP BY 1"
    ).fetchall())
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=1e-12)


def test_auto_date_histogram(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = auto_date_histogram(orders, "o_orderdate", target_buckets=10).collect()
    assert 1 <= len(out) <= 12
    assert out[0]["interval"] in ("month", "quarter", "year")
    assert sum(r["doc_count"] for r in out) == orders.count()


def test_combined_fields(spark, duck):
    import __spark_entry__ as e
    from elasticsearch_spark.search.combined import combined_fields_topk
    from elasticsearch_spark.search.bm25 import BM25Params

    idx = e._doc_index(spark, SF)
    got = combined_fields_topk(
        idx, {"text": 1.0, "source": 2.0}, ["table", "src5"], k=10,
        params=BM25Params(quantize_norms=False),
    ).collect()
    want = duck.execute("""
WITH tokt AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(source), '[a-z0-9_]+')) AS term
  FROM documents),
n AS (SELECT count(*) * 1.0 AS n FROM documents),
sumttf AS (
  SELECT (SELECT count(*) FROM tokt) * 1.0
       + 2.0 * (SELECT count(*) FROM toks) AS v),
dl AS (
  SELECT d.doc_id,
         (SELECT count(*) FROM tokt WHERE doc_id = d.doc_id) * 1.0
       + 2.0 * (SELECT count(*) FROM toks WHERE doc_id = d.doc_id) AS dl
  FROM documents d),
tf AS (
  SELECT doc_id, term, sum(w) AS tf FROM (
    SELECT doc_id, term, 1.0 AS w FROM tokt WHERE term IN ('table','src5')
    UNION ALL
    SELECT doc_id, term, 2.0 FROM toks WHERE term IN ('table','src5'))
  GROUP BY doc_id, term),
dft AS (SELECT term, count(*) * 1.0 AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(2.2 * ln(1.0 + (n.n - dft.df + 0.5) / (dft.df + 0.5)) * tf.tf
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (sumttf.v / n.n)))) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), n, sumttf
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
    """).fetchall()
    assert [r["doc_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert math.isclose(r["score"], w[1], rel_tol=1e-9)


def test_parent_join_family(spark, duck):
    from elasticsearch_spark.search.joins import has_child, has_parent, parent_id

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    hc = has_child(
        orders, li, "o_orderkey", "l_orderkey",
        {"range": {"l_quantity": {"gte": 45}}},
        score_mode="max", child_score=F.col("l_quantity"), min_children=1,
    )
    got = {(r["o_orderkey"], r["score"]) for r in hc.select("o_orderkey", "score").collect()}
    want = set(duck.execute("""
        SELECT o_orderkey, max(l_quantity) FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l_quantity >= 45 GROUP BY 1
    """).fetchall())
    assert got == want

    hp = has_parent(
        orders, li, "o_orderkey", "l_orderkey",
        {"term": {"o_orderstatus": "F"}},
    )
    assert hp.count() == duck.execute("""
        SELECT count(*) FROM lineitem l JOIN orders o
        ON o.o_orderkey = l.l_orderkey WHERE o.o_orderstatus = 'F'
    """).fetchone()[0]
    some_key = li.select("l_orderkey").first()[0]
    pid = parent_id(li, "l_orderkey", some_key)
    assert pid.count() == li.filter(F.col("l_orderkey") == some_key).count()


def test_snapshot_restore_roundtrip(spark, tmp_path):
    """Snapshot -> restore produces a rank-identical index; the
    manifest is the commit point (no snapshot.json -> invisible)."""
    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.index.builder import build_index, load_index
    from elasticsearch_spark.ops.snapshot import (
        field_caps, list_snapshots, restore_index, snapshot_index,
    )
    from elasticsearch_spark.search.executor import match_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "idx")
    build_index(docs.select("doc_id", "text"), src,
                fields={"text": "ascii_word"}, num_partitions=2,
                input_snapshot="snaptest")
    repo = str(tmp_path / "repo")
    man = snapshot_index(src, repo, "snap1")
    assert man["state"] == "SUCCESS"
    assert [s["name"] for s in list_snapshots(repo)] == ["snap1"]

    tgt = str(tmp_path / "restored")
    restore_index(repo, "snap1", tgt)
    terms = [t for t, _ in analyze("table scan", "ascii_word")]
    a = match_topk(load_index(spark, src), "text", terms, k=10).collect()
    b = match_topk(load_index(spark, tgt), "text", terms, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in a] == \
           [(r["doc_id"], round(r["score"], 6)) for r in b]

    caps = field_caps(src)
    assert caps == [{"field": "text", "type": "text",
                     "analyzer": "ascii_word", "searchable": True,
                     "aggregatable": True}]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        snapshot_index(src, repo, "snap1")  # duplicate name refused

    # searchable snapshot: mount queries the repo files directly
    # (zero copy) with identical ranks, and the mount is read-only
    from elasticsearch_spark.ops.ccr import assert_writable
    from elasticsearch_spark.ops.snapshot import mount_snapshot

    mounted = match_topk(mount_snapshot(spark, repo, "snap1"),
                         "text", terms, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in mounted] == \
           [(r["doc_id"], round(r["score"], 6)) for r in a]
    with _pytest.raises(ValueError):
        assert_writable(str(tmp_path / "repo" / "snap1"))
    with _pytest.raises(ValueError):
        mount_snapshot(spark, repo, "nope")


def test_sort_hits_section(spark):
    """Request sort section (FieldSortBuilder / ScoreSortBuilder /
    ScriptSortBuilder): field order + missing placement, _score,
    painless _script sort; id tie-break always appended."""
    from elasticsearch_spark.search.api import sort_hits

    hits = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 2.0, None), (3, 1.0, 5.0), (4, 3.0, 7.0)],
        "doc_id long, score double, price double")
    # field asc, missing last (default), then id tie-break
    got = [r["doc_id"] for r in sort_hits(hits, ["price"]).collect()]
    assert got == [3, 4, 1, 2]
    got = [r["doc_id"] for r in sort_hits(
        hits, [{"price": {"order": "desc", "missing": "_first"}}],
        k=3).collect()]
    assert got == [2, 1, 4]
    # _score desc default with id tie-break (1 before 2 at 2.0)
    got = [r["doc_id"] for r in sort_hits(hits, ["_score"]).collect()]
    assert got == [4, 1, 2, 3]
    # painless script sort: _score * params.w - price
    got = [r["doc_id"] for r in sort_hits(
        hits, [{"_script": {
            "script": {"source": "_score * params.w - doc['price'].value",
                       "params": {"w": 10}},
            "order": "desc"}}]).collect()]
    # values: d1 10, d2 null, d3 5, d4 23 -> desc nulls last: 4,1,3,2
    assert got == [4, 1, 3, 2]


def test_simulate_pipeline(spark):
    """_ingest/pipeline/_simulate: transformed sample docs, and the
    verbose per-processor trace."""
    from elasticsearch_spark.ops.ingest import simulate_pipeline

    pipeline = [
        {"lowercase": {"field": "name"}},
        {"set": {"field": "tag", "value": "ok"}},
    ]
    docs = [{"name": "ALPHA"}, {"name": "Beta"}]
    out = simulate_pipeline(spark, pipeline, docs)
    assert [d["name"] for d in out] == ["alpha", "beta"]
    assert all(d["tag"] == "ok" for d in out)
    verbose = simulate_pipeline(spark, pipeline, docs, verbose=True)
    t0 = verbose[0]["processor_results"]
    assert [p["processor_type"] for p in t0] == ["lowercase", "set"]
    assert t0[0]["doc"]["name"] == "alpha" and "tag" not in t0[0]["doc"]
    assert t0[1]["doc"]["tag"] == "ok"


# --- EQL text parser + join plan ---

def test_parse_eql_sequence_full():
    from elasticsearch_spark.ops.eql import parse_eql

    p = parse_eql('sequence by host with maxspan=2h '
                  '[ login where user_id >= 5 ] [ any where true ] '
                  'until [ logout where true ] | head 7 | tail 3')
    assert p["kind"] == "sequence" and p["by"] == "host"
    assert p["maxspan"] == 7200
    assert [s["type"] for s in p["steps"]] == ["login", "any"]
    assert p["until"]["type"] == "logout"
    assert p["pipes"] == [("head", 7), ("tail", 3)]


def test_parse_eql_rejects_bad_input():
    import pytest
    from elasticsearch_spark.ops.eql import parse_eql

    with pytest.raises(ValueError, match="at least two steps"):
        parse_eql('sequence by k [ a where true ]')
    with pytest.raises(ValueError, match="unsupported pipe"):
        parse_eql('a where true | sort 3')
    with pytest.raises(ValueError, match="unsupported EQL operator"):
        parse_eql('a where value ~ 3')


def test_eql_event_query_and_wildcard(spark):
    from elasticsearch_spark.ops.eql import eql

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = eql(ev, 'any where event_type : "pur*" and value >= 190')
    rows = got.collect()
    assert rows and all(r["event_type"] == "purchase" and r["value"] >= 190
                        for r in rows)


def test_eql_join_orderless_vs_sequence(spark):
    from elasticsearch_spark.ops.eql import eql

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # join matches keys regardless of event order; sequence requires
    # click-before-purchase — join must be a superset of sequence keys
    seq_keys = {r["user_id"] for r in eql(
        ev, 'sequence by user_id [ any where event_type == "click" ] '
            '[ any where event_type == "purchase" ]').collect()}
    join_keys_ = {r["user_id"] for r in eql(
        ev, 'join by user_id [ any where event_type == "click" ] '
            '[ any where event_type == "purchase" ]').collect()}
    assert seq_keys <= join_keys_
    assert join_keys_


def test_eql_join_until_bounds_events(spark):
    from pyspark.sql import functions as F
    from elasticsearch_spark.ops.eql import join_keys

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    bounded = join_keys(ev, ["click", "error"], until="signup")
    first_signup = (ev.filter(F.col("event_type") == "signup")
                    .groupBy("user_id").agg(F.min("ts").alias("uts")))
    joined = bounded.join(first_signup, "user_id", "left").collect()
    assert joined
    for r in joined:
        if r["uts"] is not None:
            assert r["ts_0"] < r["uts"] and r["ts_1"] < r["uts"]


def test_count_api(spark):
    from elasticsearch_spark.ops.scan import count_api

    df = spark.createDataFrame(
        [(1, "en", 50), (2, "en", 250), (3, "de", 300), (4, "en", 400)],
        "doc_id int, lang string, n int")
    got = count_api(df, {"bool": {
        "filter": [{"range": {"n": {"gte": 200}}}],
        "must_not": [{"term": {"lang": "de"}}]}}).collect()
    assert got[0]["count"] == 2
    assert count_api(df).collect()[0]["count"] == 4


def test_circle_processor_vertex_parity(spark):
    """CircleProcessor shape_type='shape': vertex math identical to
    SpatialUtils.createRegularShapePolygon, ring closed, sides clamped
    to [4, 1000]."""
    from elasticsearch_spark.ops.ingest import apply_processor

    df = spark.createDataFrame(
        [(1, 10.0, -5.0, 8.0),     # n = ceil(2pi/acos(1-1/8)) = 13
         (2, 0.0, 0.0, 1.0)],      # error == radius -> acos(0)=pi/2 -> 4
        "id int, x double, y double, radius double").select(
        "id", F.struct("x", "y", "radius").alias("circ"))
    out = apply_processor(df, {"circle": {
        "field": "circ", "target_field": "poly", "error_distance": 1.0}})
    rows = {r["id"]: r["poly"] for r in out.collect()}

    n1 = math.ceil(2 * math.pi / math.acos(1 - 1.0 / 8.0))
    poly = rows[1]
    assert len(poly) == n1 + 1
    assert poly[0] == poly[-1]          # closed ring
    exp_x = 8.0 * math.cos(math.radians(3 * (360.0 / n1))) + 10.0
    assert abs(poly[3]["x"] - exp_x) < 1e-12
    assert len(rows[2]) == 4 + 1        # clamped to minimum 4 sides

    with pytest.raises(NotImplementedError):
        apply_processor(df, {"circle": {
            "field": "circ", "shape_type": "geo_shape"}})


def test_freeze_and_slm_lifecycle(spark, tmp_path):
    """freeze = write block (searches unchanged); SLM cycle snapshots
    by pattern and prunes by max_count, never its own snapshot."""
    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.index.builder import build_index, load_index
    from elasticsearch_spark.ops.ccr import assert_writable
    from elasticsearch_spark.ops.snapshot import (
        freeze_index, is_frozen, list_snapshots, slm_run, unfreeze_index,
    )
    from elasticsearch_spark.search.executor import match_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "idx")
    build_index(docs.select("doc_id", "text"), src,
                fields={"text": "ascii_word"}, num_partitions=2,
                input_snapshot="frz")
    freeze_index(src)
    assert is_frozen(src)
    with pytest.raises(ValueError, match="frozen"):
        assert_writable(src)
    # still searchable while frozen
    terms = [t for t, _ in analyze("table scan", "ascii_word")]
    assert match_topk(load_index(spark, src), "text", terms, k=5).count() > 0
    unfreeze_index(src)
    assert not is_frozen(src)
    assert_writable(src)

    repo = str(tmp_path / "repo")
    names = []
    for i in range(3):
        r = slm_run(src, repo, {"name": "nightly",
                                "retention": {"max_count": 2}},
                    now=1_700_000_000 + i * 86400)
        names.append(r["taken"])
    snaps = [s["name"] for s in list_snapshots(repo)]
    assert len(snaps) == 2 and names[-1] in snaps and names[0] not in snaps
    # age-based retention (manifest ts is wall-clock): max_age_days=0
    # expires every EARLIER snapshot, never the cycle's own
    r = slm_run(src, repo, {"name": "nightly",
                            "retention": {"max_age_days": 0}})
    snaps = [s["name"] for s in list_snapshots(repo)]
    assert snaps == [r["taken"]]


def test_infer_mappings_dynamic(spark):
    """Dynamic mapping inference: schema types map like
    DynamicFieldsBuilder, ISO strings date-detect, dynamic_templates
    override by name glob / json type, arrays map as elements."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.mappings import infer_mappings

    df = spark.createDataFrame(
        [(1, 2.5, True, "2024-01-02T10:00:00Z", "free text",
          ["a", "b"], ("x", 3))],
        "n long, x double, f boolean, ts string, body string, "
        "tags array<string>, obj struct<s: string, k: long>")
    m = infer_mappings(df)["properties"]
    assert m["n"] == {"type": "long"}
    assert m["x"] == {"type": "double"}
    assert m["f"] == {"type": "boolean"}
    assert m["ts"] == {"type": "date"}  # date detection
    assert m["body"]["type"] == "text"
    assert m["body"]["fields"]["keyword"]["type"] == "keyword"
    assert m["tags"]["type"] == "text"  # array of element mapping
    assert m["obj"]["type"] == "object"
    assert m["obj"]["properties"]["k"] == {"type": "long"}

    tpl = [
        {"strings_as_keywords": {"match": "body*",
                                 "match_mapping_type": "string",
                                 "mapping": {"type": "keyword"}}},
        {"longs_as_integers": {"match_mapping_type": "long",
                               "mapping": {"type": "integer"}}},
    ]
    m2 = infer_mappings(df, dynamic_templates=tpl)["properties"]
    assert m2["body"] == {"type": "keyword"}   # name glob + json type
    assert m2["n"] == {"type": "integer"}      # type-only template
    assert m2["x"] == {"type": "double"}       # untouched
    # date_detection off: ISO strings stay text
    m3 = infer_mappings(df, date_detection=False)["properties"]
    assert m3["ts"]["type"] == "text"


def test_bulk_apply_contract(spark):
    """_bulk analogue: per-item results mirror TransportBulkAction
    (created/updated/deleted/not_found + conflict/missing errors) and
    failed items leave the table untouched."""
    import pytest as _pytest

    from elasticsearch_spark.ops.bulk import bulk_apply

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (6, "f", 60)],
        "doc_id long, name string, v long")
    new_docs, items = bulk_apply(docs, [
        {"delete": {"doc_id": 2}},
        {"delete": {"doc_id": 99}},
        {"index": {"doc_id": 1, "name": "a2", "v": 11}},
        {"index": {"doc_id": 4, "name": "d", "v": 40}},
        {"create": {"doc_id": 3, "name": "dup"}},
        {"create": {"doc_id": 5, "name": "e"}},
        {"update": {"doc_id": 6, "doc": {"v": 61}}},
        {"update": {"doc_id": 77, "doc": {"v": 1}}},
    ])
    assert [i.get("result", i.get("error")) for i in items] == [
        "deleted", "not_found", "updated", "created",
        "version_conflict_engine_exception", "created", "updated",
        "document_missing_exception"]
    rows = {r["doc_id"]: (r["name"], r["v"])
            for r in new_docs.collect()}
    assert rows == {1: ("a2", 11), 3: ("c", 30), 4: ("d", 40),
                    5: ("e", None), 6: ("f", 61)}
    with _pytest.raises(ValueError, match="duplicate id"):
        bulk_apply(docs, [{"delete": {"doc_id": 1}},
                          {"index": {"doc_id": 1, "name": "x"}}])
    with _pytest.raises(ValueError, match="not in schema"):
        bulk_apply(docs, [{"update": {"doc_id": 1,
                                      "doc": {"nope": 1}}}])


def test_term_level_case_insensitive(spark):
    """case_insensitive on term/prefix/wildcard/regexp
    (TermQueryBuilder.java:33 and siblings)."""
    from elasticsearch_spark.search.dsl import compile_filter

    df = spark.createDataFrame(
        [(1, "Alpha"), (2, "ALPHA"), (3, "beta"), (4, "alphabet")],
        "doc_id long, s string")

    def ids(q):
        return {r["doc_id"] for r in df.filter(compile_filter(q)).collect()}

    assert ids({"term": {"s": {"value": "alpha"}}}) == set()
    assert ids({"term": {"s": {"value": "alpha",
                               "case_insensitive": True}}}) == {1, 2}
    assert ids({"prefix": {"s": {"value": "ALPH",
                                 "case_insensitive": True}}}) == {1, 2, 4}
    assert ids({"wildcard": {"s": {"value": "Alph*",
                                   "case_insensitive": True}}}) == {1, 2, 4}
    assert ids({"regexp": {"s": {"value": "alpha.*",
                                 "case_insensitive": True}}}) == {1, 2, 4}
    assert ids({"regexp": {"s": {"value": "alpha.*"}}}) == {4}


def test_script_query_filter_context(spark):
    """ScriptQueryBuilder: painless boolean in filter context."""
    from elasticsearch_spark.search.dsl import compile_filter

    df = spark.createDataFrame(
        [(1, 10, 2.0), (2, 30, 3.0), (3, 50, 4.0)],
        "doc_id long, n long, w double")
    got = {r["doc_id"] for r in df.filter(compile_filter({"script": {
        "script": {"source": "doc['n'].value * params.f > 50",
                   "params": {"f": 2}}}})).collect()}
    assert got == {2, 3}
    # raw SQL escape hatch (non-painless lang)
    got = {r["doc_id"] for r in df.filter(compile_filter({"script": {
        "script": {"source": "n + w > 32"}}})).collect()}
    assert got == {2, 3}


def test_random_score_seeded_deterministic(spark):
    """random_score(seed, field): deterministic in [0,1), stable
    across runs, different per doc."""
    from elasticsearch_spark.search.api import _function_value
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id long")
    _, val = _function_value({"random_score": {"seed": 42,
                                               "field": "doc_id"}})
    a = [r["v"] for r in df.select(val.alias("v")).collect()]
    b = [r["v"] for r in df.select(val.alias("v")).collect()]
    assert a == b
    assert all(0.0 <= x < 1.0 for x in a)
    assert len(set(a)) > 40  # spread, not constant
    _, val2 = _function_value({"random_score": {"seed": 43,
                                                "field": "doc_id"}})
    c = [r["v"] for r in df.select(val2.alias("v")).collect()]
    assert c != a  # seed changes the ordering
    import pytest as _pytest

    with _pytest.raises(ValueError, match="random_score"):
        _function_value({"random_score": {}})


def test_bulk_apply_frames(spark):
    from elasticsearch_spark.ops.bulk import bulk_apply_frames

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "doc_id long, name string, v long")
    ups = spark.createDataFrame(
        [(2, "b2"), (4, "d")], "doc_id long, name string")
    dels = spark.createDataFrame([(3,)], "doc_id long")
    out = bulk_apply_frames(docs, upserts=ups, deletes=dels)
    rows = {r["doc_id"]: (r["name"], r["v"]) for r in out.collect()}
    assert rows == {1: ("a", 10), 2: ("b2", None), 4: ("d", None)}
    import pytest as _pytest

    dup = spark.createDataFrame(
        [(2, "x"), (2, "y")], "doc_id long, name string")
    with _pytest.raises(ValueError, match="duplicate ids"):
        bulk_apply_frames(docs, upserts=dup)


def test_eql_sample_and_runs(spark):
    """EQL `sample by` (non-temporal one-per-step groups) and
    `with runs=N` step repetition (EqlParser sequence-term runs)."""
    from elasticsearch_spark.ops.eql import eql, parse_eql

    p = parse_eql('sample by user_id [ click where true ] '
                  '[ error where true ]')
    assert p["kind"] == "sample" and p["by"] == "user_id"
    assert len(p["steps"]) == 2

    p = parse_eql('sequence by user_id with maxspan=2h '
                  '[ click where true ] with runs=2 [ error where true ]')
    assert [s["type"] for s in p["steps"]] == ["click", "click", "error"]

    with pytest.raises(ValueError, match="no with-options"):
        parse_eql('sample by k with maxspan=2h [ a where true ] '
                  '[ b where true ]')
    with pytest.raises(ValueError, match="no until"):
        parse_eql('sample by k [ a where true ] [ b where true ] '
                  'until [ c where true ]')
    with pytest.raises(ValueError, match="only valid in sequence"):
        parse_eql('join by k [ a where true ] with runs=2 '
                  '[ b where true ]')

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    types = sorted(r["event_type"]
                   for r in ev.select("event_type").distinct().collect())[:2]
    a, b = types
    got = sorted(
        r["user_id"] for r in
        eql(ev, f'sample by user_id [ {a} where true ] '
                f'[ {b} where true ]').collect())
    import duckdb as _duckdb
    con = _duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    want = sorted(r[0] for r in con.execute(f"""
        SELECT user_id FROM events GROUP BY user_id
        HAVING bool_or(event_type = '{a}') AND bool_or(event_type = '{b}')
    """).fetchall())
    assert got == want

    # runs=2: needs two successive hits of the first step; every match
    # of the expanded plan orders ts_0 < ts_1 < ts_2
    m = eql(ev, f'sequence by user_id with maxspan=1000000s '
                f'[ {a} where true ] with runs=2 [ {b} where true ]')
    rows = m.collect()
    assert rows
    for r in rows:
        assert r["ts_0"] < r["ts_1"] < r["ts_2"]
