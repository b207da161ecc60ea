"""x-pack tail: essql, ML single-metric anomalies, async search,
find_structure, polish/ukrainian analyzers, icu_folding."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.analysis import analyze
from elasticsearch_spark.ops import anomaly, essql, textstruct
from elasticsearch_spark.search import async_api

SF = "/root/testdata/sf0.001"


def test_essql_matches_duckdb(spark):
    sql = ("SELECT lang, count(*) AS n, round(avg(n_chars), 3) AS avg_c "
           "FROM documents GROUP BY lang ORDER BY lang")
    got = [tuple(r) for r in essql.essql(spark, sql, SF).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(sql).fetchall()
    assert got == want


def test_essql_translate_shows_pushdown(spark):
    df = essql.essql(
        spark, "SELECT doc_id FROM documents WHERE lang = 'de'", SF)
    plan = essql.essql_translate(df)
    assert "PushedFilters" in plan and "lang" in plan


def test_single_metric_anomalies_matches_duckdb(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {r["bucket"]: (round(r["score"], 6), r["is_anomaly"])
           for r in anomaly.single_metric_anomalies(ev).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = {r[0]: (round(r[2], 6), r[3]) for r in con.execute(
        anomaly.single_metric_anomalies_sql()).fetchall()}
    assert got == want and len(got) > 3


def test_async_search_contract(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").groupBy("lang").count()
    st = async_api.submit(df)
    assert set(st) == {"id", "is_running", "is_partial"}
    res = async_api.get(st["id"], wait_sec=120)
    assert not res["is_running"] and not res["is_partial"]
    assert len(res["hits"]) == df.count()


def test_find_structure_ndjson():
    s = '{"ts": "2026-01-01T00:00:00Z", "v": 1}\n{"ts": "x", "v": 2}'
    out = textstruct.find_structure(s)
    assert out["format"] == "ndjson"
    assert out["column_names"] == ["ts", "v"]
    assert out["timestamp_field"] == "ts"


def test_find_structure_delimited_with_header():
    s = "time,host,value\n2026-01-01T00:00:00Z,a,1\n2026-01-01T01:00:00Z,b,2"
    out = textstruct.find_structure(s)
    assert out["format"] == "delimited" and out["delimiter"] == ","
    assert out["has_header_row"] and out["column_names"][0] == "time"
    assert out["timestamp_format"] == "ISO8601"


def test_find_structure_semi_structured_and_reject():
    s = "Jan  5 12:00:01 host proc[1]: msg\nJan  5 12:00:02 host proc[2]: msg"
    assert textstruct.find_structure(s)["format"] == "semi_structured_text"
    with pytest.raises(ValueError):
        textstruct.find_structure("no structure here\nat all")


def test_polish_ukrainian_icu_analyzers():
    assert [t for t, _ in analyze("koty kotami i", "polish_light")] == \
        ["kot", "kot"]
    assert [t for t, _ in analyze("книгами і книга", "ukrainian_light")] == \
        ["книг", "книг"]
    assert [t for t, _ in analyze("Grüße Ωμέγα", "icu_folding")] == \
        ["grusse", "ωμεγα"]


# --- ES SQL fulltext: MATCH() / QUERY() / SCORE() ---

def test_parse_fulltext_extracts_and_rewrites():
    from elasticsearch_spark.ops.essql import parse_fulltext

    sql = ("SELECT doc_id, SCORE() FROM documents "
           "WHERE MATCH(text, 'a b', 'operator=and') AND lang = 'en'")
    rewritten, clauses, uses_score, negated = parse_fulltext(sql)
    assert clauses == [{"match": {"text": {"query": "a b",
                                           "operator": "and"}}}]
    assert "MATCH" not in rewritten and "__ft_m0" in rewritten
    assert uses_score and "__ft_score" in rewritten
    assert negated == [False]


def test_parse_fulltext_multi_field_and_query():
    from elasticsearch_spark.ops.essql import parse_fulltext

    _, clauses, _, _ = parse_fulltext(
        "SELECT 1 FROM documents WHERE MATCH('text,source', 'x') "
        "AND QUERY('a AND b')")
    assert clauses[0] == {"multi_match": {
        "query": "x", "fields": ["text", "source"], "type": "best_fields"}}
    assert clauses[1] == {"_query_string": {"query": "a AND b"}}


def test_parse_fulltext_or_and_not_flags():
    from elasticsearch_spark.ops.essql import _tree_mode, parse_fulltext

    assert _tree_mode("SELECT 1 FROM t WHERE MATCH(text, 'x') OR lang='en'")
    assert _tree_mode("SELECT 1 FROM t WHERE NOT MATCH(text, 'x')")
    assert not _tree_mode(
        "SELECT 1 FROM t WHERE MATCH(text, 'x') AND lang='en'")
    _, _, _, negated = parse_fulltext(
        "SELECT 1 FROM t WHERE MATCH(text, 'x') AND NOT MATCH(source, 'y')")
    assert negated == [False, True]


def test_parse_fulltext_quoted_commas_and_escapes():
    from elasticsearch_spark.ops.essql import parse_fulltext

    _, clauses, _, _ = parse_fulltext(
        "SELECT 1 FROM t WHERE MATCH(text, 'a, b''s (c)')")
    assert clauses == [{"match": {"text": {"query": "a, b's (c)"}}}]


def test_multi_metric_anomalies_per_entity_baseline(spark):
    """Each entity gets its OWN median/MAD baseline: a value normal for
    one entity flags as anomalous for another (partition_field_name)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.anomaly import multi_metric_anomalies

    rows = []
    # entity "big" runs ~1000/hour; entity "small" runs ~10/hour
    for h in range(10):
        rows.append((f"2024-01-01 {h:02d}:30:00", "big", 1000.0))
        rows.append((f"2024-01-01 {h:02d}:30:00", "small", 10.0))
    # hour 10: both emit 400 -> normal-ish for big's scale? no: big
    # deviates |400-1000|=600, small deviates |400-10|=390 vs tiny MADs
    rows.append(("2024-01-01 10:30:00", "big", 1000.0))
    rows.append(("2024-01-01 10:30:00", "small", 400.0))
    df = spark.createDataFrame(rows, "ts string, ent string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = multi_metric_anomalies(df, "ent", threshold=3.0)
    got = {(r["entity"], str(r["bucket"])): r["is_anomaly"]
           for r in out.collect()}
    assert got[("small", "2024-01-01 10:00:00")] is True
    assert got[("big", "2024-01-01 10:00:00")] is False
    assert got[("small", "2024-01-01 05:00:00")] is False


def test_population_anomalies_cross_entity(spark):
    """Population job: per-bucket cross-entity stats — the outlier USER
    in a bucket flags even on its first appearance (over_field_name)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.anomaly import population_anomalies

    rows = [("2024-01-01 00:10:00", u, 10.0 + u * 0.01) for u in range(20)]
    rows.append(("2024-01-01 00:20:00", 99, 5000.0))  # population outlier
    df = spark.createDataFrame(rows, "ts string, user long, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = population_anomalies(df, "user", span="hour", threshold=3.0)
    got = {r["entity"]: r["is_anomaly"] for r in out.collect()}
    assert got[99] is True
    assert got[0] is False and got[19] is False


def test_train_linear_regression_matches_lstsq(spark):
    """Gram-matrix closed form == numpy lstsq on a 3-feature problem;
    ridge shrinks coefficients but never the intercept."""
    import numpy as np
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.ml import train_linear_regression

    rng = np.random.default_rng(7)
    X = rng.normal(size=(500, 3))
    y = 2.0 + X @ np.array([1.5, -0.5, 3.0]) + rng.normal(0, 0.01, 500)
    rows = [(float(a), float(b), float(c), float(t))
            for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")
    m = train_linear_regression(df, ["f1", "f2", "f3"], "y")
    A = np.hstack([np.ones((500, 1)), X])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    got = [m["intercept"], m["coefficients"]["f1"],
           m["coefficients"]["f2"], m["coefficients"]["f3"]]
    assert np.allclose(got, beta, atol=1e-6)
    assert m["n"] == 500
    ridge = train_linear_regression(df, ["f1", "f2", "f3"], "y", l2=1e3)
    assert abs(ridge["coefficients"]["f3"]) < abs(m["coefficients"]["f3"])


def test_essql_catalog_commands(spark):
    """ES-SQL SHOW TABLES / DESCRIBE (SysTables/SysColumns commands)."""
    import pytest

    from elasticsearch_spark.ops.essql import essql

    sf = "/root/testdata/sf0.001"
    tabs = {r["name"] for r in essql(spark, "SHOW TABLES", sf).collect()}
    assert {"lineitem", "documents", "events"} <= tabs
    cols = {r["column"]: r["type"]
            for r in essql(spark, "DESCRIBE lineitem", sf).collect()}
    assert cols["l_orderkey"] == "bigint"
    assert cols["l_shipdate"].startswith("timestamp")
    with pytest.raises(ValueError, match="unknown table"):
        essql(spark, "DESCRIBE nope", sf)


def test_rare_anomalies(spark):
    """rare detector: low-count categories flag, score = 1/count."""
    from elasticsearch_spark.ops.anomaly import rare_anomalies

    rows = [("u1", "login")] * 50 + [("u1", "wire_transfer")] \
        + [("u2", "login")] * 30 + [("u2", "export")] * 2
    df = spark.createDataFrame(rows, "user string, action string")
    out = rare_anomalies(df, "action", by_col="user", max_count=3)
    got = {(r["user"], r["action"]): (r["count"], r["score"])
           for r in out.collect()}
    assert got == {("u1", "wire_transfer"): (1, 1.0),
                   ("u2", "export"): (2, 0.5)}


def test_train_gaussian_nb_separates_clusters(spark):
    """NB on two well-separated Gaussian blobs classifies its own
    training data nearly perfectly; model params match numpy; ties
    break to the lexically smallest class."""
    import numpy as np
    from elasticsearch_spark.ops.ml import (
        gaussian_nb_classify, train_gaussian_nb)

    rng = np.random.default_rng(11)
    a = rng.normal([0.0, 0.0], 1.0, size=(300, 2))
    b = rng.normal([8.0, 8.0], 1.0, size=(300, 2))
    rows = [(float(x), float(y), "a") for x, y in a] + \
           [(float(x), float(y), "b") for x, y in b]
    df = spark.createDataFrame(rows, "f1 double, f2 double, cls string")
    m = train_gaussian_nb(df, ["f1", "f2"], "cls")
    assert set(m["classes"]) == {"a", "b"}
    assert abs(m["classes"]["a"]["mu"]["f1"] - float(np.mean(a[:, 0]))) < 1e-6
    assert abs(m["classes"]["b"]["var"]["f2"]
               - float(np.var(b[:, 1]))) < 1e-6
    pred = gaussian_nb_classify(df, m)
    acc = pred.filter(F.col("pred") == F.col("cls")).count() / 600.0
    assert acc > 0.99
    # identical scores for every class -> smallest name wins
    m2 = {
        "features": ["f1"],
        "classes": {
            "z": {"log_prior": -0.5, "mu": {"f1": 0.0},
                  "var": {"f1": 1.0}, "log_norm": {"f1": 0.0}},
            "b": {"log_prior": -0.5, "mu": {"f1": 0.0},
                  "var": {"f1": 1.0}, "log_norm": {"f1": 0.0}},
        },
    }
    one = spark.createDataFrame([(1.0,)], "f1 double")
    assert gaussian_nb_classify(one, m2).first()["pred"] == "b"


def test_gaussian_nb_sql_twin_matches(spark):
    """Spark-trained NB predictions == the DuckDB one-statement twin
    (train + classify) on the same data: identical per-class counts."""
    import duckdb
    import numpy as np
    from elasticsearch_spark.ops.ml import (
        gaussian_nb_classify, gaussian_nb_sql, train_gaussian_nb)

    rng = np.random.default_rng(5)
    xs = rng.normal(2.0, 3.0, 400)
    ys = rng.normal(-1.0, 2.0, 400)
    cls = ["p" if i % 3 else "q" for i in range(400)]
    rows = [(i, float(x), float(y), c)
            for i, (x, y, c) in enumerate(zip(xs, ys, cls))]
    df = spark.createDataFrame(rows, "rid long, f1 double, f2 double, cls string")
    m = train_gaussian_nb(df, ["f1", "f2"], "cls")
    got = {
        r["pred"]: r["cnt"]
        for r in gaussian_nb_classify(df, m)
        .groupBy("pred").agg(F.count("*").alias("cnt")).collect()
    }
    con = duckdb.connect()
    con.register("t_src", df.toPandas())
    sql = gaussian_nb_sql(["f1", "f2"], "cls", "rid", table="t",
                          prelude="t AS (SELECT * FROM t_src), ")
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want


def test_forecast_job_matches_numpy_holt(spark):
    """forecast_job's one-F.aggregate Holt fit == the plain-Python
    recursion (seeded s1=v1, b1=0), bounds = z*rmse*sqrt(h)."""
    import math

    from elasticsearch_spark.ops.anomaly import forecast_job

    vals = [10.0, 14.0, 11.0, 18.0, 16.0, 22.0, 19.0, 25.0]
    rows = [(f"2024-01-{i+1:02d} 03:00:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value")
    got = {r["bucket"].strftime("%Y-%m-%d"): r
           for r in forecast_job(df, span="day", horizon=3,
                                 alpha=0.3, beta=0.1).collect()}

    s, b, ss, n = vals[0], 0.0, 0.0, 0
    for v in vals[1:]:
        pred = s + b
        ss += (v - pred) ** 2
        n += 1
        s_new = 0.3 * v + 0.7 * pred
        b = 0.1 * (s_new - s) + 0.9 * b
        s = s_new
    rmse = math.sqrt(ss / n)
    assert set(got) == {"2024-01-09", "2024-01-10", "2024-01-11"}
    for h in (1, 2, 3):
        r = got[f"2024-01-{8+h:02d}"]
        yhat = s + h * b
        assert abs(r["forecast"] - yhat) < 1e-9
        assert abs(r["upper"] - (yhat + 1.96 * rmse * math.sqrt(h))) < 1e-9
        assert abs(r["lower"] - (yhat - 1.96 * rmse * math.sqrt(h))) < 1e-9


def test_forecast_job_single_bucket_zero_band(spark):
    from elasticsearch_spark.ops.anomaly import forecast_job

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 5.0)], "ts string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    out = forecast_job(df, span="hour", horizon=2).collect()
    assert [round(r["forecast"], 9) for r in out] == [5.0, 5.0]
    assert all(r["lower"] == r["upper"] == r["forecast"] for r in out)


def test_rewrite_histogram():
    from elasticsearch_spark.ops.essql import rewrite_histogram

    assert rewrite_histogram(
        "SELECT HISTOGRAM(ts, INTERVAL 1 DAY) AS d FROM t GROUP BY d"
    ) == "SELECT date_trunc('day', ts) AS d FROM t GROUP BY d"
    assert rewrite_histogram("HISTOGRAM(value, 50)") == \
        "(CAST(floor(value / 50) AS BIGINT) * 50)"
    with pytest.raises(ValueError, match="1-unit"):
        rewrite_histogram("HISTOGRAM(ts, INTERVAL 3 DAY)")


def test_count_detector_side_gating(spark):
    """low/high one-sided gating: the same bucket frame scores 0 on
    the unwatched side; 'both' equals the max of the two sides."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from elasticsearch_spark.ops.anomaly import (
        count_anomalies,
        distinct_count_anomalies,
    )

    both = {r["bucket"]: r["score"]
            for r in count_anomalies(ev, span="day").collect()}
    low = {r["bucket"]: r["score"]
           for r in count_anomalies(ev, span="day", side="low").collect()}
    high = {r["bucket"]: r["score"]
            for r in count_anomalies(ev, span="day", side="high").collect()}
    assert both.keys() == low.keys() == high.keys() and len(both) > 3
    for b in both:
        assert low[b] == 0.0 or high[b] == 0.0
        assert round(max(low[b], high[b]), 9) in (
            0.0, round(both[b], 9))
    # distinct_count twin vs DuckDB
    # key by date string: DuckDB's date_trunc('day') yields DATE,
    # Spark's yields TIMESTAMP — same instant, different Python type
    got = {str(r["bucket"])[:10]: (r["n_distinct"], round(r["score"], 6))
           for r in distinct_count_anomalies(
               ev, "user_id", span="day").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    from elasticsearch_spark.ops.anomaly import (
        distinct_count_anomalies_sql,
    )
    want = {str(r[0])[:10]: (r[1], round(r[2], 6)) for r in con.execute(
        distinct_count_anomalies_sql("events", "user_id", span="day")
    ).fetchall()}
    assert got == want


def test_watch_transform_and_throttle(spark, tmp_path):
    """Watcher transform (post-condition payload reshape) and
    throttle_period (fired watches stay quiet for the period)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.watcher import Watch, execute_watch

    def inp(s):
        return s.createDataFrame([(1, 99.0), (2, 10.0)],
                                 "id long, v double")

    w = Watch(
        watch_id="w1",
        input_fn=inp,
        condition=F.col("v") > 50,
        transform_fn=lambda df: df.select(
            "watch_id", (F.col("v") * 2).alias("v2")),
        throttle_period_s=3600.0,
        status_dir=str(tmp_path),
    )
    first = execute_watch(spark, w).collect()
    assert [(r["watch_id"], r["v2"]) for r in first] == [("w1", 198.0)]
    # second run inside the throttle window: suppressed
    assert execute_watch(spark, w).count() == 0
    # throttle requires a status_dir
    import pytest as _pytest

    bad = Watch(watch_id="w2", input_fn=inp, throttle_period_s=10.0)
    with _pytest.raises(ValueError, match="status_dir"):
        execute_watch(spark, bad).collect()


def test_influencers_attribute_the_spike(spark):
    """ml.get_influencers analogue: in a spiked bucket, the influencer
    value that carries the spike scores high; background values whose
    removal does not reduce the deviation score 0 (filtered out)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.anomaly import influencers

    rows = []
    # 10 calm hours: svc_a steady at 50, svc_b wobbles 40/60 (so the
    # MAD scale is non-degenerate)
    for h in range(10):
        rows.append((f"2024-01-01 {h:02d}:15:00", "svc_a", 50.0))
        rows.append((f"2024-01-01 {h:02d}:15:00", "svc_b",
                     40.0 if h % 2 else 60.0))
    # hour 10: svc_b explodes, svc_a stays calm
    rows.append(("2024-01-01 10:15:00", "svc_a", 50.0))
    rows.append(("2024-01-01 10:15:00", "svc_b", 900.0))
    df = spark.createDataFrame(rows, "ts string, svc string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = influencers(df, "svc", threshold=3.0).collect()
    got = {(str(r["bucket"]), r["influencer"]): r["influencer_score"]
           for r in out}
    # only the anomalous bucket emits
    assert {b for b, _ in got} == {"2024-01-01 10:00:00"}
    # svc_b carries (nearly) all of the spike's deviation
    a = got.get(("2024-01-01 10:00:00", "svc_a"), 0.0)
    b = got[("2024-01-01 10:00:00", "svc_b")]
    assert b > 3.0 and b > 10 * a
    # additive-only guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="additive"):
        influencers(df, "svc", func="mean")


def test_overall_buckets_topn_average(spark):
    from elasticsearch_spark.ops.anomaly import overall_buckets

    scores = spark.createDataFrame(
        [("j1", "b1", 10.0), ("j2", "b1", 4.0), ("j3", "b1", 1.0),
         ("j1", "b2", 2.0)],
        "entity string, bucket string, score double")
    top1 = {r["bucket"]: (r["overall_score"], r["jobs_counted"])
            for r in overall_buckets(scores, top_n=1).collect()}
    assert top1 == {"b1": (10.0, 1), "b2": (2.0, 1)}
    top2 = {r["bucket"]: (r["overall_score"], r["jobs_counted"])
            for r in overall_buckets(scores, top_n=2).collect()}
    assert top2 == {"b1": (7.0, 2), "b2": (2.0, 1)}


def test_essql_cursor_paging(spark):
    from elasticsearch_spark.ops.essql import (
        essql,
        essql_clear_cursor,
        essql_page,
    )

    sql = "SELECT doc_id, lang FROM documents ORDER BY doc_id"
    full = [tuple(r) for r in essql(spark, sql, SF).collect()]

    pages, cursor, seen = 0, None, []
    while True:
        page, cursor = essql_page(spark, sql, SF, fetch_size=150,
                                  cursor=cursor)
        seen.extend(tuple(r) for r in page.collect())
        pages += 1
        if cursor is None:
            break
    assert seen == full
    assert pages == len(full) // 150 + 1

    # cursors are statement-bound
    _, c1 = essql_page(spark, sql, SF, fetch_size=1)
    assert essql_clear_cursor(c1) is True
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not belong"):
        essql_page(spark, "SELECT doc_id FROM documents ORDER BY doc_id",
                   SF, fetch_size=1, cursor=c1)
    with _pytest.raises(ValueError, match="ORDER BY"):
        essql_page(spark, "SELECT doc_id FROM documents", SF)


def test_calendar_suppresses_scheduled_windows(spark):
    """ml calendars: anomalies inside a scheduled-event window are
    reported non-anomalous (skip_result); rows and scores unchanged."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.anomaly import (
        apply_calendar,
        single_metric_anomalies,
    )

    rows = [(f"2024-01-01 {h:02d}:30:00", 100.0) for h in range(10)]
    rows.append(("2024-01-01 10:30:00", 5000.0))   # maintenance spike
    rows.append(("2024-01-02 03:30:00", 4000.0))   # real anomaly
    df = spark.createDataFrame(rows, "ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    base = single_metric_anomalies(df, threshold=3.0)
    cal = apply_calendar(base, [("2024-01-01 10:00:00",
                                 "2024-01-01 11:00:00")])
    got = {str(r["bucket"]): r["is_anomaly"] for r in cal.collect()}
    assert got["2024-01-01 10:00:00"] is False      # suppressed
    assert got["2024-01-02 03:00:00"] is True       # still reported
    assert cal.count() == base.count()              # rows kept
    # empty calendar is the identity
    assert apply_calendar(base, []) is base


def test_detector_custom_rules(spark):
    """DetectionRule: conditions on actual/score AND an entity scope,
    rules OR together, skip_result suppresses the flag only."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.anomaly import (
        apply_detector_rules,
        multi_metric_anomalies,
    )

    rows = []
    for h in range(10):
        rows.append((f"2024-01-01 {h:02d}:30:00", "a", 100.0))
        rows.append((f"2024-01-01 {h:02d}:30:00", "b", 100.0))
    rows.append(("2024-01-01 10:30:00", "a", 900.0))   # small-ish spike
    rows.append(("2024-01-01 11:30:00", "a", 9000.0))  # big spike
    rows.append(("2024-01-01 10:30:00", "b", 900.0))   # scoped out
    df = spark.createDataFrame(rows, "ts string, ent string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    base = multi_metric_anomalies(df, "ent", threshold=3.0)

    rules = [{
        "actions": ["skip_result"],
        "conditions": [{"applies_to": "actual", "operator": "lt",
                        "value": 1000.0}],
        "scope": {"ent": {"filter_values": ["a"],
                          "filter_type": "include"}},
    }]
    out = apply_detector_rules(base, rules, entity_col="ent")
    got = {(r["entity"], str(r["bucket"])): r["is_anomaly"]
           for r in out.collect()}
    # a@10 suppressed (actual 900 < 1000, in scope); a@11 kept (9000);
    # b@10 kept (scope excludes it)
    assert got[("a", "2024-01-01 10:00:00")] is False
    assert got[("a", "2024-01-01 11:00:00")] is True
    assert got[("b", "2024-01-01 10:00:00")] is True
    # exclude scope flips it
    rules[0]["scope"]["ent"]["filter_type"] = "exclude"
    out2 = apply_detector_rules(base, rules, entity_col="ent")
    got2 = {(r["entity"], str(r["bucket"])): r["is_anomaly"]
            for r in out2.collect()}
    assert got2[("a", "2024-01-01 10:00:00")] is True
    assert got2[("b", "2024-01-01 10:00:00")] is False
    # no rules = identity; unknown action refuses
    assert apply_detector_rules(base, []) is base
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown actions"):
        apply_detector_rules(base, [{"actions": ["explode"]}])
