"""Dataset assembly ops: deterministic splits + sequence packing."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.ops.dataset import (
    dataset_split, dataset_split_sql, pack_sequences, pack_sequences_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_split_deterministic_and_stable(docs, spark):
    out = dataset_split(docs, id_col="doc_id", seed="s1")
    counts = {r["split"]: r["c"] for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    n = docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 0.8 * n
    # stability: membership is a pure function of (id, seed) — a
    # subset of the corpus gets identical assignments
    sub = dataset_split(docs.limit(50), id_col="doc_id", seed="s1")
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]
    # different seed -> different partitioning (overwhelmingly likely)
    other = dataset_split(docs, id_col="doc_id", seed="s2")
    diff = out.alias("a").join(other.alias("b"), "doc_id").where(
        F.col("a.split") != F.col("b.split")).count()
    assert diff > 0
    with pytest.raises(ValueError):
        dataset_split(docs, weights={"train": 0.5, "val": 0.1})


def test_split_matches_duckdb_twin(docs):
    got = {r["doc_id"]: r["split"]
           for r in dataset_split(docs, seed="x").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = dict(con.execute(
        f"SELECT doc_id, {dataset_split_sql(seed='x')} FROM documents"
    ).fetchall())
    assert got == want


def test_pack_sequences(spark):
    rows = [(i, t) for i, t in enumerate([400, 500, 300, 900, 100,
                                          2500, 50, 60])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", 1000).collect()
    got = {r["doc_id"]: r["pack_id"] for r in out}
    # exclusive cumsum: 0,400,900,1200,2100,2200,4700,4750
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 2, 6: 4, 7: 4}
    # per-partition packing never crosses the partition key
    df2 = df.withColumn("day", (F.col("doc_id") % 2).cast("int"))
    packed = pack_sequences(df2, "n_tokens", 1000, partition_col="day")
    sums = packed.groupBy("day", "pack_id").agg(
        F.sum("n_tokens").alias("s"),
        F.count("*").alias("c")).collect()
    for r in sums:
        # a bin exceeds max only via its LAST doc (overshoot <= 1 doc)
        assert r["s"] < 1000 + 2500

    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = dict(con.execute(
        f"SELECT doc_id, {pack_sequences_sql('n_tokens', 1000)} FROM t"
    ).fetchall())
    assert got == want


def test_repetition_signals(spark):
    """Gopher repetition heuristics: hand-checkable values."""
    from elasticsearch_spark.ops.text import repetition_signals

    rows = [
        (1, "spam line\nspam line\nunique line\n\nspam line"),
        (2, "all fresh words here today"),
        (3, "go go go go"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # doc 1: 4 non-blank lines, 2 distinct -> dup_line_frac = 0.5;
    # chars: total 4 lines (9+9+11+9=38), distinct (9+11=20) -> 18/38
    assert got[1]["dup_line_frac"] == 0.5
    assert got[1]["dup_line_char_frac"] == round(18 / 38, 6)
    # doc 3: tokens [go x4] -> dup_word_frac 3/4; bigrams 'go go' x3,
    # top bigram chars = 3 * 4 ('gogo') over tok_chars 8 -> 1.5
    assert got[3]["dup_word_frac"] == 0.75
    assert got[3]["top_bigram_share"] == round(12 / 8, 6)
    # doc 2: no repetition anywhere
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["dup_line_char_frac"] == 0.0


def _py_components(edges):
    """Independent union-find for the property check."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id per component
    out = {}
    for x in list(parent):
        r = find(x)
        out[x] = min(out.get(r, r), r)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    import random

    from elasticsearch_spark.ops.dedup import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges += [(i, i + 1) for i in range(300, 340)]  # a 41-node chain
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    want = _py_components([(a, b) for a, b in edges if a != b])
    assert got == want
    # component ids are the min node id of each component
    for n, c in got.items():
        assert c <= n and got[c] == c


def test_dedup_clusters_keep_best(spark):
    from elasticsearch_spark.ops.dedup import (
        connected_components, dedup_clusters_keep_best,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long")
    comps = connected_components(pairs)
    docs = spark.createDataFrame(
        [(i, float(q)) for i, q in
         [(1, 0.5), (2, 0.9), (3, 0.1), (10, 0.2), (11, 0.2), (99, 0.0)]],
        "doc_id long, quality double")
    kept = dedup_clusters_keep_best(docs, comps, score_col="quality")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # cluster {1,2,3} -> 2 (best quality); {10,11} -> 10 (tie, low id);
    # 99 is a singleton
    assert ids == [2, 10, 99]
    # no score: lowest id wins
    kept2 = dedup_clusters_keep_best(docs, comps)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 10, 99]


def test_chunk_documents_windows_and_tail(spark):
    """Chunks stride by size-overlap, cover every token, and the last
    chunk may be short; empty docs emit nothing."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.dataset import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "a b"), (3, "   ")], "doc_id long, text string")
    out = chunk_documents(df, size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk"] for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r["n_tokens"] for r in c1] == [4, 4, 4]
    assert [r["chunk_id"] for r in c1] == [0, 1, 2]
    # short doc: one (short) chunk; whitespace-only doc: nothing
    assert [r["chunk"] for r in by_doc[2]] == ["a b"]
    assert 3 not in by_doc
    with __import__("pytest").raises(ValueError, match="overlap"):
        chunk_documents(df, size=4, overlap=4)


def test_canonicalize_url_matches_duckdb(spark):
    """Spark canonicalizer == its SQL twin on edge URLs."""
    import duckdb

    from elasticsearch_spark.ops.text import (
        canonicalize_url,
        canonicalize_url_sql,
    )

    urls = [
        "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
        "http://example.com:80/",
        "https://example.com/a/b/",
        "https://example.com/a/b?utm_campaign=z",
        "https://example.com/?gclid=123",
        "https://example.com/x?q=1&fbclid=2",
        "ftp://Host.Net/File",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in
           df.select(canonicalize_url("url").alias("c")).collect()]
    con = duckdb.connect()
    want = [con.execute(
        "SELECT " + canonicalize_url_sql(f"'{u}'")).fetchone()[0]
        for u in urls]
    assert got == want
    # tracking-only query collapses; default port dropped
    assert got[1] == "http://example.com/"
    assert got[4] == "https://example.com/"


def test_remove_boilerplate_lines(spark):
    from elasticsearch_spark.ops.text import remove_boilerplate_lines

    banner = "COPYRIGHT ACME CORP ALL RIGHTS RESERVED"
    docs = [(i, f"{banner}\nunique line {i}\nok {i}") for i in range(12)]
    docs.append((99, "no banner here at all"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate_lines(
               df, max_df=10, min_chars=10).collect()}
    assert out[0] == "unique line 0\nok 0"        # banner stripped
    assert out[99] == "no banner here at all"     # untouched
    # short lines exempt even when frequent ("ok i" < min_chars is
    # per-doc unique anyway); banner in <= max_df docs survives
    few = [(i, f"RARE BANNER LINE HERE\nbody {i}") for i in range(5)]
    df2 = spark.createDataFrame(few, "doc_id long, text string")
    out2 = {r["doc_id"]: r["text_clean"]
            for r in remove_boilerplate_lines(
                df2, max_df=10, min_chars=10).collect()}
    assert out2[0].startswith("RARE BANNER")
