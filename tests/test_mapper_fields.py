"""x-pack mapper family: aggregate_metric_double, constant_keyword
(partition pruning), unsigned_long, murmur3/_size, phonetic soundex."""

from __future__ import annotations

import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.analysis import analyze
from elasticsearch_spark.ops import fields, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_aggregate_metric_double_matches_raw(spark, li):
    pre = fields.pre_aggregate(
        li.withColumn("g", F.pmod("l_suppkey", F.lit(7))),
        ["l_suppkey", "g"], "l_quantity")
    got = {r["g"]: r for r in
           fields.aggregate_metric_agg(pre, ["g"]).collect()}
    raw = {r["g"]: r for r in
           li.withColumn("g", F.pmod("l_suppkey", F.lit(7)))
           .groupBy("g")
           .agg(F.min("l_quantity").alias("min_v"),
                F.max("l_quantity").alias("max_v"),
                F.sum("l_quantity").alias("sum_v"),
                F.count("l_quantity").alias("value_count")).collect()}
    assert set(got) == set(raw)
    for g in raw:
        assert got[g]["min_v"] == raw[g]["min_v"]
        assert got[g]["max_v"] == raw[g]["max_v"]
        assert got[g]["value_count"] == raw[g]["value_count"]
        assert got[g]["sum_v"] == pytest.approx(raw[g]["sum_v"], rel=1e-12)
        assert got[g]["avg_v"] == pytest.approx(
            raw[g]["sum_v"] / raw[g]["value_count"], rel=1e-12)


def test_constant_keyword_partition_pruning(spark, docs):
    out = tempfile.mkdtemp(prefix="ck_")
    fields.write_constant_keyword(docs, out, "lang")
    q = fields.constant_keyword_term(spark, out, "lang", "de")
    want = docs.where(F.col("lang") == "de").count()
    assert q.count() == want
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the term resolves at planning: a PartitionFilters entry, no
    # post-scan Filter on lang
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_unsigned_long_order_and_range(spark):
    raws = [0, 1, -1, -2, 2, 9_223_372_036_854_775_807,
            -9_223_372_036_854_775_808]
    df = spark.createDataFrame([(v,) for v in raws], "h long")
    got = [r["h"] for r in
           df.orderBy(fields.unsigned_long_key("h").asc()).collect()]
    # unsigned order: 0,1,2,MAX, MIN(=2^63), -2(=2^64-2), -1(=2^64-1)
    assert got == [0, 1, 2, 9_223_372_036_854_775_807,
                   -9_223_372_036_854_775_808, -2, -1]
    hi = [r["h"] for r in
          df.where(fields.unsigned_range("h", gte=2 ** 63)).collect()]
    assert sorted(hi) == [-9_223_372_036_854_775_808, -2, -1]
    # DuckDB twin produces the identical unsigned keys
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        "SELECT h FROM (SELECT unnest(?::BIGINT[]) AS h) ORDER BY "
        + fields.unsigned_long_key_sql("h"), [raws]).fetchall()]
    assert got == want


def test_murmur3_and_size_fields(spark, docs):
    d = fields.size_field(docs.limit(10)).withColumn(
        "h", fields.murmur3_field("text"))
    rows = d.select("n_chars", "_size", "h").collect()
    for r in rows:
        assert r["_size"] > r["n_chars"]  # JSON wrapper adds bytes
        assert isinstance(r["h"], int)


def test_phonetic_analyzer_chain():
    toks = analyze("Robert merged", "phonetic")
    assert toks == [("R163", 0), ("M623", 1)]


def test_soundex_spark_expr_matches_scalar(spark):
    words = ["Robert", "Ashcraft", "Tymczak", "Pfister", "merge",
             "a", "h2o", "", "Washington"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", text.soundex_expr("w").alias("s")).collect()}
    for w in words:
        assert got[w] == text.soundex(w), w


def test_scaled_float_roundtrip_and_agg(spark, li):
    d = li.select(
        "l_suppkey",
        fields.scaled_float_store("l_extendedprice", 100).alias("sf"))
    got = (d.groupBy("l_suppkey")
           .agg((F.sum("sf") / 100.0).alias("s"))
           .orderBy("l_suppkey").limit(5).collect())
    want = (li.groupBy("l_suppkey")
            .agg(F.sum(F.round(F.col("l_extendedprice") * 100) / 100.0)
                 .alias("s"))
            .orderBy("l_suppkey").limit(5).collect())
    for g, w in zip(got, want):
        # the scaled path is EXACT (one long sum, one division); the
        # raw-double comparison accumulates fp error per row
        assert g["s"] == pytest.approx(w["s"], abs=1e-6)


def test_histogram_field_agg_matches_raw(spark, li):
    # build per-suppkey histograms of quantity, re-aggregate by bucket
    per = (li.groupBy("l_suppkey", "l_quantity").count()
           .groupBy("l_suppkey")
           .agg(F.sort_array(F.collect_list(
               F.struct("l_quantity", "count"))).alias("p"))
           .select("l_suppkey", fields.histogram_struct(
               F.col("p.l_quantity"), F.col("p.count")).alias("hist"))
           .withColumn("g", F.pmod("l_suppkey", F.lit(5))))
    got = {r["g"]: r for r in
           fields.histogram_agg(per, ["g"]).collect()}
    raw = li.withColumn("g", F.pmod("l_suppkey", F.lit(5)))
    want = {r["g"]: r for r in
            raw.groupBy("g").agg(
                F.min("l_quantity").alias("min_v"),
                F.max("l_quantity").alias("max_v"),
                F.sum("l_quantity").alias("sum_v"),
                F.count("l_quantity").alias("value_count"),
                F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            ).collect()}
    assert set(got) == set(want)
    for g in want:
        assert got[g]["min_v"] == want[g]["min_v"]
        assert got[g]["max_v"] == want[g]["max_v"]
        assert got[g]["value_count"] == want[g]["value_count"]
        assert got[g]["sum_v"] == pytest.approx(want[g]["sum_v"], rel=1e-12)
        # lower-bound weighted percentile vs interpolating percentile:
        # same order of magnitude sanity + exact rule check below
        assert got[g]["pct_v"] <= want[g]["max_v"]
    # exact rule: smallest v with cum >= 0.5 * total
    one = raw.where(F.col("g") == 0).groupBy("l_quantity").count() \
        .orderBy("l_quantity").collect()
    total = sum(r["count"] for r in one)
    cum = 0
    for r in one:
        cum += r["count"]
        if cum >= 0.5 * total:
            assert got[0]["pct_v"] == r["l_quantity"]
            break


def test_token_count_field(spark):
    from elasticsearch_spark.ops.fields import token_count_field

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "a the an"), (3, ""), (4, None)],
        "id int, t string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", token_count_field("t", "standard").alias("n")).collect()}
    assert got == {1: 4, 2: 3, 3: 0, 4: None}
    # stop analyzer drops "the"/"a" but position increments still count
    # leading/inner gaps: "the quick brown fox" -> quick@1..fox@3 -> 4
    inc = {r["id"]: r["n"] for r in df.select(
        "id", token_count_field("t", "stop").alias("n")).collect()}
    assert inc[1] == 4
    noinc = {r["id"]: r["n"] for r in df.select(
        "id", token_count_field(
            "t", "stop", enable_position_increments=False).alias("n")
    ).collect()}
    assert noinc[1] == 3
    nv = df.select(token_count_field(
        "t", "standard", null_value=7).alias("n")).collect()
    assert {r["n"] for r in nv} == {4, 3, 0, 7}


def test_rank_features_score(spark):
    from elasticsearch_spark.search.extras import rank_features_score

    df = spark.createDataFrame(
        [(1, {"pagerank": 8.0, "spam": 4.0}),
         (2, {"pagerank": 2.0}),
         (3, {"spam": 1.0})],
        "id int, feats map<string,float>")
    sat = {r["id"]: r["s"] for r in df.select("id", rank_features_score(
        "feats", "pagerank", saturation_pivot=2.0).alias("s")).collect()}
    assert sat[1] == pytest.approx(8.0 / 10.0)
    assert sat[2] == pytest.approx(2.0 / 4.0)
    assert sat[3] is None  # missing feature -> no match
    neg = {r["id"]: r["s"] for r in df.select("id", rank_features_score(
        "feats", "spam", positive_score_impact=False,
        saturation_pivot=2.0).alias("s")).collect()}
    assert neg[1] == pytest.approx(2.0 / 6.0)
    assert neg[3] == pytest.approx(2.0 / 3.0)
    logd = df.select(rank_features_score(
        "feats", "pagerank", log_scaling_factor=1.0).alias("s"))
    import math
    vals = {round(r["s"], 6) for r in logd.collect() if r["s"] is not None}
    assert round(math.log(9.0), 6) in vals


def test_range_field_relations(spark):
    """RangeFieldMapper analogue: struct<gte,lte> + relation predicates.

    Reference: server/src/main/java/org/elasticsearch/index/mapper/
    RangeFieldMapper.java (relation INTERSECTS/WITHIN/CONTAINS,
    closed bounds, null bound = unbounded).
    """
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.fields import range_query, range_struct

    df = spark.createDataFrame(
        [(1, 10, 20),      # fully inside the query window
         (2, 0, 100),      # covers the query window
         (3, 15, 35),      # overlaps the right edge
         (4, 40, 50),      # disjoint
         (5, None, 12),    # unbounded below -> intersects, contains-left
         (6, 25, None)],   # unbounded above -> intersects
        "id int, lo int, hi int",
    ).select("id", range_struct("lo", "hi").alias("r"))

    def ids(rel):
        rows = df.filter(range_query("r", F.lit(10), F.lit(30), rel))
        return {r["id"] for r in rows.select("id").collect()}

    assert ids("intersects") == {1, 2, 3, 5, 6}
    assert ids("within") == {1}
    assert ids("contains") == {2}
    with pytest.raises(ValueError):
        range_query("r", F.lit(1), F.lit(2), "overlaps")
