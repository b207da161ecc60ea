"""x-pack analytics aggs — sanity vs hand-computed values (the strong
check is the DuckDB oracle gate; these pin the semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.aggs import analytics as A


@pytest.fixture(scope="module")
def nums(spark):
    return spark.createDataFrame(
        [(i, float(v), "a" if i % 2 else "b")
         for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])],
        "id long, v double, g string",
    )


def test_boxplot(nums):
    r = A.boxplot(nums, "v").collect()[0]
    assert (r["min"], r["q2"], r["max"]) == (1.0, 5.5, 100.0)
    assert math.isclose(r["q1"], 3.25) and math.isclose(r["q3"], 7.75)


def test_string_stats(spark):
    df = spark.createDataFrame([("aab",), ("b",)], "s string")
    r = A.string_stats(df, "s").collect()[0]
    assert (r["count"], r["min_length"], r["max_length"]) == (2, 1, 3)
    # chars: a:2 b:2 -> entropy = 1 bit
    assert math.isclose(r["entropy"], 1.0, rel_tol=1e-12)


def test_top_metrics_and_multi_terms(nums):
    top = A.top_metrics(nums, ["g"], "v", size=2, tie_breaker="id").collect()
    assert [r["v"] for r in top] == [100.0, 9.0]
    mt = A.multi_terms(nums, ["g"], size=2).collect()
    assert {(r["g"], r["doc_count"]) for r in mt} == {("a", 5), ("b", 5)}


def test_t_test_welch(nums):
    r = A.t_test(nums, "v", F.col("g") == "a", F.col("g") == "b").collect()[0]
    # hand-computed Welch t for a=[2,4,6,8,100], b=[1,3,5,7,9]
    ma, mb = 24.0, 5.0
    va = sum((x - ma) ** 2 for x in [2, 4, 6, 8, 100]) / 4
    vb = sum((x - mb) ** 2 for x in [1, 3, 5, 7, 9]) / 4
    want = (ma - mb) / math.sqrt(va / 5 + vb / 5)
    assert math.isclose(r["t_stat"], want, rel_tol=1e-12)
    assert (r["na"], r["nb"]) == (5, 5)


def test_variable_width_histogram(spark):
    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 2, 3, 50, 51, 200, 201, 202]], "x long"
    )
    out = A.variable_width_histogram(df, "x", buckets=3).collect()
    assert [(r["bucket_id"], r["min"], r["max"], r["doc_count"]) for r in out] == [
        (0, 1, 3, 4), (1, 50, 51, 2), (2, 200, 202, 3)
    ]


def test_moving_percentiles(spark):
    rows = []
    for m, vals in [(1, [1.0, 3.0]), (2, [5.0]), (3, [7.0, 9.0])]:
        for v in vals:
            rows.append((f"2024-0{m}-15 00:00:00", v))
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = A.moving_percentiles(df, "ts", "value", percent=0.5, window=2).collect()
    # window medians: [1,3]->2; [1,3,5]->3; [5,7,9]->7
    assert [r["p"] for r in out] == [2.0, 3.0, 7.0]


def test_date_and_ip_range(spark):
    df = spark.createDataFrame(
        [("2024-01-05", "10.0.0.1"), ("2024-07-01", "10.100.0.1"),
         ("2025-02-01", "10.200.0.1")],
        "d string, ip string",
    ).withColumn("d", F.col("d").cast("timestamp"))
    dr = {r["key"]: r["doc_count"] for r in A.date_range_agg(
        df, "d", [(None, "2024-06-01"), ("2024-06-01", None)]).collect()}
    assert dr == {"*..2024-06-01": 1, "2024-06-01..*": 2}
    ir = {r["key"]: r["doc_count"] for r in A.ip_range_agg(
        df, "ip", [(None, "10.64.0.0"), ("10.64.0.0", None)]).collect()}
    assert ir == {"*..10.64.0.0": 1, "10.64.0.0..*": 2}


def test_cumulative_cardinality(spark):
    rows = [("2024-01-03", 1), ("2024-01-05", 2), ("2024-02-02", 1),
            ("2024-02-10", 3), ("2024-03-01", 2), ("2024-04-09", 4)]
    df = spark.createDataFrame(rows, "ts string, uid long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = A.cumulative_cardinality(df, "ts", "uid", calendar="month").collect()
    got = [(str(r["bucket"])[:7], r["new_keys"], r["cumulative_cardinality"])
           for r in out]
    # Jan: {1,2}=2 new; Feb: {3}=1 new (1 repeats); Mar: 0 new; Apr: {4}
    assert got == [("2024-01", 2, 2), ("2024-02", 1, 3),
                   ("2024-03", 0, 3), ("2024-04", 1, 4)]


def test_normalize_methods(spark):
    rows = [("2024-01-01", 10.0), ("2024-02-01", 30.0), ("2024-03-01", 60.0)]
    df = spark.createDataFrame(rows, "ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    pos = [r["normalized"] for r in A.normalize_agg(
        df, "ts", "v", method="percent_of_sum").collect()]
    assert pos == [0.1, 0.3, 0.6]
    r01 = [r["normalized"] for r in A.normalize_agg(
        df, "ts", "v", method="rescale_0_1").collect()]
    assert r01 == [0.0, 0.4, 1.0]
    mean = [r["normalized"] for r in A.normalize_agg(
        df, "ts", "v", method="mean").collect()]
    assert [round(x, 6) for x in mean] == [0.3, 0.9, 1.8]


def test_geo_line_agg(spark):
    """geo_line (x-pack spatial GeoLineAggregationBuilder): per-bucket
    sort-ordered LineString, truncated at size."""
    from elasticsearch_spark.aggs.analytics import geo_line_agg

    rows = [("a", 3, 30.0, 3.0), ("a", 1, 10.0, 1.0), ("a", 2, 20.0, 2.0),
            ("b", 1, 5.0, 50.0), ("b", 2, 6.0, 60.0)]
    df = spark.createDataFrame(rows, "g string, t int, lon double, lat double")
    out = {r["g"]: r for r in geo_line_agg(
        df, ["g"], "lat", "lon", "t").collect()}
    assert out["a"]["geometry"] == "LINESTRING (10.0 1.0, 20.0 2.0, 30.0 3.0)"
    assert out["a"]["n_points"] == 3 and out["a"]["doc_count"] == 3
    assert out["b"]["geometry"] == "LINESTRING (5.0 50.0, 6.0 60.0)"
    # size truncation keeps the FIRST points in sort order
    trunc = {r["g"]: r for r in geo_line_agg(
        df, ["g"], "lat", "lon", "t", size=2).collect()}
    assert trunc["a"]["geometry"] == "LINESTRING (10.0 1.0, 20.0 2.0)"
    assert trunc["a"]["n_points"] == 2 and trunc["a"]["doc_count"] == 3
    desc = geo_line_agg(df, ["g"], "lat", "lon", "t",
                        sort_order="desc").collect()
    assert {r["g"]: r["geometry"] for r in desc}["a"].startswith(
        "LINESTRING (30.0 3.0")


def test_terms_include_exclude_partition(spark):
    """terms agg include/exclude regex + list + partitioned fetch
    (IncludeExclude.java semantics: whole-term regex, disjoint-
    exhaustive partitions)."""
    from elasticsearch_spark.aggs.translate import aggregate

    rows = [(i, ["apple", "apricot", "banana", "cherry"][i % 4])
            for i in range(40)]
    df = spark.createDataFrame(rows, "id int, fruit string")

    def terms(**conf):
        spec = {"t": {"terms": {"field": "fruit", "size": 10, **conf}}}
        return sorted(r["key"] for r in aggregate(df, spec).collect())

    assert terms(include="ap.*") == ["apple", "apricot"]
    assert terms(include="ap") == []  # whole-term anchored
    assert terms(exclude="a.*") == ["banana", "cherry"]
    assert terms(include=["banana", "cherry"], exclude=["cherry"]) == ["banana"]
    # partitions are disjoint and exhaustive
    parts = [terms(include={"partition": p, "num_partitions": 3})
             for p in range(3)]
    flat = [k for ks in parts for k in ks]
    assert sorted(flat) == ["apple", "apricot", "banana", "cherry"]
    assert len(flat) == len(set(flat))


def test_bucket_count_correlation(spark):
    """bucket_correlation/count_correlation vs a direct evaluation of
    CountCorrelationFunction.java:100-170 (uniform fractions)."""
    import math as m

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 6.0, 8.0, 10.0]  # monotone with x -> strong +corr
    doc_count = 100
    buckets = spark.createDataFrame(
        list(zip(xs, ys)), "x double, y double")

    def ref(xs, ys, N):
        n = len(xs)
        xm = sum(xs) / n
        xv = sum((v - xm) ** 2 for v in xs) / n
        w = sum(ys) / N
        ym = w
        yv = (1 - w) * ym * ym + w * (1 - ym) * (1 - ym)
        frac = 1.0 / n
        cov = sum(-(N * frac - y) * (x - xm) * ym + y * (x - xm) * (1 - ym)
                  for x, y in zip(xs, ys)) / N
        return cov / m.sqrt(xv * yv)

    from elasticsearch_spark.aggs.analytics import bucket_count_correlation

    got = bucket_count_correlation(buckets, "x", "y", doc_count).first()
    assert got["correlation"] == pytest.approx(ref(xs, ys, doc_count),
                                               rel=1e-12)
    # positive association (the Bernoulli y side caps the magnitude:
    # with only 30% of indicator docs carried by y, r ~ 0.31 here)
    assert got["correlation"] > 0.25
    # zero variance -> NULL (reference NaN)
    flat = spark.createDataFrame([(1.0, 5.0), (1.0, 5.0)], "x double, y double")
    assert bucket_count_correlation(
        flat, "x", "y", 100).first()["correlation"] is None
    with pytest.raises(ValueError):
        bucket_count_correlation(buckets, "x", "y", 10)  # weight > 1


def test_date_range_date_math_edges(spark):
    from datetime import datetime

    from elasticsearch_spark.aggs.analytics import date_range_agg
    from elasticsearch_spark.search import datemath

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    datemath.set_fixed_now(datetime(2024, 2, 1))
    try:
        out = {
            r["key"]: r["doc_count"]
            for r in date_range_agg(
                ev, "ts", [(None, "now-2w/w"), ("now-2w/w", None)]
            ).collect()
        }
    finally:
        datemath.set_fixed_now(None)
    edge = datetime(2024, 1, 15)  # Monday two weeks before Feb 1
    lo = ev.filter(F.col("ts") < F.lit(edge)).count()
    hi = ev.filter(F.col("ts") >= F.lit(edge)).count()
    assert out["*..now-2w/w"] == lo and out["now-2w/w..*"] == hi
