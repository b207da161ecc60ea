"""Aggregation surface vs DuckDB ground truth on the sf0.001 tables."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.aggs import aggregate, pipeline_agg
from elasticsearch_spark.aggs.translate import bucket_stats, top_hits

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "events", "customer"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def tables(spark):
    return {
        t: spark.read.parquet(os.path.join(SF, f"{t}.parquet"))
        for t in ["lineitem", "orders", "events", "customer"]
    }


def rows_match(got, want, float_tol=1e-9):
    assert len(got) == len(want), f"{len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=float_tol, abs_tol=1e-9), (g, w)
            else:
                assert str(a) == str(b), (g, w)


def test_terms_with_metrics(tables, duck):
    out = aggregate(
        tables["lineitem"],
        {"by_flag": {
            "terms": {"field": "l_returnflag", "order": {"_key": "asc"}},
            "aggs": {
                "sum_qty": {"sum": {"field": "l_quantity"}},
                "avg_price": {"avg": {"field": "l_extendedprice"}},
                "uniq_parts": {"cardinality": {"field": "l_partkey", "exact": True}},
            },
        }},
    ).collect()
    want = duck.execute("""
        SELECT l_returnflag, count(*), sum(l_quantity), avg(l_extendedprice),
               count(DISTINCT l_partkey)
        FROM lineitem GROUP BY 1 ORDER BY 1
    """).fetchall()
    rows_match([tuple(r) for r in out], want)


def test_terms_top_n_order_count(tables, duck):
    out = aggregate(
        tables["orders"],
        {"by_prio": {"terms": {"field": "o_orderpriority", "size": 3}}},
    ).collect()
    want = duck.execute("""
        SELECT o_orderpriority, count(*) AS c FROM orders
        GROUP BY 1 ORDER BY c DESC, o_orderpriority ASC LIMIT 3
    """).fetchall()
    rows_match([tuple(r) for r in out], want)


def test_histogram(tables, duck):
    out = aggregate(
        tables["orders"],
        {"h": {"histogram": {"field": "o_totalprice", "interval": 50000}}},
    ).collect()
    want = duck.execute("""
        SELECT floor(o_totalprice / 50000) * 50000 AS key, count(*)
        FROM orders GROUP BY 1 ORDER BY 1
    """).fetchall()
    rows_match([tuple(r) for r in out], want)


def test_date_histogram_month(tables, duck):
    out = aggregate(
        tables["orders"],
        {"m": {
            "date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
            "aggs": {"rev": {"sum": {"field": "o_totalprice"}}},
        }},
    ).collect()
    want = duck.execute("""
        SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS key,
               count(*), sum(o_totalprice)
        FROM orders GROUP BY 1 ORDER BY 1
    """).fetchall()
    rows_match([tuple(r) for r in out], want, float_tol=1e-12)


def test_date_histogram_fixed_interval(tables, duck):
    out = aggregate(
        tables["events"],
        {"w": {"date_histogram": {"field": "ts", "fixed_interval": "12h"}}},
    ).collect()
    want = duck.execute("""
        SELECT to_timestamp(floor(epoch(ts) / 43200) * 43200) AS key, count(*)
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    got = [(str(r[0]), r[1]) for r in out]
    exp = [(str(w[0]).replace("+00:00", ""), w[1]) for w in want]
    assert got == exp


def test_range_agg(tables, duck):
    out = aggregate(
        tables["customer"],
        {"r": {"range": {
            "field": "c_acctbal",
            "ranges": [
                {"key": "low", "to": 0},
                {"key": "mid", "from": 0, "to": 5000},
                {"key": "high", "from": 5000},
            ],
        }}},
    ).collect()
    want = {
        "low": duck.execute("SELECT count(*) FROM customer WHERE c_acctbal < 0").fetchone()[0],
        "mid": duck.execute("SELECT count(*) FROM customer WHERE c_acctbal >= 0 AND c_acctbal < 5000").fetchone()[0],
        "high": duck.execute("SELECT count(*) FROM customer WHERE c_acctbal >= 5000").fetchone()[0],
    }
    got = {r["key"]: r["doc_count"] for r in out}
    assert got == want


def test_filters_agg(tables, duck):
    out = aggregate(
        tables["events"],
        {"f": {"filters": {"filters": {
            "clicks": {"term": {"event_type": "click"}},
            "big": {"range": {"value": {"gte": 50}}},
        }}, "aggs": {"v": {"avg": {"field": "value"}}}}},
    ).collect()
    got = {r["key"]: (r["doc_count"], r["v"]) for r in out}
    for key, sql in [
        ("clicks", "event_type = 'click'"),
        ("big", "value >= 50"),
    ]:
        want = duck.execute(
            f"SELECT count(*), avg(value) FROM events WHERE {sql}"
        ).fetchone()
        assert got[key][0] == want[0]
        assert math.isclose(got[key][1], want[1], rel_tol=1e-9)


def test_missing_agg(tables, spark):
    df = tables["customer"].withColumn(
        "maybe", F.when(F.col("c_custkey") % 3 == 0, F.col("c_name"))
    )
    out = aggregate(df, {"m": {"missing": {"field": "maybe"}}}).collect()
    want = df.filter(F.col("maybe").isNull()).count()
    assert out[0]["doc_count"] == want


def test_composite_paging(tables, duck):
    spec = {"c": {"composite": {
        "sources": [
            {"flag": {"terms": {"field": "l_returnflag"}}},
            {"status": {"terms": {"field": "l_linestatus"}}},
        ],
        "size": 2,
    }}}
    page1 = aggregate(tables["lineitem"], spec).collect()
    after = {"flag": page1[-1]["flag"], "status": page1[-1]["status"]}
    spec["c"]["composite"]["after"] = after
    page2 = aggregate(tables["lineitem"], spec).collect()
    want = duck.execute("""
        SELECT l_returnflag, l_linestatus, count(*) FROM lineitem
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 4
    """).fetchall()
    got = [(r["flag"], r["status"], r["doc_count"]) for r in page1 + page2]
    rows_match(got, want)


def test_stats_and_extended_stats(tables, duck):
    out = aggregate(
        tables["lineitem"],
        {"g": {"global": {}, "aggs": {
            "s": {"stats": {"field": "l_quantity"}},
            "e": {"extended_stats": {"field": "l_discount"}},
        }}},
    ).collect()[0]
    want = duck.execute("""
        SELECT count(l_quantity), min(l_quantity), max(l_quantity),
               avg(l_quantity), sum(l_quantity),
               var_pop(l_discount), stddev_pop(l_discount)
        FROM lineitem
    """).fetchone()
    assert out["s_count"] == want[0]
    assert out["s_min"] == want[1] and out["s_max"] == want[2]
    assert math.isclose(out["s_avg"], want[3], rel_tol=1e-12)
    assert math.isclose(out["s_sum"], want[4], rel_tol=1e-12)
    assert math.isclose(out["e_variance"], want[5], rel_tol=1e-9)
    assert math.isclose(out["e_std_deviation"], want[6], rel_tol=1e-9)


def test_weighted_avg_and_percentiles(tables, duck):
    out = aggregate(
        tables["lineitem"],
        {"g": {"global": {}, "aggs": {
            "w": {"weighted_avg": {
                "value": {"field": "l_extendedprice"},
                "weight": {"field": "l_quantity"},
            }},
            "p": {"percentiles": {"field": "l_extendedprice",
                                   "percents": [50, 95], "exact": True}},
        }}},
    ).collect()[0]
    want = duck.execute("""
        SELECT sum(l_extendedprice * l_quantity) / sum(l_quantity),
               quantile_cont(l_extendedprice, 0.5),
               quantile_cont(l_extendedprice, 0.95)
        FROM lineitem
    """).fetchone()
    assert math.isclose(out["w"], want[0], rel_tol=1e-12)
    assert math.isclose(out["p_p50"], want[1], rel_tol=1e-9)
    assert math.isclose(out["p_p95"], want[2], rel_tol=1e-9)


def test_cardinality_approx_close():
    # HLL++ semantics (reference HyperLogLogPlusPlus.java): approximate
    from elasticsearch_spark.session import get_spark

    spark = get_spark(cores=8)
    df = spark.range(10000).withColumn("v", F.col("id") % 2500)
    got = aggregate(df, {"g": {"global": {}, "aggs": {
        "c": {"cardinality": {"field": "v"}}}}}).collect()[0]["c"]
    assert abs(got - 2500) / 2500 < 0.1


def test_top_hits_per_bucket(tables, duck):
    out = top_hits(
        tables["orders"], "o_orderpriority", "o_totalprice", size=2,
        tie_col="o_orderkey",
    ).select("o_orderpriority", "o_orderkey", "hit_rank").collect()
    want = duck.execute("""
        SELECT o_orderpriority, o_orderkey, rn FROM (
          SELECT o_orderpriority, o_orderkey,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn <= 2
    """).fetchall()
    got = sorted((r[0], r[1], r[2]) for r in out)
    assert got == sorted(want)


def test_pipeline_aggs(tables, duck):
    buckets = aggregate(
        tables["orders"],
        {"m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
                "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}},
    )
    out = pipeline_agg(
        pipeline_agg(buckets, "cumulative_sum", "rev", out_name="cum"),
        "derivative", "rev", out_name="deriv",
    ).orderBy("key").collect()
    want = duck.execute("""
        WITH b AS (
          SELECT date_trunc('month', o_orderdate) AS key, sum(o_totalprice) AS rev
          FROM orders GROUP BY 1)
        SELECT key, rev,
               sum(rev) OVER (ORDER BY key) AS cum,
               rev - lag(rev) OVER (ORDER BY key) AS deriv
        FROM b ORDER BY key
    """).fetchall()
    for g, w in zip(out, want):
        assert math.isclose(g["cum"], w[2], rel_tol=1e-12)
        if w[3] is None:
            assert g["deriv"] is None
        else:
            assert math.isclose(g["deriv"], w[3], rel_tol=1e-9)


def test_bucket_stats(tables, duck):
    buckets = aggregate(
        tables["lineitem"],
        {"t": {"terms": {"field": "l_returnflag"},
                "aggs": {"q": {"sum": {"field": "l_quantity"}}}}},
    )
    out = bucket_stats(buckets, "q").collect()[0]
    want = duck.execute("""
        WITH b AS (SELECT sum(l_quantity) AS q FROM lineitem GROUP BY l_returnflag)
        SELECT count(q), min(q), max(q), avg(q), sum(q) FROM b
    """).fetchone()
    assert out["q_count"] == want[0]
    assert math.isclose(out["q_min"], want[1])
    assert math.isclose(out["q_sum"], want[4], rel_tol=1e-12)


def test_nested_bucket(tables, duck):
    out = aggregate(
        tables["lineitem"],
        {"t": {"terms": {"field": "l_returnflag"},
                "aggs": {"status": {"terms": {"field": "l_linestatus"}}}}},
    ).collect()
    want = duck.execute("""
        SELECT l_returnflag, l_linestatus, count(*) FROM lineitem
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    got = [(r["key"], r["status"], r["doc_count"]) for r in out]
    rows_match(got, want)


def test_terms_with_error_bounds(spark):
    from elasticsearch_spark.aggs.translate import terms_with_error

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    shard = F.col("l_orderkey") % 4
    truth = {
        r["l_suppkey"]: r["n"]
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    # truncated shards: merged count understates by at most the bound
    got = terms_with_error(li, "l_suppkey", shard, size=10, shard_size=5).collect()
    # 4 shards x 5 kept terms can merge to fewer than `size` distinct terms
    assert 1 <= len(got) <= 10
    for r in got:
        t = truth[r["l_suppkey"]]
        assert r["doc_count"] <= t
        assert t <= r["doc_count"] + r["doc_count_error_upper_bound"]
    # shard_size >= per-shard cardinality: exact counts, zero error
    exact = terms_with_error(
        li, "l_suppkey", shard, size=10, shard_size=10**6
    ).collect()
    top_truth = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["l_suppkey"], r["doc_count"]) for r in exact] == top_truth
    assert all(r["doc_count_error_upper_bound"] == 0 for r in exact)


def test_date_histogram_time_zone_and_offset(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # +05:30 daily buckets land on 18:30 UTC boundaries
    tz = aggregate(ev, {"h": {"date_histogram": {
        "field": "ts", "calendar_interval": "day",
        "time_zone": "+05:30"}}}).collect()
    assert all(r["key"].hour == 18 and r["key"].minute == 30 for r in tz)
    assert sum(r["doc_count"] for r in tz) == ev.count()
    # +6h offset on 12h fixed intervals -> 06:00 / 18:00 boundaries
    off = aggregate(ev, {"h": {"date_histogram": {
        "field": "ts", "fixed_interval": "12h", "offset": "+6h"}}}).collect()
    assert all(r["key"].hour in (6, 18) for r in off)
    # fixed interval + whole-hour tz: day buckets align to local midnight
    ftz = aggregate(ev, {"h": {"date_histogram": {
        "field": "ts", "fixed_interval": "1d",
        "time_zone": "+02:00"}}}).collect()
    assert all(r["key"].hour == 22 for r in ftz)


def test_histogram_min_doc_count_zero_and_hard_bounds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dense = aggregate(docs, {"h": {"histogram": {
        "field": "n_chars", "interval": 100.0, "min_doc_count": 0,
        "extended_bounds": {"min": 0, "max": 3000}}}}).collect()
    keys = [r["key"] for r in dense]
    # every 100-wide bucket from 0 to >=3000 present, zero-filled
    assert keys == sorted(keys)
    assert keys[0] == 0.0 and keys[-1] >= 3000.0
    assert keys == [keys[0] + 100.0 * i for i in range(len(keys))]
    assert any(r["doc_count"] == 0 for r in dense)
    total = aggregate(docs, {"h": {"histogram": {
        "field": "n_chars", "interval": 100.0}}}).collect()
    assert sum(r["doc_count"] for r in dense) == sum(
        r["doc_count"] for r in total)
    # hard_bounds clips buckets outside the window
    hb = aggregate(docs, {"h": {"histogram": {
        "field": "n_chars", "interval": 100.0,
        "hard_bounds": {"min": 200, "max": 500}}}}).collect()
    assert all(200.0 <= r["key"] <= 500.0 for r in hb)


def test_metric_missing_param(spark):
    """ValuesSourceAggregationBuilder.missing on metric aggs: NULLs
    participate with the substitute value."""
    from elasticsearch_spark.aggs.translate import aggregate

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, "b", 30.0)],
        "doc_id long, g string, v double")
    out = aggregate(df, {"t": {"terms": {"field": "g"},
                               "aggs": {"m": {"avg": {
                                   "field": "v", "missing": 0.0}}}}})
    rows = {r["key"]: (r["doc_count"], r["m"]) for r in out.collect()}
    assert rows == {"a": (2, 5.0), "b": (1, 30.0)}
    # without missing: NULL skipped (avg over 1 value)
    out = aggregate(df, {"t": {"terms": {"field": "g"},
                               "aggs": {"m": {"avg": {"field": "v"}}}}})
    rows = {r["key"]: r["m"] for r in out.collect()}
    assert rows == {"a": 10.0, "b": 30.0}


def test_terms_order_by_agg_path(spark):
    """terms order by a multi-value metric path 'm.avg'
    (bucket/terms OrderPath)."""
    from elasticsearch_spark.aggs.translate import aggregate

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("c", 5.0)],
        "g string, v double")
    out = aggregate(df, {"t": {"terms": {
        "field": "g", "order": {"m.avg": "desc"}},
        "aggs": {"m": {"stats": {"field": "v"}}}}}).collect()
    assert [r["key"] for r in out] == ["b", "c", "a"]


def test_script_value_sources(tables, duck):
    """Script value sources (ValuesSourceAggregationBuilder.script):
    painless compiles to the agg's input expression — terms key,
    histogram key, and metric inputs."""
    out = aggregate(
        tables["lineitem"],
        {"by_band": {
            "terms": {"script": {
                "source": ("doc['l_quantity'].value >= params.hi"
                           " ? 'high' : 'low'"),
                "params": {"hi": 25}}, "order": {"_key": "asc"}},
            "aggs": {
                "rev": {"sum": {"script":
                        "doc['l_extendedprice'].value"
                        " * (1 - doc['l_discount'].value)"}},
            },
        }},
    ).collect()
    want = duck.execute("""
        SELECT CASE WHEN l_quantity >= 25 THEN 'high' ELSE 'low' END AS k,
               count(*), sum(l_extendedprice * (1 - l_discount))
        FROM lineitem GROUP BY 1 ORDER BY k
    """).fetchall()
    rows_match([(r["key"], r["doc_count"], r["rev"]) for r in out], want,
               float_tol=1e-9)

    out = aggregate(
        tables["lineitem"],
        {"h": {"histogram": {
            "script": "doc['l_quantity'].value * 2", "interval": 20.0}}},
    ).collect()
    want = duck.execute("""
        SELECT floor(l_quantity * 2 / 20) * 20 AS k, count(*)
        FROM lineitem GROUP BY 1 ORDER BY k
    """).fetchall()
    rows_match([(r["key"], r["doc_count"]) for r in out], want)
