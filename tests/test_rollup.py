"""Rollup / transform continuous aggregation (x-pack rollup+transform
re-expression): batch == incremental identity, checkpoint crash-window
dedup, avg-partial merge correctness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_rollup_avg_partials_merge(spark):
    from elasticsearch_spark.ops.rollup import rollup

    ev = _events(spark)
    r = rollup(ev, "ts", "1 hour", ["event_type"],
               {"value": ["avg", "sum"]})
    # merging the partials reproduces the global avg exactly
    merged = r.groupBy().agg(
        (F.sum("value_avg_sum") / F.sum("value_avg_count")).alias("avg"))
    want = ev.groupBy().agg(F.avg("value").alias("avg"))
    assert abs(merged.first()["avg"] - want.first()["avg"]) < 1e-9


def test_rollup_incremental_matches_batch(spark, tmp_path):
    from elasticsearch_spark.ops.rollup import (
        read_checkpoint, read_rollup, rollup, rollup_incremental,
    )

    ev = _events(spark).cache()
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    dest = str(tmp_path / "rollup_dest")

    # sync 1: only events up to mid are visible
    ck1 = rollup_incremental(
        spark, ev.where(F.col("ts") <= F.lit(mid)), dest, "ts", "1 hour",
        ["event_type"], {"value": ["sum", "value_count"]})
    assert ck1["syncs"] == 1 and ck1["high_water_ms"] is not None
    n1 = read_rollup(spark, dest).count()
    assert n1 > 0

    # sync 2: the full source arrives; only NEW closed buckets append
    ck2 = rollup_incremental(
        spark, ev, dest, "ts", "1 hour",
        ["event_type"], {"value": ["sum", "value_count"]})
    assert ck2["syncs"] == 2
    got = read_rollup(spark, dest)

    # batch rollup over CLOSED buckets only (the last bucket of the
    # source is open at now=max(ts) and is deliberately not emitted)
    batch = rollup(ev, "ts", "1 hour", ["event_type"],
                   {"value": ["sum", "value_count"]})
    closed = batch.where(
        F.col("bucket_ts") + F.expr("INTERVAL 1 hour") <= F.lit(hi))
    a = {(str(r["bucket_ts"]), r["event_type"]):
         (r["_doc_count"], round(r["value_sum"], 6))
         for r in got.collect()}
    b = {(str(r["bucket_ts"]), r["event_type"]):
         (r["_doc_count"], round(r["value_sum"], 6))
         for r in closed.collect()}
    assert a == b

    # sync 3: no new data -> checkpoint unchanged, no new rows
    ck3 = rollup_incremental(
        spark, ev, dest, "ts", "1 hour",
        ["event_type"], {"value": ["sum", "value_count"]})
    assert ck3["syncs"] == 2
    assert read_rollup(spark, dest).count() == got.count()
    assert read_checkpoint(dest)["syncs"] == 2


def test_rollup_crash_window_dedup(spark, tmp_path):
    """A crash between data append and checkpoint advance re-appends
    the same buckets with a new _sync_id; read_rollup keeps one row."""
    import os

    from elasticsearch_spark.ops.rollup import (
        read_rollup, rollup_incremental,
    )

    ev = _events(spark)
    dest = str(tmp_path / "crash_dest")
    rollup_incremental(spark, ev, dest, "ts", "1 hour", ["event_type"],
                       {"value": ["sum"]})
    n = read_rollup(spark, dest).count()
    # simulate the crash: roll the checkpoint back and sync again
    os.remove(os.path.join(dest, "_rollup_checkpoint.json"))
    rollup_incremental(spark, ev, dest, "ts", "1 hour", ["event_type"],
                       {"value": ["sum"]})
    raw = spark.read.parquet(os.path.join(dest, "data"))
    assert raw.count() == 2 * n           # duplicate appends exist...
    assert read_rollup(spark, dest).count() == n  # ...but reads dedup
