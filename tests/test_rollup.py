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


def test_transform_latest_batch(spark):
    """latest == newest event per user (Latest.java: group by key,
    top-1 sorted desc); deterministic struct tie-break."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.rollup import transform_latest

    ev = _events(spark)
    got = transform_latest(ev, ["user_id"], "ts")
    assert got.columns == ev.columns  # same shape, one row per key
    assert got.count() == ev.select("user_id").distinct().count()
    # spot-check one user against an explicit orderBy
    u = ev.select("user_id").first()["user_id"]
    want = (ev.where(F.col("user_id") == u)
            .orderBy(F.desc("ts"), F.desc("event_id")).first())
    have = got.where(F.col("user_id") == u).first()
    assert have["event_id"] == want["event_id"]
    assert have["ts"] == want["ts"]


def test_transform_latest_incremental_matches_batch(spark, tmp_path):
    """Two continuous syncs over a time-split source == one batch run
    (checkpoint high-water on the sort field; partials merge via the
    same max-struct reduction)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.rollup import (
        read_latest_checkpoint, read_transform_latest, transform_latest,
        transform_latest_incremental,
    )

    ev = _events(spark).cache()
    dest = str(tmp_path / "latest_dest")
    cut = ev.select(
        F.percentile_approx("ts", 0.5).alias("m")).first()["m"]

    ck1 = transform_latest_incremental(
        spark, ev.where(F.col("ts") <= F.lit(cut)), dest,
        ["user_id"], "ts")
    assert ck1["syncs"] == 1 and ck1["high_water"] is not None
    ck2 = transform_latest_incremental(spark, ev, dest, ["user_id"], "ts")
    assert ck2["syncs"] == 2

    got = read_transform_latest(spark, dest, ["user_id"], "ts")
    want = transform_latest(ev, ["user_id"], "ts")
    g = sorted(map(tuple, got.select(*want.columns).collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0

    # third sync with no new rows: checkpoint untouched
    ck3 = transform_latest_incremental(spark, ev, dest, ["user_id"], "ts")
    assert ck3["syncs"] == 2
    assert read_latest_checkpoint(dest)["syncs"] == 2


def test_rollup_search_merges_partials(spark):
    """_rollup_search over hourly partials == direct day aggregation:
    sum-of-sums, min-of-mins, max-of-maxes, count-of-counts, avg from
    the (sum, count) pair — never averaged averages."""
    import math

    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.rollup import rollup, rollup_search

    ev = spark.read.parquet(f"{SF}/events.parquet")
    mets = {"value": ["sum", "min", "max", "avg", "value_count"]}
    hourly = rollup(ev, "ts", "1 hour", ["event_type"], mets)
    got = {(str(r["bucket"]), r["event_type"]): r
           for r in rollup_search(hourly, interval="day",
                                  group_cols=["event_type"],
                                  metrics=mets).collect()}
    want = {(str(r["bucket"]), r["event_type"]): r for r in (
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"),
             F.min("value").alias("mn"), F.max("value").alias("mx"),
             F.avg("value").alias("av"),
             F.count("value").alias("vc"))).collect()}
    assert set(got) == set(want) and got
    for k, g in got.items():
        w = want[k]
        assert g["_doc_count"] == w["n"]
        assert g["value_value_count"] == w["vc"]
        assert math.isclose(g["value_sum"], w["s"], rel_tol=1e-12)
        assert g["value_min"] == w["mn"] and g["value_max"] == w["mx"]
        assert math.isclose(g["value_avg"], w["av"], rel_tol=1e-12)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="metric"):
        rollup_search(hourly, metrics={"value": ["percentiles"]})


def test_ilm_step_phases(spark, tmp_path):
    """ILM runner: hot->warm applies shrink in place, warm->cold
    freezes, delete removes — one transition per step."""
    from elasticsearch_spark.index.builder import (
        build_index, index_meta, load_index,
    )
    from elasticsearch_spark.ops.datastream import ilm_state, ilm_step
    from elasticsearch_spark.ops.snapshot import is_frozen

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "ilm_idx")
    build_index(docs.select("doc_id", "text"), idx,
                fields={"text": "ascii_word"}, num_partitions=4,
                input_snapshot="ilm")
    policy = {"warm": {"min_age_days": 0,
                       "shrink": {"number_of_shards": 2}},
              "cold": {"min_age_days": 0, "freeze": True},
              "delete": {"min_age_days": 9999}}
    st = ilm_step(spark, idx, policy)
    assert st["phase"] == "warm"
    assert index_meta(idx)["num_partitions"] == 2
    assert load_index(spark, idx).postings.count() > 0
    st = ilm_step(spark, idx, policy)
    assert st["phase"] == "cold" and is_frozen(idx)
    assert ilm_state(idx)["phase"] == "cold"
    # not old enough to delete
    assert ilm_step(spark, idx, policy)["phase"] == "cold"
    import os as _os
    import time as _time
    st = ilm_step(spark, idx, {"delete": {"min_age_days": 0}},
                  now=_time.time() + 86400)
    assert st["phase"] == "deleted" and not _os.path.exists(idx)


def test_downsample_matches_direct_agg(spark):
    from elasticsearch_spark.ops.rollup import downsample, downsample_search

    ev = _events(spark).withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")).cache()
    mets = {"value_c": ["min", "max", "sum", "value_count", "avg"]}
    ds = downsample(ev, "ts", "1 hour", ["event_type"], mets)
    # metric field keeps its original name as an aggregate-metric struct
    assert dict(ds.dtypes)["value_c"].startswith("struct<min:")
    got = {
        (r["ts"], r["event_type"]): r
        for r in downsample_search(
            ds, "ts", interval="day", group_cols=["event_type"],
            metrics=mets).collect()
    }
    want = (
        ev.groupBy(F.date_trunc("day", "ts").alias("ts"), "event_type")
        .agg(F.count("*").alias("n"), F.min("value_c").alias("mn"),
             F.max("value_c").alias("mx"), F.sum("value_c").alias("sm"),
             F.avg("value_c").alias("av"))
    ).collect()
    assert len(got) == len(want) > 0
    for w in want:
        g = got[(w["ts"], w["event_type"])]
        assert g["_doc_count"] == w["n"]
        assert g["value_c_min"] == w["mn"]
        assert g["value_c_max"] == w["mx"]
        assert g["value_c_sum"] == w["sm"]
        assert g["value_c_value_count"] == w["n"]
        assert abs(g["value_c_avg"] - w["av"]) < 1e-9


def test_downsample_histogram_group(spark):
    from elasticsearch_spark.ops.rollup import downsample

    ev = _events(spark)
    ds = downsample(ev, "ts", "1 day", metrics={},
                    histogram_groups={"user_id": 40.0})
    buckets = {r["user_id"] for r in ds.select("user_id").distinct().collect()}
    assert buckets <= {0.0, 40.0, 80.0, 120.0}
    # _doc_count conserves the corpus
    assert (sum(r["_doc_count"] for r in ds.collect())
            == ev.count())
