"""Rollup + transform: continuous summary indexes.

Reference: x-pack/plugin/rollup (RollupJobConfig: a date_histogram
group, optional terms groups, and metric configs min/max/sum/avg/
value_count rolled into a summary index on a schedule) and the
transform plugin (TransformConfig: a pivot of group_by sources +
aggregations continuously synced into a dest index with checkpoints).

Spark-first shape — a rollup/transform is exactly a declarative
aggregation Catalyst already optimizes (partial aggs map-side, one
exchange on the group keys):

  - :func:`rollup` / :func:`transform_pivot` build the summary
    DataFrame for a batch refresh;
  - :func:`rollup_incremental` appends only NEW complete buckets to a
    parquet summary index, tracking the high-water mark in a tiny JSON
    checkpoint (the transform plugin's checkpoint document) — the
    continuous mode, runnable from any scheduler or a foreachBatch
    sink. Late data within an explicit ``delay`` lag is retried on the
    next sync, mirroring the rollup job's query delay.

The summary table layout matches the reference's rollup document
convention: one row per (bucket_ts, group...) with
``<field>_<metric>`` columns plus ``_doc_count`` — so a query over the
rollup is an ordinary aggregation over pre-aggregated partials
(sum-of-sums, min-of-mins; avg carried as sum+count).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

_METRIC_FNS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "value_count": F.count,
}


def _metric_cols(metrics: dict[str, list[str]]) -> list:
    cols = []
    for field, wanted in metrics.items():
        for m in wanted:
            if m == "avg":
                # avg rolls up as (sum, count) partials — averaging the
                # averages would be wrong on merge (RollupField.java
                # stores the same pair)
                cols.append(F.sum(field).alias(f"{field}_avg_sum"))
                cols.append(
                    F.count(field).cast("long").alias(f"{field}_avg_count"))
            elif m in _METRIC_FNS:
                cols.append(_METRIC_FNS[m](field).alias(f"{field}_{m}"))
            else:
                raise ValueError(f"unsupported rollup metric {m!r}")
    return cols


def rollup(
    df: DataFrame,
    date_col: str,
    interval: str = "1 hour",
    group_cols: list[str] = (),
    metrics: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Batch rollup: date_histogram(interval) x terms(group_cols) with
    metric partials. One exchange on the bucket keys."""
    metrics = metrics or {}
    bucket = F.window(F.col(date_col), interval).start.alias("bucket_ts")
    aggs = [F.count("*").cast("long").alias("_doc_count")] + _metric_cols(metrics)
    return (
        df.groupBy(bucket, *[F.col(c) for c in group_cols])
        .agg(*aggs)
    )


def transform_pivot(
    df: DataFrame,
    group_cols: list[str],
    metrics: dict[str, list[str]] | None = None,
) -> DataFrame:
    """transform pivot: entity-centric summary (group_by sources +
    aggregations), the continuous-transform batch body."""
    metrics = metrics or {}
    aggs = [F.count("*").cast("long").alias("_doc_count")] + _metric_cols(metrics)
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def transform_latest(
    df: DataFrame,
    unique_key: list[str],
    sort_col: str,
) -> DataFrame:
    """transform ``latest``: keep the newest document per entity key.

    Reference: x-pack/plugin/transform/src/main/java/org/elasticsearch/
    xpack/transform/transforms/latest/Latest.java (group by unique_key,
    top_hits size=1 sorted desc on ``sort``).

    Spark-first shape: ONE hash aggregation with map-side partials —
    ``max(struct(sort, other...))`` per key — not a window sort: on a
    100 TB source the partial agg reduces each partition to <=1 row
    per key before the single exchange, where a window would shuffle
    every raw row. Ties on ``sort`` break deterministically by the
    remaining columns (struct comparison is lexicographic), which the
    DuckDB oracle mirrors with ORDER BY sort DESC, other DESC...
    """
    others = [c for c in df.columns
              if c not in unique_key and c != sort_col]
    packed = df.groupBy(*[F.col(k) for k in unique_key]).agg(
        F.max(F.struct(F.col(sort_col),
                       *[F.col(c) for c in others])).alias("_latest"))
    order = {c: (f"_latest.{c}") for c in [sort_col, *others]}
    return packed.select(*[
        F.col(order[c]).alias(c) if c in order else F.col(c)
        for c in df.columns
    ])


def _latest_ckpt_path(dest: str) -> str:
    return os.path.join(dest, "_latest_checkpoint.json")


def read_latest_checkpoint(dest: str) -> dict[str, Any]:
    try:
        with open(_latest_ckpt_path(dest)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"high_water": None, "syncs": 0}


def transform_latest_incremental(
    spark: SparkSession,
    source: DataFrame,
    dest: str,
    unique_key: list[str],
    sort_col: str,
) -> dict[str, Any]:
    """One continuous ``latest`` sync (TransformConfig sync.time
    checkpointing): reduce rows with ``sort_col`` above the
    checkpoint's high-water mark to per-key latest partials, append
    them, and advance the checkpoint atomically (write + os.replace).

    Idempotency matches rollup_incremental: a crash between append and
    checkpoint advance duplicates partials, which the read path
    (:func:`read_transform_latest`) resolves by keeping the max
    (sort, _sync_id, other...) struct per key — merging partials is
    exactly the same max, so incremental == batch whenever (key, sort)
    pairs are unique across syncs (duplicate pairs split across syncs
    tie-break toward the later sync; documented divergence).
    """
    ck = read_latest_checkpoint(dest)
    new = source
    if ck["high_water"] is not None:
        new = new.where(
            F.col(sort_col)
            > F.lit(ck["high_water"]).cast(source.schema[sort_col].dataType))
    part = transform_latest(new, unique_key, sort_col)
    sync_id = int(ck["syncs"]) + 1
    rows = part.withColumn("_sync_id", F.lit(sync_id))
    if not rows.head(1):
        return ck
    rows.write.mode("append").parquet(os.path.join(dest, "data"))
    hw = new.select(F.max(F.col(sort_col)).alias("m")).first()["m"]
    new_ck = {
        "high_water": hw.isoformat() if hasattr(hw, "isoformat") else hw,
        "syncs": sync_id,
    }
    tmp = _latest_ckpt_path(dest) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_ck, f)
    os.replace(tmp, _latest_ckpt_path(dest))
    return new_ck


def read_transform_latest(
    spark: SparkSession,
    dest: str,
    unique_key: list[str],
    sort_col: str,
) -> DataFrame:
    """Read the latest-transform dest index, merging per-sync partials
    (and crash-window duplicates) with the same max-struct reduction
    the batch path uses."""
    df = spark.read.parquet(os.path.join(dest, "data"))
    others = [c for c in df.columns
              if c not in unique_key and c not in (sort_col, "_sync_id")]
    packed = df.groupBy(*[F.col(k) for k in unique_key]).agg(
        F.max(F.struct(F.col(sort_col), F.col("_sync_id"),
                       *[F.col(c) for c in others])).alias("_latest"))
    out_cols = [c for c in df.columns if c != "_sync_id"]
    order = {c: f"_latest.{c}" for c in [sort_col, *others]}
    return packed.select(*[
        F.col(order[c]).alias(c) if c in order else F.col(c)
        for c in out_cols
    ])


def _ckpt_path(dest: str) -> str:
    return os.path.join(dest, "_rollup_checkpoint.json")


def read_checkpoint(dest: str) -> dict[str, Any]:
    try:
        with open(_ckpt_path(dest)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"high_water_ms": None, "syncs": 0}


def rollup_incremental(
    spark: SparkSession,
    source: DataFrame,
    dest: str,
    date_col: str,
    interval: str = "1 hour",
    group_cols: list[str] = (),
    metrics: dict[str, list[str]] | None = None,
    delay: str = "0 seconds",
    now: Any = None,
) -> dict[str, Any]:
    """One continuous-rollup sync: aggregate every COMPLETE bucket that
    ended after the checkpoint's high-water mark (minus ``delay`` for
    late data, the rollup job's query delay) and append it to the
    parquet summary index at ``dest``; then advance the checkpoint
    atomically (write + os.replace — same crash-safety pattern as
    compact_index).

    Buckets are only emitted once CLOSED (bucket_end <= now - delay),
    so reruns never rewrite a bucket and the append is idempotent per
    sync; a crash between write and checkpoint advance re-aggregates
    the same closed buckets into a duplicate append, which the
    ``syncs``-stamped ``_sync_id`` column disambiguates (keep max per
    bucket on read — :func:`read_rollup`).

    Returns the updated checkpoint dict.
    """
    ck = read_checkpoint(dest)
    if now is None:
        row = source.select(F.max(F.col(date_col)).alias("m")).first()
        now = row["m"]
    if now is None:
        return ck  # empty source
    lo_ms = ck["high_water_ms"]
    win = F.window(F.col(date_col), interval)
    closed = source.where(
        win.end <= F.lit(now) - F.expr(f"INTERVAL {delay}"))
    if lo_ms is not None:
        closed = closed.where(
            win.start >= F.lit(lo_ms).cast("timestamp"))
    rolled = rollup(closed, date_col, interval, group_cols, metrics)
    if not rolled.head(1):
        return ck
    sync_id = int(ck["syncs"]) + 1
    (
        rolled.withColumn("_sync_id", F.lit(sync_id))
        .write.mode("append").parquet(os.path.join(dest, "data"))
    )
    hw = rolled.select(F.max(
        F.col("bucket_ts") + F.expr(f"INTERVAL {interval}")).alias("m")
    ).first()["m"]
    new_ck = {
        "high_water_ms": hw.isoformat() if hasattr(hw, "isoformat") else str(hw),
        "syncs": sync_id,
    }
    tmp = _ckpt_path(dest) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_ck, f)
    os.replace(tmp, _ckpt_path(dest))
    return new_ck


def read_rollup(spark: SparkSession, dest: str) -> DataFrame:
    """Read the summary index, deduplicating crash-window double
    appends: keep the newest _sync_id per (bucket, groups) row."""
    df = spark.read.parquet(os.path.join(dest, "data"))
    metric_suffixes = ("_min", "_max", "_sum", "_count",
                       "_avg_sum", "_avg_count")
    keys = [c for c in df.columns
            if c not in ("_doc_count", "_sync_id")
            and not c.endswith(metric_suffixes)]
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
        F.desc("_sync_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).drop("_rn", "_sync_id")
    )


def rollup_search(
    summary: DataFrame,
    interval: str | None = None,
    group_cols: list[str] = (),
    metrics: dict[str, list[str]] | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """_rollup_search: answer a live aggregation request FROM the
    summary index by merging partials (reference: x-pack/plugin/rollup
    RollupResponseTranslator.java — sum-of-sums, min-of-mins,
    max-of-maxes, count-of-counts, avg recombined from its sum+count
    pair, never averaged averages; RollupJobIdentifierUtils requires
    the query interval to be >= and a multiple of the job's — here
    ``interval`` is a calendar unit name (e.g. "day") re-truncating the
    stored finer buckets, which satisfies that rule by construction).

    One exchange on the coarser keys over the (already tiny) summary —
    the whole point at 100 TB: the raw corpus is never re-scanned."""
    metrics = metrics or {}
    key = (F.date_trunc(interval, F.col(bucket_col)).alias("bucket")
           if interval else F.col(bucket_col).alias("bucket"))
    aggs = [F.sum("_doc_count").cast("long").alias("_doc_count")]
    for field, wanted in metrics.items():
        for m in wanted:
            if m == "sum":
                aggs.append(F.sum(f"{field}_sum").alias(f"{field}_sum"))
            elif m == "min":
                aggs.append(F.min(f"{field}_min").alias(f"{field}_min"))
            elif m == "max":
                aggs.append(F.max(f"{field}_max").alias(f"{field}_max"))
            elif m == "value_count":
                aggs.append(F.sum(f"{field}_value_count").cast("long")
                            .alias(f"{field}_value_count"))
            elif m == "avg":
                aggs.append(
                    (F.sum(f"{field}_avg_sum")
                     / F.sum(f"{field}_avg_count")).alias(f"{field}_avg"))
            else:
                raise ValueError(f"unsupported rollup-search metric {m!r}")
    return summary.groupBy(key, *[F.col(c) for c in group_cols]).agg(*aggs)


def downsample(
    df: DataFrame,
    timestamp_col: str,
    fixed_interval: str,
    dimensions: list[str] = (),
    metrics: dict[str, list[str]] | None = None,
    histogram_groups: dict[str, float] | None = None,
) -> DataFrame:
    """RollupV2 / downsample action: shrink a time-series index to one
    document per (rounded timestamp, dimensions, histogram buckets).

    Reference: x-pack/plugin/rollup/src/main/java/org/elasticsearch/
    xpack/rollup/v2/RollupShardIndexer.java (fixed-interval Rounding on
    the date-histogram field, terms + numeric-histogram groups,
    _doc_count per bucket) and TransportRollupAction.java:261-279 (each
    metric field keeps its ORIGINAL name, typed aggregate_metric_double
    with the collected sub-metrics) — so queries hit the downsampled
    index transparently under the same field names.

    Spark-first shape: one declarative groupBy — partial aggregation
    runs map-side, a single exchange on the bucket keys, and at 100 TB
    the output is smaller than the input by the bucket ratio before it
    ever shuffles. The reference sorts each shard externally
    (CompressingOfflineSorter) because Lucene can't hash-aggregate;
    Catalyst's hash aggregate IS that pass.
    """
    metrics = metrics or {}
    keys = [
        F.window(F.col(timestamp_col), fixed_interval)
        .start.alias(timestamp_col)
    ]
    keys += [F.col(c) for c in dimensions]
    for hfield, hint in (histogram_groups or {}).items():
        keys.append(
            (F.floor(F.col(hfield) / F.lit(float(hint)))
             * F.lit(float(hint))).alias(hfield))
    aggs = [F.count(F.lit(1)).cast("long").alias("_doc_count")]
    for fld, wanted in metrics.items():
        bad = set(wanted) - {"min", "max", "sum", "value_count", "avg"}
        if bad:
            raise ValueError(f"unsupported downsample metrics {bad}")
        v = F.col(fld)
        from elasticsearch_spark.ops.fields import aggregate_metric_struct

        aggs.append(
            aggregate_metric_struct(
                F.min(v), F.max(v), F.sum(v), F.count(v)).alias(fld))
    return df.groupBy(*keys).agg(*aggs)


def downsample_search(
    summary: DataFrame,
    timestamp_col: str,
    interval: str | None = None,
    group_cols: list[str] = (),
    metrics: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Aggregate OVER a downsampled index: sub-metrics merge as
    min-of-mins / max-of-maxes / sum-of-sums, counts add, avg
    recombines from (sum, value_count) — exactly how the aggregators
    read aggregate_metric_double fields
    (x-pack/plugin/mapper-aggregate-metric/.../AggregateDoubleMetricFieldMapper.java).
    ``interval``: optional coarser calendar unit for date_trunc
    re-bucketing (must be >= the downsample interval, the
    RollupJobIdentifierUtils rule — a finer request can't be answered
    and raises there; here the truncation is simply lossless only when
    coarser, which the caller owns)."""
    metrics = metrics or {}
    key = (F.date_trunc(interval, F.col(timestamp_col))
           if interval else F.col(timestamp_col)).alias(timestamp_col)
    aggs = [F.sum("_doc_count").cast("long").alias("_doc_count")]
    for fld, wanted in metrics.items():
        m = F.col(fld)
        for w in wanted:
            if w == "min":
                aggs.append(F.min(m["min"]).alias(f"{fld}_min"))
            elif w == "max":
                aggs.append(F.max(m["max"]).alias(f"{fld}_max"))
            elif w == "sum":
                aggs.append(F.sum(m["sum"]).alias(f"{fld}_sum"))
            elif w == "value_count":
                aggs.append(F.sum(m["value_count"]).cast("long")
                            .alias(f"{fld}_value_count"))
            elif w == "avg":
                aggs.append((F.sum(m["sum"]) / F.sum(m["value_count"]))
                            .alias(f"{fld}_avg"))
            else:
                raise ValueError(f"unsupported downsample-search metric {w!r}")
    return summary.groupBy(key, *[F.col(c) for c in group_cols]).agg(*aggs)
