"""Single-metric anomaly detection (x-pack/plugin/ml, narrow analogue).

The reference's anomaly detection jobs bucket a time series by
`bucket_span`, model the bucket metric, and emit per-bucket anomaly
scores. The proprietary model is out of scope; the Spark-first
analogue uses the classic robust statistic the same job shape needs:
score = |metric - median| / (1.4826 * MAD), a deterministic,
SQL-expressible outlier measure (1.4826 scales MAD to sigma under
normality). Everything is two aggregations and one broadcast join —
no per-row Python, no iterative model state:

  1. bucket: groupBy(date_trunc(span)) -> sum(value)   (one shuffle)
  2. med/MAD: two exact-percentile aggregates over the BUCKET table
     (tiny — one row per bucket, broadcast back)
  3. score: projection; anomalies = score > threshold

At 100 TB the raw->bucket aggregation is the only big shuffle; the
bucket table is days x spans rows, so the median/MAD pass and the
join are broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAD_SIGMA = 1.4826


def single_metric_buckets(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value",
    span: str = "hour",
) -> DataFrame:
    return (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"))
            .agg(F.sum(value_col).alias("metric")))


def single_metric_anomalies(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value",
    span: str = "hour", threshold: float = 3.0,
) -> DataFrame:
    """Per-bucket anomaly scores; `is_anomaly` = score > threshold."""
    b = single_metric_buckets(df, ts_col, value_col, span)
    stats = b.agg(F.percentile("metric", F.lit(0.5)).alias("med"))
    dev = (b.crossJoin(F.broadcast(stats))
           .select("bucket", "metric", "med",
                   F.abs(F.col("metric") - F.col("med")).alias("adev")))
    mad = dev.agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    out = dev.crossJoin(F.broadcast(mad))
    score = F.col("adev") / (F.lit(MAD_SIGMA) * F.col("mad"))
    return out.select(
        "bucket", "metric",
        score.alias("score"),
        (score > threshold).alias("is_anomaly"))


def single_metric_anomalies_sql(
    table: str = "events", ts_col: str = "ts", value_col: str = "value",
    span: str = "hour", threshold: float = 3.0,
) -> str:
    """DuckDB twin: identical bucket/median/MAD/score pipeline
    (DuckDB's median interpolates like Spark's exact percentile)."""
    return f"""
WITH b AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         sum({value_col}) AS metric
  FROM {table} GROUP BY 1),
s AS (SELECT median(metric) AS med FROM b),
d AS (SELECT bucket, metric, abs(metric - med) AS adev FROM b, s),
m AS (SELECT median(adev) AS mad FROM d)
SELECT bucket, metric,
       adev / ({MAD_SIGMA} * mad) AS score,
       adev / ({MAD_SIGMA} * mad) > {threshold} AS is_anomaly
FROM d, m
"""
