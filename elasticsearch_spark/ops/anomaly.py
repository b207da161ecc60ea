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


def _mad_score():
    """score column over (adev, mad): adev / (1.4826 * mad), with the
    degenerate constant-series case (mad = 0) mapped to 0 when the
    bucket sits ON the constant and +inf when it deviates at all —
    identical CASE on both engines, no ANSI divide-by-zero."""
    return (
        F.when(F.col("mad") > 0,
               F.col("adev") / (F.lit(MAD_SIGMA) * F.col("mad")))
        .when(F.col("adev") == 0, F.lit(0.0))
        .otherwise(F.lit(float("inf"))))


def _mad_score_sql(threshold: float) -> str:
    expr = (f"CASE WHEN mad > 0 THEN adev / ({MAD_SIGMA} * mad) "
            "WHEN adev = 0 THEN 0.0 "
            "ELSE CAST('infinity' AS DOUBLE) END")
    return (f"{expr} AS score,\n       {expr} > {threshold} AS is_anomaly")


_METRIC_FNS = {"sum": F.sum, "mean": F.avg, "avg": F.avg,
               "min": F.min, "max": F.max}


def single_metric_buckets(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value",
    span: str = "hour", func: str = "sum",
) -> DataFrame:
    """``func``: the detector function family sum/mean/min/max
    (DetectorFunction.java SUM/MEAN/MIN/MAX and their low_/high_
    variants via the ``side`` gate on the scorer)."""
    agg = _METRIC_FNS[func]
    return (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"))
            .agg(agg(value_col).alias("metric")))


def single_metric_anomalies(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value",
    span: str = "hour", threshold: float = 3.0, func: str = "sum",
) -> DataFrame:
    """Per-bucket anomaly scores; `is_anomaly` = score > threshold."""
    b = single_metric_buckets(df, ts_col, value_col, span, func)
    stats = b.agg(F.percentile("metric", F.lit(0.5)).alias("med"))
    dev = (b.crossJoin(F.broadcast(stats))
           .select("bucket", "metric", "med",
                   F.abs(F.col("metric") - F.col("med")).alias("adev")))
    mad = dev.agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    out = dev.crossJoin(F.broadcast(mad))
    score = _mad_score()
    return out.select(
        "bucket", "metric",
        score.alias("score"),
        (score > threshold).alias("is_anomaly"))


def single_metric_anomalies_sql(
    table: str = "events", ts_col: str = "ts", value_col: str = "value",
    span: str = "hour", threshold: float = 3.0, func: str = "sum",
) -> str:
    """DuckDB twin: identical bucket/median/MAD/score pipeline
    (DuckDB's median interpolates like Spark's exact percentile)."""
    fn = {"sum": "sum", "mean": "avg", "avg": "avg",
          "min": "min", "max": "max"}[func]
    return f"""
WITH b AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         {fn}({value_col}) AS metric
  FROM {table} GROUP BY 1),
s AS (SELECT median(metric) AS med FROM b),
d AS (SELECT bucket, metric, abs(metric - med) AS adev FROM b, s),
m AS (SELECT median(adev) AS mad FROM d)
SELECT bucket, metric,
       {_mad_score_sql(threshold)}
FROM d, m
"""


def multi_metric_anomalies(
    df: DataFrame, entity_col: str, ts_col: str = "ts",
    value_col: str = "value", span: str = "hour",
    threshold: float = 3.0,
) -> DataFrame:
    """Multi-metric job: the single-metric pipeline PARTITIONED by an
    entity field (x-pack/plugin/ml job config partition_field_name) —
    every entity gets its own per-bucket series, median baseline and
    MAD scale.

    Scale shape: one shuffle to (entity, bucket) partials, one
    per-entity stats aggregation (rows = entities x buckets, already
    reduced), and joins ON THE ENTITY KEY — no broadcast of
    per-entity stats needed, AQE picks the strategy by size.
    """
    b = (df.groupBy(F.col(entity_col).alias("entity"),
                    F.date_trunc(span, F.col(ts_col)).alias("bucket"))
         .agg(F.sum(value_col).alias("metric")))
    med = b.groupBy("entity").agg(
        F.percentile("metric", F.lit(0.5)).alias("med"))
    dev = (b.join(med, "entity")
           .select("entity", "bucket", "metric",
                   F.abs(F.col("metric") - F.col("med")).alias("adev")))
    mad = dev.groupBy("entity").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad"))
    out = dev.join(mad, "entity")
    score = _mad_score()
    return out.select(
        "entity", "bucket", "metric",
        score.alias("score"),
        (score > threshold).alias("is_anomaly"))


def multi_metric_anomalies_sql(
    table: str = "events", entity_col: str = "event_type",
    ts_col: str = "ts", value_col: str = "value", span: str = "hour",
    threshold: float = 3.0,
) -> str:
    """DuckDB twin of :func:`multi_metric_anomalies`."""
    return f"""
WITH b AS (
  SELECT {entity_col} AS entity,
         date_trunc('{span}', {ts_col}) AS bucket,
         sum({value_col}) AS metric
  FROM {table} GROUP BY 1, 2),
s AS (SELECT entity, median(metric) AS med FROM b GROUP BY 1),
d AS (SELECT b.entity, bucket, metric, abs(metric - med) AS adev
      FROM b JOIN s ON s.entity = b.entity),
m AS (SELECT entity, median(adev) AS mad FROM d GROUP BY 1)
SELECT d.entity, bucket, metric,
       {_mad_score_sql(threshold)}
FROM d JOIN m ON m.entity = d.entity
"""


def population_anomalies(
    df: DataFrame, entity_col: str, ts_col: str = "ts",
    value_col: str = "value", span: str = "hour",
    threshold: float = 3.0,
) -> DataFrame:
    """Population analysis (job config over_field_name): each entity's
    per-bucket metric scored against the POPULATION of entities in the
    SAME bucket — median and MAD are per-bucket cross-entity
    statistics, so an entity is anomalous when it deviates from what
    everyone else did in that bucket, not from its own history.

    Scale shape: one shuffle to (bucket, entity) partials; per-bucket
    population stats aggregate over the already-reduced table; joins
    on the bucket key.
    """
    b = (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"),
                    F.col(entity_col).alias("entity"))
         .agg(F.sum(value_col).alias("metric")))
    med = b.groupBy("bucket").agg(
        F.percentile("metric", F.lit(0.5)).alias("med"))
    dev = (b.join(med, "bucket")
           .select("bucket", "entity", "metric",
                   F.abs(F.col("metric") - F.col("med")).alias("adev")))
    mad = dev.groupBy("bucket").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad"))
    out = dev.join(mad, "bucket")
    score = _mad_score()
    return out.select(
        "bucket", "entity", "metric",
        score.alias("score"),
        (score > threshold).alias("is_anomaly"))


def population_anomalies_sql(
    table: str = "events", entity_col: str = "user_id",
    ts_col: str = "ts", value_col: str = "value", span: str = "day",
    threshold: float = 3.0,
) -> str:
    """DuckDB twin of :func:`population_anomalies`."""
    return f"""
WITH b AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         {entity_col} AS entity,
         sum({value_col}) AS metric
  FROM {table} GROUP BY 1, 2),
s AS (SELECT bucket, median(metric) AS med FROM b GROUP BY 1),
d AS (SELECT b.bucket, entity, metric, abs(metric - med) AS adev
      FROM b JOIN s ON s.bucket = b.bucket),
m AS (SELECT bucket, median(adev) AS mad FROM d GROUP BY 1)
SELECT d.bucket, entity, metric,
       {_mad_score_sql(threshold)}
FROM d JOIN m ON m.bucket = d.bucket
"""


def _sided_score(side: str, threshold: float):
    """Score/flag columns with one-sided gating (the reference's
    low_*/high_* detector-function variants,
    x-pack/plugin/ml/.../job/config/DetectorFunction.java): deviations
    on the unwatched side score 0. MAD itself stays two-sided — the
    robust scale uses every bucket, like the model's variance does."""
    base = _mad_score()
    if side == "low":
        score = F.when(F.col("metric") < F.col("med"), base).otherwise(
            F.lit(0.0))
    elif side == "high":
        score = F.when(F.col("metric") > F.col("med"), base).otherwise(
            F.lit(0.0))
    else:
        score = base
    return score.alias("score"), (score > threshold).alias("is_anomaly")


def _sided_score_sql(side: str, threshold: float) -> str:
    expr = (f"CASE WHEN mad > 0 THEN adev / ({MAD_SIGMA} * mad) "
            "WHEN adev = 0 THEN 0.0 "
            "ELSE CAST('infinity' AS DOUBLE) END")
    if side == "low":
        expr = f"CASE WHEN metric < med THEN {expr} ELSE 0.0 END"
    elif side == "high":
        expr = f"CASE WHEN metric > med THEN {expr} ELSE 0.0 END"
    return (f"{expr} AS score,\n       {expr} > {threshold} AS is_anomaly")


def _bucket_mad_frame(b: DataFrame) -> DataFrame:
    """(bucket, metric) -> + (med, adev, mad) via two broadcast-sized
    percentile passes — shared by every event-rate detector."""
    stats = b.agg(F.percentile("metric", F.lit(0.5)).alias("med"))
    dev = (b.crossJoin(F.broadcast(stats))
           .select("bucket", "metric", "med",
                   F.abs(F.col("metric") - F.col("med")).alias("adev")))
    mad = dev.agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return dev.crossJoin(F.broadcast(mad))


def count_anomalies(
    df: DataFrame, ts_col: str = "ts", span: str = "hour",
    threshold: float = 3.0, side: str = "both",
) -> DataFrame:
    """``count`` / ``low_count`` / ``high_count`` detector functions:
    the modelled metric is the per-bucket EVENT COUNT, not a field
    value (reference x-pack/plugin/ml/.../job/config/
    DetectorFunction.java COUNT/LOW_COUNT/HIGH_COUNT). One counting
    aggregation (map-side partial sums) + the shared median/MAD score;
    ``side`` gates which deviations alert."""
    b = (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"))
         .agg(F.count("*").cast("double").alias("metric")))
    score, flag = _sided_score(side, threshold)
    return _bucket_mad_frame(b).select(
        "bucket", F.col("metric").cast("long").alias("n"), score, flag)


def count_anomalies_sql(
    table: str = "events", ts_col: str = "ts", span: str = "hour",
    threshold: float = 3.0, side: str = "both",
) -> str:
    return f"""
WITH b AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         count(*)::DOUBLE AS metric
  FROM {table} GROUP BY 1),
s AS (SELECT median(metric) AS med FROM b),
d AS (SELECT bucket, metric, med, abs(metric - med) AS adev FROM b, s),
m AS (SELECT median(adev) AS mad FROM d)
SELECT bucket, metric::BIGINT AS n,
       {_sided_score_sql(side, threshold)}
FROM d, m
"""


def distinct_count_anomalies(
    df: DataFrame, field: str, ts_col: str = "ts", span: str = "hour",
    threshold: float = 3.0, side: str = "both",
) -> DataFrame:
    """``distinct_count`` / ``low_``/``high_distinct_count``: the
    per-bucket metric is count(DISTINCT field). Exact distinct — the
    partial agg dedups (bucket, field) pairs before the exchange, so
    the shuffle carries at most one row per distinct pair, the same
    cost shape as the reference's per-bucket cardinality model."""
    b = (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"))
         .agg(F.countDistinct(field).cast("double").alias("metric")))
    score, flag = _sided_score(side, threshold)
    return _bucket_mad_frame(b).select(
        "bucket", F.col("metric").cast("long").alias("n_distinct"),
        score, flag)


def distinct_count_anomalies_sql(
    table: str, field: str, ts_col: str = "ts", span: str = "hour",
    threshold: float = 3.0, side: str = "both",
) -> str:
    return f"""
WITH b AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         count(DISTINCT {field})::DOUBLE AS metric
  FROM {table} GROUP BY 1),
s AS (SELECT median(metric) AS med FROM b),
d AS (SELECT bucket, metric, med, abs(metric - med) AS adev FROM b, s),
m AS (SELECT median(adev) AS mad FROM d)
SELECT bucket, metric::BIGINT AS n_distinct,
       {_sided_score_sql(side, threshold)}
FROM d, m
"""


def time_of_day_anomalies(
    df: DataFrame, ts_col: str = "ts", threshold: float = 3.0,
) -> DataFrame:
    """``time_of_day`` detector function (DetectorFunction.TIME_OF_DAY):
    the reference models WHEN events happen within the daily cycle and
    flags events at unusual times. The deterministic analogue scores
    each hour-of-day by information content -ln(p_hour); hours above
    ``threshold`` nats are anomalous. One 24-row aggregation — the
    per-event join back (if needed) is a broadcast by construction."""
    hist = (df.groupBy(F.hour(F.col(ts_col)).alias("hour_of_day"))
            .agg(F.count("*").alias("n")))
    total = hist.agg(F.sum("n").alias("_total"))
    out = hist.crossJoin(F.broadcast(total))
    score = -F.log(F.col("n") / F.col("_total"))
    return out.select(
        "hour_of_day", "n",
        score.alias("score"),
        (score > threshold).alias("is_anomaly"))


def time_of_day_anomalies_sql(
    table: str = "events", ts_col: str = "ts", threshold: float = 3.0,
) -> str:
    return f"""
WITH h AS (
  SELECT extract(hour FROM {ts_col}) AS hour_of_day, count(*) AS n
  FROM {table} GROUP BY 1),
t AS (SELECT sum(n) AS total FROM h)
SELECT hour_of_day, n::BIGINT AS n,
       -ln(n * 1.0 / total) AS score,
       -ln(n * 1.0 / total) > {threshold} AS is_anomaly
FROM h, t
"""


def rare_anomalies(
    df: DataFrame, category_col: str, by_col: str | None = None,
    max_count: int = 3,
) -> DataFrame:
    """``rare`` function (x-pack/plugin/ml detector function "rare" /
    "freq_rare" with ``by_field``/``partition_field``): flag category
    values seen at most ``max_count`` times — rarity IS the anomaly,
    no amplitude model. Score = 1/count (rarer = higher), exactly
    orderable and SQL-twinnable.

    One hash aggregation on (partition?, category); at 100 TB the
    partial agg reduces each input split to its distinct categories
    before the exchange.
    """
    keys = ([F.col(by_col)] if by_col else []) + [F.col(category_col)]
    out = df.groupBy(*keys).agg(F.count("*").alias("count"))
    return (out.where(F.col("count") <= max_count)
            .withColumn("score", F.lit(1.0) / F.col("count")))


def rare_anomalies_sql(
    table: str, category_col: str, by_col: str | None = None,
    max_count: int = 3,
) -> str:
    """DuckDB twin of :func:`rare_anomalies`."""
    keys = ([by_col] if by_col else []) + [category_col]
    sel = ", ".join(keys)
    return f"""
SELECT {sel}, count(*)::BIGINT AS count, 1.0 / count(*) AS score
FROM {table} GROUP BY {sel} HAVING count(*) <= {max_count}
"""


# ---------------------------------------------------------------------
# Forecasting (x-pack/plugin/ml/.../action/TransportForecastJobAction)
# ---------------------------------------------------------------------
# The reference forecasts a job's modelled series forward `duration`
# from the model state. The Spark shape: bucket the series (one
# shuffle), fold the ENTIRE Holt double-exponential fit — level, trend,
# and one-step-ahead residual sum-of-squares — in ONE F.aggregate over
# the time-sorted bucket array (pure codegen, no driver loop, no UDF),
# then explode `horizon` forecast rows with Gaussian bounds
# level + h*trend ± z * rmse * sqrt(h). The smoothing recursion matches
# aggs/movefn.py _holt (MovingFunctions.holt), seeded s1=v1, b1=0.

_SPAN_INTERVAL = {"hour": "make_interval(0,0,0,0,CAST(h AS INT),0,0)",
                  "day": "make_interval(0,0,0,CAST(h AS INT),0,0,0)"}


def forecast_job(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value",
    span: str = "day", horizon: int = 7,
    alpha: float = 0.3, beta: float = 0.1, z: float = 1.96,
) -> DataFrame:
    b = single_metric_buckets(df, ts_col, value_col, span)
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("bucket"), F.col("metric").cast("double").alias("v"))))
    one = b.agg(arr.alias("series"))

    acc0 = F.struct(
        F.lit(None).cast("double").alias("s"),
        F.lit(None).cast("double").alias("b"),
        F.lit(0.0).alias("ss"),     # sum of squared 1-step residuals
        F.lit(0).cast("long").alias("n"),
    )

    def step(a, x):
        v = x["v"]
        first = a["s"].isNull()
        pred = a["s"] + a["b"]
        s = F.when(first, v).otherwise(
            F.lit(alpha) * v + F.lit(1 - alpha) * pred)
        tr = F.when(first, F.lit(0.0)).otherwise(
            F.lit(beta) * (s - a["s"]) + F.lit(1 - beta) * a["b"])
        ss = F.when(first, a["ss"]).otherwise(
            a["ss"] + (v - pred) * (v - pred))
        n = a["n"] + F.when(first, F.lit(0)).otherwise(F.lit(1))
        return F.struct(s.alias("s"), tr.alias("b"),
                        ss.alias("ss"), n.alias("n"))

    fit = one.select(
        F.element_at("series", -1)["bucket"].alias("last_bucket"),
        F.aggregate("series", acc0, step).alias("f"),
    ).select(
        "last_bucket", F.col("f.s").alias("s"), F.col("f.b").alias("b"),
        F.when(F.col("f.n") > 0,
               F.sqrt(F.col("f.ss") / F.col("f.n"))
               ).otherwise(F.lit(0.0)).alias("rmse"),
    )
    if span not in _SPAN_INTERVAL:
        raise ValueError(f"forecast span {span!r}: use hour or day")
    h = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h")
    out = fit.select("last_bucket", "s", "b", "rmse", h)
    yhat = F.col("s") + F.col("h") * F.col("b")
    band = F.lit(z) * F.col("rmse") * F.sqrt(F.col("h").cast("double"))
    return out.select(
        F.expr(f"last_bucket + {_SPAN_INTERVAL[span]}").alias("bucket"),
        yhat.alias("forecast"),
        (yhat - band).alias("lower"),
        (yhat + band).alias("upper"),
    )


def forecast_job_sql(
    table: str = "events", ts_col: str = "ts", value_col: str = "value",
    span: str = "day", horizon: int = 7,
    alpha: float = 0.3, beta: float = 0.1, z: float = 1.96,
) -> str:
    """DuckDB twin: the same Holt recursion as a recursive CTE (one row
    per bucket ordinal), the same seeded s1=v1 / b1=0, the same rmse
    over 1-step residuals, projected `horizon` steps."""
    iv = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[span]
    return f"""
WITH RECURSIVE bkt AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         sum({value_col})::DOUBLE AS v
  FROM {table} GROUP BY 1),
ord AS (SELECT bucket, v,
               row_number() OVER (ORDER BY bucket) AS rn FROM bkt),
fit AS (
  SELECT rn, v, v AS s, 0.0::DOUBLE AS b, 0.0::DOUBLE AS ss
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.v,
         {alpha} * o.v + {1 - alpha} * (f.s + f.b),
         {beta} * ({alpha} * o.v + {1 - alpha} * (f.s + f.b) - f.s)
           + {1 - beta} * f.b,
         f.ss + (o.v - (f.s + f.b)) * (o.v - (f.s + f.b))
  FROM fit f JOIN ord o ON o.rn = f.rn + 1),
last_fit AS (
  SELECT f.s, f.b, f.ss, f.rn, o.bucket AS last_bucket,
         CASE WHEN f.rn > 1 THEN sqrt(f.ss / (f.rn - 1))
              ELSE 0.0 END AS rmse
  FROM fit f JOIN ord o ON o.rn = f.rn
  ORDER BY f.rn DESC LIMIT 1),
steps AS (SELECT unnest(range(1, {int(horizon)} + 1)) AS h)
SELECT last_bucket + h * {iv} AS bucket,
       s + h * b AS forecast,
       s + h * b - {z} * rmse * sqrt(h) AS lower,
       s + h * b + {z} * rmse * sqrt(h) AS upper
FROM last_fit, steps
"""


def influencers(
    df: DataFrame, influencer_col: str, ts_col: str = "ts",
    value_col: str = "value", span: str = "hour",
    threshold: float = 3.0, func: str = "sum",
) -> DataFrame:
    """ml.get_influencers analogue (x-pack/plugin/ml Influencer
    results; job config ``influencers``): for every ANOMALOUS bucket,
    score each influencer field value by how much of the bucket's
    deviation it carries — influence_raw = the drop in |metric - med|
    when that value's contribution is removed, normalized on the same
    MAD sigma scale as the bucket score. Additive detector functions
    only (sum/count), where "removing a contribution" is exact
    subtraction; the reference's non-additive influencer model is out
    of scope (documented).

    Scale shape: the (bucket, influencer) partial aggregation is the
    only big shuffle; bucket stats stay broadcast-sized exactly as in
    :func:`single_metric_anomalies`.
    """
    if func not in ("sum", "count"):
        raise ValueError(
            "influencers: additive detector functions only (sum/count)")
    agg = (F.sum(value_col) if func == "sum"
           else F.count(F.lit(1)).cast("double"))
    b = (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"))
         .agg(agg.alias("metric")))
    stats = b.agg(F.percentile("metric", F.lit(0.5)).alias("med"))
    dev = (b.crossJoin(F.broadcast(stats))
           .select("bucket", "metric", "med",
                   F.abs(F.col("metric") - F.col("med")).alias("adev")))
    mad = dev.agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    buckets = dev.crossJoin(F.broadcast(mad))
    score = _mad_score()
    anomalous = (buckets.select("bucket", "metric", "med", "mad", "adev",
                                score.alias("bucket_score"))
                 .where(F.col("bucket_score") > threshold))
    part = (df.groupBy(F.date_trunc(span, F.col(ts_col)).alias("bucket"),
                       F.col(influencer_col).alias("influencer"))
            .agg(agg.alias("part")))
    j = part.join(anomalous, "bucket")
    influence_raw = F.greatest(
        F.col("adev")
        - F.abs(F.col("metric") - F.col("part") - F.col("med")),
        F.lit(0.0))
    j = j.withColumn("influence_raw", influence_raw)
    iscore = (
        F.when(F.col("mad") > 0,
               F.col("influence_raw") / (F.lit(MAD_SIGMA) * F.col("mad")))
        .when(F.col("influence_raw") == 0, F.lit(0.0))
        .otherwise(F.lit(float("inf"))))
    return (j.select("bucket", "influencer", "bucket_score",
                     iscore.alias("influencer_score"))
            .where(F.col("influencer_score") > 0))


def influencers_sql(
    table: str = "events", influencer_col: str = "event_type",
    ts_col: str = "ts", value_col: str = "value", span: str = "hour",
    threshold: float = 3.0, func: str = "sum",
) -> str:
    """DuckDB twin of :func:`influencers` (same pipeline + algebra)."""
    agg = (f"sum({value_col})" if func == "sum"
           else "CAST(count(*) AS DOUBLE)")
    bscore = ("CASE WHEN mad > 0 THEN adev / (1.4826 * mad) "
              "WHEN adev = 0 THEN 0.0 "
              "ELSE CAST('infinity' AS DOUBLE) END")
    return f"""
WITH b AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket, {agg} AS metric
  FROM {table} GROUP BY 1),
s AS (SELECT median(metric) AS med FROM b),
d AS (SELECT bucket, metric, med, abs(metric - med) AS adev FROM b, s),
m AS (SELECT median(adev) AS mad FROM d),
a AS (SELECT bucket, metric, med, mad, adev, {bscore} AS bucket_score
      FROM d, m
      WHERE {bscore} > {threshold}),
p AS (
  SELECT date_trunc('{span}', {ts_col}) AS bucket,
         {influencer_col} AS influencer, {agg} AS part
  FROM {table} GROUP BY 1, 2),
r AS (
  SELECT p.bucket, p.influencer, a.bucket_score, a.mad,
         greatest(a.adev - abs(a.metric - p.part - a.med), 0.0)
           AS influence_raw
  FROM p JOIN a ON a.bucket = p.bucket)
SELECT bucket, influencer, bucket_score,
       CASE WHEN mad > 0 THEN influence_raw / (1.4826 * mad)
            WHEN influence_raw = 0 THEN 0.0
            ELSE CAST('infinity' AS DOUBLE) END AS influencer_score
FROM r
WHERE CASE WHEN mad > 0 THEN influence_raw / (1.4826 * mad)
           WHEN influence_raw = 0 THEN 0.0
           ELSE CAST('infinity' AS DOUBLE) END > 0
"""


def overall_buckets(
    scores: DataFrame, job_col: str = "entity", top_n: int = 1,
) -> DataFrame:
    """ml.get_overall_buckets analogue
    (x-pack/plugin/ml/.../OverallBucket.java): per bucket timestamp,
    overall_score = the AVERAGE of the ``top_n`` highest per-job
    anomaly scores in that bucket. ``scores`` is any frame with
    (job_col, bucket, score) — e.g. the multi-metric output, one "job"
    per entity. One window + one aggregation, no shuffle beyond the
    bucket key."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy(
        F.desc("score"), F.asc(job_col))
    return (scores
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= top_n)
            .groupBy("bucket")
            .agg(F.avg("score").alias("overall_score"),
                 F.count("*").alias("jobs_counted")))


def apply_calendar(
    anomalies: DataFrame, events: list[tuple[str, str]],
    bucket_col: str = "bucket",
) -> DataFrame:
    """ml calendars (ml.put_calendar + ScheduledEvent.java): buckets
    inside a scheduled-event window keep their rows but have their
    anomaly flag suppressed (the reference's skip_result rule — the
    model still sees the data, results are not reported as anomalous).

    ``events``: [(start, end)] ISO timestamps, end exclusive. Compiled
    to one OR-chain predicate — pure codegen, pushdown-friendly."""
    if not events:
        return anomalies
    b = F.col(bucket_col)
    in_event = F.lit(False)
    for start, end in events:
        in_event = in_event | (
            (b >= F.to_timestamp(F.lit(start)))
            & (b < F.to_timestamp(F.lit(end))))
    return anomalies.withColumn(
        "is_anomaly", F.col("is_anomaly") & ~in_event)


_RULE_OPS = {"lt": "<", "lte": "<=", "gt": ">", "gte": ">="}
_RULE_FIELDS = {"actual": "metric", "score": "score"}


def apply_detector_rules(
    anomalies: DataFrame, rules: list[dict],
    entity_col: str | None = None,
) -> DataFrame:
    """ml detector custom rules (DetectionRule.java + RuleCondition +
    RuleScope/FilterRef; job config ``custom_rules``): suppress the
    anomaly flag where a rule applies. A rule applies when ALL its
    ``conditions`` hold (applies_to actual|score, operator
    lt/lte/gt/gte) AND its ``scope`` matches (filter_type include:
    entity in filter_values; exclude: entity not in). Only the
    skip_result action is meaningful post-hoc (skip_model_update is a
    model-state action — the MAD baseline here is recomputed per run,
    so it is accepted and a no-op, documented). Rules OR together,
    mirroring the reference."""
    if not rules:
        return anomalies
    any_rule = F.lit(False)
    for rule in rules:
        acts = rule.get("actions", ["skip_result"])
        unknown = set(acts) - {"skip_result", "skip_model_update"}
        if unknown:
            raise ValueError(f"detector rule: unknown actions {unknown}")
        applies = F.lit(True)
        for cond in rule.get("conditions", []):
            field = _RULE_FIELDS.get(cond["applies_to"])
            if field is None:
                raise ValueError(
                    f"detector rule: applies_to {cond['applies_to']!r} "
                    "not supported (actual/score)")
            op = _RULE_OPS[cond["operator"]]
            applies = applies & F.expr(
                f"{field} {op} {float(cond['value'])!r}")
        scope = rule.get("scope")
        if scope:
            if entity_col is None:
                raise ValueError(
                    "detector rule: scope needs entity_col")
            (fld, ref), = scope.items()
            if fld != entity_col:
                raise ValueError(
                    f"detector rule: scope field {fld!r} != entity_col")
            vals = list(ref["filter_values"])
            member = F.col("entity").isin(vals)
            applies = applies & (
                member if ref.get("filter_type", "include") == "include"
                else ~member)
        if "skip_result" in acts:
            any_rule = any_rule | applies
    return anomalies.withColumn(
        "is_anomaly", F.col("is_anomaly") & ~any_rule)
