"""x-pack mapper-family field types, Spark-first.

  - aggregate_metric_double (x-pack/plugin/mapper-aggregate-metric
    AggregateDoubleMetricFieldMapper): a struct<min,max,sum,
    value_count> column holding PRE-AGGREGATED sub-metrics; metric
    aggregations read the sub-metric instead of raw data (min of mins,
    max of maxs, sum of sums, count = sum of value_counts, avg =
    sum/count). This is the rollup-index fast path: at 100 TB an agg
    over the pre-aggregated table touches one row per (group, day)
    instead of one per event.
  - constant_keyword (x-pack/plugin/mapper-constant-keyword): a field
    whose value is identical for every doc of an index. The reference
    answers term queries on it at REWRITE time (match_all/match_none,
    no doc access — ConstantKeywordFieldMapper query rewrite). The
    Spark analogue is a partition directory column: filtering on it is
    resolved by PartitionFilters at planning, reading zero bytes of
    non-matching partitions.
  - unsigned_long (x-pack/plugin/mapper-unsigned-long): 64-bit
    unsigned values stored in a signed long by bit reinterpretation
    (the mapper shifts by Long.MIN_VALUE); ordering/range semantics
    recover the unsigned view. Spark longs are signed too, so the
    same trick applies: the sort/compare key adds 2^64 to negative
    raw bits (decimal(20,0) — exact, no float rounding).
  - murmur3 (plugins/mapper-murmur3): index-time hash of the value
    for cheap cardinality estimation. Spark's built-in JVM hashes are
    murmur3_32 (`hash`) and xxhash64; the mapper here uses xxhash64
    for 64-bit spread — same role, different constants than the
    reference's x64_128-low-64 (documented divergence; approx_
    count_distinct consumes it identically).
  - _size (plugins/mapper-size): byte length of the serialized source.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

TWO_POW_64 = 18446744073709551616  # 2**64


# ---- aggregate_metric_double -----------------------------------------

def aggregate_metric_struct(
    min_col: Column, max_col: Column, sum_col: Column, count_col: Column
) -> Column:
    return F.struct(
        min_col.alias("min"), max_col.alias("max"),
        sum_col.alias("sum"), count_col.alias("value_count"))


def pre_aggregate(
    df: DataFrame, group_cols: list[str], value_col: str,
    out: str = "metric",
) -> DataFrame:
    """Build the aggregate_metric_double column: one struct row per
    group (what a rollup job writes)."""
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        aggregate_metric_struct(
            F.min(v), F.max(v), F.sum(v), F.count(v)).alias(out))


def aggregate_metric_agg(
    df: DataFrame, group_cols: list[str], metric_col: str = "metric"
) -> DataFrame:
    """min/max/sum/value_count/avg over an aggregate_metric_double
    column — reads sub-metrics only; results are EXACTLY the raw-data
    aggregation (floating-point sum association aside)."""
    m = F.col(metric_col)
    return (df.groupBy(*group_cols)
            .agg(F.min(m["min"]).alias("min_v"),
                 F.max(m["max"]).alias("max_v"),
                 F.sum(m["sum"]).alias("sum_v"),
                 F.sum(m["value_count"]).alias("value_count"))
            .withColumn("avg_v", F.col("sum_v") / F.col("value_count")))


# ---- constant_keyword -------------------------------------------------

def write_constant_keyword(
    docs: DataFrame, out_dir: str, col: str
) -> None:
    """Persist with the constant_keyword field as a partition
    directory: every value becomes one directory, so a term filter on
    the field prunes at planning time (PartitionFilters), the
    reference's match_all/match_none rewrite."""
    docs.write.mode("overwrite").partitionBy(col).parquet(out_dir)


def constant_keyword_term(
    spark, dir_path: str, col: str, value: str
) -> DataFrame:
    df = spark.read.parquet(dir_path)
    return df.where(F.col(col) == value)


# ---- unsigned_long ----------------------------------------------------

def _dec20(v: int) -> Column:
    # ints beyond signed-64 can't ride through py4j's lit(); a string
    # cast keeps the literal exact
    return F.lit(str(v)).cast("decimal(20,0)")


def unsigned_long_key(col) -> Column:
    """Unsigned view of raw signed-64 bits: negatives shift up by 2^64.
    decimal(20,0) holds the full range exactly."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("decimal(20,0)")
    return F.when(c < 0, d + _dec20(TWO_POW_64)).otherwise(d) \
            .cast("decimal(20,0)")


def unsigned_long_key_sql(expr: str) -> str:
    """DuckDB twin (HUGEINT arithmetic)."""
    return (f"CASE WHEN {expr} < 0 THEN {expr}::HUGEINT + {TWO_POW_64} "
            f"ELSE {expr}::HUGEINT END")


def unsigned_range(col, gte: int | None = None, lte: int | None = None) -> Column:
    """Range query with unsigned semantics over raw signed bits."""
    k = unsigned_long_key(col)
    cond = F.lit(True)
    if gte is not None:
        cond = cond & (k >= _dec20(gte))
    if lte is not None:
        cond = cond & (k <= _dec20(lte))
    return cond


# ---- murmur3 / _size --------------------------------------------------

def murmur3_field(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def size_field(docs: DataFrame, out: str = "_size") -> DataFrame:
    """_size: octet length of the JSON-serialized source document."""
    src = F.to_json(F.struct(*[F.col(c) for c in docs.columns]))
    return docs.withColumn(out, F.octet_length(src))


# ---- scaled_float (mapper-extras ScaledFloatFieldMapper) ---------------

def scaled_float_store(col, factor: int) -> Column:
    """Index-time encoding: round(value * scaling_factor) stored as a
    long — aggregations then run on exact integer arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * factor).cast("long")


def scaled_float_read(col, factor: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double") / factor


# ---- histogram field (x-pack analytics HistogramFieldMapper) -----------

def histogram_struct(values: Column, counts: Column) -> Column:
    """The pre-aggregated histogram doc value: parallel (values,
    counts) arrays, values ascending — what a rollup/metrics pipeline
    writes once so percentile/avg queries never rescan raw rows."""
    return F.struct(values.alias("values"), counts.alias("counts"))


def histogram_agg(
    df, group_cols: list[str], hist_col: str = "hist",
    percentile: float = 0.5,
) -> DataFrame:
    """min/max/sum/value_count/avg + a weighted percentile over
    histogram doc values. Pairs are exploded once, partial-aggregated
    map-side; the percentile uses the exact lower-bound rule (smallest
    value whose cumulative count reaches p * total) — deterministic
    where the reference's TDigest is approximate (documented
    divergence; identical on both engines here).
    Reference: x-pack/plugin/analytics/.../aggregations/metrics/
    (HistoBackedSumAggregator etc.)."""
    from pyspark.sql import Window

    h = F.col(hist_col)
    ex = df.select(
        *group_cols,
        F.explode(F.arrays_zip(h["values"], h["counts"])).alias("e"),
    ).select(
        *group_cols,
        F.col("e.values").alias("v"), F.col("e.counts").alias("c"),
    ).where(F.col("c") > 0)
    base = ex.groupBy(*group_cols).agg(
        F.min("v").alias("min_v"), F.max("v").alias("max_v"),
        F.sum(F.col("v") * F.col("c")).alias("sum_v"),
        F.sum("c").alias("value_count"))
    base = base.withColumn("avg_v", F.col("sum_v") / F.col("value_count"))
    # lower-bound weighted percentile: per-group merge of (v, c) pairs
    merged = ex.groupBy(*group_cols, "v").agg(F.sum("c").alias("c"))
    w = Window.partitionBy(*group_cols).orderBy("v")
    cum = merged.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(Window.partitionBy(*group_cols)))
    pct = (cum.where(F.col("cum") >= F.lit(percentile) * F.col("total"))
           .groupBy(*group_cols).agg(F.min("v").alias("pct_v")))
    return base.join(pct, group_cols)


# ---- token_count (modules/mapper-extras TokenCountFieldMapper) -------


def token_count_field(
    col: Column | str,
    analyzer: str = "standard",
    enable_position_increments: bool = True,
    null_value: int | None = None,
) -> Column:
    """Index-time token count of an analyzed text field.

    Reference: TokenCountFieldMapper.countPositions (mapper-extras,
    TokenCountFieldMapper.java:141): the analyzer chain runs over the
    value and position increments are summed, so stop-removed tokens
    still count when ``enable_position_increments`` (gaps in the
    position stream are counted via last-position+1; TRAILING removed
    stopwords are not visible in the position list — documented
    divergence, ES adds end-of-stream increments). With increments
    disabled the count is the emitted-token count.

    Vectorized: one Arrow batch per call, the same analyzer registry
    the index builder uses — Zipf memoization in the code analyzers
    applies here too.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        from elasticsearch_spark.analysis import analyze

        out = []
        for v in s:
            if v is None:
                out.append(null_value)
                continue
            toks = analyze(v, analyzer)
            if not toks:
                out.append(0)
            elif enable_position_increments:
                out.append(toks[-1][1] + 1)
            else:
                out.append(len(toks))
        return pd.Series(out, dtype="Int32")

    c = F.col(col) if isinstance(col, str) else col
    return _count(c)


# ---- range field types (integer_range / long_range / double_range /
#      date_range / ip_range FIELDS) ------------------------------------
#
# The reference stores a per-doc interval and answers range queries with
# a `relation` of INTERSECTS (default) / WITHIN / CONTAINS
# (server/src/main/java/org/elasticsearch/index/mapper/RangeFieldMapper.java,
# RangeType.java dvRangeQuery; relation parsed by RangeQueryBuilder).
# Spark-first shape: the field is a plain struct<gte, lte> column, and
# each relation is a pure Catalyst predicate over the two bounds —
# whole-stage-codegen comparisons, min/max parquet pruning on the
# struct leaves, no UDF. Bounds are CLOSED intervals like the
# reference's default (include_lower/include_upper true); a NULL bound
# means unbounded on that side (ES's ±infinity default), handled by
# treating the comparison as satisfied.

def range_struct(gte, lte) -> Column:
    """Build a range-field value: struct<gte, lte> (closed interval)."""
    g = F.col(gte) if isinstance(gte, str) else gte
    l = F.col(lte) if isinstance(lte, str) else lte
    return F.struct(g.alias("gte"), l.alias("lte"))


def range_query(col, gte, lte, relation: str = "intersects") -> Column:
    """Range query over a range FIELD with ES relation semantics.

    intersects: doc interval and query interval share any point
    within:     doc interval lies entirely inside the query interval
    contains:   doc interval covers the whole query interval

    A NULL doc bound is -infinity (gte) / +infinity (lte), matching the
    reference's unbounded default — so it SATISFIES comparisons where the
    infinite side helps (``gte <= x``, ``lte >= x``) and FAILS the
    opposite direction (``gte >= x``, ``lte <= x``).
    """
    c = F.col(col) if isinstance(col, str) else col
    dg, dl = c["gte"], c["lte"]
    # gte = -inf when NULL; lte = +inf when NULL
    gte_le = lambda v: dg.isNull() | (dg <= v)      # noqa: E731
    gte_ge = lambda v: dg.isNotNull() & (dg >= v)   # noqa: E731
    lte_ge = lambda v: dl.isNull() | (dl >= v)      # noqa: E731
    lte_le = lambda v: dl.isNotNull() & (dl <= v)   # noqa: E731
    rel = relation.lower()
    if rel == "intersects":
        return gte_le(lte) & lte_ge(gte)
    if rel == "within":
        return gte_ge(gte) & lte_le(lte)
    if rel == "contains":
        return gte_le(gte) & lte_ge(lte)
    raise ValueError(f"unknown range relation: {relation!r}")


def range_query_sql(gte_expr: str, lte_expr: str, qlo: str, qhi: str,
                    relation: str = "intersects") -> str:
    """DuckDB twin of :func:`range_query` (non-null bounds)."""
    rel = relation.lower()
    if rel == "intersects":
        return f"({gte_expr} <= {qhi} AND {lte_expr} >= {qlo})"
    if rel == "within":
        return f"({gte_expr} >= {qlo} AND {lte_expr} <= {qhi})"
    if rel == "contains":
        return f"({gte_expr} <= {qlo} AND {lte_expr} >= {qhi})"
    raise ValueError(f"unknown range relation: {relation!r}")
