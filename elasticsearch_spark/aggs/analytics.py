"""x-pack analytics aggregations re-expressed as Spark built-ins.

Reference: x-pack/plugin/analytics/src/main/java/org/elasticsearch/
xpack/analytics/ — boxplot, string_stats, top_metrics, t_test, rate,
multi_terms, moving_percentiles — plus the core-registered
variable_width_histogram (SearchModule.java:432) and the date_range /
ip_range bucket variants (SearchModule.java:408-419).

Every function returns a small DataFrame and compiles to one or two
built-in hash aggregations / window passes — nothing here needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def boxplot(df: DataFrame, field: str) -> DataFrame:
    """boxplot agg (BoxplotAggregationBuilder): min/q1/q2/q3/max.
    Exact interpolated percentiles (the reference uses TDigest; exact is
    the oracle-checkable mode, percentile_approx the scale path)."""
    c = F.col(field)
    # ONE percentile buffer for all three quartiles (array form):
    # identical interpolation per element, 3x less aggregation state
    # than three scalar percentile calls (measured 40 s -> 14 s over
    # 6M rows at sf1.0)
    q = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return df.agg(
        F.min(c).alias("min"),
        q.getItem(0).alias("q1"),
        q.getItem(1).alias("q2"),
        q.getItem(2).alias("q3"),
        F.max(c).alias("max"),
    )


def string_stats(df: DataFrame, field: str) -> DataFrame:
    """string_stats agg (StringStatsAggregationBuilder): count,
    min/max/avg length, Shannon entropy (base 2) over the CHARACTER
    distribution of all values. The char histogram is a distributed agg;
    the <=few-hundred-entry histogram is summed driver-side in sorted
    char order so the float sum is deterministic across engines."""
    import math

    lengths = df.select(F.length(F.col(field)).alias("len")).agg(
        F.count("*").alias("count"),
        F.min("len").alias("min_length"),
        F.max("len").alias("max_length"),
        F.avg("len").alias("avg_length"),
    )
    chars = (
        df.select(F.explode(F.split(F.col(field), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch").agg(F.count("*").alias("c"))
        .collect()
    )
    total = float(sum(r["c"] for r in chars))
    ent = 0.0
    for r in sorted(chars, key=lambda r: r["ch"]):
        p = r["c"] / total
        ent = ent - p * math.log2(p)
    return lengths.withColumn("entropy", F.lit(ent))


def top_metrics(
    df: DataFrame,
    metrics: list[str],
    sort_field: str,
    ascending: bool = False,
    size: int = 1,
    tie_breaker: str | None = None,
) -> DataFrame:
    """top_metrics agg (TopMetricsAggregationBuilder): metric values of
    the top-``size`` docs by ``sort_field`` — a TakeOrderedAndProject.
    ``tie_breaker`` (asc) makes equal sort keys deterministic."""
    order = [F.col(sort_field).asc() if ascending else F.col(sort_field).desc()]
    cols = [sort_field, *metrics]
    if tie_breaker:
        order.append(F.col(tie_breaker).asc())
        if tie_breaker not in cols:
            cols.append(tie_breaker)
    return df.select(*cols).orderBy(*order).limit(size)


def t_test(
    df: DataFrame,
    field: str,
    filter_a,
    filter_b,
    test_type: str = "heteroscedastic",
) -> DataFrame:
    """t_test agg (TTestAggregationBuilder): Welch's t statistic between
    two filtered populations (heteroscedastic, the reference default),
    or Student's (homoscedastic). One agg pass with conditional
    aggregates — no second scan."""
    x = F.col(field)
    a, b = filter_a, filter_b
    agg = df.agg(
        F.avg(F.when(a, x)).alias("ma"),
        F.avg(F.when(b, x)).alias("mb"),
        F.var_samp(F.when(a, x)).alias("va"),
        F.var_samp(F.when(b, x)).alias("vb"),
        F.count(F.when(a, x)).alias("na"),
        F.count(F.when(b, x)).alias("nb"),
    )
    if test_type == "heteroscedastic":
        t = (F.col("ma") - F.col("mb")) / F.sqrt(
            F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
        )
    elif test_type == "homoscedastic":
        sp2 = (
            (F.col("na") - 1) * F.col("va") + (F.col("nb") - 1) * F.col("vb")
        ) / (F.col("na") + F.col("nb") - 2)
        t = (F.col("ma") - F.col("mb")) / F.sqrt(
            sp2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
        )
    else:
        raise ValueError(test_type)
    return agg.select(t.alias("t_stat"), "na", "nb")


def rate_agg(
    df: DataFrame,
    ts_field: str,
    value_field: str | None = None,
    calendar: str = "month",
    unit: str = "day",
) -> DataFrame:
    """rate agg inside a calendar date_histogram
    (RateAggregationBuilder): per bucket, sum(value) (or doc count)
    divided by the number of ``unit``s the bucket spans."""
    bucket = F.date_trunc(calendar, F.col(ts_field)).alias("bucket")
    val = F.sum(F.col(value_field)) if value_field else F.count("*")
    grouped = df.groupBy(bucket).agg(val.alias("total"))
    if calendar == "month" and unit == "day":
        days = F.dayofmonth(F.last_day(F.col("bucket")))
    elif calendar == unit:
        days = F.lit(1)
    else:
        raise ValueError(f"unsupported rate {calendar}/{unit}")
    return grouped.select(
        "bucket", "total", (F.col("total") / days).alias("rate")
    ).orderBy("bucket")


def multi_terms(
    df: DataFrame, fields: list[str], size: int = 10
) -> DataFrame:
    """multi_terms agg (MultiTermsAggregationBuilder): buckets keyed by
    a field TUPLE, ordered doc_count desc then keys asc."""
    return (
        df.groupBy(*fields).agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), *[F.asc(f) for f in fields])
        .limit(size)
    )


def moving_percentiles(
    df: DataFrame,
    ts_field: str,
    value_field: str,
    percent: float = 0.5,
    window: int = 3,
    calendar: str = "month",
) -> DataFrame:
    """moving_percentiles pipeline agg: per calendar bucket, the exact
    percentile of the values in the trailing ``window`` buckets
    (inclusive). Implemented as percentile over a row-window on the
    bucketed frame — one shuffle for the histogram, one window pass."""
    bucket = F.date_trunc(calendar, F.col(ts_field)).alias("bucket")
    per_bucket = df.groupBy(bucket).agg(
        F.collect_list(value_field).alias("vals")
    )
    w = Window.orderBy("bucket").rowsBetween(-(window - 1), 0)
    merged = per_bucket.withColumn(
        "wv", F.sort_array(F.flatten(F.collect_list("vals").over(w)))
    )
    # interpolated quantile over the sorted window values (quantile_cont
    # rule: h = (n-1)p, linear interpolation between floor/ceil ranks) —
    # written explicitly so the DuckDB twin uses the identical formula
    n = F.size("wv")
    h = (n - 1) * F.lit(float(percent))
    lo = F.floor(h).cast("int")
    frac = h - F.floor(h)
    val = F.element_at("wv", lo + 1) + frac * (
        F.element_at("wv", F.least(lo + 2, n)) - F.element_at("wv", lo + 1)
    )
    return merged.select("bucket", val.alias("p")).orderBy("bucket")


def variable_width_histogram(
    df: DataFrame, field: str, buckets: int = 5
) -> DataFrame:
    """variable_width_histogram (reg. SearchModule.java:432): data-driven
    bucket boundaries. The reference streams a 1-D clustering; this
    engine uses the DETERMINISTIC largest-gaps rule — sort the distinct
    values, cut at the (buckets-1) largest gaps (ties: leftmost) — which
    is reproducible and SQL-expressible (the reference's collector is
    order-dependent and cannot be oracle-checked). Emits per bucket:
    min, max, doc_count, centroid (avg)."""
    vals = df.select(F.col(field).alias("v")).filter(F.col("v").isNotNull())
    distinct = vals.distinct()
    w = Window.orderBy("v")
    gaps = distinct.withColumn("prev", F.lag("v").over(w)).withColumn(
        "gap", F.col("v") - F.col("prev")
    )
    cuts = (
        gaps.filter(F.col("prev").isNotNull())
        .orderBy(F.desc("gap"), F.asc("v"))
        .limit(buckets - 1)
        .select(F.col("v").alias("cut"))
    )
    # bucket id = number of cuts <= value, computed on DISTINCT values
    # (tiny cut list -> broadcast), then joined back to the raw rows
    bucketed = (
        distinct.join(F.broadcast(cuts), F.col("v") >= F.col("cut"), "left")
        .groupBy("v")
        .agg(F.count(F.col("cut")).alias("bucket_id"))
    )
    out = (
        vals.join(bucketed, "v")
        .groupBy("bucket_id")
        .agg(
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            F.count("*").alias("doc_count"),
            F.avg("v").alias("centroid"),
        )
        .orderBy("bucket_id")
    )
    return out


def _unpivot_counts(wide: DataFrame, keys: list[str]) -> DataFrame:
    """Unpivot a one-row wide counter frame (columns c0..cN) into
    (key, doc_count) rows ENTIRELY in-plan — explode over an array of
    structs, no driver round-trip. Keeps the agg composable (usable as a
    sub-agg / pushed downstream) and removes an avoidable collect()."""
    pairs = F.array(*[
        F.struct(
            F.lit(k).alias("key"),
            F.col(f"c{i}").cast("long").alias("doc_count"),
        )
        for i, k in enumerate(keys)
    ])
    return wide.select(F.explode(pairs).alias("kv")).select(
        "kv.key", "kv.doc_count"
    )


def date_range_agg(
    df: DataFrame, ts_field: str, ranges: list[tuple[str | None, str | None]]
) -> DataFrame:
    """date_range buckets (from inclusive, to exclusive), ISO strings or
    date-math expressions (``now-1M/M``, ``2024-01-05||/w``)."""
    from elasticsearch_spark.search.datemath import (
        is_date_math, parse_date_math)

    def _edge(v):
        # both edges round DOWN (DateRangeAggregationBuilder: from is
        # inclusive, to is exclusive — no round-up edge exists)
        if is_date_math(v):
            return F.lit(parse_date_math(v))
        return F.lit(v).cast("timestamp")

    rows = []
    keys = []
    c = F.col(ts_field)
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= _edge(lo))
        if hi is not None:
            cond = cond & (c < _edge(hi))
        keys.append(f"{lo or '*'}..{hi or '*'}")
        # coalesce: F.sum over ZERO rows is NULL — empty input must
        # yield zero-count buckets, not NULL doc_counts
        rows.append(
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"c{i}")
        )
    return _unpivot_counts(df.agg(*rows), keys)


def ip_to_long(col):
    """dotted-quad string -> numeric (for ip_range bucketing)."""
    parts = F.split(col, r"\.")
    return (
        parts[0].cast("long") * 16777216
        + parts[1].cast("long") * 65536
        + parts[2].cast("long") * 256
        + parts[3].cast("long")
    )


def ip_range_agg(
    df: DataFrame, ip_col: str, ranges: list[tuple[str | None, str | None]]
) -> DataFrame:
    """ip_range buckets (from inclusive, to exclusive) on dotted-quad
    strings, compared numerically (IpRangeAggregationBuilder)."""
    import ipaddress

    v = ip_to_long(F.col(ip_col))
    aggs = []
    keys = []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (v >= int(ipaddress.IPv4Address(lo)))
        if hi is not None:
            cond = cond & (v < int(ipaddress.IPv4Address(hi)))
        keys.append(f"{lo or '*'}..{hi or '*'}")
        aggs.append(
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"c{i}")
        )
    return _unpivot_counts(df.agg(*aggs), keys)


def geohash_grid_agg(
    df: DataFrame, lat_col: str, lon_col: str,
    precision: int = 4, size: int = 10000,
) -> DataFrame:
    """geohash_grid bucket agg (GeoHashGridAggregationBuilder.java):
    count docs per geohash cell, largest first. The cell id is pure
    Catalyst arithmetic (search/geo.py geohash) — the groupBy shuffles
    only (cell, partial count) rows, standard map-side combine."""
    from elasticsearch_spark.search.geo import geohash

    return (
        df.groupBy(geohash(lat_col, lon_col, precision).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geo_distance_agg(
    df: DataFrame, lat_col: str, lon_col: str,
    origin: tuple[float, float], ranges: list[tuple[float | None, float | None]],
) -> DataFrame:
    """geo_distance bucket agg (GeoDistanceAggregationBuilder.java,
    registered in SearchModule.java:437-448): count docs per distance
    ring [from, to) km around ``origin``. Rings may overlap, so each is
    a conditional count over ONE pass — a single partial-agg shuffle of
    per-ring counters, never one job per ring."""
    from elasticsearch_spark.search.geo import haversine_km

    d = haversine_km(
        F.col(lat_col), F.col(lon_col),
        F.lit(float(origin[0])), F.lit(float(origin[1])))
    aggs = []
    keys = []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        parts = []
        if lo is not None:
            cond = cond & (d >= F.lit(float(lo)))
        if hi is not None:
            cond = cond & (d < F.lit(float(hi)))
        parts.append("*-" if lo is None else f"{float(lo):g}-")
        parts.append("*" if hi is None else f"{float(hi):g}")
        keys.append("".join(parts))
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
            ).alias(f"c{i}")
        )
    return _unpivot_counts(df.agg(*aggs), keys)


def geotile_grid_agg(
    df: DataFrame, lat_col: str, lon_col: str,
    zoom: int = 7, size: int = 10000,
) -> DataFrame:
    """geotile_grid bucket agg (GeoTileGridAggregationBuilder.java)."""
    from elasticsearch_spark.search.geo import geotile

    return (
        df.groupBy(geotile(lat_col, lon_col, zoom).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geo_bounds_agg(df: DataFrame, lat_col: str, lon_col: str) -> DataFrame:
    """geo_bounds agg (GeoBoundsAggregationBuilder, reg.
    SearchModule.java:455): smallest lat/lon box covering the points."""
    return df.agg(
        F.max(lat_col).alias("top"),
        F.min(lat_col).alias("bottom"),
        F.min(lon_col).alias("left"),
        F.max(lon_col).alias("right"),
    )


def geo_centroid_agg(df: DataFrame, lat_col: str, lon_col: str) -> DataFrame:
    """geo_centroid agg (GeoCentroidAggregationBuilder, reg. :462):
    arithmetic mean point + count (the reference's planar centroid)."""
    return df.agg(
        F.avg(lat_col).alias("lat"),
        F.avg(lon_col).alias("lon"),
        F.count("*").alias("count"),
    )


def cumulative_cardinality(
    df: DataFrame, ts_field: str, key_field: str, calendar: str = "month"
) -> DataFrame:
    """cumulative_cardinality pipeline agg (x-pack/plugin/analytics/
    .../CumulativeCardinalityPipelineAggregationBuilder.java): per
    calendar bucket, the number of DISTINCT keys seen in any bucket up
    to and including it.

    The reference merges per-bucket HLL sketches; the exact equivalent
    (and the oracle-checkable mode) exploits that a key contributes to
    the cumulative count from its FIRST bucket onward: one groupBy(key)
    min(bucket) — shuffling O(distinct keys) rows, not O(rows) — then a
    count per first-bucket and a running sum. Buckets with no new keys
    still appear (joined against the full bucket histogram)."""
    bucket = F.date_trunc(calendar, F.col(ts_field))
    buckets = df.select(bucket.alias("bucket")).distinct()
    firsts = (
        df.groupBy(F.col(key_field).alias("k"))
        .agg(F.min(bucket).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("new_keys"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        buckets.join(firsts, "bucket", "left")
        .withColumn("new_keys", F.coalesce(F.col("new_keys"), F.lit(0)))
        .withColumn("cumulative_cardinality", F.sum("new_keys").over(w))
        .orderBy("bucket")
    )


def normalize_agg(
    df: DataFrame, ts_field: str, value_field: str,
    method: str = "percent_of_sum", calendar: str = "month",
) -> DataFrame:
    """normalize pipeline agg (x-pack/plugin/analytics/.../normalize/
    NormalizePipelineAggregationBuilder.java): rescale a per-bucket
    metric across the bucket set. Methods: percent_of_sum (v/Σv),
    mean (v/avg), rescale_0_1, rescale_0_100, z-score."""
    bucket = F.date_trunc(calendar, F.col(ts_field)).alias("bucket")
    per = df.groupBy(bucket).agg(F.sum(value_field).alias("value"))
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v = F.col("value")
    if method == "percent_of_sum":
        norm = v / F.sum(v).over(w)
    elif method == "mean":
        norm = v / F.avg(v).over(w)
    elif method == "rescale_0_1":
        norm = (v - F.min(v).over(w)) / (F.max(v).over(w) - F.min(v).over(w))
    elif method == "rescale_0_100":
        norm = (v - F.min(v).over(w)) * 100.0 / (
            F.max(v).over(w) - F.min(v).over(w)
        )
    elif method == "z-score":
        norm = (v - F.avg(v).over(w)) / F.stddev_pop(v).over(w)
    else:
        raise ValueError(method)
    return per.select("bucket", "value", norm.alias("normalized")).orderBy("bucket")


def geo_line_agg(
    df: DataFrame,
    group_cols: list[str],
    lat_col: str,
    lon_col: str,
    sort_col: str,
    size: int = 10_000,
    sort_order: str = "asc",
) -> DataFrame:
    """geo_line agg (x-pack/plugin/spatial/.../aggregations/
    GeoLineAggregationBuilder.java, MAX_PATH_SIZE=10000): per bucket,
    the points ordered by the sort field joined into a LineString,
    truncated to ``size``.

    Spark shape: ONE partial/final aggregation — collect (sort, lon,
    lat) structs, sort_array on the struct's leading sort key (JVM-
    side), slice to size, render WKT. No window, no second shuffle;
    the per-bucket array is bounded by ``size`` exactly like the
    reference's bucketed sort.
    """
    pts = F.sort_array(
        F.collect_list(F.struct(
            F.col(sort_col).alias("s"),
            F.col(lon_col).alias("x"),
            F.col(lat_col).alias("y"),
        )),
        asc=(sort_order == "asc"),
    )
    pts = F.slice(pts, 1, size)
    return (
        df.groupBy(*group_cols)
        .agg(F.count("*").alias("doc_count"), pts.alias("_pts"))
        .select(*group_cols, "doc_count",
                F.size("_pts").alias("n_points"),
                F.concat(
                    F.lit("LINESTRING ("),
                    F.array_join(F.transform(
                        F.col("_pts"),
                        lambda p: F.concat(p["x"].cast("string"), F.lit(" "),
                                           p["y"].cast("string"))), ", "),
                    F.lit(")"),
                ).alias("geometry"))
    )


def bucket_count_correlation(
    buckets: DataFrame,
    x_col: str,
    y_col: str,
    indicator_doc_count: int,
) -> DataFrame:
    """bucket_correlation pipeline agg, count_correlation function
    (x-pack/plugin/ml/.../aggs/correlation/CountCorrelationFunction.
    java:100-170): correlation between an indicator's per-bucket
    expectation ``x_col`` and a sibling agg's per-bucket doc count
    ``y_col``, where ``indicator_doc_count`` is the indicator's total
    count (>= sum of y). The y side is treated as a Bernoulli draw per
    indicator doc (yMean = sum(y)/doc_count), giving the reference's
    point-biserial form with uniform fractions 1/n_buckets.

    Spark shape: one 1-row mean pass, one covariance pass — pipeline
    aggs run over already-reduced coordinator buckets, so both jobs
    touch n_buckets rows. Returns one row (correlation double), NULL
    when either variance is zero (the reference's NaN).
    """
    import math

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    stats = buckets.agg(
        F.avg(x).alias("x_mean"),
        F.var_pop(x).alias("x_var"),
        F.sum(y).alias("y_sum"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]
    x_mean, x_var = float(stats["x_mean"]), float(stats["x_var"])
    n = int(stats["n_buckets"])
    doc_count = float(indicator_doc_count)
    weight = float(stats["y_sum"]) / doc_count
    if weight > 1.0:
        raise ValueError(
            "indicator doc_count must cover the correlating counts")
    y_mean = weight
    y_var = (1 - weight) * y_mean * y_mean + weight * (1 - y_mean) * (1 - y_mean)
    frac = 1.0 / n
    term = (
        -(F.lit(doc_count * frac) - y) * (x - F.lit(x_mean)) * F.lit(y_mean)
        + y * (x - F.lit(x_mean)) * F.lit(1 - y_mean)
    )
    out = buckets.agg(
        (F.sum(term) / F.lit(doc_count)).alias("xy_cov"))
    denom = x_var * y_var
    if denom <= 0:  # the reference returns NaN
        return out.select(F.lit(None).cast("double").alias("correlation"))
    return out.select(
        (F.col("xy_cov") / F.lit(math.sqrt(denom))).alias("correlation"))
