"""ES aggregations -> Spark groupBy/window programs (SURVEY.md §2.4).

The reference's aggs all follow partial-per-shard + final-reduce
(search/aggregations/InternalAggregation.java:218 reduce;
QueryPhaseResultConsumer.java:52,114 batched reduce) — exactly Spark's
partial/final hash aggregation, so every metric here compiles to
built-in JVM-side aggregate expressions (no Python in the hot path).

Supported spec shape (a faithful subset of the ES JSON)::

    aggregate(df, {"by_flag": {
        "terms": {"field": "l_returnflag", "size": 10},
        "aggs": {"qty": {"sum": {"field": "l_quantity"}},
                 "uniq": {"cardinality": {"field": "l_partkey"}}}}})

Bucket aggs: terms, rare_terms, histogram, date_histogram, range,
filters, missing, composite, global. Metric aggs: avg, sum, min, max,
value_count, stats, extended_stats, weighted_avg, cardinality
(HLL++ via approx_count_distinct, like the reference's
HyperLogLogPlusPlus.java:40; ``exact`` option for oracle-checked runs),
percentiles (percentile_approx / exact), median_absolute_deviation,
top_hits (window top-k per bucket, TopHitsAggregator.java analogue).
Pipeline aggs (window functions over the bucket frame): derivative,
cumulative_sum, moving_fn avg, serial_diff, cumulative count — see
``pipeline_agg``.

Distributed notes: terms in Spark is EXACT (full shuffle groupBy),
unlike ES's shard_size-approximate top-N
(GlobalOrdinalsStringTermsAggregator.java:54) — strictly stronger
semantics, same partial/final plan. Buckets with high cardinality
stay distributed; only explicit ``size`` limits collapse to the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window, functions as F

BUCKET_KINDS = {
    "terms", "rare_terms", "histogram", "date_histogram", "range",
    "filters", "missing", "composite", "global",
}

_CAL_TRUNC = {
    "year": "year", "1y": "year", "quarter": "quarter", "1q": "quarter",
    "month": "month", "1M": "month", "week": "week", "1w": "week",
    "day": "day", "1d": "day", "hour": "hour", "1h": "hour",
    "minute": "minute", "1m": "minute", "second": "second", "1s": "second",
}


def _script_col(script) -> Column:
    """Script value source (ValuesSourceAggregationBuilder.script,
    server/src/main/java/org/elasticsearch/search/aggregations/support/
    ValuesSourceAggregationBuilder.java): the painless script compiles
    ONCE to a Catalyst expression, so scripted aggs stay inside
    whole-stage codegen like field-sourced ones."""
    from elasticsearch_spark.scripts import compile_painless_program

    if isinstance(script, str):
        script = {"source": script}
    return F.expr(compile_painless_program(
        script["source"], script.get("params")))


def _metric_cols(name: str, spec: dict[str, Any]) -> list[Column]:
    kind, body = next(iter(spec.items()))
    f = body.get("field") if isinstance(body, dict) else None
    if f and isinstance(body, dict) and "script" in body:
        # the reference treats field+script as a VALUE script over the
        # field; silently preferring the field would diverge — refuse
        # loudly until value-script semantics exist
        raise ValueError(
            f"metric agg {name!r}: 'field' and 'script' together "
            "(value-script semantics) are not supported — use a script "
            "that reads doc['field'] instead")
    c = F.col(f) if f else None
    if c is None and isinstance(body, dict) and "script" in body:
        c = _script_col(body["script"])
    if c is not None and isinstance(body, dict) and "missing" in body:
        # ValuesSourceAggregationBuilder.missing: substitute for NULLs
        # so they participate instead of being skipped
        c = F.coalesce(c, F.lit(body["missing"]))
    if kind == "avg":
        return [F.avg(c).alias(name)]
    if kind == "sum":
        return [F.sum(c).alias(name)]
    if kind == "min":
        return [F.min(c).alias(name)]
    if kind == "max":
        return [F.max(c).alias(name)]
    if kind == "value_count":
        return [F.count(c).alias(name)]
    if kind == "stats":
        return [
            F.count(c).alias(f"{name}_count"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            F.sum(c).alias(f"{name}_sum"),
        ]
    if kind == "extended_stats":
        # ES variance is population variance (sum_of_squares based)
        return [
            F.count(c).alias(f"{name}_count"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            F.sum(c).alias(f"{name}_sum"),
            F.sum(c * c).alias(f"{name}_sum_of_squares"),
            F.var_pop(c).alias(f"{name}_variance"),
            F.stddev_pop(c).alias(f"{name}_std_deviation"),
        ]
    if kind == "weighted_avg":
        v = F.col(body["value"]["field"])
        w = F.col(body["weight"]["field"])
        return [(F.sum(v * w) / F.sum(w)).alias(name)]
    if kind == "cardinality":
        if body.get("exact"):
            return [F.countDistinct(c).alias(name)]
        rsd = float(body.get("precision_threshold_rsd", 0.05))
        return [F.approx_count_distinct(c, rsd).alias(name)]
    if kind == "percentiles":
        percents = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
        fracs = [p / 100.0 for p in percents]
        # array form: EVERY output column carries the IDENTICAL
        # aggregate expression, which Catalyst deduplicates into one
        # aggregation buffer — one counts-map (exact) / one sketch
        # (approx) instead of one per requested percent; element
        # values match the scalar calls exactly
        pfun = F.percentile if body.get("exact") else F.percentile_approx
        qarr = pfun(c, F.array(*[F.lit(fr) for fr in fracs]))
        cols = [
            qarr.getItem(i).alias(f"{name}_p{str(p).replace('.', '_')}")
            for i, p in enumerate(percents)
        ]
        return cols
    raise ValueError(f"unsupported metric agg: {kind}")


def _offset_seconds(s: str) -> int:
    """Parse a date_histogram offset like "+6h" / "-30m" / "1d"."""
    sign = -1 if s.startswith("-") else 1
    body = s.lstrip("+-")
    return sign * int(body[:-1]) * {
        "s": 1, "m": 60, "h": 3600, "d": 86400,
    }[body[-1]]


def _bucket_key(
    kind: str, body: dict[str, Any], col: Column | None = None
) -> tuple[Column, str]:
    """Returns (key expression, output column name). ``col`` overrides
    the input column (used to re-apply the bucket rounding to literal
    extended_bounds values)."""
    if kind == "terms" or kind == "rare_terms":
        c = (_script_col(body["script"])
             if "field" not in body and "script" in body
             else F.col(body["field"]))
        if "missing" in body:
            # the `missing` param (TermsAggregationBuilder): NULL field
            # values bucket under the substitute instead of dropping
            c = F.coalesce(c, F.lit(body["missing"]))
        return c, body.get("key_name", "key")
    if kind == "histogram":
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))
        if col is not None:
            c = col
        elif "field" not in body and "script" in body:
            c = _script_col(body["script"])
        else:
            c = F.col(body["field"])
        return (
            F.floor((c - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
            + F.lit(offset)
        ), "key"
    if kind == "date_histogram":
        c = col if col is not None else F.col(body["field"])
        # offset (DateHistogramAggregationBuilder.offset): buckets are
        # rounded on a shifted timeline — key = trunc(v - off) + off
        off_s = _offset_seconds(body["offset"]) if body.get("offset") else 0
        if off_s:
            c = F.timestamp_seconds(F.unix_timestamp(c) - F.lit(off_s))
        ci = body.get("calendar_interval")
        tz = body.get("time_zone")
        if ci:
            if tz:
                # truncate on the LOCAL calendar, report the UTC instant
                # of the local boundary (Rounding.java timeZone rounding)
                k = F.to_utc_timestamp(
                    F.date_trunc(_CAL_TRUNC[ci], F.from_utc_timestamp(c, tz)),
                    tz,
                )
            else:
                k = F.date_trunc(_CAL_TRUNC[ci], c)
        else:
            fi = body["fixed_interval"]  # e.g. "30d", "12h"
            unit = fi[-1]
            n = int(fi[:-1])
            secs = n * {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
            epoch = F.unix_timestamp(c)
            if tz:
                # fixed intervals anchor at the tz's epoch offset
                shift = F.unix_timestamp(
                    F.from_utc_timestamp(c, tz)) - F.unix_timestamp(c)
                epoch = epoch + shift
                k = F.timestamp_seconds(
                    (F.floor(epoch / F.lit(secs)) * F.lit(secs)).cast("long")
                    - shift
                )
            else:
                k = F.timestamp_seconds(
                    (F.floor(epoch / F.lit(secs)) * F.lit(secs)).cast("long")
                )
        if off_s:
            k = F.timestamp_seconds(F.unix_timestamp(k) + F.lit(off_s))
        return k, "key"
    if kind == "missing":
        return F.col(body["field"]).isNull(), "key"
    raise ValueError(f"no single key expr for bucket agg {kind}")


def aggregate(
    df: DataFrame, spec: dict[str, Any], query: dict[str, Any] | None = None
) -> DataFrame:
    """Run ONE top-level agg (with optional metric sub-aggs and one
    nested bucket level) and return the flattened bucket DataFrame."""
    if query is not None:
        from elasticsearch_spark.search.dsl import compile_filter

        df = df.filter(compile_filter(query))
    if len(spec) != 1:
        raise ValueError("one top-level aggregation per call")
    name, body = next(iter(spec.items()))
    kind = next(k for k in body if k != "aggs")
    conf = body[kind]
    sub: dict[str, Any] = body.get("aggs", {})

    metric_cols: list[Column] = [F.count(F.lit(1)).alias("doc_count")]
    nested_bucket: tuple[str, dict] | None = None
    for sname, sspec in sub.items():
        skind = next(iter(sspec))
        if skind in BUCKET_KINDS:
            nested_bucket = (sname, sspec)
        elif skind == "top_hits":
            continue  # handled separately below
        else:
            metric_cols.extend(_metric_cols(sname, sspec))

    # ---- grouping ----
    if kind == "global":
        out = df.agg(*metric_cols)
        return out

    if kind == "filter":
        # the singular filter agg (FilterAggregationBuilder): one
        # filtered sub-scope — scan-level predicate + the sub-metrics
        from elasticsearch_spark.search.dsl import compile_filter

        return df.filter(compile_filter(conf)).agg(*metric_cols)

    if kind == "filters":
        # one bucket per named predicate: filter + agg per bucket, unioned
        # (Catalyst shares the scan; each bucket is a partial/final agg)
        from elasticsearch_spark.search.dsl import compile_filter

        rows = []
        preds = []
        for bname, q in conf["filters"].items():
            pred = compile_filter(q)
            preds.append(pred)
            rows.append(
                df.filter(pred)
                .agg(*metric_cols)
                .select(F.lit(bname).alias("key"), "*")
            )
        if conf.get("other_bucket") or conf.get("other_bucket_key"):
            # FiltersAggregator.java other-bucket: docs matching NONE
            # of the named predicates (NULL-safe — a NULL predicate is
            # "didn't match", exactly the reference's doc-count rule)
            none = preds[0]
            for p in preds[1:]:
                none = none | p
            other = ~F.coalesce(none, F.lit(False))
            rows.append(
                df.filter(other)
                .agg(*metric_cols)
                .select(F.lit(conf.get("other_bucket_key", "_other_"))
                        .alias("key"), "*")
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    if kind == "range":
        c = F.col(conf["field"])
        branches = []
        for r in conf["ranges"]:
            frm = r.get("from")
            to = r.get("to")
            label = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (c >= F.lit(frm))
            if to is not None:
                cond = cond & (c < F.lit(to))
            branches.append((label, cond))
        # ranges may overlap (ES allows it): one pass per bucket via
        # conditional agg, unioned
        outs = []
        for label, cond in branches:
            outs.append(
                df.filter(cond).agg(*metric_cols).select(
                    F.lit(label).alias("key"), "*"
                )
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    if kind == "composite":
        sources = conf["sources"]  # list of {name: {terms|histogram|date_histogram: {...}}}
        keys = []
        for src in sources:
            sname, sspec = next(iter(src.items()))
            skind, sconf = next(iter(sspec.items()))
            expr, _ = _bucket_key(skind, sconf)
            keys.append(expr.alias(sname))
        grouped = df.groupBy(*keys).agg(*metric_cols)
        key_names = [next(iter(s)) for s in sources]
        grouped = grouped.orderBy(*[F.asc(n) for n in key_names])
        after = conf.get("after")
        if after:
            # strictly-greater-than cursor on the composite key tuple
            cond = F.lit(False)
            eq = F.lit(True)
            for n in key_names:
                cond = cond | (eq & (F.col(n) > F.lit(after[n])))
                eq = eq & (F.col(n) == F.lit(after[n]))
            grouped = grouped.filter(cond)
        size = conf.get("size")
        if size:
            grouped = grouped.limit(int(size))
        return grouped

    key_expr, key_name = _bucket_key(kind, conf)
    if kind == "missing":
        grouped = df.groupBy(key_expr.alias("is_missing")).agg(*metric_cols)
        return grouped.filter(F.col("is_missing")).drop("is_missing")

    grouped = df.groupBy(key_expr.alias(key_name)).agg(*metric_cols)

    if kind == "terms":
        # include / exclude / partitioned fetch (bucket/terms/
        # IncludeExclude.java): regex strings are WHOLE-term anchored
        # (Lucene RegExp), lists are exact values, and
        # include={partition, num_partitions} splits the term space
        # deterministically so huge cardinalities page across requests
        # (hash constants differ from the reference's — documented;
        # the contract is disjoint-exhaustive determinism, not a
        # specific assignment).
        # ES drops docs missing the field unless `missing` substitutes
        # (the coalesce above already made those keys non-null)
        grouped = grouped.filter(F.col(key_name).isNotNull())
        inc, exc = conf.get("include"), conf.get("exclude")
        if isinstance(inc, dict):
            p, nparts = int(inc["partition"]), int(inc["num_partitions"])
            grouped = grouped.filter(F.pmod(
                F.xxhash64(F.col(key_name).cast("string")),
                F.lit(nparts)) == p)
        elif isinstance(inc, list):
            grouped = grouped.filter(F.col(key_name).isin(inc))
        elif isinstance(inc, str):
            grouped = grouped.filter(
                F.col(key_name).cast("string").rlike(f"^(?:{inc})$"))
        if isinstance(exc, list):
            grouped = grouped.filter(~F.col(key_name).isin(exc))
        elif isinstance(exc, str):
            grouped = grouped.filter(
                ~F.col(key_name).cast("string").rlike(f"^(?:{exc})$"))
        min_dc = int(conf.get("min_doc_count", 1))
        if min_dc > 1:
            grouped = grouped.filter(F.col("doc_count") >= min_dc)
        order = conf.get("order", {"_count": "desc"})
        okey, odir = next(iter(order.items()))
        # agg-path order "stats_agg.avg" (OrderPath.java): multi-value
        # metrics flatten to {name}_{stat} columns here
        okey = okey.replace(".", "_")
        ocol = F.col("doc_count") if okey == "_count" else (
            F.col(key_name) if okey == "_key" else F.col(okey)
        )
        grouped = grouped.orderBy(
            ocol.desc() if odir == "desc" else ocol.asc(), F.asc(key_name)
        )
        size = conf.get("size")
        if size:
            grouped = grouped.limit(int(size))
    elif kind == "rare_terms":
        max_dc = int(conf.get("max_doc_count", 1))
        grouped = grouped.filter(F.col("doc_count") <= max_dc).orderBy(
            F.asc("doc_count"), F.asc(key_name)
        )
    elif kind in ("histogram", "date_histogram"):
        hb = conf.get("hard_bounds")
        if hb:
            # hard_bounds (DateHistogramAggregationBuilder.hardBounds):
            # buckets outside [min, max] are dropped outright
            lo_l, hi_l = F.lit(hb["min"]), F.lit(hb["max"])
            if kind == "date_histogram":
                lo_l, hi_l = lo_l.cast("timestamp"), hi_l.cast("timestamp")
            grouped = grouped.filter(
                (F.col(key_name) >= lo_l) & (F.col(key_name) <= hi_l))
        min_dc = int(conf.get("min_doc_count", 1))
        if min_dc > 1:
            grouped = grouped.filter(F.col("doc_count") >= min_dc)
        elif min_dc == 0:
            grouped = _densify_histogram(grouped, kind, conf, key_name)
        grouped = grouped.orderBy(F.asc(key_name))

    if nested_bucket is not None:
        nname, nspec = nested_bucket
        nkind = next(iter(nspec))
        nexpr, _ = _bucket_key(nkind, nspec[nkind])
        nmetrics = [F.count(F.lit(1)).alias("doc_count")]
        for s2, sp2 in nspec.get("aggs", {}).items():
            nmetrics.extend(_metric_cols(s2, sp2))
        inner = df.groupBy(key_expr.alias(key_name), nexpr.alias(nname)).agg(*nmetrics)
        return inner.join(grouped.select(key_name), key_name, "left_semi").orderBy(
            F.asc(key_name), F.asc(nname)
        )

    return grouped


def top_hits(
    df: DataFrame,
    bucket_field: str,
    sort_col: str,
    size: int = 3,
    ascending: bool = False,
    tie_col: str | None = None,
) -> DataFrame:
    """top_hits agg: best ``size`` docs per bucket
    (TopHitsAggregator.java:212 analogue) via window row_number.

    Input is re-spread first (spread.py): the rank-filter plan gets a
    per-map-partition WindowGroupLimit whose required SORT dominates
    on few-row-group inputs — 16x more map partitions measured
    1.7-2.2 s -> 1.3-1.5 s at sf1.0, identical rows (interleaved A/B,
    r6). No-op on well-split inputs."""
    from elasticsearch_spark.spread import spread_input

    df = spread_input(df)
    order = [F.asc(sort_col) if ascending else F.desc(sort_col)]
    if tie_col:
        order.append(F.asc(tie_col))
    w = Window.partitionBy(bucket_field).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= size)
        .withColumnRenamed("_rank", "hit_rank")
    )


def pipeline_agg(
    buckets: DataFrame,
    kind: str,
    metric: str,
    key: str = "key",
    out_name: str | None = None,
    lag: int = 1,
    window_size: int = 3,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Pipeline aggregations over a bucket frame (SearchModule.java:502-568)
    as window functions: derivative, cumulative_sum, moving_avg
    (moving_fn), serial_diff."""
    out_name = out_name or f"{metric}_{kind}"
    part = partition_by or []
    w = Window.partitionBy(*part).orderBy(F.asc(key)) if part else Window.orderBy(F.asc(key))
    c = F.col(metric)
    if kind == "derivative":
        expr = c - F.lag(c, 1).over(w)
    elif kind == "serial_diff":
        expr = c - F.lag(c, lag).over(w)
    elif kind == "cumulative_sum":
        expr = F.sum(c).over(w.rowsBetween(Window.unboundedPreceding, 0))
    elif kind == "moving_avg":
        expr = F.avg(c).over(w.rowsBetween(-(window_size - 1), 0))
    else:
        raise ValueError(f"unsupported pipeline agg {kind}")
    return buckets.withColumn(out_name, expr)


def nested_agg(
    df: DataFrame, path: str, spec: dict, parent_cols: list[str] | None = None
) -> DataFrame:
    """nested aggregation (SearchModule.java:449): step INTO the
    sub-documents — explode the array-of-struct column, then run any
    aggregation over the children (+ optional parent key columns for
    reverse_nested-style grouping)."""
    cols = list(parent_cols or [])
    exploded = df.select(*cols, F.explode(F.col(path)).alias("_child")).select(
        *cols, "_child.*"
    )
    return aggregate(exploded, spec)


def reverse_nested_agg(
    df: DataFrame,
    path: str,
    child_key: str,
    parent_metrics: dict[str, tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    key_name: str | None = None,
) -> DataFrame:
    """reverse_nested (reg. SearchModule.java:451): bucket by a CHILD
    field, then step back OUT to parent scope — doc_count is the number
    of distinct PARENT docs with >=1 child in the bucket, and metrics
    aggregate over each parent once (not once per child).

    ``parent_metrics``: {out_name: (op, parent_field)} with op in
    avg/sum/min/max. Plan: explode -> per-(bucket, parent) dropDuplicates
    (partial map-side) -> one hash agg."""
    metrics = parent_metrics or {}
    key = key_name or child_key.split(".")[-1]
    needed = [id_col] + sorted({f for _, f in metrics.values()})
    exploded = df.select(
        *needed, F.col(path + "." + child_key.split(".")[-1]).alias("_ks")
    ).select(*needed, F.explode("_ks").alias(key))
    per_parent = exploded.dropDuplicates([key, id_col])
    aggs = [F.count("*").alias("doc_count")]
    ops = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
    for out, (op, fieldname) in metrics.items():
        aggs.append(ops[op](F.col(fieldname)).alias(out))
    return per_parent.groupBy(key).agg(*aggs)


def adjacency_matrix(df: DataFrame, filters: dict[str, dict]) -> DataFrame:
    """adjacency_matrix agg (SearchModule.java:377): doc counts for each
    named filter and each pairwise intersection — ONE aggregation pass
    over boolean predicate columns."""
    from elasticsearch_spark.search.dsl import compile_filter

    from elasticsearch_spark.aggs.analytics import _unpivot_counts

    names = list(filters)
    preds = {n: compile_filter(q).cast("long") for n, q in filters.items()}
    keys = list(names)
    aggs = [F.sum(preds[n]).alias(f"c{i}") for i, n in enumerate(names)]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            keys.append(f"{a}&{b}")
            aggs.append(F.sum(preds[a] * preds[b]).alias(f"c{len(aggs)}"))
    # in-plan unpivot; ES omits empty cells, so filter zero counts
    return (
        _unpivot_counts(df.agg(*aggs), keys)
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def median_absolute_deviation(df: DataFrame, field: str, exact: bool = True) -> DataFrame:
    """MAD (reference: TDigest-approximate; exact two-pass here, approx
    via percentile_approx for the scale path). Pure-plan: the median is
    a one-row broadcast cross join rather than a driver collect, so the
    agg stays composable and lazily re-evaluates with its input."""
    pfun = F.percentile if exact else F.percentile_approx
    mcol = "_mad_m"
    while mcol in df.columns:  # collision-proof alias for the join
        mcol += "_"
    med = df.agg(pfun(F.col(field), F.lit(0.5)).alias(mcol))
    return (
        df.crossJoin(F.broadcast(med))
        .agg(pfun(F.abs(F.col(field) - F.col(mcol)),
                  F.lit(0.5)).alias("mad"))
    )


def matrix_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """aggs-matrix-stats module: pairwise covariance + Pearson
    correlation, one agg pass."""
    aggs = []
    for i, a in enumerate(fields):
        for b in fields[i + 1:]:
            aggs.append(F.covar_samp(F.col(a), F.col(b)).alias(f"cov_{a}_{b}"))
            aggs.append(F.corr(F.col(a), F.col(b)).alias(f"corr_{a}_{b}"))
    return df.agg(*aggs)


def diversified_sampler(
    df: DataFrame,
    dedup_field: str,
    sort_col: str,
    max_docs_per_value: int = 1,
    shard_size: int = 100,
    tie_col: str | None = None,
) -> DataFrame:
    """sampler/diversified_sampler (SearchModule.java:379-384): the
    best-scoring subset with per-key de-duplication."""
    order = [F.desc(sort_col)] + ([F.asc(tie_col)] if tie_col else [])
    w = Window.partitionBy(dedup_field).orderBy(*order)
    ranked = df.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= max_docs_per_value
    ).drop("_rk")
    return ranked.orderBy(*order).limit(shard_size)


def scripted_metric(
    df: DataFrame,
    group_cols: list[str],
    map_combine,
    out_schema: str,
):
    """scripted_metric agg (SearchModule.java:463): user map/combine
    logic as a grouped-map pandas function — the sanctioned UDAF path."""
    return df.groupBy(*group_cols).applyInPandas(map_combine, schema=out_schema)


def auto_date_histogram(
    df: DataFrame, field: str, target_buckets: int = 10
) -> DataFrame:
    """auto_date_histogram (SearchModule.java:428): pick the coarsest
    calendar interval yielding <= target buckets (coordinator-side
    min/max probe, like the reference's rounding selection)."""
    bounds = df.agg(
        F.min(field).alias("lo"), F.max(field).alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        return df.sparkSession.createDataFrame([], "key timestamp, doc_count long")
    span_s = (hi - lo).total_seconds()
    ladder = [
        ("second", 1), ("minute", 60), ("hour", 3600), ("day", 86400),
        ("week", 7 * 86400), ("month", 30 * 86400), ("quarter", 91 * 86400),
        ("year", 365 * 86400),
    ]
    unit = ladder[-1][0]
    for name, secs in ladder:
        if span_s / secs <= target_buckets:
            unit = name
            break
    return (
        df.groupBy(F.date_trunc(unit, F.col(field)).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .withColumn("interval", F.lit(unit))
        .orderBy("key")
    )


def bucket_script(buckets: DataFrame, expr: str, out_name: str,
                  params: dict | None = None) -> DataFrame:
    """bucket_script pipeline agg: arithmetic over sibling metrics.
    Accepts painless (``params.x`` / ternaries / ``Math.*`` — bare
    names are bucket-path references, as in the reference) or raw
    SQL."""
    from elasticsearch_spark.scripts import maybe_painless

    return buckets.withColumn(out_name, F.expr(maybe_painless(expr, params)))


def bucket_selector(buckets: DataFrame, predicate: str,
                    params: dict | None = None) -> DataFrame:
    """bucket_selector: drop buckets failing the predicate (painless or
    raw SQL)."""
    from elasticsearch_spark.scripts import maybe_painless

    return buckets.filter(F.expr(maybe_painless(predicate, params)))


def bucket_sort(
    buckets: DataFrame, sort: list[tuple[str, str]],
    from_: int = 0, size: int | None = None,
) -> DataFrame:
    """bucket_sort: order/truncate the bucket list."""
    cols = [F.desc(c) if d == "desc" else F.asc(c) for c, d in sort]
    out = buckets.orderBy(*cols)
    if from_ > 0:
        out = out.offset(from_)
    if size is not None:
        out = out.limit(size)
    return out


def percentile_ranks(df: DataFrame, field: str, values: list[float]) -> DataFrame:
    """percentile_ranks agg: for each value, the fraction of docs with
    field <= value (as a percentage, like the reference)."""
    aggs = [
        (F.avg((F.col(field) <= F.lit(v)).cast("double")) * 100).alias(
            f"rank_{str(v).replace('.', '_')}"
        )
        for v in values
    ]
    return df.agg(*aggs)


def bucket_stats(buckets: DataFrame, metric: str) -> DataFrame:
    """stats_bucket / max_bucket / min_bucket / avg_bucket / sum_bucket:
    one global agg over the bucket frame."""
    c = F.col(metric)
    return buckets.agg(
        F.count(c).alias(f"{metric}_count"),
        F.min(c).alias(f"{metric}_min"),
        F.max(c).alias(f"{metric}_max"),
        F.avg(c).alias(f"{metric}_avg"),
        F.sum(c).alias(f"{metric}_sum"),
    )


def bucket_extended_stats(buckets: DataFrame, metric: str) -> DataFrame:
    """extended_stats_bucket: bucket_stats plus sum-of-squares,
    population variance/std-dev and std-dev bounds (the reference's
    ExtendedStatsBucketPipelineAggregationBuilder, sigma=2 default)."""
    c = F.col(metric)
    base = buckets.agg(
        F.count(c).alias(f"{metric}_count"),
        F.min(c).alias(f"{metric}_min"),
        F.max(c).alias(f"{metric}_max"),
        F.avg(c).alias(f"{metric}_avg"),
        F.sum(c).alias(f"{metric}_sum"),
        F.sum(c * c).alias(f"{metric}_sum_of_squares"),
        F.var_pop(c).alias(f"{metric}_variance"),
        F.stddev_pop(c).alias(f"{metric}_std_deviation"),
    )
    return base.withColumns({
        f"{metric}_std_upper":
            F.col(f"{metric}_avg") + 2 * F.col(f"{metric}_std_deviation"),
        f"{metric}_std_lower":
            F.col(f"{metric}_avg") - 2 * F.col(f"{metric}_std_deviation"),
    })


def bucket_percentiles(
    buckets: DataFrame, metric: str, percents: list[float] | None = None,
) -> DataFrame:
    """percentiles_bucket: exact interpolated percentiles over the
    bucket metric (PercentilesBucketPipelineAggregationBuilder; the
    bucket list is coordinator-sized, so exactness is free)."""
    percents = percents or [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]
    c = F.col(metric)
    return buckets.agg(*[
        F.percentile(c, F.lit(p / 100.0)).alias(
            f"p{str(p).replace('.', '_')}")
        for p in percents
    ])


def terms_with_error(
    df: DataFrame,
    field: str,
    shard_col: Column,
    size: int = 10,
    shard_size: int | None = None,
) -> DataFrame:
    """terms agg with ``doc_count_error_upper_bound``: the distributed
    merge the reference's coordinator performs, including its
    worst-case error accounting for counts a shard truncated away
    (server/.../bucket/terms/InternalTerms.java doc-count-error merge;
    AbstractInternalTerms reduce).

    Each shard (``shard_col`` group) contributes only its top
    ``shard_size`` terms by (count DESC, term ASC). A term absent from
    a shard's list may still have up to that shard's LAST included
    count hiding there, so its merged count understates by at most
    sum(cutoff_s) over shards s not reporting it. Like the reference's
    coordinator, a shard that returned ``shard_size`` terms is assumed
    truncated (the coordinator can't see whether more existed).

    Plan: one (shard, term) hash agg -> per-shard window top-k (the
    shard fan-in; window input is per-shard distinct terms, i.e. the
    same state the reference's shard keeps) -> one merge agg + a
    broadcast of the tiny per-shard cutoff table. Default shard_size is
    the reference's BucketUtils.suggestShardSideQueueSize heuristic:
    size * 1.5 + 10.
    """
    if shard_size is None:
        shard_size = int(size * 1.5) + 10
    per_shard = (
        df.select(shard_col.alias("_shard"), F.col(field))
        .groupBy("_shard", field)
        .agg(F.count("*").alias("_cnt"))
    )
    w = Window.partitionBy("_shard").orderBy(F.desc("_cnt"), F.asc(field))
    ranked = per_shard.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") <= shard_size)
    cutoffs = (
        kept.groupBy("_shard")
        .agg(
            F.count("*").alias("_n"),
            F.min("_cnt").alias("_last"),
        )
        .select(
            "_shard",
            F.when(F.col("_n") >= shard_size, F.col("_last"))
            .otherwise(F.lit(0))
            .alias("_cutoff"),
        )
    )
    total = cutoffs.agg(F.sum("_cutoff").alias("_tot"))
    present = (
        kept.join(F.broadcast(cutoffs), "_shard")
        .groupBy(field)
        .agg(
            F.sum("_cnt").alias("doc_count"),
            F.sum("_cutoff").alias("_present"),
        )
    )
    return (
        present.crossJoin(F.broadcast(total))
        .select(
            field,
            "doc_count",
            (F.col("_tot") - F.col("_present")).alias(
                "doc_count_error_upper_bound"
            ),
        )
        .orderBy(F.desc("doc_count"), F.asc(field))
        .limit(size)
    )


def _densify_histogram(
    grouped: DataFrame, kind: str, conf: dict[str, Any], key_name: str
) -> DataFrame:
    """min_doc_count: 0 — emit EVERY bucket between the data's first and
    last key (widened by bucket-rounded extended_bounds), zero-filled.

    Pure plan: the bucket ladder is one explode(sequence(...)) over the
    1-row bounds frame, left-joined back — no driver round-trip, so the
    densified histogram stays composable (usable under pipeline aggs,
    which is exactly where zero buckets matter: derivatives and moving
    windows must see the gaps). Ladder size = key span / interval; at
    100 TB that's bounded by the time range, not the row count."""
    eb = conf.get("extended_bounds") or {}
    lo = F.min(key_name).alias("_lo")
    hi = F.max(key_name).alias("_hi")
    bounds = grouped.agg(lo, hi)
    if eb:
        # round the literal bounds with the SAME key expression, then
        # widen (F.least / F.greatest skip NULLs, so extended_bounds
        # alone densifies an empty result — ES parity)
        lo_k, _ = _bucket_key(
            kind, conf,
            col=F.lit(eb["min"]).cast(
                "timestamp" if kind == "date_histogram" else "double"),
        )
        hi_k, _ = _bucket_key(
            kind, conf,
            col=F.lit(eb["max"]).cast(
                "timestamp" if kind == "date_histogram" else "double"),
        )
        bounds = bounds.select(
            F.least(F.col("_lo"), lo_k).alias("_lo"),
            F.greatest(F.col("_hi"), hi_k).alias("_hi"),
        )
    if kind == "histogram":
        interval = float(conf["interval"])
        n = F.floor(
            (F.col("_hi") - F.col("_lo")) / F.lit(interval) + F.lit(0.5)
        ).cast("int")
        ladder = bounds.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n),
                    lambda i: F.col("_lo") + i.cast("double") * F.lit(interval),
                )
            ).alias(key_name)
        )
    else:
        ci = conf.get("calendar_interval")
        if ci:
            step = {
                "second": "INTERVAL 1 SECOND", "minute": "INTERVAL 1 MINUTE",
                "hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY",
                "week": "INTERVAL 7 DAY", "month": "INTERVAL 1 MONTH",
                "quarter": "INTERVAL 3 MONTH", "year": "INTERVAL 1 YEAR",
            }[ci]
        else:
            fi = conf["fixed_interval"]
            secs = int(fi[:-1]) * {
                "s": 1, "m": 60, "h": 3600, "d": 86400}[fi[-1]]
            step = f"INTERVAL {secs} SECOND"
        ladder = bounds.select(
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
            ).alias(key_name)
        )
    ladder = ladder.filter(F.col(key_name).isNotNull())
    dense = ladder.join(grouped, key_name, "left")
    return dense.withColumn(
        "doc_count", F.coalesce(F.col("doc_count"), F.lit(0))
    )
