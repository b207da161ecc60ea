"""moving_fn pipeline aggregation — the full MovingFunctions model set.

Reference: server/src/main/java/org/elasticsearch/search/aggregations/
pipeline/MovingFunctions.java (max/min/sum/unweightedAvg/stdDev/
linearWeightedAvg/ewma/holt/holtWinters) driven by
MovFnPipelineAggregator.java:100-101 window semantics: for bucket
``i`` the model sees ``values[i - window + shift : i + shift)`` —
shift=0 (the default) EXCLUDES the current bucket.

Spark shape: ONE window collect_list builds each bucket's value array
(bucket frames are coordinator-small — this is the reference's
coordinator-side reduce), then every model except holt_winters runs as
a Catalyst higher-order ``aggregate`` fold over that array — inside
whole-stage codegen, no Python. holt_winters needs an indexed seasonal
array (lookback ``i - period``), which a fold can't reach, so it runs
as one Arrow-batched pandas_udf over the collected arrays.

Null buckets: the reference skips NaN values inside every model; here a
missing metric is a SQL NULL and ``collect_list`` drops nulls, which is
the same skip.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["moving_fn", "MOVING_MODELS"]

_D = "double"


def _sum(arr: Column) -> Column:
    # empty window -> 0.0 (MovingFunctions.sum)
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.cast(_D))


def _count(arr: Column) -> Column:
    return F.size(arr)


def _unweighted_avg(arr: Column) -> Column:
    # empty -> NaN in the reference; NULL is the engine's NaN
    return F.when(_count(arr) > 0, _sum(arr) / _count(arr))


def _std_dev(arr: Column) -> Column:
    avg = _unweighted_avg(arr)
    sq = F.aggregate(
        arr, F.lit(0.0), lambda a, x: a + (x.cast(_D) - avg) * (x.cast(_D) - avg)
    )
    return F.when(_count(arr) > 0, F.sqrt(sq / _count(arr)))


def _linear_weighted_avg(arr: Column) -> Column:
    # MovingFunctions.linearWeightedAvg: weight 1..n by position,
    # totalWeight STARTS AT 1 (reference quirk, mirrored exactly)
    acc0 = F.struct(
        F.lit(0.0).alias("avg"),
        F.lit(1.0).alias("w"),
        F.lit(1.0).alias("cur"),
    )
    folded = F.aggregate(
        arr,
        acc0,
        lambda a, x: F.struct(
            (a["avg"] + x.cast(_D) * a["cur"]).alias("avg"),
            (a["w"] + a["cur"]).alias("w"),
            (a["cur"] + 1).alias("cur"),
        ),
        lambda a: F.when(a["w"] > 1.0, a["avg"] / a["w"]),
    )
    return folded


def _ewma(arr: Column, alpha: float) -> Column:
    # avg = v on the first value, then v*alpha + avg*(1-alpha)
    acc0 = F.struct(F.lit(None).cast(_D).alias("avg"))
    return F.aggregate(
        arr,
        acc0,
        lambda a, x: F.struct(
            F.when(a["avg"].isNull(), x.cast(_D))
            .otherwise(x.cast(_D) * F.lit(alpha) + a["avg"] * F.lit(1 - alpha))
            .alias("avg")
        ),
        lambda a: a["avg"],
    )


def _holt(arr: Column, alpha: float, beta: float) -> Column:
    # MovingFunctions.holt: s/b double-exponential recursion; returns s
    acc0 = F.struct(
        F.lit(None).cast(_D).alias("s"),
        F.lit(None).cast(_D).alias("b"),
    )

    def step(a, x):
        v = x.cast(_D)
        first = a["s"].isNull()
        s = F.when(first, v).otherwise(
            F.lit(alpha) * v + F.lit(1 - alpha) * (a["s"] + a["b"])
        )
        # reference: on the first value b = v - last where last = v -> 0
        b = F.when(first, F.lit(0.0)).otherwise(
            F.lit(beta) * (s - a["s"]) + F.lit(1 - beta) * a["b"]
        )
        return F.struct(s.alias("s"), b.alias("b"))

    return F.aggregate(arr, acc0, step, lambda a: a["s"])


def holt_winters_py(
    values: np.ndarray,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    multiplicative: bool,
) -> float:
    """Direct transcription of MovingFunctions.holtWinters (the
    coordinator-side model is scalar by nature — it runs once per
    bucket over a <=window-length array)."""
    vs = np.asarray(values, dtype="float64")
    vs = vs[~np.isnan(vs)]
    if vs.size == 0:
        return float("nan")
    if vs.size < 2 * period:
        return float("nan")  # ref throws; a bucket-level NaN is the
        # engine's "not enough data" (documented divergence)
    padding = 1e-10 if multiplicative else 0.0
    vs = vs + padding
    n = vs.size
    s = float(np.mean(vs[:period]))
    b = float(np.sum((vs[period:2 * period] - vs[:period]) / period)) / period
    seasonal = np.zeros(n)
    if s != 0.0:
        seasonal[:period] = vs[:period] / s
    last_s, last_b = s, b
    for i in range(period, n):
        if multiplicative:
            s = alpha * (vs[i] / seasonal[i - period]) + (1 - alpha) * (last_s + last_b)
        else:
            s = alpha * (vs[i] - seasonal[i - period]) + (1 - alpha) * (last_s + last_b)
        b = beta * (s - last_s) + (1 - beta) * last_b
        if multiplicative:
            seasonal[i] = gamma * (vs[i] / (last_s + last_b)) + (1 - gamma) * seasonal[i - period]
        else:
            seasonal[i] = gamma * (vs[i] - (last_s - last_b)) + (1 - gamma) * seasonal[i - period]
        last_s, last_b = s, b
    idx = n - period
    if multiplicative:
        return (s + b) * seasonal[idx]
    return s + b + seasonal[idx]


MOVING_MODELS = (
    "max", "min", "sum", "unweighted_avg", "std_dev",
    "linear_weighted_avg", "ewma", "holt", "holt_winters",
)


def moving_fn(
    buckets: DataFrame,
    metric: str,
    model: str,
    window: int,
    shift: int = 0,
    key: str = "key",
    out_name: str | None = None,
    partition_by: list[str] | None = None,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.3,
    period: int = 1,
    multiplicative: bool = False,
) -> DataFrame:
    """moving_fn over an ordered bucket frame.

    ``model`` is one of :data:`MOVING_MODELS` (the painless
    ``MovingFunctions.<name>`` helpers scripts call in the reference).
    Window = ``[i - window + shift, i + shift)`` buckets
    (MovFnPipelineAggregator.java:100)."""
    if model not in MOVING_MODELS:
        raise ValueError(f"unknown moving_fn model {model!r}")
    out_name = out_name or f"{metric}_{model}"
    part = partition_by or []
    w = (
        Window.partitionBy(*part).orderBy(F.asc(key))
        if part
        else Window.orderBy(F.asc(key))
    ).rowsBetween(shift - window, shift - 1)
    arr = F.collect_list(F.col(metric).cast(_D)).over(w)
    if model == "max":
        col = F.array_max(arr)
    elif model == "min":
        col = F.array_min(arr)
    elif model == "sum":
        col = _sum(arr)
    elif model == "unweighted_avg":
        col = _unweighted_avg(arr)
    elif model == "std_dev":
        col = _std_dev(arr)
    elif model == "linear_weighted_avg":
        col = _linear_weighted_avg(arr)
    elif model == "ewma":
        col = _ewma(arr, alpha)
    elif model == "holt":
        col = _holt(arr, alpha, beta)
    else:  # holt_winters

        @pandas_udf("double")
        def hw(vals: pd.Series) -> pd.Series:
            out = np.empty(len(vals))
            for i, v in enumerate(vals):
                r = holt_winters_py(
                    np.asarray(v, dtype="float64"),
                    alpha, beta, gamma, period, multiplicative,
                )
                out[i] = r
            return pd.Series(out).replace([math.inf, -math.inf], np.nan)

        col = hw(arr)
        col = F.when(F.isnan(col), F.lit(None)).otherwise(col)
    return buckets.withColumn(out_name, col)
