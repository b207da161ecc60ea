"""Watcher — scheduled search + condition + actions (alerting).

Reference: x-pack/plugin/watcher (WatcherService.java,
execution/ExecutionService.java): a watch is {trigger: schedule,
input: search, condition, actions}; each trigger firing runs the input
search, evaluates the condition over the result payload
(ctx.payload.*), and when met executes actions (index / logging /
email / slack / webhook). Conditions: always / never / compare
(CompareCondition.java:135 ops EQ NOT_EQ LT LTE GT GTE) /
array_compare (ArrayCompareCondition.java: a path to an array —
typically agg buckets — with a quantifier ``some`` | ``all``).

Spark-first shape: one trigger firing == one batch job (or one
foreachBatch of a Structured Streaming source at ingest cadence). The
input search is any DataFrame query, the condition compiles to a
Catalyst predicate + a tiny aggregate (never a driver loop over
buckets), and the ``index`` action writes alert rows to a sink table.
Email/slack/webhook are side-effect transports — out of scope here,
the alert-row sink is the cluster-scale integration point. At 100 TB
the input search is the expensive part and it is ordinary engine
query execution; condition + action add one filter and one write.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

_OPS: dict[str, Callable[[Column, object], Column]] = {
    "eq": lambda c, v: c == F.lit(v),
    "not_eq": lambda c, v: c != F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "lte": lambda c, v: c <= F.lit(v),
    "gt": lambda c, v: c > F.lit(v),
    "gte": lambda c, v: c >= F.lit(v),
}


def compare(col: str, op: str, value) -> Column:
    """CompareCondition on a payload column (LenientCompare is the
    reference's cross-type coercion; Spark's cast rules play that
    role here)."""
    if op not in _OPS:
        raise ValueError(f"unknown compare op {op!r}; one of {sorted(_OPS)}")
    return _OPS[op](F.col(col), value)


@dataclass
class Watch:
    """One watch: the input search produces the payload DataFrame;
    ``condition`` is a Catalyst predicate evaluated per payload row
    (array_compare element-wise semantics — agg buckets are rows
    here); ``quantifier`` gates the whole watch like the reference's
    array_compare: ``some`` fires when any row matches, ``all`` only
    when every row does. ``always``/``never`` = literal conditions."""

    watch_id: str
    input_fn: Callable[[SparkSession], DataFrame]
    condition: Column | bool = True
    quantifier: str = "some"
    metadata: dict = field(default_factory=dict)
    # payload transform applied AFTER the condition gate, before
    # actions (x-pack watcher transform/TransformRegistry — the
    # search/script transforms both reduce to a frame function here)
    transform_fn: Callable[[DataFrame], DataFrame] | None = None
    # acking/throttling (WatchStatus + ActionThrottler): once fired,
    # suppress re-fires for this many seconds; state lives in
    # ``status_dir`` as one tiny json per watch
    throttle_period_s: float = 0.0
    status_dir: str | None = None


def execute_watch(spark: SparkSession, watch: Watch) -> DataFrame:
    """Run one watch: input search -> condition -> index-action rows.

    Returns the alert payload (matching rows tagged with watch_id),
    EMPTY when the condition is not met — including under ``all`` when
    any row fails, matching ArrayCompareCondition. One job: the
    quantifier gate is computed as window-free aggregates joined back
    by a crossJoin of one literal row (broadcast, no driver collect
    of the payload)."""
    payload = watch.input_fn(spark)
    if watch.quantifier not in ("some", "all"):
        raise ValueError("quantifier must be 'some' or 'all'")
    cond = (
        F.lit(watch.condition) if isinstance(watch.condition, bool)
        else watch.condition
    )
    flagged = payload.withColumn("_met", cond)
    gate = flagged.agg(
        F.coalesce(F.sum(F.col("_met").cast("int")), F.lit(0)).alias("n_met"),
        F.count("*").alias("n_rows"),
    ).withColumn(
        "_fire",
        (F.col("n_met") > 0) if watch.quantifier == "some"
        else (F.col("n_rows") > 0) & (F.col("n_met") == F.col("n_rows")),
    ).select("_fire")
    out = (
        flagged.where(F.col("_met"))
        .crossJoin(F.broadcast(gate.where(F.col("_fire"))))
        .drop("_met", "_fire")
        .withColumn("watch_id", F.lit(watch.watch_id))
    )
    if watch.throttle_period_s > 0:
        # coordinator-side throttle decision (the reference's
        # ActionThrottler consults WatchStatus the same way): one tiny
        # status read + a 1-row fired check; payload stays lazy
        import json as _json
        import os as _os
        import time as _time

        if not watch.status_dir:
            raise ValueError("throttle_period_s needs status_dir")
        _os.makedirs(watch.status_dir, exist_ok=True)
        path = _os.path.join(watch.status_dir,
                             f"watch-{watch.watch_id}.json")
        last = 0.0
        if _os.path.exists(path):
            with open(path) as fh:
                last = float(_json.load(fh).get("last_fired", 0.0))
        now = _time.time()
        if now - last < watch.throttle_period_s:
            return out.limit(0)
        if out.limit(1).count() > 0:
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump({"last_fired": now}, fh)
            _os.replace(tmp, path)
    if watch.transform_fn is not None:
        out = watch.transform_fn(out)
    return out


def run_watches(spark: SparkSession, watches: list[Watch]) -> DataFrame:
    """One trigger sweep over many watches (the reference's
    ExecutionService executes triggered watches as a batch): union of
    per-watch alert rows. Schemas must align on the shared columns;
    each watch's payload keeps its own columns via unionByName with
    allowMissingColumns."""
    outs = [execute_watch(spark, w) for w in watches]
    if not outs:
        raise ValueError("no watches")
    acc = outs[0]
    for df in outs[1:]:
        acc = acc.unionByName(df, allowMissingColumns=True)
    return acc
