"""EQL-style event sequence correlation.

Reference: x-pack/plugin/eql/.../sequence/SequenceMatcher.java:27 —
stateful ordered matching of event steps sharing a join key within
``maxspan``. Spark re-creation: windowed first-match joins — for each
step-i match, the EARLIEST step-(i+1) event with the same key, a later
timestamp, and overall span <= maxspan. Deterministic and
SQL-expressible (window row_number), so oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sequence(
    events: DataFrame,
    steps: list,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    maxspan_seconds: int | None = None,
    until: object | None = None,
) -> DataFrame:
    """Match ordered event sequences per key.

    steps: list of event_type values (or filter Columns). Returns one
    row per matched sequence: (by, ts_0..ts_{n-1}, id_0..id_{n-1}),
    where each step event is the earliest qualifying continuation
    (ties by event id).

    ``until`` (an event_type value or filter Column — EQL's `until`
    clause, SequenceMatcher's expiration events): a sequence is
    discarded when an until-event for the same key occurs strictly
    between its first and last step events (the pending state would
    have been expired before completing). One extra left-anti join.
    """
    def step_df(i, step):
        pred = (F.col(type_col) == F.lit(step)) if isinstance(step, str) else step
        return events.filter(pred).select(
            F.col(by).alias("k"),
            F.col(ts_col).alias(f"ts_{i}"),
            F.col(id_col).alias(f"id_{i}"),
        )

    cur = step_df(0, steps[0])
    for i, step in enumerate(steps[1:], start=1):
        nxt = step_df(i, step)
        joined = cur.join(nxt, "k").filter(F.col(f"ts_{i}") > F.col(f"ts_{i-1}"))
        if maxspan_seconds is not None:
            joined = joined.filter(
                F.unix_timestamp(F.col(f"ts_{i}"))
                - F.unix_timestamp(F.col("ts_0"))
                <= maxspan_seconds
            )
        # earliest continuation per partial sequence
        w = Window.partitionBy("k", *[f"id_{j}" for j in range(i)]).orderBy(
            F.asc(f"ts_{i}"), F.asc(f"id_{i}")
        )
        cur = (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if until is not None:
        last = len(steps) - 1
        upred = (
            (F.col(type_col) == F.lit(until)) if isinstance(until, str) else until
        )
        u = events.filter(upred).select(
            F.col(by).alias("_uk"), F.col(ts_col).alias("_uts")
        )
        cur = cur.join(
            u,
            (F.col("k") == F.col("_uk"))
            & (F.col("_uts") > F.col("ts_0"))
            & (F.col("_uts") < F.col(f"ts_{last}")),
            "left_anti",
        )
    return cur.withColumnRenamed("k", by)
