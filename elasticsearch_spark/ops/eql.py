"""EQL-style event sequence correlation.

Reference: x-pack/plugin/eql/.../sequence/SequenceMatcher.java:27 —
stateful ordered matching of event steps sharing a join key within
``maxspan``. Spark re-creation: each step is an AS-OF extension — for
every partial sequence, the EARLIEST step-(i+1) event with the same
key, a strictly later timestamp, and overall span <= maxspan.

The as-of step is NOT a join: partials and step events are unioned
into one frame and scanned with a single running-min window per key
(ordered ts desc), so a hot key with P partials and E step events
costs O((P+E) log(P+E)) sort work instead of the P×E rows an equi-join
would materialize before trimming — the same bounded-state shape as
the reference's streaming matcher. Deterministic and SQL-expressible
(window functions), so oracle-checkable.
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
        # as-of extension via ONE ordered scan per key: tag partials
        # (_e=0, sort time = ts_{i-1}) and step-i events (_e=1), order
        # by time DESC with partials FIRST at equal time (strict '>'
        # means a same-timestamp event does not qualify), and take the
        # running min (ts_i, id_i) struct over the PRECEDING rows —
        # i.e. over exactly the events strictly later than the partial,
        # with the (ts, id) lexicographic min giving the earliest
        # continuation and its id tie-break.
        p = cur.withColumn("_t", F.col(f"ts_{i-1}")).withColumn(
            "_e", F.lit(0)
        )
        e = nxt.withColumn("_t", F.col(f"ts_{i}")).withColumn("_e", F.lit(1))
        u = p.unionByName(e, allowMissingColumns=True)
        w = (
            Window.partitionBy("k")
            .orderBy(F.desc("_t"), F.asc("_e"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cont = F.min(
            F.when(
                F.col("_e") == 1,
                F.struct(F.col(f"ts_{i}"), F.col(f"id_{i}")),
            )
        ).over(w)
        cur = (
            u.withColumn("_c", cont)
            .filter((F.col("_e") == 0) & F.col("_c").isNotNull())
            .withColumn(f"ts_{i}", F.col("_c").getField(f"ts_{i}"))
            .withColumn(f"id_{i}", F.col("_c").getField(f"id_{i}"))
            .drop("_t", "_e", "_c")
        )
        if maxspan_seconds is not None:
            # events later than the earliest continuation are later
            # still, so filtering after the as-of pick is equivalent to
            # constraining the pick itself
            cur = cur.filter(
                F.unix_timestamp(F.col(f"ts_{i}"))
                - F.unix_timestamp(F.col("ts_0"))
                <= maxspan_seconds
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


def pipe(matches: DataFrame, kind: str, n: int,
         ts_col: str = "ts_0", id_col: str = "id_0") -> DataFrame:
    """EQL pipes ``| head n`` / ``| tail n`` (reference:
    x-pack/plugin/eql/.../plan/logical/Head.java, Tail.java; the only
    pipes the language ships). Ordering is the sequence's first-event
    time with the event id as tie-break, ascending for head and
    descending for tail — one TakeOrderedAndProject, no full sort."""
    if kind == "head":
        return matches.orderBy(F.asc(ts_col), F.asc(id_col)).limit(n)
    if kind == "tail":
        return matches.orderBy(F.desc(ts_col), F.desc(id_col)).limit(n)
    raise ValueError(f"unknown EQL pipe {kind!r}")
