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


# ---------------------------------------------------------------------
# EQL text parser + non-sequenced `join` plan
# ---------------------------------------------------------------------
# The reference parses EQL text with an ANTLR grammar
# (x-pack/plugin/eql/src/main/java/org/elasticsearch/xpack/eql/parser/
# EqlParser.java) into logical plans including the non-sequenced Join
# (.../plan/logical/Join.java). This is an original recursive-descent
# parser over the subset the sequence/join executors support:
#
#   sequence by <field> [with maxspan=<n><s|m|h|d>]
#     [ <type> where <cond> ] ...  [until [ <type> where <cond> ]]
#   join by <field> [ ... ] ...    [until [ ... ]]
#   <type> where <cond>
#   ... | head N | tail N
#
# <cond>: and/or/not, comparisons (== != < <= > >=), in (...), the
# case-insensitive wildcard operator `:`, parens, double-quoted string
# literals, numbers, true/false/null.

_TOKEN = None  # placeholder for doc grep; tokens produced by _lex


def _lex(text: str) -> list[str]:
    import re as _re

    toks = _re.findall(
        r'"(?:[^"\\]|\\.)*"|==|!=|<=|>=|\||[()\[\]<>:=,]|[^\s()\[\]<>:=,|]+',
        text)
    return [t for t in toks if t.strip()]


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of EQL query")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.lower() != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")

    # --- condition grammar ---

    def cond(self):
        left = self.cond_and()
        while (self.peek() or "").lower() == "or":
            self.next()
            left = {"or": [left, self.cond_and()]}
        return left

    def cond_and(self):
        left = self.cond_not()
        while (self.peek() or "").lower() == "and":
            self.next()
            left = {"and": [left, self.cond_not()]}
        return left

    def cond_not(self):
        if (self.peek() or "").lower() == "not":
            self.next()
            return {"not": self.cond_not()}
        return self.primary()

    def literal(self):
        t = self.next()
        if t.startswith('"'):
            return t[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        low = t.lower()
        if low in ("true", "false"):
            return low == "true"
        if low == "null":
            return None
        try:
            return int(t)
        except ValueError:
            return float(t)

    def primary(self):
        t = self.peek()
        if t == "(":
            self.next()
            inner = self.cond()
            self.expect(")")
            return inner
        field = self.next()
        if field.lower() == "true":
            return {"true": True}
        op = self.next()
        if op.lower() == "in":
            self.expect("(")
            vals = [self.literal()]
            while self.peek() == ",":
                self.next()
                vals.append(self.literal())
            self.expect(")")
            return {"in": (field, vals)}
        if op not in ("==", "!=", "<", "<=", ">", ">=", ":"):
            raise ValueError(f"unsupported EQL operator {op!r}")
        return {"cmp": (field, op, self.literal())}


def _compile_cond(node, type_col: str) -> "F.Column":
    if "true" in node:
        return F.lit(True)
    if "or" in node:
        a, b = node["or"]
        return _compile_cond(a, type_col) | _compile_cond(b, type_col)
    if "and" in node:
        a, b = node["and"]
        return _compile_cond(a, type_col) & _compile_cond(b, type_col)
    if "not" in node:
        return ~_compile_cond(node["not"], type_col)
    if "in" in node:
        field, vals = node["in"]
        return F.col(field).isin(vals)
    field, op, lit = node["cmp"]
    c = F.col(field)
    if op == ":":
        # EQL's case-insensitive wildcard operator
        pat = str(lit).lower().replace("%", r"\%").replace("_", r"\_")
        pat = pat.replace("*", "%").replace("?", "_")
        return F.lower(c).like(pat)
    v = F.lit(lit)
    return {"==": c == v, "!=": c != v, "<": c < v,
            "<=": c <= v, ">": c > v, ">=": c >= v}[op]


_SPAN_UNIT = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_eql(text: str) -> dict:
    """EQL text -> plan dict {kind, by, maxspan, steps, until, pipes}.
    Each step is {type, cond} (cond = parsed tree or None)."""
    p = _Parser(_lex(text))
    kind = p.next().lower()
    plan: dict = {"kind": kind, "by": None, "maxspan": None,
                  "steps": [], "until": None, "pipes": []}

    def parse_step():
        p.expect("[")
        typ = p.next()
        cond = None
        if (p.peek() or "").lower() == "where":
            p.next()
            cond = p.cond()
        p.expect("]")
        return {"type": typ, "cond": cond}

    if kind in ("sequence", "join", "sample"):
        if (p.peek() or "").lower() == "by":
            p.next()
            plan["by"] = p.next()
        if (p.peek() or "").lower() == "with":
            if kind == "sample":
                raise ValueError("sample takes no with-options")
            p.next()
            t = p.next().lower()
            if not t.startswith("maxspan"):
                raise ValueError(f"unsupported with-option {t!r}")
            if "=" in t:
                span = t.split("=", 1)[1]
            else:
                p.expect("=")
                span = p.next().lower()
            unit = span[-1]
            plan["maxspan"] = (int(span[:-1]) * _SPAN_UNIT[unit]
                               if unit in _SPAN_UNIT else int(span))
        while p.peek() == "[":
            step = parse_step()
            runs = 1
            if (p.peek() or "").lower() == "with":
                # `[...] with runs=N` (EqlParser sequence-term runs):
                # the step repeats N times, so the matcher needs N
                # successive hits — duplicating the step is exactly the
                # reference's plan expansion
                p.next()
                t = p.next().lower()
                if not t.startswith("runs"):
                    raise ValueError(f"unsupported step option {t!r}")
                if "=" in t and t != "runs":
                    runs = int(t.split("=", 1)[1])
                else:
                    p.expect("=")
                    runs = int(p.next())
                if kind != "sequence":
                    raise ValueError("runs is only valid in sequence")
                if not 1 <= runs <= 100:
                    raise ValueError(f"runs must be in [1, 100], got {runs}")
            plan["steps"].extend([dict(step) for _ in range(runs)])
        if (p.peek() or "").lower() == "until":
            if kind == "sample":
                raise ValueError("sample takes no until")
            p.next()
            plan["until"] = parse_step()
        if len(plan["steps"]) < 2:
            raise ValueError(f"{kind} needs at least two steps")
        if kind == "sample":
            # reference grammar: sample REQUIRES a join key and takes
            # 2-5 filters (EqlParser sampleQuery rule)
            if plan["by"] is None:
                raise ValueError("sample requires a `by` key")
            if len(plan["steps"]) > 5:
                raise ValueError("sample takes at most 5 filters")
    else:
        # simple event query: `<type> where <cond>`
        plan["kind"] = "event"
        cond = None
        if (p.peek() or "").lower() == "where":
            p.next()
            cond = p.cond()
        plan["steps"] = [{"type": kind, "cond": cond}]

    while p.peek() == "|":
        p.next()
        pk = p.next().lower()
        if pk not in ("head", "tail"):
            raise ValueError(f"unsupported pipe {pk!r}")
        plan["pipes"].append((pk, int(p.next())))
    if p.peek() is not None:
        raise ValueError(f"trailing tokens at {p.peek()!r}")
    return plan


def _step_pred(step: dict, type_col: str):
    pred = F.lit(True)
    if step["type"].lower() != "any":
        pred = F.col(type_col) == F.lit(step["type"])
    if step["cond"] is not None:
        pred = pred & _compile_cond(step["cond"], type_col)
    return pred


def join_keys(
    events: DataFrame,
    steps: list,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    until=None,
) -> DataFrame:
    """EQL non-sequenced ``join`` (plan/logical/Join.java): a key
    matches when it has at least one event per step, in ANY order; the
    reported event per step is the earliest ((ts, id) lexicographic).
    ``until`` bounds the search: only events strictly before the key's
    FIRST until-event count (the matcher's state would have been
    expired at that point — simplification of the reference's streaming
    expiry, same results for first-match-per-step semantics).

    Shape: union of step-filtered scans tagged with the step ordinal,
    ONE groupBy(key) with per-step conditional min-struct aggregation
    (map-side partial), then an all-steps-present filter — a single
    shuffle of (key, step, ts, id) rows, no step-to-step join."""
    tagged = None
    for i, step in enumerate(steps):
        part = events.filter(
            step if isinstance(step, F.Column)
            else (F.col(type_col) == F.lit(step)) if isinstance(step, str)
            else _step_pred(step, type_col)
        ).select(
            F.col(by).alias("k"), F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"), F.lit(i).alias("_step"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    if until is not None:
        upred = (until if isinstance(until, F.Column)
                 else (F.col(type_col) == F.lit(until)) if isinstance(until, str)
                 else _step_pred(until, type_col))
        first_u = (events.filter(upred)
                   .groupBy(F.col(by).alias("k"))
                   .agg(F.min(ts_col).alias("_uts")))
        tagged = (tagged.join(first_u, "k", "left")
                  .filter(F.col("_uts").isNull() | (F.col("_ts") < F.col("_uts")))
                  .drop("_uts"))
    n = len(steps)
    aggs = [
        F.min(F.when(F.col("_step") == i,
                     F.struct(F.col("_ts"), F.col("_id")))).alias(f"_s{i}")
        for i in range(n)
    ]
    out = tagged.groupBy("k").agg(*aggs)
    for i in range(n):
        out = out.filter(F.col(f"_s{i}").isNotNull())
    cols = [F.col("k").alias(by)]
    for i in range(n):
        cols += [F.col(f"_s{i}._ts").alias(f"ts_{i}"),
                 F.col(f"_s{i}._id").alias(f"id_{i}")]
    return out.select(*cols)


def eql(
    events: DataFrame,
    text: str,
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Execute an EQL text query (parser above + the sequence/join
    executors). ``by`` defaults apply when the text has no `by`."""
    plan = parse_eql(text)
    key = plan["by"] or by
    if plan["kind"] == "event":
        return events.filter(_step_pred(plan["steps"][0], type_col))
    steps = [_step_pred(s, type_col) for s in plan["steps"]]
    until = (_step_pred(plan["until"], type_col)
             if plan["until"] is not None else None)
    if plan["kind"] == "sequence":
        out = sequence(events, steps, by=key, ts_col=ts_col, id_col=id_col,
                       type_col=type_col, maxspan_seconds=plan["maxspan"],
                       until=until)
    else:
        # `join` and `sample` share the one-event-per-step-any-order
        # plan; sample differs in the reference only by which concrete
        # events it exhibits (up to 10 heuristic samples per key vs our
        # deterministic earliest-per-step sample — documented
        # divergence; the matching KEY SET is identical).
        out = join_keys(events, plan["steps"], by=key, ts_col=ts_col,
                        id_col=id_col, type_col=type_col,
                        until=plan["until"])
    for pk, n in plan["pipes"]:
        out = pipe(out, pk, n)
    return out
