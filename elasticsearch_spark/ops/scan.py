"""Scan/pagination operators (SURVEY.md §2.1/§2.5).

  - sliced scroll (search/slice/SliceBuilder.java:44): split a scan
    into max parallel slices — ``id % max == slice`` (hash-free variant
    of DocValuesSliceQuery; deterministic + SQL-twin-able).
  - from/size offset pagination (SearchSourceBuilder.java:134-136).
  - track_total_hits (TopDocsCollectorContext.java:109-123): exact
    count up to a threshold, else a lower bound with relation "gte".
  - terminate_after (QueryPhase.java:208-211): stop collecting per
    partition after N docs (early exit inside the Arrow batch stream).
  - reindex (index/reindex/ReindexRequest.java): scan -> transform ->
    write, which in Spark is simply a job; provided for API parity.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def slice_scan(
    df: DataFrame, slice_id: int, max_slices: int, id_col: str = "doc_id"
) -> DataFrame:
    return df.filter(F.pmod(F.col(id_col), F.lit(max_slices)) == F.lit(slice_id))


def paginate(
    ordered: DataFrame, from_: int = 0, size: int = 10
) -> DataFrame:
    """Offset pagination over an already-ordered result."""
    out = ordered
    if from_ > 0:
        out = out.offset(from_)
    return out.limit(size)


def track_total_hits(df: DataFrame, threshold: int = 10000) -> dict:
    """Exact count if <= threshold else lower bound (the reference stops
    counting at the threshold; we cheaply cap with a limited count)."""
    capped = df.limit(threshold + 1).count()
    if capped <= threshold:
        return {"value": capped, "relation": "eq"}
    return {"value": threshold, "relation": "gte"}


def terminate_after(df: DataFrame, n: int) -> DataFrame:
    """Keep at most n rows per partition, stopping the scan early
    (Arrow-batched; batches after the quota are not materialized)."""
    import pandas as pd

    def take_n(batches):
        taken = 0
        for pdf in batches:
            if taken >= n:
                break
            room = n - taken
            out = pdf.iloc[:room]
            taken += len(out)
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(take_n, schema=schema)


def apply_update_script(df: DataFrame, script: dict) -> DataFrame:
    """Apply an _update_by_query ``script`` object to a frame.

    Three shapes, mirroring the reference's update-script contract
    (server/src/main/java/org/elasticsearch/action/update/UpdateHelper.java,
    TransportUpdateByQueryAction):

    - ``{"fields": {col: expr}}`` — engine-native multi-column form;
      every expression reads the ORIGINAL doc (one withColumns).
    - statement painless (``ctx._source.f = ...``, if/else, for-each,
      ctx.op) — symbolically compiled ONCE on the driver
      (scripts.compile_painless_update); ``ctx.op = 'noop'`` keeps the
      original values, ``'delete'`` drops the row. Per-row work runs
      inside whole-stage codegen — no Python interpreter.
    - expression painless with ``target`` — single-column update.
    """
    from pyspark.sql import functions as F

    from elasticsearch_spark.scripts import (
        compile_painless_update, is_statement_script, maybe_painless)

    params = script.get("params")
    fields = script.get("fields")
    if fields is not None:
        return df.withColumns({
            col: F.expr(maybe_painless(src, params))
            for col, src in fields.items()
        })
    source = script["source"]
    if is_statement_script(source):
        plan = compile_painless_update(source, params)
        sets = plan["set"]
        if plan["op"] is None:
            return df.withColumns(
                {f: F.expr(e) for f, e in sets.items()})
        # ctx.op: evaluate over the ORIGINAL doc, then guard every
        # update with it — noop keeps originals, delete drops the row
        df = df.withColumn("__op", F.expr(plan["op"]))
        df = df.withColumns({
            f: F.expr(f"CASE WHEN __op = 'noop' THEN {f} ELSE {e} END")
            for f, e in sets.items()
        })
        return df.filter("__op <> 'delete'").drop("__op")
    target = script.get("target", "value")
    return df.withColumn(target, F.expr(maybe_painless(source, params)))


def reindex(
    source: DataFrame,
    dest_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    query=None,
    mode: str = "overwrite",
    script: dict | None = None,
) -> None:
    """Reindex / update-by-query: scan -> (filter) -> transform -> write.

    ``script``: the _update_by_query request's ``script`` object —
    see :func:`apply_update_script` (expression AND statement painless,
    incl. ctx._source mutation + ctx.op noop/delete)."""
    df = source
    if query is not None:
        from elasticsearch_spark.search.dsl import compile_filter

        df = df.filter(compile_filter(query))
    if script is not None:
        df = apply_update_script(df, script)
    if transform is not None:
        df = transform(df)
    df.write.mode(mode).parquet(dest_path)


def count_api(df: DataFrame, query: dict | None = None) -> DataFrame:
    """The _count endpoint (rest/action/RestCountAction.java -> a size=0
    search counting matches): the query runs in FILTER context — no
    scoring, no fetch — so the plan is scan -> pushed predicate ->
    partial counts -> one-row final sum, never a top-k or a sort."""
    if query is not None:
        from elasticsearch_spark.search.dsl import compile_filter

        df = df.filter(compile_filter(query))
    return df.agg(F.count(F.lit(1)).cast("long").alias("count"))
