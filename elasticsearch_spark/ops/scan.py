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
    ``{"source": <painless or SQL>, "params": {...}, "fields":
    {col: expr, ...}}``. The reference runs painless per doc
    (TransportUpdateByQueryAction); here each target column compiles
    ONCE through scripts.maybe_painless into the projection, so the
    update executes inside whole-stage codegen. ``source`` alone
    updates the conventional single column named by
    ``script["target"]`` (default "value")."""
    df = source
    if query is not None:
        from elasticsearch_spark.search.dsl import compile_filter

        df = df.filter(compile_filter(query))
    if script is not None:
        from pyspark.sql import functions as F

        from elasticsearch_spark.scripts import maybe_painless

        params = script.get("params")
        fields = script.get("fields")
        if fields is None:
            fields = {script.get("target", "value"): script["source"]}
        # ONE withColumns: every expression reads the ORIGINAL doc
        # (painless doc['f'] snapshot semantics), not earlier updates
        df = df.withColumns({
            col: F.expr(maybe_painless(src, params))
            for col, src in fields.items()
        })
    if transform is not None:
        df = transform(df)
    df.write.mode(mode).parquet(dest_path)
