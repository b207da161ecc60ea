"""_bulk API analogue: a mixed batch of index/create/update/delete
actions applied to a document table in one plan.

Reference contract: server/src/main/java/org/elasticsearch/action/bulk/
TransportBulkAction.java + TransportShardBulkAction.java (per-item
results, op types) and action/update/UpdateHelper.java (partial-doc
merge). The reference executes a bulk as per-shard sub-batches against
live Lucene engines; the Spark-first shape is a set-algebra rewrite of
the doc table — the batch is request-sized (driver-side list, like an
HTTP bulk body), so every auxiliary frame is broadcast-sized by
construction and the ONLY full-table work is one broadcast anti-join +
one broadcast left-join + a tiny union, all in a single plan:

    final = (docs ⟕ update-overrides)           # merge partial docs
            ⟈ (deleted ∪ replaced ids)          # drop removed/replaced
            ∪ (new full docs)                   # index/create payloads

At 100 TB the doc table never shuffles: the anti/left joins broadcast
the id sets and the plan stays a single scan.

Sequential same-id semantics (the reference applies items in order
within a shard batch) are intentionally out of scope: duplicate ids in
one batch raise loudly rather than silently reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bulk_apply", "bulk_apply_frames"]

_OPS = ("index", "create", "update", "delete")


def bulk_apply(
    docs: DataFrame,
    actions: list[dict],
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[dict]]:
    """Apply a bulk ``actions`` batch to ``docs``.

    Each action is ``{op: body}`` with op in index/create/update/delete:

    - ``{"index": {id_col: .., **fields}}`` — upsert (created|updated)
    - ``{"create": {...}}`` — insert; version_conflict if the id exists
    - ``{"update": {id_col: .., "doc": {partial fields}}}`` — merge
      onto the existing doc; document_missing if absent
    - ``{"delete": {id_col: ..}}`` — remove; not_found if absent

    Returns ``(new_docs, items)``: the rewritten doc table (same
    schema; columns absent from new payloads are NULL) and the per-item
    result list mirroring the reference's bulk response items.
    """
    spark = docs.sparkSession
    parsed: list[tuple[str, dict]] = []
    seen_ids: set = set()
    for a in actions:
        if len(a) != 1 or next(iter(a)) not in _OPS:
            raise ValueError(f"bulk action must be one of {_OPS}: {a}")
        op, body = next(iter(a.items()))
        if id_col not in body:
            raise ValueError(f"bulk {op} body needs {id_col}")
        did = body[id_col]
        if did in seen_ids:
            raise ValueError(
                f"duplicate id {did} in one bulk batch (sequential "
                "same-id semantics unsupported — split the batch)")
        seen_ids.add(did)
        parsed.append((op, body))

    # ONE bounded existence probe: the touched-id set is request-sized
    ids_df = spark.createDataFrame(
        [(i,) for i in sorted(seen_ids)], f"{id_col} long")
    existing = {
        r[0] for r in docs.join(
            F.broadcast(ids_df), id_col, "left_semi")
        .select(id_col).distinct().collect()
    }

    items: list[dict] = []
    new_rows: list[dict] = []          # full replacement/new payloads
    update_overrides: list[dict] = []  # partial merges onto live docs
    drop_ids: list = []                # originals to remove
    for op, body in parsed:
        did = body[id_col]
        if op == "delete":
            if did in existing:
                drop_ids.append(did)
                items.append({id_col: did, "result": "deleted"})
            else:
                items.append({id_col: did, "result": "not_found"})
        elif op == "index":
            drop_ids.append(did)
            new_rows.append(body)
            items.append({
                id_col: did,
                "result": "updated" if did in existing else "created"})
        elif op == "create":
            if did in existing:
                items.append({
                    id_col: did,
                    "error": "version_conflict_engine_exception"})
            else:
                new_rows.append(body)
                items.append({id_col: did, "result": "created"})
        else:  # update
            if did not in existing:
                items.append({
                    id_col: did,
                    "error": "document_missing_exception"})
            else:
                update_overrides.append(
                    {id_col: did, **body.get("doc", {})})
                items.append({id_col: did, "result": "updated"})

    out = docs
    schema_cols = docs.columns
    if update_overrides:
        ov_cols = sorted({k for o in update_overrides for k in o})
        bad = [c for c in ov_cols if c not in schema_cols]
        if bad:
            raise ValueError(f"update doc fields not in schema: {bad}")
        ov = spark.createDataFrame(
            [tuple(o.get(c) for c in ov_cols) for o in update_overrides],
            docs.select(*ov_cols).schema,
        )
        renamed = ov.select(
            F.col(id_col),
            *[F.col(c).alias(f"__ov_{c}") for c in ov_cols
              if c != id_col])
        out = out.join(F.broadcast(renamed), id_col, "left")
        out = out.select(
            *[(F.coalesce(F.col(f"__ov_{c}"), F.col(c)).alias(c)
               if f"__ov_{c}" in out.columns and c != id_col
               else F.col(c))
              for c in schema_cols])
    if drop_ids:
        drop_df = spark.createDataFrame(
            [(i,) for i in drop_ids], f"{id_col} long")
        out = out.join(F.broadcast(drop_df), id_col, "left_anti")
    if new_rows:
        bad = [c for r in new_rows for c in r if c not in schema_cols]
        if bad:
            raise ValueError(f"indexed doc fields not in schema: {bad}")
        wide = [tuple(r.get(c) for c in schema_cols) for r in new_rows]
        new_df = spark.createDataFrame(wide, docs.schema)
        out = out.unionByName(new_df)
    return out, items


def bulk_apply_frames(
    docs: DataFrame,
    upserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster-scale bulk: the same set-algebra as :func:`bulk_apply`
    but with DataFrames as the action sources, for batches far beyond a
    request body (the reference streams these through _bulk in chunks;
    one relational rewrite replaces the chunk loop).

    ``upserts`` replaces-or-inserts whole rows (same schema as docs,
    missing columns NULL); ``deletes`` is a frame of ids. Plan shape:
    docs LEFT ANTI JOIN (upsert ids ∪ delete ids) UNION upserts — when
    the action side is small Spark broadcasts it, when it is huge both
    sides hash-partition on the id and co-shuffle; either way the doc
    payload columns move at most once and only for surviving rows.
    Within-batch duplicate upsert ids raise (same contract as
    bulk_apply).
    """
    out = docs
    drop = None
    if deletes is not None:
        drop = deletes.select(id_col)
    if upserts is not None:
        n = upserts.count()
        nd = upserts.select(id_col).distinct().count()
        if n != nd:
            raise ValueError(
                f"bulk upserts contain {n - nd} duplicate ids — "
                "sequential same-id semantics unsupported")
        ids = upserts.select(id_col)
        drop = ids if drop is None else drop.unionByName(ids)
    if drop is not None:
        out = out.join(drop, id_col, "left_anti")
    if upserts is not None:
        missing = [c for c in docs.columns if c not in upserts.columns]
        filled = upserts
        for c in missing:
            filled = filled.withColumn(
                c, F.lit(None).cast(docs.schema[c].dataType))
        out = out.unionByName(filled.select(*docs.columns))
    return out
