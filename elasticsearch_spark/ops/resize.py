"""Index resize: the _shrink API.

Reference: server/.../action/admin/indices/shrink/ (ResizeRequest,
TransportResizeAction) — shrink requires the target shard count to be
a FACTOR of the source count, precisely because ES routes with
``hash % num_shards``: when target | source, ``h % target ==
(h % source) % target``, so every source shard maps wholesale onto one
target shard and shrinking is a file-level regroup, never a per-doc
re-route. This engine uses the identical routing
(``pmod(xxhash64(doc_id), P)``, index/builder.py), so the same factor
rule gives the same zero-rehash shrink.

Spark shape: ONE pass over the posting blocks rewriting
``part_id % target`` (a projection — block payloads, doc ids, and all
global statistics are untouched), written back partitioned by the new
part_id. Unfolded streaming segments fold into the shrunk postings in
the same pass. term_dict / coll_stats copy verbatim. The new
``index_meta.json`` is written LAST (the commit point, as everywhere
else in this engine).

split (increasing shards) is NOT implemented: it requires re-routing
every posting entry by ``xxhash64(doc_id) % newP``, i.e. a decode +
re-encode of every block — a rebuild, which ``build_index`` already
does better. The reference's split also rebuilds (it re-indexes into
the target under the hood via hash-partition filtering). Documented
divergence: we refuse instead of silently rebuilding.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession, functions as F

from elasticsearch_spark.index.builder import index_meta, load_index


def shrink_index(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_shards: int,
) -> dict:
    """Shrink ``src_dir`` into ``dst_dir`` with ``target_shards``
    partitions. Returns the new index meta."""
    from elasticsearch_spark.ops.ccr import assert_writable

    meta = dict(index_meta(src_dir))
    p = int(meta["num_partitions"])
    t = int(target_shards)
    if t <= 0 or p % t != 0:
        raise ValueError(
            f"target shard count {t} must be a positive factor of the "
            f"source's {p} (ES ResizeRequest rule)")
    if os.path.exists(os.path.join(dst_dir, "index_meta.json")):
        raise ValueError(f"{dst_dir} already holds an index")
    assert_writable(src_dir)  # followers/snapshots shrink via restore
    os.makedirs(dst_dir, exist_ok=True)

    idx = load_index(spark, src_dir)
    (
        idx.postings.withColumn(
            "part_id", F.pmod(F.col("part_id"), F.lit(t)).cast("int"))
        .write.partitionBy("part_id")
        .parquet(os.path.join(dst_dir, "postings"))
    )
    dl = os.path.join(src_dir, "doc_lengths")
    if os.path.isdir(dl):
        (
            spark.read.parquet(dl).withColumn(
                "part_id", F.pmod(F.col("part_id"), F.lit(t)).cast("int"))
            .write.partitionBy("part_id")
            .parquet(os.path.join(dst_dir, "doc_lengths"))
        )
    for d in ("term_dict", "coll_stats", "bigrams_text"):
        sd = os.path.join(src_dir, d)
        if os.path.isdir(sd):
            shutil.copytree(sd, os.path.join(dst_dir, d))

    meta["num_partitions"] = t
    meta["postings_dir"] = "postings"
    meta["folded_batches"] = []  # segments folded into the rewrite
    meta["shrunk_from"] = {"path": src_dir, "num_partitions": p}
    tmp = os.path.join(dst_dir, ".index_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(dst_dir, "index_meta.json"))
    return meta
