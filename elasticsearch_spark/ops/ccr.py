"""CCR — cross-cluster replication as segment-level index following.

Reference: x-pack/plugin/ccr (ShardFollowNodeTask / follow/
TransportPutFollowAction): a follower index continuously pulls the
leader's newly-written operations, tracked by sequence number; the
follower is read-only while following and ``unfollow`` promotes it to
a regular index.

Spark shape: this engine's index layout is already segment-shaped
(streaming/refresh.py writes each micro-batch as its own immutable
``segments/batch=<id>`` directory, and the base build lives under
``postings/``). Following therefore replicates at the SEGMENT level —
the unit the reference also ships for restore-from-remote — rather
than re-sending per-doc operations (documented divergence: op-level
replay is what a soft-deletes translog enables; file-level is the
remote-recovery path. Both converge to identical searchable state, and
segment shipping is the bandwidth-optimal shape for an append-only
corpus at 100 TB: bytes move once, already compressed and sorted).

``follow`` bootstraps the follower (base postings + stats + meta),
``poll_follow`` copies segment batches that appeared on the leader
since the follower's checkpoint (idempotent — a re-poll after a crash
re-copies into the same directory names), ``unfollow`` promotes. Reads
on a follower are ordinary ``load_index`` reads; writes are refused
while ``follower_meta.json`` exists.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

_FOLLOWER_META = "follower_meta.json"
_BASE_ITEMS = ("postings", "term_dict", "coll_stats", "index_meta.json")


def _copytree(src: str, dst: str) -> None:
    if os.path.isdir(src):
        shutil.copytree(src, dst, dirs_exist_ok=True)
    else:
        shutil.copy2(src, dst)


def is_follower(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, _FOLLOWER_META))


def assert_writable(index_dir: str) -> None:
    """Writers (ingest_batch / compact) call this: a following index is
    read-only, like the reference's follower shards — and so is a
    mounted snapshot (x-pack searchable-snapshots: the blob store is
    immutable; writes would corrupt every mount sharing it)."""
    if is_follower(index_dir):
        raise ValueError(
            f"{index_dir} is a follower index (read-only); unfollow first")
    if os.path.exists(os.path.join(index_dir, "snapshot.json")):
        raise ValueError(
            f"{index_dir} is a snapshot (read-only); restore_index to a "
            "new directory to write")
    if os.path.exists(os.path.join(index_dir, "frozen.json")):
        # x-pack frozen-indices: frozen = write-blocked, still searchable
        raise ValueError(
            f"{index_dir} is frozen (read-only); unfreeze_index first")


def _leader_batches(leader_dir: str) -> list[int]:
    seg = os.path.join(leader_dir, "segments")
    if not os.path.isdir(seg):
        return []
    out = []
    for name in os.listdir(seg):
        if name.startswith("batch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def follow(spark: SparkSession, leader_dir: str, follower_dir: str) -> dict:
    """Bootstrap a follower: copy the leader's base segments + stats
    and record the follow checkpoint. Returns the follower meta."""
    if os.path.exists(os.path.join(follower_dir, "index_meta.json")):
        raise ValueError(f"{follower_dir} already holds an index")
    os.makedirs(follower_dir, exist_ok=True)
    for item in _BASE_ITEMS:
        src = os.path.join(leader_dir, item)
        if os.path.exists(src):
            _copytree(src, os.path.join(follower_dir, item))
    synced = []
    for b in _leader_batches(leader_dir):
        _copytree(os.path.join(leader_dir, "segments", f"batch={b}"),
                  os.path.join(follower_dir, "segments", f"batch={b}"))
        synced.append(b)
    meta = {"leader_dir": os.path.abspath(leader_dir),
            "synced_batches": synced}
    tmp = os.path.join(follower_dir, f".{_FOLLOWER_META}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(follower_dir, _FOLLOWER_META))
    return meta


def poll_follow(spark: SparkSession, follower_dir: str) -> dict:
    """One follow poll: copy newly-appeared leader segment batches and
    refresh the follower's global stats. Idempotent (same batch dirs
    are overwritten in place on replay). Returns the updated meta."""
    path = os.path.join(follower_dir, _FOLLOWER_META)
    if not os.path.exists(path):
        raise ValueError(f"{follower_dir} is not a follower")
    with open(path) as f:
        meta = json.load(f)
    leader_dir = meta["leader_dir"]
    have = set(meta["synced_batches"])
    new = [b for b in _leader_batches(leader_dir) if b not in have]
    for b in new:
        _copytree(os.path.join(leader_dir, "segments", f"batch={b}"),
                  os.path.join(follower_dir, "segments", f"batch={b}"))
    if new:
        from elasticsearch_spark.streaming.refresh import refresh_stats

        refresh_stats(spark, follower_dir)
        meta["synced_batches"] = sorted(have | set(new))
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)
    return meta


def unfollow(follower_dir: str) -> None:
    """Promote the follower to a regular writable index (the
    reference's pause + close + unfollow sequence)."""
    path = os.path.join(follower_dir, _FOLLOWER_META)
    if not os.path.exists(path):
        raise ValueError(f"{follower_dir} is not a follower")
    os.remove(path)
