"""Snapshot / restore + field_caps over on-disk indexes.

Reference: repository-level snapshots (es/repositories/,
RestSnapshotAction surface) and the _field_caps endpoint
(action/fieldcaps/FieldCapabilitiesRequest.java). The reference
snapshots Lucene segment files into a blob repository with an
incremental manifest; here an index generation IS a directory of
immutable parquet segment files + a JSON commit point, so a snapshot
is a manifest-first copy of those files and restore is a copy back —
the same "files are immutable, the manifest is the commit point"
contract, without a blob-store dependency.

Scale note: on a real deployment the copy is `hadoop distcp` /
object-store server-side copy of the SAME immutable files; nothing
here rewrites data, so snapshotting is O(metadata) + byte transfer,
never a Spark job.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from elasticsearch_spark.index.builder import index_meta

_COPY_DIRS = (
    "postings", "term_dict", "coll_stats", "doc_lengths", "checkpoints",
    "segments", "bigrams_text",
)


def snapshot_index(index_path: str, repo_path: str, name: str) -> dict:
    """Copy an index generation into ``repo_path/name``. The snapshot
    manifest (written LAST, the commit point) records what was copied;
    a partial copy without a manifest is invisible to restore."""
    meta = index_meta(index_path)  # validates it IS an index
    dest = os.path.join(repo_path, name)
    if os.path.exists(os.path.join(dest, "snapshot.json")):
        raise ValueError(f"snapshot {name!r} already exists")
    os.makedirs(dest, exist_ok=True)
    copied = []
    for d in _COPY_DIRS:
        src = os.path.join(index_path, d)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(dest, d), dirs_exist_ok=True)
            copied.append(d)
    shutil.copy2(os.path.join(index_path, "index_meta.json"), dest)
    manifest = {
        "name": name,
        "state": "SUCCESS",
        "index_meta": meta,
        "dirs": copied,
        "ts": time.time(),
    }
    tmp = os.path.join(dest, ".snapshot.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(dest, "snapshot.json"))
    return manifest


def list_snapshots(repo_path: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo_path):
        return out
    for name in sorted(os.listdir(repo_path)):
        p = os.path.join(repo_path, name, "snapshot.json")
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def restore_index(repo_path: str, name: str, target_path: str) -> dict:
    """Materialize a snapshot as a fresh index directory (the restored
    index is a new generation — the snapshot stays immutable)."""
    src = os.path.join(repo_path, name)
    with open(os.path.join(src, "snapshot.json")) as f:
        manifest = json.load(f)
    if manifest.get("state") != "SUCCESS":
        raise ValueError(f"snapshot {name!r} is not restorable")
    os.makedirs(target_path, exist_ok=True)
    for d in manifest["dirs"]:
        shutil.copytree(
            os.path.join(src, d), os.path.join(target_path, d),
            dirs_exist_ok=True,
        )
    shutil.copy2(os.path.join(src, "index_meta.json"), target_path)
    return manifest


def field_caps(index_path: str) -> list[dict]:
    """_field_caps: per indexed field, its analyzer and capabilities
    (every inverted-index field here is searchable + aggregatable on
    term statistics — the subset the engine indexes)."""
    meta = index_meta(index_path)
    return [
        {
            "field": fld,
            "type": "text",
            "analyzer": analyzer,
            "searchable": True,
            "aggregatable": True,
        }
        for fld, analyzer in sorted(meta.get("fields", {}).items())
    ]


def mount_snapshot(spark, repo_path: str, name: str):
    """Searchable snapshot: query an index STRAIGHT from the snapshot
    repository, zero copy (x-pack searchable-snapshots
    SearchableSnapshotsService — the reference mounts blob-store
    segment files as a read-only shard instead of restoring them).

    Here a snapshot already holds the index's immutable parquet
    segments, so mounting is just ``load_index`` on the snapshot dir:
    scans read the repository files directly (on a cluster, straight
    from the object store). The mounted index is READ-ONLY —
    ``assert_writable`` refuses ingest/compaction on any directory
    carrying a ``snapshot.json`` manifest; ``restore_index`` is the
    write-me-back path."""
    from elasticsearch_spark.index.builder import load_index

    src = os.path.join(repo_path, name)
    mpath = os.path.join(src, "snapshot.json")
    if not os.path.exists(mpath):
        raise ValueError(f"no snapshot {name!r} in {repo_path}")
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("state") != "SUCCESS":
        raise ValueError(f"snapshot {name!r} is not mountable")
    return load_index(spark, src)


# ---------------------------------------------------------------------
# freeze / unfreeze (x-pack/plugin/frozen-indices
# TransportFreezeIndexAction): a frozen index is read-only and its
# shards release memory between searches. Here the memory side is
# automatic (no long-lived per-index state — DataFrames are lazy), so
# freezing is the WRITE BLOCK: a marker file writers check via
# ops/ccr.assert_writable. Searches keep working unchanged.
# ---------------------------------------------------------------------

def freeze_index(index_path: str) -> dict:
    """Mark the index frozen (write-blocked). Idempotent."""
    index_meta(index_path)  # must be an index
    marker = os.path.join(index_path, "frozen.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"frozen_at": time.time()}, f)
    os.replace(tmp, marker)
    return {"frozen": True}


def unfreeze_index(index_path: str) -> dict:
    marker = os.path.join(index_path, "frozen.json")
    if os.path.exists(marker):
        os.remove(marker)
    return {"frozen": False}


def is_frozen(index_path: str) -> bool:
    return os.path.exists(os.path.join(index_path, "frozen.json"))


# ---------------------------------------------------------------------
# SLM — snapshot lifecycle policies (x-pack/plugin/ilm +
# core/.../slm/SnapshotLifecyclePolicy.java): scheduled snapshots named
# from a pattern, pruned by a retention rule. The scheduler is external
# (any cron / Airflow); `slm_run` is the idempotent body it invokes.
# ---------------------------------------------------------------------

def slm_run(
    index_path: str,
    repo_path: str,
    policy: dict,
    now: float | None = None,
) -> dict:
    """Execute one SLM cycle: take a snapshot named
    ``<name>-<utc stamp>`` and prune beyond ``retention.max_count`` /
    older than ``retention.max_age_days`` (expire_after). Returns
    {taken, deleted}."""
    name = policy.get("name", "slm")
    retention = policy.get("retention", {})
    now = time.time() if now is None else float(now)
    stamp = time.strftime("%Y%m%d%H%M%S", time.gmtime(now))
    snap = f"{name}-{stamp}"
    taken = snapshot_index(index_path, repo_path, snap)
    deleted = []
    mine = sorted(
        (s for s in list_snapshots(repo_path)
         if s["name"].startswith(f"{name}-")),
        key=lambda s: s["name"])
    max_age = retention.get("max_age_days")
    if max_age is not None:
        cutoff = now - float(max_age) * 86400.0
        for s in list(mine):
            if s.get("ts", now) < cutoff and s["name"] != snap:
                deleted.append(s["name"])
                shutil.rmtree(os.path.join(repo_path, s["name"]))
                mine.remove(s)
    max_count = retention.get("max_count")
    if max_count is not None and len(mine) > int(max_count):
        for s in mine[: len(mine) - int(max_count)]:
            if s["name"] == snap:
                continue
            deleted.append(s["name"])
            shutil.rmtree(os.path.join(repo_path, s["name"]))
    return {"taken": taken["name"], "deleted": deleted}
