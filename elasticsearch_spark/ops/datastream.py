"""Data streams + ILM rollover/retention, Spark-first.

Reference: x-pack/plugin/data-streams (DataStream metadata: a named
append-only stream backed by generation indices `.ds-<name>-<gen>`,
writes routed to the current generation only), the rollover action
(server RolloverRequest conditions: max_docs / max_age), and the ILM
delete phase (x-pack/plugin/ilm — generations past retention are
dropped whole).

Spark-first translation: a generation is a parquet directory; the
stream keeps a tiny JSON manifest with per-generation doc counts and
timestamp min/max. That manifest is the scale lever:

  - writes only ever touch the OPEN generation directory (bounded-size
    compaction units — no table-wide rewrite at 100 TB),
  - a time-range query consults the manifest and unions ONLY the
    generations whose [min_ts, max_ts] overlap the range — whole
    generations are pruned before any file listing,
  - retention (ILM delete) drops closed generation directories
    atomically; the open generation is never deleted.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


class DataStream:
    def __init__(self, path: str, ts_col: str = "ts"):
        self.path = path
        self.ts_col = ts_col
        os.makedirs(path, exist_ok=True)
        self._meta_file = os.path.join(path, "_stream.json")

    def meta(self) -> dict:
        if not os.path.exists(self._meta_file):
            return {"generation": 1, "gens": [
                {"gen": 1, "docs": 0, "min_ts": None, "max_ts": None,
                 "batches": 0}]}
        with open(self._meta_file) as f:
            return json.load(f)

    def _save(self, m: dict) -> None:
        tmp = self._meta_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._meta_file)

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.path, f"gen-{gen:06d}")

    def append(self, df: DataFrame) -> None:
        """Write a batch into the OPEN generation. One pass computes
        the manifest stats (count + ts bounds) while writing."""
        m = self.meta()
        cur = m["gens"][-1]
        batch_dir = os.path.join(
            self._gen_dir(cur["gen"]), f"batch-{cur['batches']:06d}")
        df.write.mode("overwrite").parquet(batch_dir)
        spark = df.sparkSession
        stats = (spark.read.parquet(batch_dir)
                 .agg(F.count("*").alias("n"),
                      F.min(self.ts_col).cast("string").alias("mn"),
                      F.max(self.ts_col).cast("string").alias("mx"))
                 .first())
        cur["docs"] += stats["n"]
        cur["batches"] += 1
        if stats["mn"] is not None:
            cur["min_ts"] = (stats["mn"] if cur["min_ts"] is None
                             else min(cur["min_ts"], stats["mn"]))
            cur["max_ts"] = (stats["mx"] if cur["max_ts"] is None
                             else max(cur["max_ts"], stats["mx"]))
        self._save(m)

    def rollover(self, max_docs: int | None = None,
                 force: bool = False) -> bool:
        """Close the open generation and open the next when a condition
        holds (RolloverRequest max_docs; `force` = the explicit
        _rollover call). Returns whether a rollover happened."""
        m = self.meta()
        cur = m["gens"][-1]
        if not force and (max_docs is None or cur["docs"] < max_docs):
            return False
        if cur["docs"] == 0:
            return False  # reference refuses to roll an empty index
        nxt = cur["gen"] + 1
        m["generation"] = nxt
        m["gens"].append({"gen": nxt, "docs": 0, "min_ts": None,
                          "max_ts": None, "batches": 0})
        self._save(m)
        return True

    def read(
        self, spark: SparkSession,
        ts_from: str | None = None, ts_to: str | None = None,
    ) -> DataFrame:
        """Search across generations; a ts range prunes whole
        generations via manifest bounds before any scan."""
        m = self.meta()
        parts = []
        for g in m["gens"]:
            if g["docs"] == 0:
                continue
            if ts_from is not None and g["max_ts"] is not None \
                    and g["max_ts"] < ts_from:
                continue
            if ts_to is not None and g["min_ts"] is not None \
                    and g["min_ts"] > ts_to:
                continue
            part = (spark.read
                    .option("recursiveFileLookup", "true")
                    .parquet(self._gen_dir(g["gen"]))
                    .withColumn("_generation", F.lit(g["gen"])))
            parts.append(part)
        if not parts:
            raise FileNotFoundError(f"no generations match in {self.path}")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        ts = F.col(self.ts_col)
        if ts_from is not None:
            out = out.where(ts >= F.lit(ts_from).cast("timestamp"))
        if ts_to is not None:
            out = out.where(ts <= F.lit(ts_to).cast("timestamp"))
        return out

    def retention_delete(self, keep_last: int) -> list[int]:
        """ILM delete phase: drop closed generations beyond the newest
        `keep_last` (the open generation always survives)."""
        m = self.meta()
        closed = m["gens"][:-1]
        drop = closed[:-keep_last] if keep_last > 0 else closed
        dropped = []
        for g in drop:
            shutil.rmtree(self._gen_dir(g["gen"]), ignore_errors=True)
            dropped.append(g["gen"])
        m["gens"] = [g for g in m["gens"] if g["gen"] not in set(dropped)]
        self._save(m)
        return dropped


# ---------------------------------------------------------------------
# ILM policy executor over standalone indexes
# (x-pack/plugin/ilm/.../IndexLifecycleRunner.java: each index carries
# a lifecycle state; the runner advances it through the policy's
# phases by age). Here the state lives in ``ilm.json`` next to the
# index and `ilm_step` is the idempotent runner body: it applies at
# most ONE phase transition per call (the reference's step-by-step
# execution), using this engine's existing lifecycle ops — shrink for
# warm, freeze for cold, snapshot-based delete guard.
# ---------------------------------------------------------------------

def _ilm_state_path(index_path: str) -> str:
    return os.path.join(index_path, "ilm.json")


def ilm_state(index_path: str) -> dict:
    p = _ilm_state_path(index_path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"phase": "hot"}


def ilm_step(
    spark,
    index_path: str,
    policy: dict,
    now: float | None = None,
) -> dict:
    """Advance one ILM step. ``policy`` phases (all optional):
      warm:   {min_age_days, shrink: {number_of_shards}}
      cold:   {min_age_days, freeze: bool}
      delete: {min_age_days}
    Age counts from the index's creation (its meta mtime). A shrink
    replaces the index path contents atomically via a sibling dir +
    os.replace of the whole directory. Returns the new state."""
    import shutil
    import time as _time

    from elasticsearch_spark.index.builder import index_meta
    from elasticsearch_spark.ops.resize import shrink_index
    from elasticsearch_spark.ops.snapshot import freeze_index

    now = _time.time() if now is None else float(now)
    st = ilm_state(index_path)
    meta_p = os.path.join(index_path, "index_meta.json")
    age_days = (now - os.path.getmtime(meta_p)) / 86400.0
    phase = st.get("phase", "hot")

    def save(new_state: dict) -> dict:
        tmp = _ilm_state_path(index_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, _ilm_state_path(index_path))
        return new_state

    if phase == "hot" and "warm" in policy:
        w = policy["warm"]
        if age_days >= float(w.get("min_age_days", 0)):
            if "shrink" in w:
                target = int(w["shrink"]["number_of_shards"])
                if target != index_meta(index_path)["num_partitions"]:
                    tmp_dir = index_path.rstrip("/") + ".ilm_shrink"
                    shutil.rmtree(tmp_dir, ignore_errors=True)
                    shrink_index(spark, index_path, tmp_dir, target)
                    old = index_path.rstrip("/") + ".ilm_old"
                    shutil.rmtree(old, ignore_errors=True)
                    os.rename(index_path, old)
                    os.rename(tmp_dir, index_path)
                    shutil.rmtree(old, ignore_errors=True)
            return save({"phase": "warm", "entered_at": now})
        return st
    if phase == "warm" and "cold" in policy:
        c = policy["cold"]
        if age_days >= float(c.get("min_age_days", 0)):
            if c.get("freeze", True):
                freeze_index(index_path)
            return save({"phase": "cold", "entered_at": now})
        return st
    if phase in ("hot", "warm", "cold") and "delete" in policy:
        if age_days >= float(policy["delete"].get("min_age_days", 1e18)):
            shutil.rmtree(index_path)
            return {"phase": "deleted"}
    return st
