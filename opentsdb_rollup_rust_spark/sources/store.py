"""S1/S4/S5/S6/S7 — storage with snapshot semantics.

The engine targets Iceberg tables (BASELINE.json:15). When the Iceberg
runtime jar is on the classpath we use it directly (`writeTo(...).
append()`, `option('snapshot-id', ...)`). This sandbox has no Iceberg
jar (SURVEY.md Appendix A), so the same API is implemented over
Parquet + an explicit JSON manifest that reproduces the snapshot
model of the Iceberg spec (iceberg.apache.org/spec): a table is a
list of immutable snapshots, each owning an explicit file list; the
current snapshot pointer is advanced by an ATOMIC manifest swap
(os.replace), which is the commit point. Readers pin a snapshot id
and see an immutable file set — exactly the resume semantics the
job needs (BASELINE.json:6 "resumable from Iceberg-snapshot
checkpoints").

Cluster note: on a real deployment `ManifestStore` is swapped for an
Iceberg catalog with zero changes to callers — the surface is
append / overwrite / read(snapshot_id) / current_snapshot.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "run_id string, tier string, bucket int, src_snapshot long, "
    "rows_in long, rows_out long, committed_at timestamp"
)
METRICS_SCHEMA = (
    "run_id string, tier string, bucket int, points_per_sec double, "
    "bytes_per_point double, wall_ms long"
)


class ManifestStore:
    """Snapshot-pinned parquet tables under a root directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"current": None, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, table: str, manifest: dict) -> None:
        """The atomic commit point (os.replace is atomic on POSIX)."""
        p = self._manifest_path(table)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, p)

    def _write_data(self, table: str, df: DataFrame, snap_id: int) -> list[str]:
        out = os.path.join(self.root, table, f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(out)
        return [out]

    def _new_snap_id(self, manifest: dict) -> int:
        return (manifest["current"] or 0) + 1

    # ------------------------------------------------------------- surface

    def current_snapshot(self, table: str) -> int | None:
        return self._load_manifest(table)["current"]

    def append(self, table: str, df: DataFrame, summary: dict | None = None) -> int:
        """New snapshot = previous file set + newly written files.

        ``summary`` is arbitrary commit metadata recorded atomically
        with the data (the Iceberg snapshot-summary analogue) — the
        job uses it to mark (tier, src_snapshot, buckets) done, which
        makes resume exactly-once: the marker and the data are one
        manifest swap.
        """
        m = self._load_manifest(table)
        snap_id = self._new_snap_id(m)
        paths = self._write_data(table, df, snap_id)
        prev = self._snapshot_paths(m, m["current"])
        m["snapshots"].append(
            {
                "id": snap_id,
                "paths": prev + paths,
                "new_paths": paths,
                "ts": time.time(),
                "summary": summary or {},
            }
        )
        m["current"] = snap_id
        self._commit_manifest(table, m)
        return snap_id

    def snapshot_summaries(self, table: str) -> list[dict]:
        return [
            {"id": s["id"], **s.get("summary", {})}
            for s in self._load_manifest(table)["snapshots"]
        ]

    def read_snapshot_delta(self, table: str, snap_id: int) -> DataFrame:
        """Only the files ADDED by ``snap_id`` (incremental read)."""
        m = self._load_manifest(table)
        for s in m["snapshots"]:
            if s["id"] == snap_id:
                return self.spark.read.parquet(*s.get("new_paths", s["paths"]))
        raise KeyError(f"snapshot {snap_id} not found")

    def overwrite(self, table: str, df: DataFrame) -> int:
        """New snapshot replacing the whole table (retention rewrite)."""
        m = self._load_manifest(table)
        snap_id = self._new_snap_id(m)
        paths = self._write_data(table, df, snap_id)
        m["snapshots"].append({"id": snap_id, "paths": paths, "ts": time.time()})
        m["current"] = snap_id
        self._commit_manifest(table, m)
        return snap_id

    def _snapshot_paths(self, manifest: dict, snap_id: int | None) -> list[str]:
        if snap_id is None:
            return []
        for s in manifest["snapshots"]:
            if s["id"] == snap_id:
                return list(s["paths"])
        raise KeyError(f"snapshot {snap_id} not found")

    def read(
        self, table: str, snapshot_id: int | None = None, schema: str | None = None
    ) -> DataFrame:
        """Read pinned to ``snapshot_id`` (default: current). Empty
        tables need ``schema`` to produce a typed empty frame."""
        m = self._load_manifest(table)
        snap = m["current"] if snapshot_id is None else snapshot_id
        paths = self._snapshot_paths(m, snap)
        if not paths:
            if schema is None:
                raise KeyError(f"table {table} is empty and no schema given")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*paths)

    def exists(self, table: str) -> bool:
        return self._load_manifest(table)["current"] is not None
