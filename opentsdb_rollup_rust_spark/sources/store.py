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

import fcntl
import json
import os
import time
import uuid
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "run_id string, tier string, bucket int, src_snapshot long, "
    "rows_in long, rows_out long, committed_at timestamp"
)
METRICS_SCHEMA = (
    "run_id string, tier string, bucket int, points_per_sec double, "
    "bytes_per_point double, wall_ms long"
)


class ConcurrentCommitError(RuntimeError):
    """A maintenance operation (compact / replace_range / prune)
    computed its new snapshot against a base that another writer
    advanced before the commit — committing would silently drop the
    concurrent writer's files. Retry the operation against the new
    current snapshot (the same contract as Iceberg's optimistic
    commit conflicts)."""


class ManifestStore:
    """Snapshot-pinned parquet tables under a root directory.

    Concurrency model (mirrors Iceberg's optimistic commits): every
    manifest mutation happens under a per-table writer flock, so two
    appends never lose one another (the streaming sink and the batch
    job can share a table). Long-running maintenance ops (compact,
    replace_range, prune) do their expensive read+rewrite WITHOUT the
    lock, then validate at commit time that the base snapshot they
    computed against is still current — raising ConcurrentCommitError
    for the caller to retry instead of clobbering a concurrent commit.
    (The real IcebergStore gets both behaviors natively from the
    catalog's atomic swap + validation.)"""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    @contextmanager
    def _write_lock(self, table: str):
        """Per-table advisory writer lock (flock): serializes
        manifest read-modify-write cycles across processes on one
        host. Readers never take it — snapshots are immutable."""
        os.makedirs(os.path.join(self.root, table), exist_ok=True)
        lock_path = os.path.join(self.root, table, "_lock")
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

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
        # unique suffix: two writers computing against the same base
        # (e.g. a stream append racing a compaction) must never write
        # into the same directory — the loser's files become orphans
        # the commit validation rejects, not corruption
        out = os.path.join(
            self.root, table, f"snap-{snap_id}-{uuid.uuid4().hex[:8]}"
        )
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
        # the (slow) data write happens OUTSIDE the lock — the dir name
        # is collision-free, and append semantics merge onto whatever
        # the current snapshot is at commit time, so the lock scope is
        # the manifest swap only (a streaming micro-batch never waits
        # behind a long batch write)
        paths = self._write_data(
            table, df, self._new_snap_id(self._load_manifest(table))
        )
        with self._write_lock(table):
            m = self._load_manifest(table)
            snap_id = self._new_snap_id(m)
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
        """All commit summaries — including those of snapshots whose
        data files expire_snapshots has reclaimed (retired_summaries):
        resume markers must outlive the data-file GC."""
        m = self._load_manifest(table)
        retired = [
            {"id": r["id"], **r.get("summary", {})}
            for r in m.get("retired_summaries", [])
        ]
        return retired + [
            {"id": s["id"], **s.get("summary", {})} for s in m["snapshots"]
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
        paths = self._write_data(
            table, df, self._new_snap_id(self._load_manifest(table))
        )
        with self._write_lock(table):
            m = self._load_manifest(table)
            snap_id = self._new_snap_id(m)
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

    # ----------------------------------------------------------- retention

    def expand_files(self, paths: list[str]) -> list[str]:
        """Snapshot paths (files or directories) -> concrete parquet
        data files."""
        out: list[str] = []
        for p in paths:
            if os.path.isdir(p):
                for root, _dirs, fs in os.walk(p):
                    out.extend(
                        os.path.join(root, f)
                        for f in sorted(fs)
                        if f.endswith(".parquet")
                    )
            else:
                out.append(p)
        return out

    def _commit_against(self, table: str, base: int | None, build) -> dict:
        """Optimistic-commit helper for long maintenance ops: under the
        writer lock, re-load the manifest, verify the table has not
        advanced past ``base``, apply ``build(manifest)`` (which
        appends the new snapshot and returns the result dict), and
        swap. Raises ConcurrentCommitError on conflict — the caller's
        freshly-written data files become orphans, never corruption
        (unique snap-dir suffixes)."""
        with self._write_lock(table):
            m = self._load_manifest(table)
            if m["current"] != base:
                raise ConcurrentCommitError(
                    f"{table}: snapshot advanced {base} -> {m['current']} "
                    "during maintenance; recompute against the new current"
                )
            out = build(m)
            self._commit_manifest(table, m)
            return out

    def expire_snapshots(
        self,
        table: str,
        keep_last: int = 1,
        orphan_grace_seconds: float = 3600.0,
    ) -> dict:
        """Iceberg ``expire_snapshots`` + ``remove_orphan_files``
        analogue — the GC half of the snapshot model: compaction /
        retention / replace_range leave superseded files on disk so
        older snapshots stay readable; expiry drops all but the newest
        ``keep_last`` snapshots from the manifest and DELETES

          1. every data file referenced only by expired snapshots, and
          2. ORPHANS — data files under the table dir referenced by NO
             snapshot at all (conflict-loser writes, crashes between a
             commit and its deletes) — but only when older than
             ``orphan_grace_seconds``: an in-flight writer's
             half-written directory is not referenced yet either, and
             the age guard is what keeps the sweep from destroying it
             (Iceberg's remove_orphan_files has the same guard).

        Expired snapshots' SUMMARIES are retained in the manifest
        (``retired_summaries``): the job's exactly-once resume reads
        committed-bucket markers from snapshot_summaries(), and GC of
        data files must never forget which work was committed — losing
        the markers would double-append entire tiers. Irreversible for
        the data files by design."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        with self._write_lock(table):
            m = self._load_manifest(table)
            if m["current"] is None:
                return {"expired": 0, "deleted_files": 0}
            keep = m["snapshots"][-keep_last:]
            expired = m["snapshots"][:-keep_last]
            protected: set[str] = set()
            for s in keep:
                protected.update(self.expand_files(s["paths"]))
            doomed: set[str] = set()
            for s in expired:
                doomed.update(self.expand_files(s["paths"]))
            doomed -= protected
            retired = [
                {"id": s["id"], "summary": s["summary"]}
                for s in expired
                if s.get("summary")
            ]
            if expired:
                # commit the shrunken manifest FIRST (still under the
                # writer lock): a crash mid-delete leaves unreferenced
                # files (orphans, collected by the next expiry's age
                # sweep), never a live snapshot with missing files
                m["retired_summaries"] = (
                    m.get("retired_summaries", []) + retired
                )
                m["snapshots"] = keep
                self._commit_manifest(table, m)
        # Deletions happen OUTSIDE the writer lock, so a concurrent
        # expire (or a crash-retry overlapping a prior half-finished
        # sweep) can race on the same files: deletion must be
        # idempotent — missing file/dir means the other GC got there
        # first, which is success, not failure.
        for f in doomed:
            Path(f).unlink(missing_ok=True)
        # orphan collection: age-guarded sweep of data files and snap
        # directories no snapshot references
        cutoff = time.time() - orphan_grace_seconds
        n_orphans = 0
        retained_dirs = {p for s in keep for p in s["paths"]}
        tdir = os.path.join(self.root, table)
        for entry in sorted(os.listdir(tdir)):
            d = os.path.join(tdir, entry)
            if not os.path.isdir(d) or d in retained_dirs:
                continue
            live = set(self.expand_files([d])) & protected
            if live:
                continue  # a retained snapshot references into this dir
            try:
                if os.path.getmtime(d) > cutoff:
                    continue  # possibly an in-flight write — too young
            except OSError:
                continue  # vanished under a concurrent sweep
            for root, _dirs, files in os.walk(d, topdown=False):
                for f in files:
                    n_orphans += f.endswith(".parquet")
                    Path(root, f).unlink(missing_ok=True)
                try:
                    os.rmdir(root)
                except OSError:
                    pass  # concurrent sweep removed it / not yet empty
        return {
            "expired": len(expired),
            "deleted_files": len(doomed),
            "orphans_removed": n_orphans,
        }

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_within: tuple[str, ...] | None = None,
    ) -> dict:
        """Small-file compaction (the Iceberg ``rewrite_data_files``
        analogue). Every incremental append writes its own files, so a
        long-running tier job accumulates thousands of under-sized
        files — the classic operational killer at 100 TB (open/seek
        cost per file dominates the scan). Files under half the target
        size are read back, bin-packed to ~target-size outputs
        (repartition to ceil(bytes/target)), and committed as a new
        snapshot; full-size files carry over untouched. Old snapshots
        keep referencing the old files (time travel preserved, as with
        prune_older_than).

        ``sort_within`` re-sorts each output file (rollup tables pass
        ('series_id', 'window_start') to keep the O1 series-major
        monotone layout parquet delta encoding and the codec rely on —
        a bare round-robin repartition would interleave series).
        Returns {files_in, files_out, bytes, snapshot} — a no-op
        (<=1 small file) commits nothing."""
        m = self._load_manifest(table)
        if m["current"] is None:
            return {"snapshot": None, "files_in": 0, "files_out": 0, "bytes": 0}
        files = self.expand_files(self._snapshot_paths(m, m["current"]))
        small_set = {
            f for f in files if os.path.getsize(f) < target_file_bytes // 2
        }
        small = [f for f in files if f in small_set]
        keep = [f for f in files if f not in small_set]
        if len(small) <= 1:
            return {
                "snapshot": m["current"],
                "files_in": len(small),
                "files_out": len(small),
                "bytes": sum(os.path.getsize(f) for f in small),
            }
        total = sum(os.path.getsize(f) for f in small)
        n_out = max(1, -(-total // target_file_bytes))
        base = m["current"]
        snap_id = self._new_snap_id(m)
        packed = self.spark.read.parquet(*small).repartition(n_out)
        if sort_within:
            packed = packed.sortWithinPartitions(*sort_within)
        written = self._write_data(table, packed, snap_id)

        def build(m2: dict) -> dict:
            m2["snapshots"].append(
                {
                    "id": snap_id,
                    "paths": keep + written,
                    "ts": time.time(),
                    "summary": {
                        "compaction": {
                            "files_in": len(small),
                            "files_out": int(n_out),
                            "bytes": int(total),
                        }
                    },
                }
            )
            m2["current"] = snap_id
            return {
                "snapshot": snap_id,
                "files_in": len(small),
                "files_out": int(n_out),
                "bytes": int(total),
            }

        return self._commit_against(table, base, build)

    def replace_range(
        self,
        table: str,
        ts_col: str,
        t0_epoch: int,
        t1_epoch: int,
        df_new: DataFrame,
    ) -> dict:
        """Surgical time-range replacement (the Iceberg
        overwrite-by-filter analogue) — the backfill primitive: rows
        with ``ts_col`` in [t0, t1) are replaced by ``df_new``'s rows.
        Metadata-first like prune_older_than: data files whose parquet
        footer [min, max] is DISJOINT from the range carry over without
        being read; only range-straddling files are scanned and
        rewritten with the range filtered out; df_new's files are
        written alongside. One atomic manifest swap."""
        from pyspark.sql import functions as F

        m = self._load_manifest(table)
        if m["current"] is None:
            raise KeyError(f"table {table} is empty — nothing to replace")
        files = self.expand_files(self._snapshot_paths(m, m["current"]))
        keep: list[str] = []
        rewrite: list[str] = []
        for f in files:
            lo, hi = _footer_min_max(f, ts_col)
            if lo is not None and hi is not None and (
                hi < t0_epoch or lo >= t1_epoch
            ):
                keep.append(f)
            else:
                rewrite.append(f)
        base = m["current"]
        snap_id = self._new_snap_id(m)
        if rewrite:
            straddling = self.spark.read.parquet(*rewrite)
            ts, mk = _epoch_bound_exprs(straddling, ts_col)
            outside = straddling.where(
                (ts < mk(t0_epoch)) | (ts >= mk(t1_epoch))
            )
            df_new = outside.unionByName(df_new)
        written = self._write_data(table, df_new, snap_id)

        def build(m2: dict) -> dict:
            m2["snapshots"].append(
                {
                    "id": snap_id,
                    "paths": keep + written,
                    "ts": time.time(),
                    "summary": {
                        "replace_range": {
                            "ts_col": ts_col,
                            "t0": t0_epoch,
                            "t1": t1_epoch,
                            "files_kept": len(keep),
                            "files_rewritten": len(rewrite),
                        }
                    },
                }
            )
            m2["current"] = snap_id
            return {
                "snapshot": snap_id,
                "files_kept": len(keep),
                "files_rewritten": len(rewrite),
            }

        return self._commit_against(table, base, build)

    def prune_older_than(self, table: str, ts_col: str, cutoff_epoch: int) -> dict:
        """Retention as a metadata-first operation (the Iceberg
        partition-drop analogue): classify every data file by its
        parquet FOOTER min/max of ``ts_col`` — files entirely older
        than the cutoff leave the new snapshot without being read or
        rewritten, files entirely newer carry over untouched, and only
        straddling files are scanned and rewritten with the filter
        applied. Round 1 recomputed and rewrote the whole table.

        Dropped files stay on disk because older snapshots still
        reference them (Iceberg keeps them until expire_snapshots);
        the new current snapshot simply stops listing them."""
        from pyspark.sql import functions as F

        m = self._load_manifest(table)
        if m["current"] is None:
            return {"snapshot": None, "dropped": [], "kept": [], "rewritten": []}
        files = self.expand_files(self._snapshot_paths(m, m["current"]))
        kept: list[str] = []
        dropped: list[str] = []
        straddle: list[str] = []
        for f in files:
            lo, hi = _footer_min_max(f, ts_col)
            if hi is not None and hi < cutoff_epoch:
                dropped.append(f)
            elif lo is not None and lo >= cutoff_epoch:
                kept.append(f)
            else:  # straddles the cutoff, or no usable stats
                straddle.append(f)
        if not dropped and not straddle:
            return {
                "snapshot": m["current"],
                "dropped": [],
                "kept": kept,
                "rewritten": [],
            }
        base = m["current"]
        snap_id = self._new_snap_id(m)
        new_paths = list(kept)
        if straddle:
            sdf = self.spark.read.parquet(*straddle)
            ts, mk = _epoch_bound_exprs(sdf, ts_col)
            filtered = sdf.where(ts >= mk(cutoff_epoch))
            new_paths += self._write_data(table, filtered, snap_id)

        def build(m2: dict) -> dict:
            m2["snapshots"].append(
                {
                    "id": snap_id,
                    "paths": new_paths,
                    "ts": time.time(),
                    "summary": {
                        "retention_cutoff": cutoff_epoch,
                        "files_dropped": len(dropped),
                        "files_rewritten": len(straddle),
                    },
                }
            )
            m2["current"] = snap_id
            return {
                "snapshot": snap_id,
                "dropped": dropped,
                "kept": kept,
                "rewritten": straddle,
            }

        return self._commit_against(table, base, build)


def _epoch_bound_exprs(df: "DataFrame", ts_col: str):
    """(lhs, mk_lit) pieces for epoch-seconds range predicates on
    ``ts_col``, pushdown-friendly where possible (r6, guide §6.2).

    For a TimestampType column the comparison stays on the RAW column
    against a foldable timestamp literal, so parquet footer/row-group
    pruning applies at the scan; wrapping the column in
    unix_timestamp() (the old form) blocks pushdown entirely. Exact
    equivalence: unix_timestamp floors to whole seconds, and for any t
    and integer bound s, floor(t) >= s <=> t >= s and
    floor(t) < s <=> t < s — identical rows kept. Non-timestamp
    columns (string ts etc.) keep the unix_timestamp parse."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(ts_col) == "timestamp":
        return F.col(ts_col), lambda s: F.timestamp_seconds(F.lit(s))
    return F.unix_timestamp(F.col(ts_col)), lambda s: F.lit(s)


def _footer_min_max(path: str, col_name: str) -> tuple[float | None, float | None]:
    """(min, max) of a column across a file's row groups, in epoch
    seconds, read from parquet footer statistics only. (None, None)
    when stats are unavailable — callers must treat that as 'could
    contain anything' and rewrite."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = md.schema.names
    if col_name not in names:
        return None, None
    ci = names.index(col_name)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return None, None
        mn, mx = _stat_epoch(st.min), _stat_epoch(st.max)
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return lo, hi


def _stat_epoch(v) -> float:
    from datetime import datetime, timezone

    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return v.timestamp()
    return float(v)


# ------------------------------------------------------------ real Iceberg


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def make_store(
    spark: SparkSession,
    root: str,
    catalog: str = "rollup_cat",
    namespace: str = "rollup",
):
    """Backend factory: a real Iceberg catalog when the runtime jar is
    present (cluster deployments), the manifest store otherwise (this
    sandbox ships no Iceberg jar — SURVEY.md Appendix A). Both expose
    the identical surface, so callers (plans/job.py, jobs/run_rollup.py)
    never branch."""
    if iceberg_available(spark):
        return IcebergStore(spark, catalog=catalog, namespace=namespace, root=root)
    return ManifestStore(spark, root)


class IcebergStore:
    """ManifestStore's surface over a real Iceberg catalog.

    Mapping of the snapshot model:
      append()            -> df.writeTo(t).append() with
                             snapshot-property.* write options carrying
                             the commit summary (resume markers commit
                             ATOMICALLY with the data, same as the
                             manifest swap)
      current_snapshot()  -> latest snapshot_id from the t.snapshots
                             metadata table (ids are random longs, not
                             sequential — resume only needs equality)
      read(snapshot_id)   -> spark.read.option('snapshot-id', ...)
      read_snapshot_delta -> incremental append scan
                             (start-snapshot-id = parent, end = snap)
      prune_older_than    -> DELETE WHERE ts < cutoff: Iceberg drops
                             whole data files by column stats and
                             rewrites only straddlers — the same
                             file-granularity behavior ManifestStore
                             implements by hand over parquet footers
      overwrite           -> createOrReplace

    Requires a configured catalog, e.g.::

        spark.sql.catalog.rollup_cat = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.rollup_cat.type = hadoop
        spark.sql.catalog.rollup_cat.warehouse = <root>

    Untestable in this sandbox (no jar) — exercised by
    tests/test_store_backends.py, which skips when the probe fails.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: str = "rollup_cat",
        namespace: str = "rollup",
        root: str | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        if root and not spark.conf.get(f"spark.sql.catalog.{catalog}", None):
            spark.conf.set(
                f"spark.sql.catalog.{catalog}",
                "org.apache.iceberg.spark.SparkCatalog",
            )
            spark.conf.set(f"spark.sql.catalog.{catalog}.type", "hadoop")
            spark.conf.set(f"spark.sql.catalog.{catalog}.warehouse", root)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _qual(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # ------------------------------------------------------------- surface

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._qual(table))

    def current_snapshot(self, table: str) -> int | None:
        if not self.exists(table):
            return None
        # the main branch ref IS the current snapshot — exact even when
        # two commits land in the same committed_at millisecond (the
        # create+append pair in append() does exactly that), where an
        # ORDER BY committed_at could return the wrong id
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._qual(table)}.refs "
            "WHERE name = 'main'"
        ).first()
        if row is not None:
            return int(row.snapshot_id)
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._qual(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row.snapshot_id) if row else None

    def append(self, table: str, df: DataFrame, summary: dict | None = None) -> int:
        import json

        q = self._qual(table)
        if not self.exists(table):
            df.limit(0).writeTo(q).create()
        w = df.writeTo(q)
        for k, v in (summary or {}).items():
            w = w.option(f"snapshot-property.{k}", json.dumps(v))
        w.append()
        snap = self.current_snapshot(table)
        assert snap is not None
        return snap

    def snapshot_summaries(self, table: str) -> list[dict]:
        import json

        if not self.exists(table):
            return []
        out = []
        for r in self.spark.sql(
            f"SELECT snapshot_id, summary FROM {self._qual(table)}.snapshots "
            "ORDER BY committed_at"
        ).collect():
            d: dict = {"id": int(r.snapshot_id)}
            for k, v in (r.summary or {}).items():
                try:
                    d[k] = json.loads(v)
                except (ValueError, TypeError):
                    d[k] = v
            out.append(d)
        return out

    def read(
        self, table: str, snapshot_id: int | None = None, schema: str | None = None
    ) -> DataFrame:
        if not self.exists(table):
            if schema is None:
                raise KeyError(f"table {table} is empty and no schema given")
            return self.spark.createDataFrame([], schema)
        r = self.spark.read
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.table(self._qual(table))

    def read_snapshot_delta(self, table: str, snap_id: int) -> DataFrame:
        row = self.spark.sql(
            f"SELECT parent_id FROM {self._qual(table)}.snapshots "
            f"WHERE snapshot_id = {snap_id}"
        ).first()
        if row is None:
            raise KeyError(f"snapshot {snap_id} not found")
        r = self.spark.read.format("iceberg").option("end-snapshot-id", str(snap_id))
        if row.parent_id is not None:
            r = r.option("start-snapshot-id", str(int(row.parent_id)))
            return r.load(self._qual(table))
        return self.spark.read.option("snapshot-id", str(snap_id)).table(
            self._qual(table)
        )

    def overwrite(self, table: str, df: DataFrame) -> int:
        df.writeTo(self._qual(table)).createOrReplace()
        snap = self.current_snapshot(table)
        assert snap is not None
        return snap

    def prune_older_than(self, table: str, ts_col: str, cutoff_epoch: int) -> dict:
        from datetime import datetime, timezone

        # compare the RAW column against a timestamp literal: wrapping
        # the column in unix_timestamp() would make the predicate
        # non-evaluable against Iceberg's file column stats, degrading
        # the metadata-only file drop into a full copy-on-write rewrite
        cutoff = datetime.fromtimestamp(cutoff_epoch, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        self.spark.sql(
            f"DELETE FROM {self._qual(table)} "
            f"WHERE {ts_col} < TIMESTAMP '{cutoff}'"
        )
        return {
            "snapshot": self.current_snapshot(table),
            "dropped": [],  # Iceberg handles file classification itself
            "kept": [],
            "rewritten": [],
        }

    def expire_snapshots(
        self,
        table: str,
        keep_last: int = 1,
        orphan_grace_seconds: float = 3600.0,
    ) -> dict:
        """Snapshot GC via Iceberg's stored procedures (same result
        shape as ManifestStore.expire_snapshots; the snapshot count is
        measured as before-minus-after since the procedure reports
        files). Iceberg retains snapshot summary metadata through
        expiry on its own, so resume markers survive here natively.
        Orphan collection runs as Iceberg's separate
        remove_orphan_files procedure. DIVERGENCE from ManifestStore:
        Iceberg's RemoveOrphanFilesProcedure rejects intervals under
        24 hours (IllegalArgumentException, bypassable only via
        spark.testing or the Action API), so the cutoff here is
        clamped to max(orphan_grace_seconds, 86400) — the manifest
        backend honors the raw parameter, this backend never sweeps
        files younger than a day."""
        from datetime import datetime, timedelta, timezone

        before = len(self.snapshot_summaries(table))
        now_dt = datetime.now(tz=timezone.utc)
        now = now_dt.strftime("%Y-%m-%d %H:%M:%S")
        row = self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.namespace}.{table}', "
            f"older_than => TIMESTAMP '{now}', "
            f"retain_last => {int(keep_last)})"
        ).collect()[0]
        after = len(self.snapshot_summaries(table))
        orphan_cutoff = (
            now_dt - timedelta(seconds=max(orphan_grace_seconds, 86400.0))
        ).strftime("%Y-%m-%d %H:%M:%S")
        orow = self.spark.sql(
            f"CALL {self.catalog}.system.remove_orphan_files("
            f"table => '{self.namespace}.{table}', "
            f"older_than => TIMESTAMP '{orphan_cutoff}')"
        ).collect()
        return {
            "expired": max(0, before - after),
            "deleted_files": int(row["deleted_data_files_count"]),
            "orphans_removed": len(orow),
        }

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_within: tuple[str, ...] | None = None,
    ) -> dict:
        """Small-file compaction via Iceberg's stored procedure —
        bin-packs under-sized data files to the target size, same
        semantics as ManifestStore.compact. ``sort_within`` selects
        the 'sort' rewrite strategy so output files keep the
        series-major layout."""
        strategy = ""
        if sort_within:
            order = ", ".join(sort_within)
            strategy = f"strategy => 'sort', sort_order => '{order}', "
        row = self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.namespace}.{table}', {strategy}"
            f"options => map('target-file-size-bytes', "
            f"'{int(target_file_bytes)}'))"
        ).collect()[0]
        return {
            "snapshot": self.current_snapshot(table),
            "files_in": int(row["rewritten_data_files_count"]),
            "files_out": int(row["added_data_files_count"]),
            "bytes": int(row["rewritten_bytes_count"]),
        }

    def replace_range(
        self,
        table: str,
        ts_col: str,
        t0_epoch: int,
        t1_epoch: int,
        df_new: DataFrame,
    ) -> dict:
        """Range replacement via Iceberg overwrite-by-filter
        (`writeTo(...).overwrite(cond)`): Iceberg classifies data files
        against the predicate with its column stats — disjoint files
        carry over untouched, straddlers rewrite — exactly the
        footer-based behavior ManifestStore.replace_range hand-rolls."""
        from datetime import datetime, timezone

        from pyspark.sql import functions as F

        def lit(e: int):
            return F.lit(
                datetime.fromtimestamp(e, tz=timezone.utc).strftime(
                    "%Y-%m-%d %H:%M:%S"
                )
            ).cast("timestamp")

        cond = (F.col(ts_col) >= lit(t0_epoch)) & (F.col(ts_col) < lit(t1_epoch))
        df_new.writeTo(self._qual(table)).overwrite(cond)
        return {
            "snapshot": self.current_snapshot(table),
            "files_kept": -1,  # Iceberg classifies internally
            "files_rewritten": -1,
        }
