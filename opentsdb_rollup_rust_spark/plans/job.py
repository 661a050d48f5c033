"""§3.1 — the flagship tier-rollup job: resumable, lineage-tracked,
explicitly partitioned (the engine's batch entry point).

Pipeline per tier (BASELINE.json:6,14):

  resume check (committed buckets from snapshot summaries, J4)
    -> snapshot-pinned source scan (S6)
    -> fused wide derive+agg (A11 = S3+A1+A5: per-sequence token stats
       -> salted groupBy(source, window) over 6 stat buffers -> unpivot
       to tier rows; base tier) or finer tier scan (cascade, A2)
    -> bucket = pmod(xxhash64(series_id), B) (F2)
    -> drop already-committed buckets
    -> repartition(B, bucket) + sortWithinPartitions(series_id,
       window_start) (O1 — monotone timestamps for the codec and for
       parquet delta encoding)
    -> append rollup tier; the commit records (src_snapshot, buckets)
       in the snapshot summary ATOMICALLY with the data — resume truth
       lives in the data table itself, so a crash anywhere leaves
       either nothing or a fully-committed bucket set (exactly-once).
    -> Gorilla chunk encode (C1) reads back ONLY the files this commit
       added (no recompute), appends chunks with its own summary
       (chunks resume independently if the job dies between the two).
    -> lineage + metrics rows appended last (reporting; resume does
       not depend on them).

Scale notes: the salted agg's phase-1 partial aggregation collapses
each task to ~|series x salts x windows| rows before any exchange; the
wide rows (tokens arrays) never cross a shuffle — point derivation is
a narrow map fused into the scan. At 10^12 sequences the knobs are
n_buckets (final-layout parallelism) and salts (hot-series fan-out);
both change only shuffle layout, never results (tested).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..codec.gorilla import compression_stats, encode_chunks
from ..config import DEFAULT_TIERS, TierSpec
from ..functions.hashing import series_hash_bucket
from ..operators.rollup import cascade_reagg, fused_tier_rollup
from ..sources.store import METRICS_SCHEMA, ManifestStore

ROLLUP_SCHEMA = (
    "series_id string, window_start timestamp, interval string, "
    "sum long, count long, min long, max long, bucket int"
)


@dataclass
class JobResult:
    run_id: str
    tier: str
    src_snapshot: int
    buckets_done: list[int]
    buckets_skipped: list[int]
    rows_out: int
    points_in: int
    wall_ms: int
    bytes_per_point: float


def committed_buckets(store: ManifestStore, table: str, src_snapshot: int) -> set[int]:
    """Buckets already committed for this source snapshot — read from
    the table's own snapshot summaries (atomic with the data)."""
    done: set[int] = set()
    for s in store.snapshot_summaries(table):
        if s.get("src_snapshot") == src_snapshot:
            done.update(s.get("buckets", []))
    return done


def run_rollup_job(
    spark: SparkSession,
    store: ManifestStore,
    tier: str,
    n_buckets: int = 8,
    salts: int = 8,
    run_id: str | None = None,
    encode: bool = True,
    tiers: dict[str, TierSpec] | None = None,
    fail_before_chunks: bool = False,
    derive_impl: str = "arrow",
) -> JobResult:
    """Run one tier to completion (idempotent under re-runs).

    ``fail_before_chunks`` simulates a crash between the rollup commit
    and the chunk commit (resume test)."""
    tiers = tiers or DEFAULT_TIERS
    spec = tiers[tier]
    run_id = run_id or uuid.uuid4().hex[:12]
    rollup_table = f"rollup_{tier}"
    chunks_table = f"chunks_{tier}"
    t0 = time.monotonic()

    # --- snapshot-pinned source (S6)
    if spec.source is None:
        src_snapshot = store.current_snapshot("sequences")
        if src_snapshot is None:
            raise RuntimeError("sequences table is empty")
        src = store.read("sequences", src_snapshot)
        # fused wide-form derive+rollup: aggregates one row per sequence
        # (6 stat buffers) instead of one per point; identical result to
        # salted_rollup(derive_points(...)) by golden test
        rolled = fused_tier_rollup(src, tier, salts=salts, impl=derive_impl)
    else:
        src_table = f"rollup_{spec.source}"
        src_snapshot = store.current_snapshot(src_table)
        if src_snapshot is None:
            raise RuntimeError(f"{src_table} is empty — run tier {spec.source} first")
        finer = store.read(src_table, src_snapshot)
        rolled = cascade_reagg(finer.drop("bucket"), tier)

    # --- resume (J4): drop buckets already committed for this snapshot
    done = committed_buckets(store, rollup_table, src_snapshot)
    rolled = rolled.withColumn("bucket", series_hash_bucket("series_id", n_buckets))
    all_buckets = list(range(n_buckets))
    todo = [b for b in all_buckets if b not in done]

    rows_out = points_in = 0
    rollup_snap = None
    if todo:
        if done:
            rolled = rolled.where(~F.col("bucket").isin(sorted(done)))
        # --- series-major layout (O1)
        rolled = rolled.repartition(len(todo), "bucket").sortWithinPartitions(
            "series_id", "window_start"
        )
        rollup_snap = store.append(
            rollup_table,
            rolled,
            summary={"src_snapshot": src_snapshot, "buckets": todo,
                     "run_id": run_id},
        )

    # --- chunks: encode from what the data table says is committed but
    # the chunks table hasn't encoded yet (crash-safe second commit)
    bytes_per_point = 0.0
    if encode and not fail_before_chunks and store.exists(rollup_table):
        chunk_done = committed_buckets(store, chunks_table, src_snapshot)
        chunk_todo = sorted(committed_buckets(store, rollup_table, src_snapshot)
                            - chunk_done)
        if chunk_todo:
            base = (
                store.read_snapshot_delta(rollup_table, rollup_snap)
                if rollup_snap is not None
                else store.read(rollup_table)
            )
            base = base.where(F.col("bucket").isin(chunk_todo))
            chunks = encode_chunks(base.drop("bucket"), tier, spec.chunk_points)
            store.append(
                chunks_table,
                chunks,
                summary={"src_snapshot": src_snapshot, "buckets": chunk_todo,
                         "run_id": run_id},
            )
        if store.exists(chunks_table):
            row = (
                compression_stats(store.read(chunks_table))
                .agg((F.sum("enc_bytes") / F.sum("points")).alias("bpp"))
                .first()
            )
            bytes_per_point = float(row.bpp or 0.0)

    # --- per-bucket stats from the WRITTEN files (no recompute)
    per_bucket: dict[int, tuple[int, int]] = {}
    if rollup_snap is not None:
        written = store.read_snapshot_delta(rollup_table, rollup_snap)
        per_bucket = {
            r["bucket"]: (r["rows_out"], int(r["points_in"] or 0))
            for r in written.groupBy("bucket")
            .agg(F.count("*").alias("rows_out"), F.sum("count").alias("points_in"))
            .collect()
        }
        rows_out = sum(v[0] for v in per_bucket.values())
        points_in = sum(v[1] for v in per_bucket.values())

    wall_ms = int((time.monotonic() - t0) * 1000)

    # --- lineage + metrics (reporting; resume does not depend on them)
    if per_bucket:
        ldf = spark.createDataFrame(
            [
                (run_id, tier, b, src_snapshot, pin, pout)
                for b, (pout, pin) in sorted(per_bucket.items())
            ],
            "run_id string, tier string, bucket int, src_snapshot long, "
            "rows_in long, rows_out long",
        ).withColumn("committed_at", F.current_timestamp())
        store.append("lineage", ldf)
        pps = points_in / max(wall_ms / 1000.0, 1e-9)
        store.append(
            "metrics",
            spark.createDataFrame(
                [(run_id, tier, b, pps, bytes_per_point, wall_ms)
                 for b in sorted(per_bucket)],
                METRICS_SCHEMA,
            ),
        )

    return JobResult(
        run_id=run_id,
        tier=tier,
        src_snapshot=src_snapshot,
        buckets_done=sorted(per_bucket),
        buckets_skipped=sorted(done),
        rows_out=rows_out,
        points_in=points_in,
        wall_ms=wall_ms,
        bytes_per_point=bytes_per_point,
    )


def run_cascade(
    spark: SparkSession,
    store: ManifestStore,
    tiers: dict[str, TierSpec] | None = None,
    **kwargs,
) -> list[JobResult]:
    """Run every tier in dependency order (1m -> 1h -> 1d)."""
    tiers = tiers or DEFAULT_TIERS
    order: list[str] = []
    remaining = dict(tiers)
    while remaining:
        for name, spec in list(remaining.items()):
            if spec.source is None or spec.source in order:
                order.append(name)
                del remaining[name]
    return [run_rollup_job(spark, store, t, tiers=tiers, **kwargs) for t in order]


def backfill_tier(
    spark: SparkSession,
    store: ManifestStore,
    tier: str,
    t0_epoch: int,
    t1_epoch: int,
    n_buckets: int = 8,
    salts: int = 8,
    tiers: dict[str, TierSpec] | None = None,
    derive_impl: str = "arrow",
) -> dict:
    """Recompute one tier's rollups for [t0, t1) from its source and
    surgically splice them into the tier table — the operational fix
    for late/corrected source data without reprocessing history.

    The recompute mirrors run_rollup_job's plan (fused wide derive+agg
    from the sequences snapshot for the base tier; cascade re-agg from
    the finer tier otherwise) but reads ONLY the range: the base tier
    pre-filters sequences on the deterministic event time (a cheap
    JVM expression over doc_id, evaluated before the expensive Arrow
    derive ever sees a row), and cascade tiers filter the finer tier
    on the RAW window_start column so the predicate pushes to parquet
    footers. The splice is store.replace_range (overwrite-by-filter /
    footer classification — never a full-table rewrite).

    If the tier has a Gorilla chunk table, the chunks whose extent
    intersects [t0, t1) are re-encoded from the post-splice rollup and
    range-replaced too — otherwise the chunk read path
    (codec.pruned_read) would keep serving the pre-backfill values.

    Idempotent: re-running produces an identical table (tested in
    tests/test_maintenance.py)."""
    from ..operators.points import event_time

    tiers = tiers or DEFAULT_TIERS
    spec = tiers[tier]
    sec = spec.interval_seconds
    # windows w in [t0, t1) need events/finer-windows in [wlo, ev_hi):
    # wlo = first window start >= t0, ev_hi = end of the last window
    # starting before t1 (handles unaligned t0/t1)
    wlo = -(-t0_epoch // sec) * sec
    ev_hi = -(-t1_epoch // sec) * sec
    if spec.source is None:
        src = store.read("sequences")
        ev = F.unix_timestamp(event_time("doc_id"))
        src = src.where((ev >= F.lit(wlo)) & (ev < F.lit(ev_hi)))
        rolled = fused_tier_rollup(src, tier, salts=salts, impl=derive_impl)
    else:
        finer = store.read(f"rollup_{spec.source}")
        finer = finer.where(
            (F.col("window_start") >= F.timestamp_seconds(F.lit(wlo)))
            & (F.col("window_start") < F.timestamp_seconds(F.lit(ev_hi)))
        )
        rolled = cascade_reagg(finer.drop("bucket"), tier)
    ws = F.unix_timestamp("window_start")
    rolled = rolled.where((ws >= F.lit(t0_epoch)) & (ws < F.lit(t1_epoch)))
    rolled = rolled.withColumn("bucket", series_hash_bucket("series_id", n_buckets))
    rolled = rolled.repartition(n_buckets, "bucket").sortWithinPartitions(
        "series_id", "window_start"
    )
    res = store.replace_range(
        f"rollup_{tier}", "window_start", t0_epoch, t1_epoch, rolled
    )

    chunks_table = f"chunks_{tier}"
    if store.exists(chunks_table):
        chunk_sec = spec.chunk_seconds
        c0 = (t0_epoch // chunk_sec) * chunk_sec
        c1 = -(-t1_epoch // chunk_sec) * chunk_sec
        repaired = store.read(f"rollup_{tier}").where(
            (F.col("window_start") >= F.timestamp_seconds(F.lit(c0)))
            & (F.col("window_start") < F.timestamp_seconds(F.lit(c1)))
        )
        new_chunks = encode_chunks(repaired.drop("bucket"), tier, spec.chunk_points)
        res["chunks"] = store.replace_range(
            chunks_table, "chunk_start", c0, c1, new_chunks
        )
    return res


def apply_retention(
    spark: SparkSession,
    store: ManifestStore,
    tier: str,
    now_epoch: int,
    tiers: dict[str, TierSpec] | None = None,
) -> int:
    """P3 — drop windows older than the tier's retention via the
    store's footer-stat pruning: whole files entirely past retention
    are dropped from the snapshot WITHOUT a read or rewrite (the
    Iceberg partition-drop analogue); only cutoff-straddling files are
    rewritten. Returns rows kept, -1 = no-op."""
    spec = (tiers or DEFAULT_TIERS)[tier]
    table = f"rollup_{tier}"
    if spec.retention_seconds is None or not store.exists(table):
        return -1
    cutoff = now_epoch - spec.retention_seconds
    store.prune_older_than(table, "window_start", cutoff)
    try:
        return store.read(table).count()
    except KeyError:  # every file aged out — table is empty
        return 0
