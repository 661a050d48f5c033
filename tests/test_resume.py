"""M4 — snapshot store, resumable job, lineage, retention, router.

Key golden test (BASELINE.md "resumability"): kill mid-job, re-run,
assert 0 duplicate windows and lineage records the skip.
"""

import pytest
from pyspark.sql import functions as F

from opentsdb_rollup_rust_spark.operators.points import derive_points
from opentsdb_rollup_rust_spark.operators.rollup import tumbling_rollup
from opentsdb_rollup_rust_spark.plans.job import (
    apply_retention,
    committed_buckets,
    run_cascade,
    run_rollup_job,
)
from opentsdb_rollup_rust_spark.plans.tier_router import read_rollup, route_tier
from opentsdb_rollup_rust_spark.sources.store import ManifestStore
from opentsdb_rollup_rust_spark.sources.synth import synth_sequences


@pytest.fixture()
def store(spark, tmp_path):
    s = ManifestStore(spark, str(tmp_path / "store"))
    s.append("sequences", synth_sequences(spark, 500))
    return s


def test_store_snapshot_isolation(spark, store):
    snap1 = store.current_snapshot("sequences")
    store.append("sequences", synth_sequences(spark, 100))
    assert store.read("sequences", snap1).count() == 500
    assert store.read("sequences").count() == 600


def test_full_cascade_matches_direct(spark, store):
    results = run_cascade(spark, store, n_buckets=4, encode=False)
    assert [r.tier for r in results] == ["1m", "1h", "1d"]
    pts = derive_points(store.read("sequences"))
    for tier in ("1m", "1h", "1d"):
        stored = store.read(f"rollup_{tier}").drop("bucket")
        direct = tumbling_rollup(pts, tier)
        assert stored.exceptAll(direct).count() == 0
        assert direct.exceptAll(stored).count() == 0


def test_kill_and_resume_no_duplicates(spark, store):
    """Crash between rollup commit and chunk commit; then re-run."""
    r1 = run_rollup_job(
        spark, store, "1m", n_buckets=4, encode=True, fail_before_chunks=True
    )
    assert r1.buckets_done == [0, 1, 2, 3]
    assert not store.exists("chunks_1m")

    r2 = run_rollup_job(spark, store, "1m", n_buckets=4, encode=True)
    assert r2.buckets_skipped == [0, 1, 2, 3]  # resume skipped all data work
    assert r2.rows_out == 0
    assert store.exists("chunks_1m")  # ...but the missing chunks were encoded

    # 0 duplicate windows
    stored = store.read("rollup_1m")
    dup = (
        stored.groupBy("series_id", "window_start")
        .agg(F.count("*").alias("n"))
        .where("n > 1")
        .count()
    )
    assert dup == 0
    # and the data exactly matches a direct computation
    direct = tumbling_rollup(derive_points(store.read("sequences")), "1m")
    assert stored.drop("bucket").exceptAll(direct).count() == 0

    # chunks decode back to the stored tier
    from opentsdb_rollup_rust_spark.codec.gorilla import decode_chunks

    decoded_n = decode_chunks(store.read("chunks_1m")).count()
    assert decoded_n == stored.count() * 4  # 4 aggs per window


def test_new_snapshot_triggers_reprocess(spark, store):
    run_rollup_job(spark, store, "1m", n_buckets=4, encode=False)
    n1 = store.read("rollup_1m").count()
    store.append("sequences", synth_sequences(spark, 100))
    r = run_rollup_job(spark, store, "1m", n_buckets=4, encode=False)
    assert r.buckets_skipped == []  # new snapshot => all buckets redone
    assert store.read("rollup_1m").count() > n1


def test_lineage_and_metrics_rows(spark, store):
    r = run_rollup_job(spark, store, "1m", n_buckets=4, encode=False)
    lin = store.read("lineage")
    assert lin.where(F.col("run_id") == r.run_id).count() == 4
    met = store.read("metrics")
    row = met.where(F.col("run_id") == r.run_id).first()
    assert row.points_per_sec > 0
    assert committed_buckets(store, "rollup_1m", r.src_snapshot) == {0, 1, 2, 3}


def test_retention_drops_old_windows(spark, store):
    run_rollup_job(spark, store, "1m", n_buckets=2, encode=False)
    hi = store.read("rollup_1m").agg(
        F.max(F.unix_timestamp("window_start"))
    ).first()[0]
    total = store.read("rollup_1m").count()
    kept = apply_retention(spark, store, "1m", now_epoch=hi + 3 * 86400)
    # 30-day horizon, 7-day retention anchored 3 days past the end
    assert 0 < kept < total
    assert store.read("rollup_1m").count() == kept


def test_retention_prunes_files_without_rewrite(spark, tmp_path):
    """Footer-stat pruning: daily appends (the production commit
    pattern) age out as whole files — dropped from the snapshot with
    no read/rewrite; files entirely inside retention are carried over
    byte-identically; only a cutoff-straddling file is rewritten."""
    import os

    s = ManifestStore(spark, str(tmp_path / "rstore"))
    day = 86400

    def mk(day_idx, n=10, span=1):
        rows = [
            ("s1", float(day_idx * day + i * (span * day) // n))
            for i in range(n)
        ]
        return (
            spark.createDataFrame(rows, "series_id string, epoch double")
            .select(
                "series_id",
                F.timestamp_seconds(F.col("epoch")).alias("window_start"),
            )
            .coalesce(1)
        )

    s.append("t", mk(0))  # day 0 — fully expired
    s.append("t", mk(1))  # day 1 — fully expired
    s.append("t", mk(2, span=2))  # days 2-3 — straddles the cutoff
    s.append("t", mk(4))  # day 4 — fully retained
    files_before = s.expand_files(
        s._snapshot_paths(s._load_manifest("t"), s.current_snapshot("t"))
    )
    mtimes = {f: os.path.getmtime(f) for f in files_before}

    cutoff = 3 * day
    res = s.prune_older_than("t", "window_start", cutoff)

    assert len(res["dropped"]) == 2  # day-0 and day-1 files, never read
    assert len(res["rewritten"]) == 1  # only the day-2-3 straddler
    assert len(res["kept"]) == 1  # day-4 file untouched
    # kept file is the SAME path with the SAME mtime (no rewrite)
    kept = res["kept"][0]
    assert os.path.getmtime(kept) == mtimes[kept]
    # dropped files left the snapshot but remain on disk (older
    # snapshots still reference them, Iceberg-style)
    for f in res["dropped"]:
        assert os.path.exists(f)
    rows = s.read("t").select(F.unix_timestamp("window_start").alias("e"))
    lo, hi, n = rows.agg(F.min("e"), F.max("e"), F.count("*")).first()
    assert lo >= cutoff
    assert n == 10 + 5  # day-4 append + surviving half of the straddler


def test_router_picks_coarsest_divisible(spark, store):
    assert route_tier(60) == "1m"
    assert route_tier(7200) == "1h"
    assert route_tier(300) == "1m"
    assert route_tier(2 * 86400) == "1d"
    with pytest.raises(ValueError):
        route_tier(90)


def test_read_rollup_reaggregates(spark, store):
    run_cascade(spark, store, n_buckets=2, encode=False)
    two_h = read_rollup(store, 7200, fill="zero")
    direct = tumbling_rollup(derive_points(store.read("sequences")), "1h")
    # sum of counts preserved through routing+reagg+fill
    assert (
        two_h.agg(F.sum("count")).first()[0]
        == direct.agg(F.sum("count")).first()[0]
    )
    assert "avg" in two_h.columns


def test_realtime_splice_equals_direct(spark, points):
    """P5b: tier<watermark ∪ on-the-fly raw>=watermark re-aggregated
    to 2h equals the direct single-source read, for watermarks at the
    range edges (all-cold / all-hot) and at an ODD 1h boundary (a 2h
    window straddles the splice — its halves must recombine exactly)."""
    from opentsdb_rollup_rust_spark.operators.rollup import cascade_reagg
    from opentsdb_rollup_rust_spark.plans.tier_router import (
        realtime_read_pipeline,
        rollup_read_pipeline,
    )
    from tests.conftest import assert_df_equal

    pts = points
    tier_full = cascade_reagg(tumbling_rollup(pts, "1m"), "1h")
    direct = rollup_read_pipeline(
        tier_full, "1h", 7200, fill="zero", with_avg=True
    )
    lo, hi = pts.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    mid_odd = ((lo + hi) // 2) // 7200 * 7200 + 3600
    all_cold = (hi // 3600 + 1) * 3600
    all_hot = lo // 3600 * 3600
    for wm in (mid_odd, all_cold, all_hot):
        tier = tier_full.where(
            F.col("window_start") < F.timestamp_seconds(F.lit(wm))
        )
        spliced = realtime_read_pipeline(
            tier, pts, "1h", 7200, wm, fill="zero", with_avg=True
        )
        assert_df_equal(spliced, direct)


def test_realtime_splice_rejects_unaligned_watermark(spark, points):
    from opentsdb_rollup_rust_spark.plans.tier_router import (
        realtime_read_pipeline,
    )

    with pytest.raises(ValueError):
        realtime_read_pipeline(points, points, "1h", 7200, 1800)
