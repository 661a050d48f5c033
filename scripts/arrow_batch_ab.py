"""Interleaved A/B: Arrow IPC batch size on the arrow-derive pipeline.

Round-3's sequential attempt at this A/B was swallowed by monotone
host degradation (SURVEY.md §8); this retry uses the same-JVM
interleaved ABAB design as derive_ab.py, which is robust to STEADY
degradation (both configs sample the same window) though not to
bursts landing inside single reps — per-rep lists are printed so a
burst-hit rep is visible, and adjacent-pair ratios are reported
alongside the minima.

``spark.sql.execution.arrow.maxRecordsPerBatch`` is a runtime SQL
conf, so one JVM alternates it between reps; the arrow derive impl is
pinned (the knob is inert on the sql path).

Usage: python scripts/arrow_batch_ab.py [--cpus 32] [--seqs 24000000]
       [--pairs 3] [--batches 65536,262144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seqs", type=int, default=24_000_000)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--batches", default="65536,262144")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    try:
        os.sched_setaffinity(0, set(range(args.cpus)))
        os.nice(-5)
    except (PermissionError, OSError):
        pass

    from opentsdb_rollup_rust_spark.session import get_spark
    from opentsdb_rollup_rust_spark.sources.synth import synth_sequences
    from opentsdb_rollup_rust_spark.operators.rollup import (
        cascade_reagg,
        fused_tier_rollup,
    )

    gb = int(os.environ.get("SPARK_GRAFT_MEM_PER_CORE_GB", "2"))
    spark = get_spark(
        app_name="arrow-batch-ab",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": f"{gb * args.cpus}g",
            **(
                {
                    "spark.driver.extraJavaOptions": (
                        f"-Xms{gb * args.cpus}g -XX:+AlwaysPreTouch"
                    )
                }
                if os.environ.get("SPARK_GRAFT_PRETOUCH", "1") != "0"
                else {}
            ),
        },
    )

    seq_path = f"/tmp/spark_graft_bench/seqs_{args.seqs}_f256.parquet"
    if not os.path.exists(seq_path):
        synth_sequences(spark, args.seqs, partitions=256).write.mode(
            "overwrite"
        ).parquet(seq_path)
    seqs = spark.read.parquet(seq_path)

    def rep(batch: int) -> float:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
        )
        t0 = time.monotonic()
        r1m = fused_tier_rollup(seqs, "1m", impl="arrow").persist()
        r1m.write.format("noop").mode("overwrite").save()
        cascade_reagg(cascade_reagg(r1m, "1h"), "1d").write.format(
            "noop"
        ).mode("overwrite").save()
        r1m.unpersist()
        return time.monotonic() - t0

    for b in batches:  # untimed warmup per config
        rep(b)

    runs: dict[int, list[float]] = {b: [] for b in batches}
    pair_ratios: list[float] = []
    for _ in range(args.pairs):
        pair: list[float] = []
        for b in batches:
            t = rep(b)
            runs[b].append(round(t, 2))
            pair.append(t)
            print(f"batch={b:7d} {t:7.2f} s", file=sys.stderr, flush=True)
        if len(pair) == 2:
            pair_ratios.append(round(pair[0] / pair[1], 3))

    out = {
        "cpus": args.cpus,
        "seqs": args.seqs,
        "runs": {str(k): v for k, v in runs.items()},
        "min": {str(k): min(v) for k, v in runs.items()},
        "median": {str(k): sorted(v)[len(v) // 2] for k, v in runs.items()},
        "adjacent_pair_ratios_a_over_b": pair_ratios,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
