"""Interleaved A/B: arrow vs sql derive inside the fused tier pipeline.

The round-3 forensics put the Arrow IPC / Python-wait slice at 33% of
heavy-stage task time at local[32] (1.57x the local[8] share) — the
last engine-side lever on the N->4N raw scaling gap. The `sql` derive
(codegen'd higher-order functions, functions/arrays.py) removes the
Python boundary entirely at the price of per-element JVM evaluation;
both impls are golden-tested bit-identical
(tests/test_synth.py::test_derive_points_arrow_matches_sql,
tests/test_rollup.py::test_fused_rollup_matches_long_form).

Sequential A-then-B runs are useless on this box (multi-minute
kernel-time bursts land on whichever config is executing —
BENCH/BASELINE.md), so this alternates ABAB... within ONE JVM and
compares per-config minima plus adjacent-pair ratios.

Usage: python scripts/derive_ab.py [--cpus 32] [--seqs 24000000]
       [--pairs 3]
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
    ap.add_argument(
        "--impls", default="arrow,sql", help="comma list of derive impls"
    )
    args = ap.parse_args()
    impls = args.impls.split(",")

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
        app_name="derive-ab",
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

    def rep(impl: str) -> float:
        t0 = time.monotonic()
        r1m = fused_tier_rollup(seqs, "1m", impl=impl).persist()
        r1m.write.format("noop").mode("overwrite").save()
        cascade_reagg(cascade_reagg(r1m, "1h"), "1d").write.format(
            "noop"
        ).mode("overwrite").save()
        r1m.unpersist()
        return time.monotonic() - t0

    # one untimed warmup per impl (JIT + python worker spin-up)
    for impl in impls:
        rep(impl)

    runs: dict[str, list[float]] = {i: [] for i in impls}
    for _ in range(args.pairs):
        for impl in impls:
            t = rep(impl)
            runs[impl].append(round(t, 2))
            print(f"{impl:5s} {t:7.2f} s", file=sys.stderr, flush=True)

    out = {
        "cpus": args.cpus,
        "seqs": args.seqs,
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in runs.items()},
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
