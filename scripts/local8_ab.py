"""Interleaved in-JVM A/B of runtime confs at local[8].

Run 23 closed the scaling contract (raw 0.939) but left one open
question (BENCH/BASELINE.md): post-r3 local[8] legs read 44.5-47 s
where the r3 plateau was 38-44 s, despite clean compute probes around
them. Host drift and engine-default cost are confounded across
JVM/runs; this script separates the RUNTIME-flippable suspects with
the same-JVM interleaved design that settled the Arrow-batch question
(scripts/arrow_batch_ab.py): one local[8] JVM, the flagship pipeline,
configs alternating A B C A B C ... so any host drift hits every
config equally.

Suspects tested here (both are `spark.conf.set`-able at runtime):
  - spark.sql.shuffle.partitions: bench uses cpus (=8 at local[8]).
    8 partitions of the aggregated set are 4x larger each than the
    32-core level's -> bigger per-task sort/agg hash tables, more GC
    per task. 2-3x cores is the standard sizing; AQE coalesces from
    this initial number, so raising it is cheap.
  - spark.sql.execution.arrow.maxRecordsPerBatch: 256k won the r4
    ABAB at both levels, but both r4 windows were degraded/near-clean
    at 32 cores; re-pin at 8 cores while we're here (sql derive means
    this only matters for the codec encode stage, so expect noise).

NOT testable in-JVM (startup options, separate JVMs + across-JVM
interleave needed): heap size (r3 ran 24g at local[8]; 2 g/core gives
16g), pretouch, GC choice. See scripts/heap_ab.py for that leg.

Usage: python scripts/local8_ab.py [--seqs 24000000] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=24_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument(
        "--configs",
        default="sp8,sp16,sp32",
        help="comma list: sp<N> sets shuffle.partitions=N; "
        "ab<N> sets arrow batch rows=N (with sp=cpus); "
        "dvsql/dvarrow flips the derive impl (sp=cpus, 256k batches) — "
        "r3's 38-44 s local[8] plateau ran the ARROW derive, and the "
        "r4 A/B that flipped the default to sql caught arrow in a "
        "degraded window (248 s), so sql-vs-arrow at 8 cores has "
        "never been measured clean",
    )
    args = ap.parse_args()
    cpus = args.cpus

    try:
        os.sched_setaffinity(0, set(range(cpus)))
        os.nice(-5)
    except (PermissionError, OSError):
        pass

    from opentsdb_rollup_rust_spark.session import get_spark
    from opentsdb_rollup_rust_spark.sources.synth import synth_sequences
    from opentsdb_rollup_rust_spark.operators.rollup import (
        cascade_reagg,
        fused_tier_rollup,
    )
    from scripts.scaling_run import hw_throughput  # noqa: E402

    gb = int(os.environ.get("SPARK_GRAFT_MEM_PER_CORE_GB", "2"))
    spark = get_spark(
        app_name="local8_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": f"{gb * cpus}g",
            "spark.driver.extraJavaOptions": (
                f"-Xms{gb * cpus}g -XX:+AlwaysPreTouch"
            ),
        },
    )

    seq_path = f"/tmp/spark_graft_bench/seqs_{args.seqs}_f256.parquet"
    if not os.path.exists(seq_path):
        synth_sequences(spark, args.seqs, partitions=256).write.mode(
            "overwrite"
        ).parquet(seq_path)
    seqs = spark.read.parquet(seq_path)

    derive = {"impl": "sql"}

    def apply(cfg: str) -> None:
        derive["impl"] = "sql"
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "262144"
        )
        if cfg.startswith("dv"):
            derive["impl"] = cfg[2:]
        elif cfg.startswith("sp"):
            spark.conf.set("spark.sql.shuffle.partitions", cfg[2:])
        elif cfg.startswith("ab"):
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", cfg[2:]
            )
        else:
            raise SystemExit(f"unknown config {cfg}")

    def pipeline() -> float:
        t0 = time.monotonic()
        r1m = fused_tier_rollup(seqs, "1m", impl=derive["impl"]).persist()
        r1m.write.format("noop").mode("overwrite").save()
        cascade_reagg(cascade_reagg(r1m, "1h"), "1d").write.format(
            "noop"
        ).mode("overwrite").save()
        r1m.unpersist()
        return time.monotonic() - t0

    configs = args.configs.split(",")
    # one untimed warmup per config (JIT + python worker spin-up)
    for cfg in configs:
        apply(cfg)
        w = pipeline()
        print(f"warmup {cfg}: {w:.2f} s", file=sys.stderr, flush=True)

    times: dict[str, list[float]] = {c: [] for c in configs}
    probes: list[float] = []
    for r in range(args.rounds):
        probes.append(round(hw_throughput(cpus) / 1e6, 1))
        print(f"round {r+1} probe: {probes[-1]} Mops/s", file=sys.stderr)
        for cfg in configs:
            apply(cfg)
            dt = pipeline()
            times[cfg].append(round(dt, 2))
            print(f"  {cfg}: {dt:.2f} s", file=sys.stderr, flush=True)

    out = {
        "ab": "local8_runtime_confs",
        "cpus": cpus,
        "seqs": args.seqs,
        "heap_gb": gb * cpus,
        "probes_mops": probes,
        "runs": times,
        "min": {c: min(v) for c, v in times.items()},
        "median": {c: statistics.median(v) for c, v in times.items()},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
