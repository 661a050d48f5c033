"""One-level pipeline probe for scaling forensics.

Runs the bench pipeline (read cached 24M-seq parquet -> fused 1m
rollup -> 1h -> 1d cascade -> noop sink) at one parallelism level with
optional conf overrides, prints per-rep wall times as JSON. Used to
A/B shuffle/GC/scan confs without paying the full scaling protocol
(ceiling probes, both levels) per variant.

Usage: python scripts/pipeline_probe.py --cpus 32 --reps 5 [--warmup 2]
         [--conf k=v ...] [--seqs 24000000] [--eventlog DIR]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--seqs", type=int, default=24_000_000)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--eventlog", default=None)
    args = ap.parse_args()

    try:
        os.sched_setaffinity(0, set(range(args.cpus)))
        os.nice(-5)
    except (PermissionError, OSError):
        pass

    from opentsdb_rollup_rust_spark.operators.rollup import (
        cascade_reagg,
        fused_tier_rollup,
    )
    from opentsdb_rollup_rust_spark.session import get_spark

    extra = {
        "spark.ui.showConsoleProgress": "false",
        "spark.local.dir": "/dev/shm/spark-tmp",
    }
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra[k] = v
    if args.eventlog:
        os.makedirs(args.eventlog, exist_ok=True)
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = args.eventlog

    spark = get_spark(
        app_name=f"probe{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf=extra,
    )
    path = f"/tmp/spark_graft_bench/seqs_{args.seqs}_f256.parquet"
    seqs = spark.read.parquet(path)

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    runs = []
    for i in range(args.warmup + args.reps):
        t0 = time.monotonic()
        r1m = fused_tier_rollup(seqs, "1m", impl="arrow").persist()
        sink(r1m)
        sink(cascade_reagg(cascade_reagg(r1m, "1h"), "1d"))
        r1m.unpersist()
        runs.append(round(time.monotonic() - t0, 2))
        print(f"rep{i}: {runs[-1]}s", file=sys.stderr, flush=True)
    timed = runs[args.warmup:]
    n_points = args.seqs * 6
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "conf": args.conf,
                "runs": runs,
                "best": min(timed),
                "pps_best": round(n_points / min(timed), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
