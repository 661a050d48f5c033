"""Scaling-efficiency protocol (BASELINE.md §bench / SURVEY.md §6).

The north rule requires >=0.8 throughput scaling efficiency between N
and 4N executors; this sandbox has no cluster, so per the task brief
the proxy is the same job at two parallelism levels: local[8] vs
local[32] on the identical input (same 64-file parquet layout, same
code, same confs except parallelism).

Runs bench.py in a fresh JVM per (cpus, run) so no warm caches leak
across levels; takes the median of `runs` per level; writes
BENCH/BASELINE.md and prints one JSON summary line.

Usage: python scripts/scaling_run.py [--runs 3] [--seqs 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, seqs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_SEQS=str(seqs),
        BENCH_QUERIES="none",  # pipeline throughput only
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--seqs", type=int, default=400_000)
    ap.add_argument("--levels", type=int, nargs=2, default=(8, 32))
    args = ap.parse_args()

    lo, hi = args.levels
    results: dict[int, list[dict]] = {lo: [], hi: []}
    for cpus in (lo, hi):
        for r in range(args.runs):
            res = run_bench(cpus, args.seqs)
            results[cpus].append(res)
            print(
                f"local[{cpus}] run {r + 1}/{args.runs}: "
                f"{res['points_per_sec']:.0f} pts/s "
                f"({res['value']}s wall, {res['bytes_per_point']} B/pt)",
                file=sys.stderr,
            )

    med = {
        c: statistics.median(x["points_per_sec"] for x in results[c])
        for c in (lo, hi)
    }
    bpp = statistics.median(x["bytes_per_point"] for x in results[hi])
    factor = hi / lo
    eff = (med[hi] / med[lo]) / factor

    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "levels": {str(lo): round(med[lo], 1), str(hi): round(med[hi], 1)},
        "bytes_per_point": bpp,
        "n_sequences": args.seqs,
        "runs_per_level": args.runs,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    rows_lo = ", ".join(f"{x['points_per_sec']:.0f}" for x in results[lo])
    rows_hi = ", ".join(f"{x['points_per_sec']:.0f}" for x in results[hi])
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured baseline (protocol: BASELINE.md, SURVEY.md §6)

Same deterministic input ({args.seqs} synthetic sequences = {args.seqs * 6}
metric points, 64-file parquet, seedless-deterministic xxhash synth),
same code, fresh JVM per run; throughput = input metric points /
wall-clock of read -> derive -> 1m rollup -> 1h -> 1d cascade -> sink.
local[{lo}] vs local[{hi}] is the sandbox proxy for N vs 4N executors
(task brief: no real cluster available here).

| parallelism | points/sec (median of {args.runs}) | all runs |
|---|---|---|
| local[{lo}] | {med[lo]:.0f} | {rows_lo} |
| local[{hi}] | {med[hi]:.0f} | {rows_hi} |

**Scaling efficiency {lo}->{hi} = (pps_{hi}/pps_{lo})/{factor:.0f} =
{eff:.3f}** (required: >= 0.8, BASELINE.json:2,14).

Compression: **{bpp} bytes/point** (Gorilla codec, 1m tier,
sum/count/min/max chunks; published Gorilla yardstick 1.37 B/pt on
production ODS floats — our integer token-stat series have different
value entropy).

Raw per-run JSON:

```json
{json.dumps({str(k): v for k, v in results.items()}, indent=1)}
```
""")
    print(f"wrote BENCH/BASELINE.md (efficiency={eff:.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
