"""Across-JVM interleaved A/B: local[8] heap 16g (2 g/core, the
r4/r5 protocol) vs 24g (the r1-r3 protocol's fixed heap).

Motivation (BENCH/BASELINE.md run 23 note): every r1-r3 protocol run
gave local[8] a 24g heap; r4 switched to constant heap-per-core
(2 g/core -> 16g at local[8], 64g at local[32]) because holding 24g
at BOTH levels under-provisions the 4N level. Since then the best
local[8] legs read 44.5-47 s where the r3 plateau was 38-44 s. If
16g costs ~10% at 8 cores, the per-core provisioning (not the host)
explains part of the gap — worth knowing even though the protocol
keeps constant heap-per-core (the cluster-honest proxy: a real 4N
step brings 4x aggregate heap).

Heap is a JVM startup option, so this interleaves across fresh JVM
invocations of bench.py (A B A B ...), each pinned to 8 cores with
pretouch; any host drift lands on both configs alternately. Each
invocation reports its per-rep walls; we compare per-config minima
(min = contention-free capability, the protocol's own comparator).

Usage: python scripts/heap_ab.py [--pairs 2] [--seqs 24000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_run import hw_throughput  # noqa: E402


def run_once(gb_per_core: int, seqs: int, warmup: int, reps: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_MEM_PER_CORE_GB=str(gb_per_core),
        BENCH_SEQS=str(seqs),
        BENCH_WARMUP=str(warmup),
        BENCH_REPS=str(reps),
        BENCH_QUERIES="none",
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
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--seqs", type=int, default=24_000_000)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    runs: dict[str, list[float]] = {"16g": [], "24g": []}
    probes: list[float] = []
    for p in range(args.pairs):
        probes.append(round(hw_throughput(8) / 1e6, 1))
        print(f"pair {p+1} probe: {probes[-1]} Mops/s", file=sys.stderr)
        for gb, key in ((2, "16g"), (3, "24g")):
            r = run_once(gb, args.seqs, args.warmup, args.reps)
            timed = r["pipeline_runs"][args.warmup :]
            runs[key].extend(timed)
            print(f"  {key}: {timed}", file=sys.stderr, flush=True)

    out = {
        "ab": "local8_heap",
        "seqs": args.seqs,
        "probes_mops": probes,
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items() if v},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
