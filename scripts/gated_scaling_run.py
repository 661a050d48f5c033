"""Clean-window-gated scaling protocol (r3 VERDICT task #3).

The box's sustained kernel-time bursts are the dominant noise source
in the N->4N protocol (BENCH/BASELINE.md: every clean-window run
scored raw 0.69-0.83, every burst-window run 0.33-0.66, with the
no-Spark probes degrading in lockstep). This wrapper refuses to START
a protocol run until TWO CONSECUTIVE 8-core compute probes read
clean, so runs are launched only into windows the host is actually
honoring — the launch gate the round-3 verdict endorsed.

Gate: hw_throughput(8) >= CLEAN_MOPS twice in a row (clean history
reads ~130-148 Mops/s; bursts read 35-110). Between failed probes we
sleep and retry, up to --max-wait minutes, then run anyway with the
gate result disclosed in the output JSON (never silently).

Usage: python scripts/gated_scaling_run.py [--runs 1]
       [--clean-mops 120] [--max-wait 30] [scaling_run.py args...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_run import hw_throughput  # noqa: E402


def wait_for_clean_window(
    clean_mops: float, max_wait_min: float, need: int = 3
) -> tuple[bool, list[float]]:
    """`need` consecutive clean 8-core probes, or timeout. Returns
    (gated_ok, all probe samples in Mops/s). Run 21 showed 2
    consecutive 125-ish probes can still be a false plateau, so the
    default is now 3 — combined with scaling_run's mid-run abort."""
    samples: list[float] = []
    deadline = time.monotonic() + max_wait_min * 60
    consecutive = 0
    while time.monotonic() < deadline:
        m = hw_throughput(8) / 1e6
        samples.append(round(m, 1))
        consecutive = consecutive + 1 if m >= clean_mops else 0
        print(
            f"gate probe: {m:.1f} Mops/s "
            f"({consecutive}/{need} consecutive clean)",
            file=sys.stderr,
            flush=True,
        )
        if consecutive >= need:
            return True, samples
        time.sleep(20 if m >= clean_mops else 60)
    return False, samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--clean-mops", type=float, default=120.0)
    ap.add_argument("--max-wait", type=float, default=30.0)
    # abort threshold is deliberately LOOSER than the launch gate:
    # normal in-run jitter dips the probe ~10-15% below the idle
    # plateau even in clean windows, so gate at clean_mops but only
    # abort when the box has clearly fallen back to burst territory.
    ap.add_argument("--abort-below-mops", type=float, default=110.0)
    # a mid-run abort should not consume the run budget: retry the
    # whole gate+run cycle up to this many times per requested run.
    ap.add_argument("--max-aborts", type=int, default=5)
    # which protocol to gate: the local[8]/local[32] core-scaling run
    # (scaling_run.py) or the 1-vs-4 real-executor-JVM cluster run
    # (standalone_scaling.py) — the launch gate is identical
    ap.add_argument(
        "--target", choices=("local", "standalone"), default="local"
    )
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    for i in range(args.runs):
        aborts = 0
        while True:
            ok, samples = wait_for_clean_window(
                args.clean_mops, args.max_wait
            )
            print(
                json.dumps(
                    {"gate": "clean" if ok else "timeout", "probes": samples}
                ),
                flush=True,
            )
            script = (
                "scaling_run.py"
                if args.target == "local"
                else "standalone_scaling.py"
            )
            prefix = (
                "gated_run" if args.target == "local" else "gated_sa_run"
            )
            cmd = [
                sys.executable,
                os.path.join(REPO, "scripts", script),
                "--out",
                os.path.join(
                    REPO, "BENCH", f"{prefix}_{int(time.time())}.md"
                ),
                "--abort-below-mops",
                str(args.abort_below_mops),
            ] + [a for a in args.rest if a != "--"]
            print(
                f"launching protocol run {i + 1}/{args.runs}",
                file=sys.stderr,
            )
            rc = subprocess.run(cmd).returncode
            if rc == 75 and aborts < args.max_aborts:  # EX_TEMPFAIL
                aborts += 1
                print(
                    f"mid-run abort {aborts}/{args.max_aborts}; "
                    "re-arming gate",
                    file=sys.stderr,
                )
                continue
            if rc != 0:
                sys.exit(rc)
            break


if __name__ == "__main__":
    main()
