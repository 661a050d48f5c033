"""Standalone-cluster scaling protocol: N vs 4N real executor JVMs.

The north rule (BASELINE.json:14) asks for ">=0.8 throughput scaling
efficiency between N and 4N executors" measured "via spark-submit
--py-files on a multi-executor cluster". The local[8]/local[32] proxy
in scripts/scaling_run.py scales CORES inside one JVM; this harness
scales EXECUTORS: it boots a real standalone master, then per leg
starts 1 (N) or 4 (4N) worker JVMs of 8 cores each, and spark-submits
jobs/bench_cluster.py with the engine shipped as ``--py-files
engine.zip``. Each worker hosts exactly one 8-core executor JVM
(spark.executor.cores == worker cores), so the legs are literally
1 executor vs 4 executors: separate heaps, separate python worker
pools, shuffle crossing process boundaries through the block-transfer
service — everything a real 4-node step changes except the physical
network and per-node DRAM.

Per-node honesty on one box: worker i (and therefore its executor and
python workers, which inherit the affinity mask) is PINNED to the
8-core slice [8i, 8i+8) — the stand-in for "one node = 8 cores"; the
same sched_setaffinity rationale as bench.py's local-mode pinning.
The submit driver itself is unpinned but identical across legs (it
only schedules; the sink is noop, no collect). The one confound a
real cluster does not have remains the shared socket: all-core turbo
and one DRAM controller under 32 active cores — the same ceiling
probes as scaling_run.py (compute + membw, pre/mid/post medians) are
reported alongside, and the normalized number is the
cluster-relevant one for exactly the reason documented there.

Usage:
  python scripts/standalone_scaling.py [--seqs 24000000]
      [--warmup 2] [--reps 5] [--workers 1 4] [--cores-per-worker 8]
      [--out BENCH/standalone_last.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from scaling_run import hw_throughput, membw_throughput  # noqa: E402


def spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _wait_for(path: str, needle: str, timeout_s: float, what: str) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if os.path.exists(path):
            with open(path, errors="replace") as f:
                if needle in f.read():
                    return
        time.sleep(0.5)
    tail = ""
    if os.path.exists(path):
        with open(path, errors="replace") as f:
            tail = f.read()[-2000:]
    raise RuntimeError(f"{what} did not report '{needle}' in {timeout_s}s\n{tail}")


class Cluster:
    """A throwaway standalone master + fixed-size worker fleet.

    Context-manages hard teardown: master/workers are plain Popen
    children killed (SIGTERM, then SIGKILL) on exit — a leaked 16g
    pretouch worker would poison every later measurement on the box.
    """

    def __init__(
        self,
        n_workers: int,
        cores_per_worker: int,
        mem_per_core_gb: int,
        workdir: str,
        pin: bool = True,
        port: int = 7077,
    ):
        self.n = n_workers
        self.cores = cores_per_worker
        self.mem_gb = mem_per_core_gb * cores_per_worker
        self.dir = workdir
        self.pin = pin
        self.port = port
        self.url = f"spark://127.0.0.1:{port}"
        self.procs: list[subprocess.Popen] = []

    def _env(self) -> dict:
        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        # executors shuffle/spill to tmpfs like the local-mode protocol
        # (worker-level env wins over app conf for standalone executors)
        env["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-tmp"
        # keep daemon JVMs small — they host no tasks
        env["SPARK_DAEMON_MEMORY"] = "1g"
        return env

    def __enter__(self) -> "Cluster":
        os.makedirs(self.dir, exist_ok=True)
        os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
        sc = os.path.join(spark_home(), "bin", "spark-class")
        mlog = os.path.join(self.dir, "master.log")
        self.procs.append(
            subprocess.Popen(
                [
                    sc,
                    "org.apache.spark.deploy.master.Master",
                    "--host",
                    "127.0.0.1",
                    "--port",
                    str(self.port),
                    "--webui-port",
                    str(self.port + 1000),
                ],
                stdout=open(mlog, "w"),
                stderr=subprocess.STDOUT,
                env=self._env(),
            )
        )
        _wait_for(mlog, "ALIVE", 60, "master")
        ncpu = os.cpu_count() or 32
        for i in range(self.n):
            wlog = os.path.join(self.dir, f"worker{i}.log")

            def _pin(i: int = i):
                if self.pin:
                    lo = (i * self.cores) % ncpu
                    os.sched_setaffinity(
                        0, set(range(lo, lo + self.cores))
                    )

            self.procs.append(
                subprocess.Popen(
                    [
                        sc,
                        "org.apache.spark.deploy.worker.Worker",
                        "--cores",
                        str(self.cores),
                        # worker advertises executor-heap + overhead room
                        "--memory",
                        f"{self.mem_gb + 2}g",
                        "--webui-port",
                        str(self.port + 1100 + i),
                        "--work-dir",
                        os.path.join(self.dir, f"w{i}"),
                        self.url,
                    ],
                    stdout=open(wlog, "w"),
                    stderr=subprocess.STDOUT,
                    env=self._env(),
                    preexec_fn=_pin,
                )
            )
        for i in range(self.n):
            _wait_for(
                os.path.join(self.dir, f"worker{i}.log"),
                "Successfully registered",
                60,
                f"worker{i}",
            )
        return self

    def __exit__(self, *exc) -> None:
        for p in reversed(self.procs):
            p.terminate()
        deadline = time.monotonic() + 15
        for p in self.procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.monotonic()))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
        self.procs.clear()
        # executor JVMs are children of the workers; a worker that died
        # to SIGKILL can orphan a 16g AlwaysPreTouch executor, which
        # would poison every later leg — sweep them best-effort
        subprocess.run(
            ["pkill", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True,
        )
        time.sleep(1.0)

    def submit_bench(
        self,
        input_path: str,
        seqs: int,
        warmup: int,
        reps: int,
        timeout_s: float = 3600,
    ) -> dict:
        total_cores = self.n * self.cores
        cmd = [
            os.path.join(spark_home(), "bin", "spark-submit"),
            "--master",
            self.url,
            "--py-files",
            os.path.join(REPO, "engine.zip"),
            "--conf",
            f"spark.executor.cores={self.cores}",
            "--conf",
            f"spark.executor.memory={self.mem_gb}g",
            "--conf",
            f"spark.cores.max={total_cores}",
            "--conf",
            f"spark.sql.shuffle.partitions={total_cores}",
            "--conf",
            "spark.driver.memory=4g",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.ui.showConsoleProgress=false",
            "--conf",
            "spark.local.dir=/dev/shm/spark-tmp",
            # same heap discipline as bench.py: fault+zero executor
            # heaps ONCE at JVM start (untimed), not inside timed reps
            "--conf",
            (
                "spark.executor.extraJavaOptions="
                f"-Xms{self.mem_gb}g -XX:+AlwaysPreTouch"
            ),
            os.path.join(REPO, "jobs", "bench_cluster.py"),
            "--input",
            input_path,
            "--seqs",
            str(seqs),
            "--warmup",
            str(warmup),
            "--reps",
            str(reps),
            "--wait-executors",
            str(self.n),
            # registration waits out the untimed -Xms/AlwaysPreTouch
            # page-zeroing: 4 concurrent 16g heaps exceed 120s on this
            # host's fault path (observed: 4-worker leg never registered)
            "--wait-timeout",
            "600",
        ]
        out = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=self._env(),
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"submit failed rc={out.returncode}\n"
                f"stdout tail: {out.stdout[-1500:]}\n"
                f"stderr tail: {out.stderr[-1500:]}"
            )
        return json.loads(out.stdout.strip().splitlines()[-1])


def materialize_input(seqs: int) -> str:
    """Same fixed 256-file synthetic table as bench.py (untimed)."""
    path = f"/tmp/spark_graft_bench/seqs_{seqs}_f256.parquet"
    if os.path.exists(path):
        return path
    from opentsdb_rollup_rust_spark.session import get_spark
    from opentsdb_rollup_rust_spark.sources.synth import synth_sequences

    spark = get_spark(
        app_name="sa-input",
        master="local[16]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    synth_sequences(spark, seqs, partitions=256).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=24_000_000)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--workers", type=int, nargs=2, default=(1, 4))
    ap.add_argument("--cores-per-worker", type=int, default=8)
    ap.add_argument("--mem-per-core-gb", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH", "standalone_last.md")
    )
    ap.add_argument("--abort-below-mops", type=float, default=None)
    args = ap.parse_args()
    lo_w, hi_w = args.workers
    cpw = args.cores_per_worker
    factor = hi_w / lo_w

    # rebuild engine.zip so the shipped code is never stale vs the tree
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh")],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    input_path = materialize_input(args.seqs)
    print(f"input ready: {input_path}", file=sys.stderr)

    # ceiling probes: same pre/mid/post median discipline as
    # scaling_run.py, at the two TOTAL core counts
    lo_c, hi_c = lo_w * cpw, hi_w * cpw
    hw: dict[int, list[float]] = {lo_c: [], hi_c: []}
    mb: dict[int, list[float]] = {lo_c: [], hi_c: []}

    def sample(tag: str) -> None:
        for c in (lo_c, hi_c):
            hw[c].append(hw_throughput(c))
            mb[c].append(membw_throughput(c))
        print(
            f"ceiling [{tag}]: compute {hw[lo_c][-1]/1e6:.0f} -> "
            f"{hw[hi_c][-1]/1e6:.0f} Mops/s; membw {mb[lo_c][-1]:.1f} -> "
            f"{mb[hi_c][-1]:.1f} passes/s",
            file=sys.stderr,
        )

    sample("pre")
    res: dict[int, dict] = {}
    for n_workers in (lo_w, hi_w):
        base = f"/tmp/sa_cluster_{n_workers}w"
        shutil.rmtree(base, ignore_errors=True)
        with Cluster(
            n_workers, cpw, args.mem_per_core_gb, base
        ) as cl:
            print(
                f"cluster up: {n_workers} worker(s) x {cpw} cores",
                file=sys.stderr,
            )
            res[n_workers] = cl.submit_bench(
                input_path, args.seqs, args.warmup, args.reps
            )
            print(json.dumps(res[n_workers]), file=sys.stderr)
        if n_workers == lo_w:
            if args.abort_below_mops is not None:
                m = hw_throughput(lo_c) / 1e6
                if m < args.abort_below_mops:
                    print(
                        json.dumps(
                            {
                                "metric": "standalone_scaling_efficiency",
                                "aborted": "host fell back mid-run",
                                "midrun_probe_mops": round(m, 1),
                                "lo_level": res[lo_w],
                            }
                        )
                    )
                    sys.exit(75)  # EX_TEMPFAIL: watcher may retry
            sample("mid")
    sample("post")

    lo_pps = res[lo_w]["points_per_sec_best"]
    hi_pps = res[hi_w]["points_per_sec_best"]
    eff = hi_pps / (factor * lo_pps)
    hwm = {c: statistics.median(v) for c, v in hw.items()}
    hw_eff = hwm[hi_c] / (factor * hwm[lo_c])
    mbm = {c: statistics.median(v) for c, v in mb.items()}
    out = {
        "metric": "standalone_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "mode": "standalone (separate worker+executor JVMs, pinned "
        "8-core slices, spark-submit --py-files engine.zip)",
        "normalized_to_hw_ceiling": round(min(eff / hw_eff, 1.5), 3),
        "hw_ceiling_eff": round(hw_eff, 3),
        "membw_ceiling_eff": round(
            mbm[hi_c] / (factor * mbm[lo_c]), 3
        ),
        "hw_ceiling_samples": {
            str(c): [round(x / 1e6, 1) for x in v] for c, v in hw.items()
        },
        "membw_ceiling_samples": {
            str(c): [round(x, 1) for x in v] for c, v in mb.items()
        },
        "levels": {
            str(lo_w): res[lo_w],
            str(hi_w): res[hi_w],
        },
        "n_sequences": args.seqs,
    }
    line = json.dumps(out)
    print(line)
    with open(args.out, "w") as f:
        f.write(
            "# standalone-cluster scaling run (N vs 4N executor JVMs)\n\n"
            "```json\n" + json.dumps(out, indent=1) + "\n```\n"
        )
    print(f"wrote {args.out} eff={eff:.3f}", file=sys.stderr)


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, lambda *a: sys.exit(143))
    main()
