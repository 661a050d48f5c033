"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py on purpose: this file isolates
individual declared queries with the noop sink, times N reps, and can
dump .explain("formatted") to plans/r06/. It changes no measurement
methodology of bench.py — it exists so the optimization round can
cite per-query before/after numbers and plan shapes without touching
the driver's harness.

Usage:
  python bench_extra.py <query> [<query> ...]          # time at $SPARK_GRAFT_SF_DIR
  BENCH_EXTRA_PLAN=plans/r06/suffix python bench_extra.py <query>
      also writes plans/r06/<query>_<suffix>.txt
  BENCH_EXTRA_REPS=N   (default 2; reported: all reps + min)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    plan_spec = os.environ.get("BENCH_EXTRA_PLAN", "")

    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except (PermissionError, OSError):
        pass

    import __spark_entry__ as E
    from opentsdb_rollup_rust_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": "64g",
        },
    )

    names = sys.argv[1:]
    qs = E.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if plan_spec:
            d, _, suffix = plan_spec.partition(":")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{name}_{suffix or 'plan'}.txt"), "w") as f:
                f.write(fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                    fn(spark, sf_dir)._jdf.queryExecution(), "formatted"))
        runs = []
        if reps == 0:
            out[name] = {"runs": [], "min": None}
            continue
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"runs": runs, "min": min(runs)}
        print(f"{name}: {runs} min={min(runs)}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "results": out}))


if __name__ == "__main__":
    main()
