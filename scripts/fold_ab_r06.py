"""r06 A/B: exact-JVM alternatives for the derive token-sum fold.

The r6 isolation measured the interpreted `F.aggregate` token-sum fold
at ~15.4 s of the 23.8 s sf1.0 derive_wide("sql") stage (65%). Five
alternatives were A/B'd and lost (OPTIMIZATION_r06.md §5). This script
tests the one exact-JVM formulation not yet tried: fusing the per-row
sum into a codegen'd hash aggregation via posexplode — per-row key =
doc_id, carried per-row stats emitted only at pos 0 — plus the
int-accumulator fold (exact for the generator's bounded tokens:
len<=512, v<50257 -> row sum <= 25.7M < 2^31; ANSI overflow impossible).

Usage: python scripts/fold_ab_r06.py [n_seqs] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except OSError:
        pass

    from opentsdb_rollup_rust_spark.session import get_spark
    from opentsdb_rollup_rust_spark.sources.synth import synth_sequences
    from opentsdb_rollup_rust_spark.operators.points import event_time
    from opentsdb_rollup_rust_spark.operators.rollup import fused_tier_rollup
    from opentsdb_rollup_rust_spark.config import TOKEN_STATS

    gb = int(os.environ.get("SPARK_GRAFT_MEM_PER_CORE_GB", "2"))
    spark = get_spark(
        app_name="fold-ab-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": f"{gb * cpus}g",
            "spark.driver.extraJavaOptions": f"-Xms{gb * cpus}g -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("WARN")

    seq_path = f"/tmp/spark_graft_bench/seqs_{n_seqs}_f256.parquet"
    if not os.path.exists(seq_path):
        synth_sequences(spark, n_seqs, partitions=256).write.mode(
            "overwrite"
        ).parquet(seq_path)
    seqs = spark.read.parquet(seq_path)

    # ---- variant builders: each returns the fused 1m rollup DF ----

    def v_baseline(src):
        # the r5 long-accumulator fold, inline (the tree's sql path
        # now defaults to the int accumulator, so build the old form
        # explicitly to keep this A/B honest)
        from opentsdb_rollup_rust_spark.operators.rollup import fused_rollup_wide

        t = F.col("tokens")
        wide = src.select(
            F.col("source"),
            F.unix_timestamp(event_time("doc_id")).alias("ts_sec"),
            F.size(t).cast("long").alias("n_tok"),
            F.aggregate(
                t, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
            ).alias("tok_sum"),
            F.array_min(t).cast("long").alias("tok_min"),
            F.array_max(t).cast("long").alias("tok_max"),
            F.element_at(t, 1).cast("long").alias("tok_first"),
            F.element_at(t, -1).cast("long").alias("tok_last"),
        )
        return fused_rollup_wide(wide, "1m")

    def _wide_intacc(src):
        t = F.col("tokens")
        return src.select(
            F.col("source"),
            F.unix_timestamp(event_time("doc_id")).alias("ts_sec"),
            F.size(t).cast("long").alias("n_tok"),
            F.aggregate(t, F.lit(0), lambda a, x: a + x).cast("long").alias(
                "tok_sum"
            ),
            F.array_min(t).cast("long").alias("tok_min"),
            F.array_max(t).cast("long").alias("tok_max"),
            F.element_at(t, 1).cast("long").alias("tok_first"),
            F.element_at(t, -1).cast("long").alias("tok_last"),
        )

    def v_intacc(src):
        from opentsdb_rollup_rust_spark.operators.rollup import fused_rollup_wide

        return fused_rollup_wide(_wide_intacc(src), "1m")

    def v_explode(src):
        from opentsdb_rollup_rust_spark.operators.rollup import fused_rollup_wide

        t = F.col("tokens")
        pre = src.select(
            F.col("doc_id"),
            F.col("source"),
            F.unix_timestamp(event_time("doc_id")).alias("ts_sec"),
            F.size(t).cast("long").alias("n_tok"),
            F.array_min(t).cast("long").alias("tok_min"),
            F.array_max(t).cast("long").alias("tok_max"),
            F.element_at(t, 1).cast("long").alias("tok_first"),
            F.element_at(t, -1).cast("long").alias("tok_last"),
            F.posexplode(t).alias("pos", "tok"),
        )
        # string columns go in the GROUP KEY (hash-agg eligible); all
        # agg buffers are longs — a string min buffer forces
        # SortAggregate, which sorts the exploded stream and OOMs
        first = F.col("pos") == 0
        per_row = pre.groupBy("doc_id", "source").agg(
            F.min(F.when(first, F.col("ts_sec"))).alias("ts_sec"),
            F.min(F.when(first, F.col("n_tok"))).alias("n_tok"),
            F.sum(F.col("tok").cast("long")).alias("tok_sum"),
            F.min(F.when(first, F.col("tok_min"))).alias("tok_min"),
            F.min(F.when(first, F.col("tok_max"))).alias("tok_max"),
            F.min(F.when(first, F.col("tok_first"))).alias("tok_first"),
            F.min(F.when(first, F.col("tok_last"))).alias("tok_last"),
        )
        wide = per_row.select("source", "ts_sec", *TOKEN_STATS)
        return fused_rollup_wide(wide, "1m")

    # explode ruled out by measurement: 222.9 s vs 12.7/8.4 at 12M seqs
    # (the 60M-group hash agg over the 3.6B exploded rows spills; with
    # string min buffers it degrades further to a SortAggregate OOM).
    # Keep it runnable via FOLD_AB_EXPLODE=1 for the record.
    variants = {
        "baseline_sql": v_baseline,
        "intacc": v_intacc,
    }
    if os.environ.get("FOLD_AB_EXPLODE") == "1":
        variants["explode"] = v_explode

    # correctness spot check first — full row equality vs baseline on 5k seqs
    small = synth_sequences(spark, 5000, partitions=4).cache()
    norm = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    base_rows = norm(v_baseline(small))
    for name, fn in variants.items():
        if name == "baseline_sql":
            continue
        rows = norm(fn(small))
        assert rows == base_rows, f"{name}: MISMATCH vs baseline"
        print(f"{name}: exact match on 5k-seq fused rollup", flush=True)
    small.unpersist()

    # interleaved ABAB timing
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"fold-ab:{name}:rep{r}")
            t0 = time.monotonic()
            _sink(fn(seqs))
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{r} {name:14s} {dt:7.2f} s", flush=True)

    print("---")
    for name, ts in times.items():
        print(f"{name:14s} best {min(ts):7.2f}  all {[round(x, 2) for x in ts]}")


if __name__ == "__main__":
    main()
