"""r06 A/B: connected-components convergence probe — separate
join-probe action per round (r5) vs probe fused into the checkpoint
materialization (r6). Interleaved ABAB on the identical pair input.

Usage: python scripts/cc_probe_ab_r06.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def cc_old(edges: DataFrame, src="doc_a", dst="doc_b", max_iter=50) -> DataFrame:
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )
    labels = (
        bidir.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = bidir.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError("no fixpoint")
    bidir.unpersist()
    return labels.select("node", F.col("label").alias("cluster"))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except OSError:
        pass

    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from opentsdb_rollup_rust_spark.session import get_spark

    spark = get_spark(
        app_name="cc-ab-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    pairs = minhash_lsh_pairs(docs, "text").select("doc_a", "doc_b").localCheckpoint()
    print("pairs:", pairs.count())

    # exactness
    a = sorted(map(tuple, cc_old(pairs).collect()))
    b = sorted(map(tuple, connected_components(pairs).collect()))
    assert a == b, "cluster mismatch old vs new"
    print(f"exact match: {len(a)} nodes")

    times = {"old": [], "new": []}
    for r in range(reps):
        for name, fn in (("old", cc_old), ("new", connected_components)):
            spark.sparkContext.setJobDescription(f"cc-ab:{name}:{r}")
            t0 = time.monotonic()
            _sink(fn(pairs))
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{r} {name:4s} {dt:6.2f} s", flush=True)
    print("---")
    for n, ts in times.items():
        print(f"{n:4s} best {min(ts):6.2f}  all {[round(x,2) for x in ts]}")


if __name__ == "__main__":
    main()
