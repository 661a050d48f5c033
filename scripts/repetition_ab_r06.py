"""r06 A/B: repetition_profile run statistics — struct-accumulator
fold (previous) vs run-start positions via filter(sequence) (current).
Interleaved ABAB over the sf0.1 docs replicated to ~sf1.0 scale.

Usage: python scripts/repetition_ab_r06.py [mult] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def old_repetition(docs, text_col="text"):
    from opentsdb_rollup_rust_spark.pipeline.text import doc_words

    staged = docs.select("doc_id", doc_words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    tail = F.size(w) - F.lit(1)
    grams = F.zip_with(
        F.slice(w, 1, tail),
        F.slice(w, 2, tail),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = staged.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.size(F.array_distinct(w)).cast("long").alias("d_words"),
        F.array_sort(grams).alias("sg"),
    ).where(F.col("n_words") >= 2)
    runs = F.aggregate(
        F.col("sg"),
        F.struct(
            F.lit(0).cast("int").alias("i"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("mx"),
            F.lit(0).cast("long").alias("d"),
        ),
        lambda acc, x: F.struct(
            (acc["i"] + F.lit(1)).alias("i"),
            F.when(
                (acc["i"] > 0) & (F.element_at(F.col("sg"), acc["i"]) == x),
                acc["run"] + F.lit(1).cast("long"),
            )
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(
                    (acc["i"] > 0)
                    & (F.element_at(F.col("sg"), acc["i"]) == x),
                    acc["run"] + F.lit(1).cast("long"),
                ).otherwise(F.lit(1).cast("long")),
            ).alias("mx"),
            (
                acc["d"]
                + F.when(
                    (acc["i"] > 0)
                    & (F.element_at(F.col("sg"), acc["i"]) == x),
                    F.lit(0).cast("long"),
                ).otherwise(F.lit(1).cast("long"))
            ).alias("d"),
        ),
    )
    agg = base.select(
        "doc_id",
        "n_words",
        "d_words",
        F.size("sg").cast("long").alias("n_2grams"),
        runs.alias("_r"),
    ).select(
        "doc_id",
        "n_words",
        "d_words",
        "n_2grams",
        F.col("_r.d").alias("d_2grams"),
        F.col("_r.mx").alias("top_cnt"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        F.expr("(n_words - d_words) * 1000000 DIV n_words").alias(
            "dup_word_ppm"
        ),
        "n_2grams",
        F.expr("(n_2grams - d_2grams) * 1000000 DIV n_2grams").alias(
            "dup_2gram_ppm"
        ),
        F.expr("top_cnt * 1000000 DIV n_2grams").alias("top_2gram_ppm"),
    )


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except OSError:
        pass

    from opentsdb_rollup_rust_spark.pipeline.text import repetition_profile
    from opentsdb_rollup_rust_spark.session import get_spark

    spark = get_spark(
        app_name="rep-ab-r06",
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
    big = (
        docs.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
        .select(
            F.concat_ws("#", "doc_id", F.col("_rep").cast("string")).alias(
                "doc_id"
            ),
            "text",
        )
        .repartition(cpus * 4)
        .persist()
    )
    print("corpus rows:", big.count())

    a = sorted(map(tuple, old_repetition(docs).collect()))
    b = sorted(map(tuple, repetition_profile(docs).collect()))
    assert a == b, "repetition mismatch old vs new"
    print(f"exact match on {len(a)} docs")

    times = {"old": [], "new": []}
    for r in range(reps):
        for name, fn in (("old", old_repetition), ("new", repetition_profile)):
            spark.sparkContext.setJobDescription(f"rep-ab:{name}:{r}")
            t0 = time.monotonic()
            _sink(fn(big))
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{r} {name:4s} {dt:6.2f} s", flush=True)
    print("---")
    for n, ts in times.items():
        print(f"{n:4s} best {min(ts):6.2f}  all {[round(x,2) for x in ts]}")


if __name__ == "__main__":
    main()
