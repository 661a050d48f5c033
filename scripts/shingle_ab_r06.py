"""r06 A/B: k-gram shingle construction — zip_with chain vs one
lookahead-regex pass.

The r6 isolation measured `_shingles_from_words` (the 2x zip_with +
concat_ws chain) at ~2.8 s over sf1.0's 50k docs, feeding 5 dedup
queries. Alternative: ONE regex pass over the space-joined words with
a zero-width lookahead capture — `(?:^| )(?=((?:\\S+ ){k-1}\\S+))` —
which matches exactly at word starts (the consumed leading space /
anchor) and captures the k-word gram without consuming it, so
overlapping grams all surface. Equivalent to the zip_with build
whenever the words array has no empty entries (split(trim(text),'\\s+')
only yields an empty entry for text starting with non-space
whitespace, which the document generator never produces — verified:
0 docs with tabs/newlines/leading blanks at sf0.1).

Usage: python scripts/shingle_ab_r06.py [mult] [reps]
  mult: corpus multiplier (default 20 — sf0.1 docs x 20 ~ sf1.0 scale)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


GRAM_RE = r"(?:^| )(?=((?:\S+ ){2}\S+))"


def regex_shingles_from_words(w, k: int = 3):
    assert k == 3
    joined = F.array_join(w, " ")
    grams = F.regexp_extract_all(joined, F.lit(GRAM_RE), F.lit(1))
    return F.array_distinct(
        F.when(F.size(w) >= F.lit(k), grams).otherwise(F.array(joined))
    )


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except OSError:
        pass

    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        _shingles_from_words,
    )
    from opentsdb_rollup_rust_spark.pipeline.text import doc_words
    from opentsdb_rollup_rust_spark.session import get_spark

    spark = get_spark(
        app_name="shingle-ab-r06",
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

    def old_zipwith_shingles(w, k: int = 3):
        # the r1-r5 construction, inline (the tree's _shingles_from_words
        # is now the guarded regex hybrid)
        n = F.size(w)
        acc = w
        for j in range(1, k):
            acc = F.zip_with(
                acc, F.slice(w, j + 1, n), lambda a, b: F.concat_ws(" ", a, b)
            )
        mk = F.slice(acc, 1, n - F.lit(k - 1))
        return F.array_distinct(
            F.when(n >= F.lit(k), mk).otherwise(F.array(F.array_join(w, " ")))
        )

    def v_zipwith(d):
        w = d.select("doc_id", doc_words(F.col("text")).alias("_w"))
        return w.select(
            "doc_id", old_zipwith_shingles(F.col("_w")).alias("shingles")
        )

    def v_regex(d):
        # the tree's guarded hybrid (regex + per-row empty-word fallback)
        w = d.select("doc_id", doc_words(F.col("text")).alias("_w"))
        return w.select(
            "doc_id", _shingles_from_words(F.col("_w")).alias("shingles")
        )

    # exactness: full equality on the real (unreplicated) docs
    a = {r["doc_id"]: r["shingles"] for r in v_zipwith(docs).collect()}
    b = {r["doc_id"]: r["shingles"] for r in v_regex(docs).collect()}
    assert a == b, "shingle construction mismatch"
    print(f"exact match on {len(a)} docs (incl order)")

    # also force evaluation shape comparable to consumers: explode+count
    times = {"zipwith": [], "regex": []}
    for r in range(reps):
        for name, fn in (("zipwith", v_zipwith), ("regex", v_regex)):
            spark.sparkContext.setJobDescription(f"shingle-ab:{name}:{r}")
            t0 = time.monotonic()
            _sink(fn(big).select("doc_id", F.explode("shingles").alias("s")))
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"rep{r} {name:8s} {dt:6.2f} s", flush=True)
    print("---")
    for n, ts in times.items():
        print(f"{n:8s} best {min(ts):6.2f}  all {[round(x,2) for x in ts]}")


if __name__ == "__main__":
    main()
