"""r06 evidence probe for api_query_delete_read: how many store files
does the delete rewrite before vs after the time-clustered append
layout? (The replace_range commit summary records files_kept /
files_rewritten — metadata-first pruning is directly observable.)

Runs the demo fixture twice against sf0.1: once with the r5 random
layout (plain append) and once with the r6 repartitionByRange+sort
layout, printing each run's replace summary and wall time.

Usage: python scripts/delete_read_evidence_r06.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except OSError:
        pass

    import __spark_entry__ as E
    from opentsdb_rollup_rust_spark.operators.tagquery import TagFilter
    from opentsdb_rollup_rust_spark.plans.api_query import (
        QuerySpec,
        api_query_delete,
    )
    from opentsdb_rollup_rust_spark.session import get_spark
    from opentsdb_rollup_rust_spark.sources.store import ManifestStore

    spark = get_spark(
        app_name="delete-evidence-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("WARN")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    pts, lo, end = E._api_spec_range(spark, sf_dir)
    t0e = lo + (end - lo) // 3
    t1e = lo + 2 * ((end - lo) // 3)
    spec = QuerySpec(
        metric="click",
        start=t0e,
        end=t1e,
        filters=(
            TagFilter("literal_or", "host", "web1|web3"),
            TagFilter("literal_or", "env", "prod"),
        ),
    )
    base = pts.select("series_id", "ts", "value", "tags")

    for name, frame in (
        ("random-layout (r5)", base),
        (
            "ts-clustered (r6)",
            base.repartitionByRange(F.col("ts")).sortWithinPartitions("ts"),
        ),
    ):
        for rep in range(3):
            store = ManifestStore(
                spark, tempfile.mkdtemp(prefix="del_evi_")
            )
            w0 = time.monotonic()
            store.append("api_pts", frame)
            res = api_query_delete(store, "api_pts", spec)
            rem = store.read("api_pts")
            out = rem.groupBy(
                "series_id",
                F.element_at("tags", F.lit("host")).alias("host"),
                (
                    F.floor(F.unix_timestamp("ts") / 86400).cast("long")
                    * 86400
                ).alias("w_start"),
            ).agg(
                F.sum("value").cast("long").alias("sum_v"),
                F.count("*").alias("cnt"),
            )
            _sink(out)
            wall = time.monotonic() - w0
            print(
                f"{name} rep{rep}: kept={res['files_kept']} "
                f"rewritten={res['files_rewritten']} wall={wall:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
