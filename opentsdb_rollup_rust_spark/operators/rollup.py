"""A1-A4 — the heart of the engine: tumbling rollups and the cascade.

Semantics (docs.opentsdb.net "Rollup And Pre-Aggregates" +
BASELINE.json:6):

- A1 tumbling_rollup: per (series, epoch-aligned window): SUM, COUNT,
  MIN, MAX. AVG IS NEVER STORED — sum+count make tiers losslessly
  re-aggregable.
- A2 cascade_reagg: coarser tier from finer tier:
  sum=sum(sum), count=sum(count), min=min(min), max=max(max).
  Never re-average. cascade(direct(x)) == direct-at-coarser(x) exactly
  because all four aggregators are decomposable and values are int64.
- A3 derived_avg: avg = sum/count at read time.
- A4 preaggregate: across-series aggregation (collapse the tag
  dimension) at the same windows — OpenTSDB's "pre-aggregates".

Spark notes: groupBy on (series_id, bucket) gets automatic partial
(map-side) + final hash aggregation from Catalyst — at 10^12-row scale
the partial agg collapses each task's rows to ~|series x windows per
task| before the exchange, which is the single most important scale
property of this plan. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import INTERVAL_SECONDS
from ..functions.timeutil import time_bucket

ROLLUP_COLS = ("series_id", "window_start", "interval", "sum", "count", "min", "max")


def tumbling_rollup(points: DataFrame, interval: str) -> DataFrame:
    """A1: points(series_id, ts, value) -> rollup rows at ``interval``."""
    sec = INTERVAL_SECONDS[interval]
    return (
        points.groupBy(
            "series_id", time_bucket("ts", sec).alias("window_start")
        )
        .agg(
            F.sum("value").alias("sum"),
            F.count("value").alias("count"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .select(
            "series_id",
            "window_start",
            F.lit(interval).alias("interval"),
            "sum",
            "count",
            "min",
            "max",
        )
    )


def cascade_reagg(finer: DataFrame, interval: str) -> DataFrame:
    """A2: re-aggregate a finer rollup tier to ``interval``."""
    sec = INTERVAL_SECONDS[interval]
    return (
        finer.groupBy(
            "series_id", time_bucket("window_start", sec).alias("window_start")
        )
        .agg(
            F.sum("sum").alias("sum"),
            F.sum("count").alias("count"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
        .select(
            "series_id",
            "window_start",
            F.lit(interval).alias("interval"),
            "sum",
            "count",
            "min",
            "max",
        )
    )


def derived_avg(rollup: DataFrame) -> DataFrame:
    """A3: attach read-time avg. Exact: long/long -> double once, at
    the edge; never fed back into storage. count=0 (zero-filled
    windows) => null avg — ANSI-safe, and semantically "no data"."""
    return rollup.withColumn(
        "avg",
        F.when(
            F.col("count") > 0,
            F.col("sum").cast("double") / F.col("count").cast("double"),
        ),
    )


def preaggregate(rollup: DataFrame, group_expr) -> DataFrame:
    """A4: collapse the series dimension — aggregate across series per
    window. ``group_expr`` maps series_id -> coarser key (e.g. source
    prefix); sum/count re-add, min/max re-extremize."""
    return (
        rollup.groupBy(group_expr.alias("group_key"), "window_start", "interval")
        .agg(
            F.sum("sum").alias("sum"),
            F.sum("count").alias("count"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
    )
