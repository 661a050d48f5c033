"""J1/J2/W1 — gap-fill for missing windows (BASELINE.json:6).

Fill policies mirror the OpenTSDB downsampler fill policies
(docs.opentsdb.net "Downsampling"):
  none  — missing windows absent (no spine join at all)
  zero  — value columns 0, count 0
  null  — spine row present, typed nulls
  nan   — query-output render: missing values as NaN doubles (count 0)
  ffill — forward-fill: carry last observed value per series

Step 1 (J1): dense per-series window spine LEFT JOIN observed windows.
The spine is generated with sequence()+explode over each series' own
[min, max] window range — distributed, proportional to output size,
no driver loop. Step 2 (W1/J2): forward-fill is a window function
(last ignorenulls over unbounded-preceding row frame) — the as-of-join
semantics without a join.

Scale note: the spine explode produces |series| x |windows| rows — the
same cardinality the fill output must have, so it cannot be avoided;
it shuffles once on (series_id) for the window function. For zero/null
fill there is no window function and the left join is a plain
shuffle-hash/SMJ on (series_id, window_start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import INTERVAL_SECONDS

FILL_POLICIES = ("none", "zero", "null", "nan", "ffill")


def window_spine(rollup: DataFrame, interval: str) -> DataFrame:
    """Dense (series_id, window_start) spine spanning each series'
    observed [min, max] window range at ``interval``."""
    sec = INTERVAL_SECONDS[interval]
    bounds = rollup.groupBy("series_id").agg(
        F.min("window_start").alias("w0"), F.max("window_start").alias("w1")
    )
    return bounds.select(
        "series_id",
        F.explode(
            F.sequence(
                F.col("w0"),
                F.col("w1"),
                F.expr(f"INTERVAL {sec} SECONDS"),
            )
        ).alias("window_start"),
    )


def gap_fill(rollup: DataFrame, interval: str, policy: str = "zero") -> DataFrame:
    """Fill missing windows of a single-interval rollup frame."""
    if policy not in FILL_POLICIES:
        raise ValueError(f"unknown fill policy {policy!r}")
    if policy == "none":
        return rollup

    spine = window_spine(rollup, interval)
    joined = spine.join(
        rollup.drop("interval"), ["series_id", "window_start"], "left"
    ).withColumn("interval", F.lit(interval))

    if policy == "null":
        return joined.select(
            "series_id", "window_start", "interval", "sum", "count", "min", "max"
        )
    if policy == "nan":
        # OpenTSDB's NaN fill is query-output semantics: missing values
        # surface as NaN doubles (count stays an exact 0 long). Never
        # stored — tiers keep exact longs; this is a read-path render.
        nan = F.lit(float("nan"))
        return joined.select(
            "series_id",
            "window_start",
            "interval",
            F.coalesce(F.col("sum").cast("double"), nan).alias("sum"),
            F.coalesce("count", F.lit(0).cast("long")).alias("count"),
            F.coalesce(F.col("min").cast("double"), nan).alias("min"),
            F.coalesce(F.col("max").cast("double"), nan).alias("max"),
        )
    if policy == "zero":
        # count 0 marks the window as synthetic; min/max 0 matches the
        # OpenTSDB zero-fill (NaN-free numeric zero substitution).
        return joined.select(
            "series_id",
            "window_start",
            "interval",
            F.coalesce("sum", F.lit(0).cast("long")).alias("sum"),
            F.coalesce("count", F.lit(0).cast("long")).alias("count"),
            F.coalesce("min", F.lit(0).cast("long")).alias("min"),
            F.coalesce("max", F.lit(0).cast("long")).alias("max"),
        )
    # ffill
    w = (
        Window.partitionBy("series_id")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined
    for c in ("sum", "count", "min", "max"):
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.select(
        "series_id", "window_start", "interval", "sum", "count", "min", "max"
    )
