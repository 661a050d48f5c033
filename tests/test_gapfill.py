"""Fill-policy golden micro-fixture (FIXTURES.md §2 / OpenTSDB
downsampler fill policies): one series, windows {0,1,4,5}, gaps {2,3}."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentsdb_rollup_rust_spark.operators.gapfill import gap_fill

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def sparse(spark):
    rows = [
        ("s", BASE + dt.timedelta(minutes=m), "1m", v, 1, v, v)
        for m, v in [(0, 10), (1, 11), (4, 14), (5, 15)]
    ]
    return spark.createDataFrame(
        rows, "series_id string, window_start timestamp, interval string, "
        "sum long, count long, min long, max long"
    )


def _by_minute(df):
    return {
        r.window_start.minute: (r.sum, r["count"], r["min"], r["max"])
        for r in df.collect()
    }


def test_none(sparse):
    assert gap_fill(sparse, "1m", "none").count() == 4


def test_zero(sparse):
    got = _by_minute(gap_fill(sparse, "1m", "zero"))
    assert sorted(got) == [0, 1, 2, 3, 4, 5]
    assert got[2] == (0, 0, 0, 0) and got[3] == (0, 0, 0, 0)
    assert got[1] == (11, 1, 11, 11)


def test_null(sparse):
    got = _by_minute(gap_fill(sparse, "1m", "null"))
    assert got[2] == (None, None, None, None)
    assert got[5] == (15, 1, 15, 15)


def test_nan(sparse):
    import math

    got = _by_minute(gap_fill(sparse, "1m", "nan"))
    s, c, lo, hi = got[2]
    assert math.isnan(s) and math.isnan(lo) and math.isnan(hi)
    assert c == 0  # count stays an exact long
    assert got[5] == (15.0, 1, 15.0, 15.0)  # observed values render as doubles


def test_ffill(sparse):
    got = _by_minute(gap_fill(sparse, "1m", "ffill"))
    assert got[2] == (11, 1, 11, 11)  # carried from window 1
    assert got[3] == (11, 1, 11, 11)
    assert got[4] == (14, 1, 14, 14)


def test_fill_preserves_observed(points_1h):
    filled = gap_fill(points_1h, "1h", "zero")
    obs = points_1h.drop("interval")
    joined = filled.drop("interval").join(
        obs.withColumnRenamed("sum", "osum"), ["series_id", "window_start"], "inner"
    )
    assert joined.where(F.col("sum") != F.col("osum")).count() == 0


@pytest.fixture(scope="module")
def points_1h(points):
    from opentsdb_rollup_rust_spark.operators.rollup import tumbling_rollup

    return tumbling_rollup(points, "1h").cache()
