"""ST1-ST4 streaming surface tests. Golden rule: a completed stream
(Trigger.AvailableNow over a static file source) must equal the batch
operator on the same input — the streaming/batch parity that makes the
surface trustworthy."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from opentsdb_rollup_rust_spark.operators.rollup import tumbling_rollup
from opentsdb_rollup_rust_spark.streaming.rollup_stream import (
    read_points_stream,
    run_to_memory_table,
    stateful_forward_fill,
    streaming_session_rollup,
    streaming_sliding_rollup,
    streaming_tumbling_rollup,
)

from .conftest import assert_df_equal


@pytest.fixture(scope="module")
def points_dir(points, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pts")) + "/points.parquet"
    points.write.mode("overwrite").parquet(d)
    return d


def _memname() -> str:
    return "t" + uuid.uuid4().hex[:10]


def test_streaming_tumbling_equals_batch(spark, points, points_dir):
    stream = read_points_stream(spark, points_dir)
    name = _memname()
    run_to_memory_table(streaming_tumbling_rollup(stream, "1h"), name)
    got = spark.table(name)
    want = tumbling_rollup(points, "1h")
    assert_df_equal(got, want)


def test_streaming_sliding_multiplicity(spark, points, points_dir):
    stream = read_points_stream(spark, points_dir)
    name = _memname()
    run_to_memory_table(
        streaming_sliding_rollup(stream, "2 hours", "1 hour"), name
    )
    got = spark.table(name)
    # every point lands in exactly length/slide = 2 windows
    n_points = points.count()
    assert got.agg(F.sum("count")).collect()[0][0] == 2 * n_points


def test_streaming_session_windows(spark, points_dir, points):
    stream = read_points_stream(spark, points_dir)
    name = _memname()
    run_to_memory_table(streaming_session_rollup(stream, gap="1 hour"), name)
    got = spark.table(name)
    rows = got.collect()
    assert len(rows) >= 1
    # sessions never overlap per series and bounds are ordered
    for r in rows:
        assert r["session_start"] < r["session_end"]
    # total point mass is conserved
    assert got.agg(F.sum("count")).collect()[0][0] == points.count()


def test_stateful_forward_fill(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("s1", base, 10),
        ("s1", base + dt.timedelta(hours=3), 40),  # gap of 2 windows
        ("s2", base + dt.timedelta(hours=1), 7),
    ]
    df = spark.createDataFrame(
        rows, "series_id string, window_start timestamp, sum long"
    )
    d = str(tmp_path / "roll.parquet")
    df.write.parquet(d)
    stream = (
        spark.readStream.schema("series_id string, window_start timestamp, sum long")
        .parquet(d)
    )
    name = _memname()
    run_to_memory_table(stateful_forward_fill(stream, "1h"), name, "append")
    got = {
        (r["series_id"], r["window_start"]): (r["sum"], r["filled"])
        for r in spark.table(name).collect()
    }
    e = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[("s1", e)] == (10, 0)
    assert got[("s1", e + 3600)] == (10, 1)  # carried
    assert got[("s1", e + 7200)] == (10, 1)  # carried
    assert got[("s1", e + 10800)] == (40, 0)
    assert got[("s2", e + 3600)] == (7, 0)
    assert len(got) == 5
