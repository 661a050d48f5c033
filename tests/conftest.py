from __future__ import annotations

import pytest

from opentsdb_rollup_rust_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sequences(spark):
    from opentsdb_rollup_rust_spark.sources.synth import synth_sequences

    return synth_sequences(spark, 1_000).cache()


@pytest.fixture(scope="session")
def points(sequences):
    from opentsdb_rollup_rust_spark.operators.points import derive_points

    return derive_points(sequences).cache()


def assert_df_equal(a, b):
    """Exact multiset equality of two DataFrames."""
    extra = a.exceptAll(b).count()
    missing = b.exceptAll(a).count()
    assert extra == 0 and missing == 0, f"extra={extra} missing={missing}"
