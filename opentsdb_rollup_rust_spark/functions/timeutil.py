"""F1 — time bucketing.

Epoch-aligned tumbling windows, the OpenTSDB downsampler alignment
(docs.opentsdb.net "Downsampling": buckets are aligned on Unix-epoch
multiples of the interval). Implemented with arithmetic on epoch
seconds rather than F.window so the same expression works for any
interval, stays inside whole-stage codegen, and has a 1:1 ANSI-SQL
twin for the DuckDB oracle (FLOOR(epoch(ts)/s)*s).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_bucket_epoch(ts: Column | str, interval_seconds: int) -> Column:
    """Epoch seconds of the window start containing ``ts`` (long)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    s = F.lit(interval_seconds).cast("long")
    return (F.floor(F.unix_timestamp(ts) / s) * s).cast("long")


def time_bucket(ts: Column | str, interval_seconds: int) -> Column:
    """Window-start timestamp containing ``ts`` (TimestampType)."""
    return F.timestamp_seconds(time_bucket_epoch(ts, interval_seconds))
