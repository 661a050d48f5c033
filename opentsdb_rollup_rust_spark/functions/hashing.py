"""F2 — series-hash bucketing.

The analogue of the reference's series-major layout (HBase row key =
metric_uid + hour + tag_uids): in columnar Spark the "series-major"
property survives as hash-bucket partitioning on series_id plus
sort-within-partition on (series_id, ts) (BASELINE.json:6,14).

``xxhash64`` is a JVM-side codegen'd expression — the scale path.
``md5_bucket`` is a slower variant whose value is reproducible in
other engines (DuckDB oracle parity) — used only in demo queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def series_hash_bucket(series_id: Column | str, n_buckets: int) -> Column:
    """bucket = pmod(xxhash64(series_id), B), int."""
    c = F.col(series_id) if isinstance(series_id, str) else series_id
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def md5_int60(col: Column | str) -> Column:
    """Cross-engine-reproducible 60-bit unsigned hash: first 15 hex
    chars of md5 as a long (fits int64 — never negative).
    DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_bucket(col: Column | str, n_buckets: int) -> Column:
    """Cross-engine-reproducible bucket: first 8 hex chars of md5 as a
    long, mod B. DuckDB twin: ('0x' || substr(md5(x),1,8))::BIGINT % B."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets)).cast("int")
