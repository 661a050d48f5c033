"""S3 — derive the metric stream from the sequences table.

BASELINE.json:6: "treating per-sequence token statistics as the metric
stream". Each sequence row emits 6 points (one per TOKEN_STATS entry),
series_id = source ':' stat — the (metric, tags) analogue flattened to
a string, mirroring OpenTSDB's TSUID = metric_uid + tag_uids.

Event time is deterministic: epoch('2024-01-01') +
xxhash64(doc_id) % 30d (FIXTURES.md §2) — no wall-clock anywhere.

Long format via F.stack (built-in UDTF-like expression, JVM-side);
the tokens array never survives past this operator, so column pruning
keeps coarser tiers from ever reading it (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import EPOCH_BASE_SECONDS, HORIZON_SECONDS, SERIES_SEP, TOKEN_STATS
from ..functions.arrays import token_array_stats


def event_time(doc_id: Column | str) -> Column:
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    sec = F.lit(EPOCH_BASE_SECONDS) + F.pmod(F.xxhash64(c), F.lit(HORIZON_SECONDS))
    return F.timestamp_seconds(sec)


def derive_points(sequences: DataFrame, keep_doc_id: bool = False) -> DataFrame:
    """sequences -> points(series_id string, ts timestamp, value long).

    ``keep_doc_id=True`` additionally carries doc_id (for lineage /
    invariant tests); the scale path drops it so the shuffle rows stay
    narrow.
    """
    stats = token_array_stats("tokens")
    stack_args: list[Column] = []
    for name in TOKEN_STATS:
        stack_args.append(F.lit(name))
        stack_args.append(stats[name])
    wide = sequences.select(
        F.col("doc_id"),
        F.col("source"),
        event_time("doc_id").alias("ts"),
        F.stack(F.lit(len(TOKEN_STATS)), *stack_args).alias("stat", "value"),
    )
    cols = [
        F.concat_ws(SERIES_SEP, F.col("source"), F.col("stat")).alias("series_id"),
        F.col("ts"),
        F.col("value").cast("long").alias("value"),
    ]
    if keep_doc_id:
        cols.insert(0, F.col("doc_id"))
    return wide.select(*cols)
