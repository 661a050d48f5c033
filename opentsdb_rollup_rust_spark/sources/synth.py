"""S2 — deterministic small-scale generator of the north-rule input
table (BASELINE.json:15): (doc_id string, tokens array<int32>,
n_tok int32, source string).

Generation rules are FIXTURES.md §1, verbatim:
  - doc_id   = f"doc-{i:012d}"
  - L        = 1 + (xxhash64(doc_id) mod 512)
  - token[j] = xxhash64(doc_id, j) mod 50257
  - source   ∈ {web, code, books, wiki} weighted 70/15/10/5 by hash;
    the 70% 'web' skew is the deliberate hot key for salted agg tests.

Everything is built-in Spark expressions (spark.range + higher-order
functions) — generation itself is distributed and seedless-determinstic
(xxhash64 uses Spark's fixed default seed 42), so the same N produces
identical bytes on any cluster size. No wall-clock, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257
MAX_LEN = 512
SOURCES = ("web", "code", "books", "wiki")  # 70/15/10/5


def synth_sequences(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    doc_offset: int = 0,
) -> DataFrame:
    """Deterministic sequences table of ``n`` rows; ``doc_offset``
    shifts the doc_id range so incremental batches are disjoint."""
    if partitions is None:
        partitions = max(1, min(64, n // 25_000 or 1))
    df = spark.range(doc_offset, doc_offset + n, 1, partitions).select(
        F.format_string("doc-%012d", F.col("id")).alias("doc_id")
    )
    h = F.xxhash64(F.col("doc_id"))
    length = (F.pmod(h, F.lit(MAX_LEN)) + F.lit(1)).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), length - F.lit(1)),
        lambda j: F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(VOCAB)).cast("int"),
    )
    src_roll = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("source")), F.lit(100))
    source = (
        F.when(src_roll < 70, F.lit("web"))
        .when(src_roll < 85, F.lit("code"))
        .when(src_roll < 95, F.lit("books"))
        .otherwise(F.lit("wiki"))
    )
    return df.select(
        "doc_id",
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        source.alias("source"),
    )
