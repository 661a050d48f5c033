"""F3/F4 — token-array scalar functions.

All built-in higher-order functions (JVM, codegen) — no explode in the
hot path, no Python. ANSI mode note (Spark 4 default): token values are
int32 but sums accumulate in LongType to avoid overflow throws
(SURVEY.md §7 "what's hard" #5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_array_stats(
    tokens: Column | str, sum_acc: str = "long"
) -> dict[str, Column]:
    """Exact per-row stats over an array<int> column, as long columns.

    first/last use element_at (1-based; -1 = last). Empty arrays are
    not produced by the generator (len >= 1) but min/max/first/last
    would be null there — callers filter or rely on n_tok >= 1.

    ``sum_acc="int"`` (r6): accumulate tok_sum in IntegerType and cast
    the final value to long. The interpreted fold's per-element
    ``x.cast(long)`` is a large share of the fold's cost — dropping it
    wins every interleaved rep of the 12M-seq fused-rollup A/B
    (scripts/fold_ab_r06.py: best 8.14 -> 6.75 s, median 9.7 -> 8.2 s;
    the explode reformulation loses 20x and is recorded there too).
    EXACT AND ANSI-SAFE ONLY when every row's sum fits int32; both
    token generators guarantee it by contract (synth_sequences:
    len <= 512, values < 50257 -> max 25.7M; _md5_token_seqs:
    len <= 8, values < 997 -> max ~8k). Callers with unbounded arrays
    must keep the default long accumulator (overflow would THROW under
    ANSI, never silently wrap).
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    if sum_acc == "int":
        tok_sum = F.aggregate(t, F.lit(0), lambda acc, x: acc + x).cast("long")
    else:
        tok_sum = F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        )
    return {
        "n_tok": F.size(t).cast("long"),
        "tok_sum": tok_sum,
        "tok_min": F.array_min(t).cast("long"),
        "tok_max": F.array_max(t).cast("long"),
        "tok_first": F.element_at(t, 1).cast("long"),
        "tok_last": F.element_at(t, -1).cast("long"),
    }


def token_invariant_violations(derived: DataFrame, source: DataFrame) -> DataFrame:
    """F4 — per-row token-array equality invariant (BASELINE.json:15).

    Any table derived from sequences that still carries (doc_id, tokens)
    must hold the exact source array. Returns the violating rows
    (must be empty). Array equality is element-wise in Spark.
    """
    s = source.select(F.col("doc_id"), F.col("tokens").alias("_src_tokens"))
    return (
        derived.join(s, "doc_id", "inner")
        .where(
            (F.col("tokens") != F.col("_src_tokens"))
            | F.col("tokens").isNull()
            | F.col("_src_tokens").isNull()
        )
        .select("doc_id")
    )
