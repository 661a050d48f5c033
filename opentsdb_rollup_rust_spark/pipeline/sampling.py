"""Deterministic training-mixture sampling.

An LLM data pipeline rarely trains on the raw corpus distribution: it
assigns each source a mixture weight (epochs) — e.g. wiki x2.5, web
x0.3 — and emits floor(w) copies of every document plus one more for
a deterministic w-fractional subset. Doing this with ``rand()`` is a
resumability bug (retried tasks resample); the scale-correct form is
a pure per-key hash decision:

    n_copies(doc) = floor(w[source])
                  + (md5_bucket(salt || doc_id) < frac(w) * DENOM)

which is reproducible across retries, executors, and repartitioning,
and — because the hash is uniform per key — realizes each source's
target rate to within binomial noise regardless of how doc_ids are
laid out. Everything is whole-stage-codegen expressions; the
up-sampling explode emits rows, never widens them, so it pipelines
into the pack/write stage with no shuffle of its own.

The md5 bucket (functions.hashing.md5_bucket) is the cross-engine-
reproducible demo hash; swap xxhash64 for the pure-JVM scale path
when oracle parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket

# deterministic-sampling denominator: weights resolve to 1/10000ths
SAMPLE_DENOM = 10_000

# demo mixture (sources in the testdata corpus); unlisted sources get
# DEFAULT_WEIGHT. Includes an up-sampled (>1), a down-sampled (<1) and
# a drop-most source so every branch of n_copies is exercised.
MIXTURE_WEIGHTS: dict[str, float] = {
    "src0": 2.5,
    "src1": 1.0,
    "src2": 0.5,
}
DEFAULT_WEIGHT = 0.1
SAMPLE_SALT = "mix:v1:"


def _weight_maps(
    weights: dict[str, float], default: float
) -> tuple[dict[str, int], dict[str, int], int, int]:
    """Split each weight into (whole epochs, fractional threshold in
    1/DENOM units) — all integer so both engines compare exactly."""
    whole = {s: int(w) for s, w in weights.items()}
    frac_bp = {s: round((w - int(w)) * SAMPLE_DENOM) for s, w in weights.items()}
    return whole, frac_bp, int(default), round((default - int(default)) * SAMPLE_DENOM)


def n_copies_col(
    key: Column,
    strat: Column,
    weights: dict[str, float],
    default: float = DEFAULT_WEIGHT,
    salt: str = SAMPLE_SALT,
) -> Column:
    """Per-row copy count under the mixture — a pure projection."""
    whole, frac, d_whole, d_frac = _weight_maps(weights, default)
    bucket = md5_bucket(F.concat(F.lit(salt), key.cast("string")), SAMPLE_DENOM)
    w_col: Column = F.lit(d_whole)
    f_col: Column = F.lit(d_frac)
    for s in sorted(weights):
        w_col = F.when(strat == F.lit(s), F.lit(whole[s])).otherwise(w_col)
        f_col = F.when(strat == F.lit(s), F.lit(frac[s])).otherwise(f_col)
    return (w_col + (bucket < f_col).cast("int")).cast("int").alias("n_copies")


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    default: float = DEFAULT_WEIGHT,
    key_col: str = "doc_id",
    strat_col: str = "source",
    salt: str = SAMPLE_SALT,
) -> DataFrame:
    """Materialize the mixture: each input row appears ``n_copies``
    times with ``copy_idx`` in [0, n_copies). Rows with n_copies = 0
    vanish (empty-array explode), >1 duplicate. No shuffle — the
    explode is a generator in the same stage as the scan."""
    weights = MIXTURE_WEIGHTS if weights is None else weights
    nc = n_copies_col(
        F.col(key_col), F.col(strat_col), weights, default, salt
    )
    copies = F.when(
        F.col("n_copies") > 0,
        F.sequence(F.lit(0), F.col("n_copies") - F.lit(1)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.withColumn("n_copies", nc)
        .withColumn("copy_idx", F.explode(copies))
        .drop("n_copies")
    )


# --- deterministic train/val/test split ---------------------------------

# thresholds in 1/SAMPLE_DENOM units: [0, train) train,
# [train, train+val) val, rest test
SPLIT_RATIOS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}
SPLIT_SALT = "split:v1:"


def split_col(
    key: Column,
    ratios: dict[str, float] | None = None,
    salt: str = SPLIT_SALT,
) -> Column:
    """Deterministic split label for a row: hash the key once, carve
    [0, DENOM) into contiguous ranges sized by the ratios.

    The same hash-not-rand argument as the mixture sampler: retries,
    repartitions and incremental re-runs all re-derive the identical
    assignment, and a document can never migrate between splits when
    the corpus grows (its bucket depends only on its own key). The
    salt namespaces the split decision away from the mixture
    sampler's buckets so the two decisions are independent.

    Ratios must sum to 1 (validated in integer space after rounding,
    so float dust cannot leave a dead or double-assigned bucket)."""
    ratios = SPLIT_RATIOS if ratios is None else ratios
    cuts = {k: round(v * SAMPLE_DENOM) for k, v in ratios.items()}
    if sum(cuts.values()) != SAMPLE_DENOM:
        raise ValueError(f"split ratios must sum to 1, got {ratios}")
    bucket = md5_bucket(F.concat(F.lit(salt), key.cast("string")), SAMPLE_DENOM)
    out: Column | None = None
    hi = 0
    *head, last = list(cuts)
    for name in head:
        hi += cuts[name]
        cond = bucket < F.lit(hi)
        out = F.when(cond, F.lit(name)) if out is None else out.when(
            cond, F.lit(name)
        )
    return (F.lit(last) if out is None else out.otherwise(F.lit(last))).alias(
        "split"
    )


def split_assign(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Attach the split label — a pure projection (no shuffle, no
    rand); downstream writers partition output by it."""
    return docs.withColumn(
        "split", split_col(F.col(key_col), ratios, salt)
    )


# --- deterministic shuffle + shard layout -------------------------------

SHARD_SALT = "shard:v1:"


def shard_order(
    docs: DataFrame,
    n_shards: int = 16,
    key_col: str = "doc_id",
    salt: str = SHARD_SALT,
) -> DataFrame:
    """Assign every row a (shard, pos) — the deterministic GLOBAL
    SHUFFLE a training dataloader wants, without a global sort.

    shard = hash bucket of the key (uniform, so shards balance);
    pos   = rank of the key's hash within its shard, tie-broken by
            the key itself.

    Ordering by a per-key hash IS the shuffle: adjacent input docs
    land in unrelated (shard, pos) slots, yet the layout is a pure
    function of the key set — retries, repartitions and incremental
    rebuilds reproduce it exactly (same argument as ``split_col``).
    Cost at scale: ONE hash-partition exchange on shard plus the
    within-shard sort the sharded writer needs anyway; nothing global.
    The within-shard rank is a window over each shard's rows — each
    shard is |docs|/n_shards, sized by choosing n_shards so a shard
    fits an executor (the same contract as any sharded writer).
    """
    from pyspark.sql import Window

    from ..functions.hashing import md5_int60

    h = md5_int60(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ).alias("h")
    with_shard = docs.withColumn("h", h).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return (
        with_shard.withColumn(
            "pos", (F.row_number().over(w) - F.lit(1)).cast("long")
        )
        .drop("h")
    )
