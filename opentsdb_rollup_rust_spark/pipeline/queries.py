"""Driver-facing demo queries + DuckDB oracle twins for the
training-data pipeline operators (dedup / similarity / text /
multimodal). Merged into __spark_entry__.queries() / oracle_sql().

Every oracle replicates the *algorithm* (same md5-derived hashes, same
integer quantization, same tie-breaks), so value-hash comparison is
exact — including for the approximate operators (LSH band joins),
where both engines must produce the identical candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_MAX_DF,
    MINHASH_K,
    MINHASH_MAX_BUCKET,
    MINHASH_P,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_BUCKET,
    _mh_perm_consts,
    cluster_summary,
    connected_components,
    connected_components_auto,
    connected_components_twostar,
    exact_dup_clusters,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_planted_dupes,
)
from .multimodal import attach_media_payload, extract_features
from .similarity import (
    IVF_LISTS,
    IVF_PROBE,
    LSH_MAX_BUCKET,
    LSH_PLANES_PER_TABLE,
    LSH_TABLES,
    N_PLANES,
    brute_force_topk,
    embedding_near_dup_pairs,
    hyperplane_weights,
    ivf_topk,
    lsh_topk,
    with_planted_vec_dupes,
)
from .packing import (
    GREEDY_BUCKETS,
    GREEDY_CAPACITY,
    PACK_CAPACITY,
    concat_pack_spans,
    greedy_pack_bins,
)
from .text import text_profile

EMB_DIM = 64

# Per-method recall@3 floors the ann_recall gate asserts (ppm), over
# the deterministic 10% query panel (vec_id % 10 == 0). Measured:
# lsh 693_333 (sf0.01) / 731_666 (sf0.1); ivf 526_666 / 500_000
# (n_probe=4 of 16 lists — probing a quarter of the corpus bounds
# recall by design). Floors sit below both scales with margin.
ANN_RECALL_FLOORS_PPM = {"lsh": 650_000, "ivf": 450_000}

# Hard cap on the recall-evaluation query panel (r4 VERDICT task #4).
# The panel is the deterministic 10% sample vec_id % 10 == 0, further
# bounded to the first ANN_RECALL_PANEL_CAP panel ids (vec_id <
# 10 * cap): the ground truth is brute force — intentionally quadratic
# in |panel| x |corpus| — so without a constant cap the evaluation
# query itself would stop scaling long before the operators it grades.
# 2000 queries is ample for a recall estimate (binomial CI ~±1% at
# recall 0.65) and keeps the truth join bounded at any corpus size.
# At sf0.01/sf0.1 (5k/50k vectors) the cap is not binding at sf0.01
# and binds at sf0.1 (panel 5000 -> 2000), both deterministic.
ANN_RECALL_PANEL_CAP = 2000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.trim(F.col("text")).alias("text"), "lang", "source", "n_chars"
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _staged_profile(docs: DataFrame, keep: list[str]) -> DataFrame:
    """Shared staged profile projection for the corpus-build composes:
    one words split per row, per-language scores and quality parts
    landed as columns, then pred_lang / quality_q / n_ws_tokens from
    cheap attribute refs (the unstaged select re-ran the split and
    filter passes once per consumer — see lang_pred_from_scores)."""
    from .text import (
        LANG_STOPWORDS,
        doc_words,
        lang_pred_from_scores,
        quality_from_parts,
        quality_parts,
    )

    staged = docs.select(*keep, "text", doc_words(F.col("text")).alias("_w"))
    qp = quality_parts(F.col("text"), words=F.col("_w"))
    from .text import lang_scores

    sc = lang_scores(F.col("text"), words=F.col("_w"))
    parts = staged.select(
        *keep,
        *[qp[k].alias(f"_{k}") for k in qp],
        *[sc[lang].alias(f"_s_{lang}") for lang in LANG_STOPWORDS],
    )
    qf = quality_from_parts(*[F.col(f"_{k}") for k in qp])
    return parts.select(
        *keep,
        lang_pred_from_scores(
            {lang: F.col(f"_s_{lang}") for lang in LANG_STOPWORDS}
        ).alias("pred_lang"),
        qf["quality_q"].alias("quality_q"),
        F.col("_n_words").alias("n_ws_tokens"),
    )


def _mp(df: DataFrame) -> DataFrame:
    """Spread rows across the cluster before expression-heavy map work.
    The testdata parquet is a single row group (<= 2 input splits), so
    without this the shingle/hash/dot-product projections — the actual
    cost of the dedup/ANN pipelines — run at parallelism 2 regardless
    of core count. At production scale the scan has thousands of
    splits and this shuffle of raw rows is noise (AQE coalesces it)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# ---------------------------------------------------------------- text

def q_text_tokens(spark, sf_dir):
    from .text import token_counts

    d = _docs(spark, sf_dir)
    tc = token_counts(F.col("text"))
    return d.select(
        "doc_id",
        tc["n_ws_tokens"].alias("n_ws_tokens"),
        tc["n_word_tokens"].alias("n_word_tokens"),
        tc["n_bpe_tokens"].alias("n_bpe_tokens"),
        tc["n_chars"].alias("n_text_chars"),
    )


def q_text_scrub(spark, sf_dir):
    """T6: PII redaction with lineage counts. The shared-vocabulary
    testdata contains no PII, so the query PLANTS deterministic
    email/IP/phone strings on doc_id residue classes (mirrored in the
    oracle) — the scrubber then has real spans to find, count on the
    original text, and replace with typed tags. Output is the
    per-type counts plus md5 of the scrubbed text (driver-hashable
    proof the replacement spans match byte-for-byte)."""
    from .text import pii_scrub

    d = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("long")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.pmod(did, F.lit(3)) == 0,
            F.concat(F.lit(" u"), did.cast("string"), F.lit("@ex.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(did, F.lit(5)) == 0,
            F.concat(
                F.lit(" 10.0."),
                F.pmod(did, F.lit(256)).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(did, F.lit(7)) == 0,
            F.concat(F.lit(" +1-555-01"), F.pmod(did, F.lit(10)).cast("string")),
        ).otherwise(F.lit("")),
    )
    s = pii_scrub(planted)
    return d.select(
        "doc_id",
        s["n_email"].alias("n_email"),
        s["n_ip"].alias("n_ip"),
        s["n_phone"].alias("n_phone"),
        F.md5(s["scrubbed"]).alias("scrub_md5"),
    )


def q_text_quality(spark, sf_dir):
    # staged (r6): words split once, integer parts landed as columns,
    # final arithmetic over attribute refs — see lang_pred_from_scores
    from .text import doc_words, quality_from_parts, quality_parts

    d = _docs(spark, sf_dir)
    staged = d.select("doc_id", "text", doc_words(F.col("text")).alias("_w"))
    qp = quality_parts(F.col("text"), words=F.col("_w"))
    parts = staged.select(
        "doc_id", *[qp[k].alias(f"_{k}") for k in qp]
    )
    qf = quality_from_parts(*[F.col(f"_{k}") for k in qp])
    return parts.select(
        "doc_id",
        F.col("_n_words").alias("n_words"),
        F.col("_n_punct").alias("n_punct"),
        qf["mean_word_len_q"].alias("mean_word_len_q"),
        qf["stop_ratio_q"].alias("stop_ratio_q"),
        qf["quality_q"].alias("quality_q"),
    )


def q_text_langid(spark, sf_dir):
    # staged (r6): one split + one filter pass per language, argmax
    # over score COLUMNS (the unstaged chain re-ran each filter ~4x —
    # measured 2.98 s -> ~1.5 s at sf1.0)
    from .text import LANG_STOPWORDS, doc_words, lang_pred_from_scores, lang_scores

    d = _docs(spark, sf_dir)
    staged = d.select("lang", doc_words(F.col("text")).alias("_w"))
    sc = lang_scores(F.col("text"), words=F.col("_w"))
    scored = staged.select(
        "lang", *[sc[lang].alias(f"_s_{lang}") for lang in LANG_STOPWORDS]
    )
    pred = lang_pred_from_scores(
        {lang: F.col(f"_s_{lang}") for lang in LANG_STOPWORDS}
    )
    return (
        scored.select(F.col("lang"), pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


def q_text_fingerprint(spark, sf_dir):
    from .text import bag_fingerprint, doc_words, rolling_fingerprint

    d = _docs(spark, sf_dir)
    staged = d.select("doc_id", "text", doc_words(F.col("text")).alias("_w"))
    return staged.select(
        "doc_id",
        rolling_fingerprint(F.col("text"), words=F.col("_w")).alias("fingerprint"),
        bag_fingerprint(F.col("text"), words=F.col("_w")).alias("bag_fp"),
    )


# ---------------------------------------------------------------- dedup

def q_dedup_exact(spark, sf_dir):
    d = with_planted_dupes(_docs(spark, sf_dir), every=10, mutate=False)
    return exact_dup_clusters(d)


def q_dedup_minhash(spark, sf_dir):
    d = with_planted_dupes(_mp(_docs(spark, sf_dir)), every=10, mutate=True)
    return minhash_lsh_pairs(d)


def q_dedup_components(spark, sf_dir):
    """D6: MinHash pairs -> connected components -> per-cluster
    membership summary (size + member-id checksum). Oracle runs a
    recursive transitive closure over the identical pair CTEs, so a
    hash match proves the distributed label propagation found exactly
    the same components."""
    d = with_planted_dupes(_mp(_docs(spark, sf_dir)), every=10, mutate=True)
    return cluster_summary(connected_components(minhash_lsh_pairs(d)))


def q_dedup_components_star(spark, sf_dir):
    """D6 scale variant under the driver gate: identical clusters via
    the O(log n) large-star/small-star algorithm. Components are
    algorithm-independent, so this shares dedup_components' oracle —
    a hash match proves twostar == recursive closure == fixpoint on
    the same pair set."""
    d = with_planted_dupes(_mp(_docs(spark, sf_dir)), every=10, mutate=True)
    return cluster_summary(
        connected_components_twostar(minhash_lsh_pairs(d))
    )


def q_dedup_components_auto(spark, sf_dir):
    """D6 default policy under the driver gate: the probe-then-
    contract hybrid (connected_components_auto) on the same pair set
    — shares dedup_components' recursive-closure oracle, so a hash
    match proves auto == twostar == fixpoint == closure."""
    d = with_planted_dupes(_mp(_docs(spark, sf_dir)), every=10, mutate=True)
    return cluster_summary(
        connected_components_auto(minhash_lsh_pairs(d))
    )


def q_dedup_simhash(spark, sf_dir):
    # 60-bit simhash: planted near-dups land at hamming <= ~13; 7 keeps
    # precision while the 15-bit bands keep the candidate join selective
    d = with_planted_dupes(_mp(_docs(spark, sf_dir)), every=10, mutate=True)
    return simhash_pairs(d, max_hamming=7).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_dedup_jaccard(spark, sf_dir):
    # max_df guard ON (hot-shingle skew protection), mirrored in the oracle
    d = with_planted_dupes(_mp(_docs(spark, sf_dir)), every=10, mutate=True)
    return ngram_jaccard_pairs(d, min_jaccard=0.5, max_df=DEFAULT_MAX_DF)


def q_dedup_embed(spark, sf_dir):
    e = with_planted_vec_dupes(_mp(_embs(spark, sf_dir)), every=20)
    return embedding_near_dup_pairs(e, dim=EMB_DIM, min_cos_q=990_000)


# ---------------------------------------------------------------- similarity

def q_ann_topk(spark, sf_dir):
    # 10 literal queries: the all-JVM broadcast-join plan wins below
    # the vectorized scorer's fixed two-job overhead (similarity
    # brute_force_topk docstring has the measured crossover)
    e = _mp(_embs(spark, sf_dir))
    q = e.where(F.col("vec_id") < 10)
    return brute_force_topk(e, q, k=5, impl="join").select(
        "q_id", "neighbor_id", "cos_q", F.col("rank").cast("int").alias("rank")
    )


def q_ann_lsh(spark, sf_dir):
    e = _mp(_embs(spark, sf_dir))
    return lsh_topk(e, dim=EMB_DIM, k=3).select(
        "q_id", "neighbor_id", "cos_q", F.col("rank").cast("int").alias("rank")
    )


def q_ann_ivf(spark, sf_dir):
    e = _mp(_embs(spark, sf_dir))
    return ivf_topk(e, dim=EMB_DIM, k=3).select(
        "q_id", "neighbor_id", "cos_q", F.col("rank").cast("int").alias("rank")
    )


def q_ann_recall(spark, sf_dir):
    """ANN QUALITY as a gate-checked number (r3 VERDICT task #5):
    recall@3 of lsh_topk and ivf_topk against exact brute-force top-3
    over the full query set (every vector queries; identical
    deterministic tie-break cos DESC, id ASC in both engines). All
    three pipelines are md5-deterministic, so the oracle recomputes
    the IDENTICAL recall in SQL — the hash match pins the approximate
    operators' retrieval quality, not just their candidate mechanics —
    and ``meets_floor`` asserts recall_ppm >= the per-method floor
    in ANN_RECALL_FLOORS_PPM. The ORACLE emits literal TRUE for
    meets_floor (the codec_check / agg_distinct_sketch invariant
    pattern, r4 ADVICE): a recall drop below the floor makes the Spark
    side emit false -> hash mismatch -> the gate actually fails,
    instead of both engines agreeing on false.
    Integer arithmetic only (ppm via DIV), no float recall.

    Scale shape: ground truth is brute force, inherently quadratic,
    so it runs over a deterministic QUERY PANEL (vec_id % 10 == 0 —
    the standard recall-evaluation pattern: sample queries, never the
    corpus) hard-bounded at ANN_RECALL_PANEL_CAP queries (vec_id <
    10*cap — see the constant's rationale) and is localCheckpoint'ed
    so the lsh and ivf branches share ONE materialization instead of
    recomputing the brute-force plan per branch (measured 339s ->
    seconds at sf0.1)."""
    e = _mp(_embs(spark, sf_dir))
    panel = e.where(
        (F.pmod(F.col("vec_id"), F.lit(10)) == 0)
        & (F.col("vec_id") < F.lit(10 * ANN_RECALL_PANEL_CAP))
    )
    truth = (
        brute_force_topk(e, panel, k=3)
        .select("q_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    possible = panel.agg((F.count("*") * 3).cast("long").alias("possible"))

    def _row(method, approx):
        hits = (
            approx.select("q_id", "neighbor_id")
            .join(truth, ["q_id", "neighbor_id"], "left_semi")
            .agg(F.count("*").cast("long").alias("hits"))
        )
        # 1-row x 1-row crossJoin: scalar assembly, not a data join
        return hits.crossJoin(possible).select(
            F.lit(method).alias("method"),
            "hits",
            "possible",
            F.expr("CAST((hits * 1000000) DIV possible AS BIGINT)").alias(
                "recall_ppm"
            ),
            F.expr(
                f"(hits * 1000000) DIV possible >= {ANN_RECALL_FLOORS_PPM[method]}"
            ).alias("meets_floor"),
        )

    return _row("lsh", lsh_topk(e, dim=EMB_DIM, k=3)).unionByName(
        _row("ivf", ivf_topk(e, dim=EMB_DIM, k=3))
    )


def q_pipeline_clean(spark, sf_dir):
    """End-to-end training-data cleaning pass composing the pipeline
    operators the way a real corpus build does:
      exact dedup (keep-first)  ->  quality filter  ->
      per (source, predicted language) corpus stats.
    The planted exact duplicates are dropped by the dedup stage, so
    the aggregate equals the clean corpus — double-counted if dedup
    regresses, shifted if the quality gate drifts."""
    d = with_planted_dupes(_docs(spark, sf_dir), every=10, mutate=False)
    keepers = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = d.join(keepers, "doc_id", "left_semi")
    prof = _staged_profile(survivors, ["source"]).where(
        F.col("quality_q") >= 450_000
    )
    return prof.groupBy("source", "pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws_tokens").alias("total_tokens"),
        F.floor(F.avg("quality_q")).cast("long").alias("mean_quality_q"),
    )


# ---------------------------------------------------------------- multimodal

def q_mm_features(spark, sf_dir):
    media = attach_media_payload(_docs(spark, sf_dir))
    return extract_features(media)


def q_pack_concat(spark, sf_dir):
    """K1 demo: concat-and-chunk packing of the documents table into
    PACK_CAPACITY-token context windows, n_chars standing in for the
    pre-tokenized length (packing consumes lengths only). Distributed
    prefix sum — range buckets of 128 docs, per-bucket window cumsum,
    O(buckets) driver scan; never a global window."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").alias("n_tok")
    )
    return concat_pack_spans(
        docs,
        capacity=PACK_CAPACITY,
        bucket_expr=F.floor(F.col("doc_id") / F.lit(128)).cast("long"),
    )


def q_pack_greedy(spark, sf_dir):
    """K2 demo: whole-document greedy packing into GREEDY_CAPACITY
    bins inside GREEDY_BUCKETS md5-hash groups; capacity sits below
    the max doc length so the oversize own-bin rule is exercised."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").alias("n_tok")
    )
    return greedy_pack_bins(
        docs, capacity=GREEDY_CAPACITY, n_buckets=GREEDY_BUCKETS
    )


def q_sample_mixture(spark, sf_dir):
    """Q-MIX: deterministic training-mixture sampling — src0 up-sampled
    2.5x, src1 1x, src2 0.5x, everything else 0.1x, decided by a pure
    per-doc md5 hash (resumable: retried tasks re-derive the identical
    sample). The query MATERIALIZES the mixture (explode) and pins the
    emitted multiset per source: row count, distinct docs, doc_id and
    copy_idx sums."""
    from .sampling import mixture_sample

    out = mixture_sample(_docs(spark, sf_dir))
    return out.groupBy("source").agg(
        F.count("*").alias("n_emitted"),
        F.countDistinct("doc_id").alias("n_docs_kept"),
        F.sum("doc_id").alias("doc_id_sum"),
        F.sum("copy_idx").cast("long").alias("copy_idx_sum"),
    )


def q_decontam(spark, sf_dir):
    """D7: benchmark decontamination — docs with doc_id % 37 == 0 play
    the held-out eval set; every other doc is scored by its count of
    distinct 3-word shingles shared with that set. Eval shingles are
    broadcast, so the training corpus never shuffles for the join."""
    from .dedup import decontaminate

    d = _docs(spark, sf_dir)
    panel = F.col("doc_id") % 37 == 0
    return decontaminate(d.where(~panel), d.where(panel))


def q_text_repetition(spark, sf_dir):
    """T7: Gopher-style repetition quality signals — duplicate-word /
    duplicate-2gram / top-2gram fractions as exact-integer ppm. The
    2-gram mode is a real distributed aggregation (explode ->
    partial-agg), not a per-row O(L^2) array scan."""
    from .text import repetition_profile

    return repetition_profile(_docs(spark, sf_dir))


def q_pipeline_build(spark, sf_dir):
    """The FULL corpus-build composition — the pipeline-side analogue
    of the api_query endpoint (unit-green stages miss composition
    bugs; a corpus build is where they bite):

      exact dedup keep-first  ->  decontaminate vs the held-out eval
      slice (drop docs sharing >= half their shingles)  ->  quality
      gate  ->  deterministic split assignment  ->
      per (split, source, predicted language) doc + token totals.

    Stage order is load-bearing: dedup BEFORE decontamination (or a
    contaminated text survives through an uncontaminated duplicate
    id), decontamination BEFORE the quality gate (contamination is
    not a quality question), split LAST (so leakage cannot re-enter
    through a split-then-clean ordering bug). The oracle recomputes
    all five stages from the raw table, so the hash pins each
    boundary AND the order."""
    from .dedup import decontaminate
    from .sampling import split_assign

    d = _docs(spark, sf_dir)
    panel = F.col("doc_id") % 37 == 0
    ev, tr = d.where(panel), d.where(~panel)
    keepers = (
        tr.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    tr = tr.join(keepers, "doc_id", "left_semi")
    contaminated = (
        decontaminate(tr, ev)
        .where(F.col("share_ppm") >= 500_000)
        .select("doc_id")
    )
    tr = tr.join(contaminated, "doc_id", "left_anti")
    prof = _staged_profile(tr, ["doc_id", "source"]).where(
        F.col("quality_q") >= 450_000
    )
    return split_assign(prof).groupBy("split", "source", "pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws_tokens").alias("total_tokens"),
    )


PIPELINE_QUERIES = {
    "text_tokens": q_text_tokens,
    "text_repetition": q_text_repetition,
    "sample_mixture": q_sample_mixture,
    "decontam": q_decontam,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_scrub": q_text_scrub,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_components": q_dedup_components,
    "dedup_components_star": q_dedup_components_star,
    "dedup_components_auto": q_dedup_components_auto,
    "dedup_embed": q_dedup_embed,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_recall": q_ann_recall,
    "pipeline_clean": q_pipeline_clean,
    "pipeline_build": q_pipeline_build,
    "mm_features": q_mm_features,
    "pack_concat": q_pack_concat,
    "pack_greedy": q_pack_greedy,
}


# ================================================================ oracles
# Shared SQL fragments. DuckDB notes: regexp_replace needs the 'g'
# flag (Spark replaces all matches by default); hash60 mirrors
# functions.hashing.md5_int60; list slicing is 1-based inclusive.

_WORDS = "regexp_split_to_array(trim(text), '\\s+')"


def _h60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# documents with trimmed text (mirror of _docs)
_D = "d AS (SELECT doc_id, trim(text) AS text, lang, source, n_chars FROM documents)"

# planted near-dup corpus (mirror of with_planted_dupes(mutate=True))
_PLANTED = f"""{_D},
  w0 AS (SELECT doc_id, text, {_WORDS} AS w FROM d),
  planted AS (
    SELECT doc_id, text FROM d
    UNION ALL
    SELECT doc_id + 10000000,
           array_to_string(w[1:greatest(len(w)-1, 1)], ' ')
    FROM w0 WHERE doc_id % 10 = 0)"""

# distinct 3-word shingles of the planted corpus
_SHINGLES = f"""{_PLANTED},
  pw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM planted),
  sh AS (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(w) >= 3
                THEN list_transform(generate_series(1, len(w)-2),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                ELSE [array_to_string(w, ' ')] END)) AS shingle
        FROM pw)"""

# minhash affine-permutation constants, inlined as VALUES rows so the
# oracle uses bit-identical integers to dedup._mh_perm_consts
_MH_A, _MH_B = _mh_perm_consts(MINHASH_K)
_MH_CONSTS = ", ".join(
    f"({i}, {_MH_A[i]}, {_MH_B[i]})" for i in range(MINHASH_K)
)
_SH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
_SH_MASK = (1 << _SH_BAND_BITS) - 1

# GPT-2-ish pre-tokenizer pattern as a DuckDB string literal (single
# quotes doubled); same leftmost-first alternation in RE2 as in Spark's
# Java regex, so piece counts match exactly
from .text import BPE_PIECE_RE as _BPE_RE  # noqa: E402

_BPE_SQL = "'" + _BPE_RE.replace("'", "''") + "'"

# MinHash-LSH candidate-pair CTE chain, shared by the dedup_minhash
# oracle and the dedup_components oracle (which runs a recursive
# transitive closure on the identical pair set). Mirrors the engine's
# MINHASH_MAX_BUCKET hot-bucket guard (drop degenerate band buckets
# BEFORE the self-join), so engine and oracle agree bit-for-bit on
# the capped candidate set.
_MH_CTES = f"""{_SHINGLES},
        wh AS (SELECT doc_id, {_h60('shingle')} % {MINHASH_P} AS hp FROM sh),
        consts AS (SELECT * FROM (VALUES {_MH_CONSTS}) AS t(i, a, b)),
        mh AS (SELECT doc_id, i, min((a * hp + b) % {MINHASH_P}) AS mh
               FROM wh CROSS JOIN consts GROUP BY 1, 2),
        bands0 AS (SELECT doc_id, i // 4 AS band,
                          md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS key
                   FROM mh GROUP BY 1, 2),
        mh_safe AS (SELECT band, key FROM bands0 GROUP BY band, key
                    HAVING count(*) <= {MINHASH_MAX_BUCKET}),
        bands AS (SELECT bands0.* FROM bands0 JOIN mh_safe USING (band, key))"""
_MH_PAIRS_SELECT = """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""

_STOPS_EN = "['the','a','of','is','and','to','in','it']"
_LANG_STOPS = {
    "en": _STOPS_EN,
    "de": "['der','die','das','und','ist','nicht']",
    "fr": "['le','la','et','les','des','un']",
    "es": "['el','los','las','una','por','que']",
}


def _lang_hits(lang: str) -> str:
    return (
        f"len(list_filter(w, x -> list_contains({_LANG_STOPS[lang]}, x)))::BIGINT"
    )


def _quant_emb(col: str = "embedding") -> str:
    return f"list_transform({col}, x -> CAST(FLOOR(x::DOUBLE * 1000) AS BIGINT))"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
    )


def _sql_cos_q(dot: str, n2a: str, n2b: str) -> str:
    return (
        f"CAST(FLOOR({dot}::DOUBLE / (sqrt({n2a}::DOUBLE) * sqrt({n2b}::DOUBLE)) "
        f"* 1000000) AS BIGINT)"
    )


def _sql_bucket(qe: str) -> str:
    """Random-hyperplane LSH bucket — weights inlined as literals,
    identical to similarity.hyperplane_weights."""
    ws = hyperplane_weights(N_PLANES, EMB_DIM)
    terms = []
    for p, row in enumerate(ws):
        lit = "[" + ",".join(str(v) for v in row) + "]::BIGINT[]"
        dot = f"list_sum(list_transform(generate_series(1, {EMB_DIM}), i -> {qe}[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _sql_table_keys() -> str:
    """Multi-table LSH banding as a UNION ALL over tables — mirror of
    similarity.banded_table_keys (table t uses planes [t*P, (t+1)*P);
    the Spark side stages the same hyperplane_weights matrix as
    broadcast data — DuckDB's planner handles inline literals fine)."""
    ws = hyperplane_weights(LSH_TABLES * LSH_PLANES_PER_TABLE, EMB_DIM)
    parts = []
    for t in range(LSH_TABLES):
        terms = []
        for p in range(LSH_PLANES_PER_TABLE):
            row = ws[t * LSH_PLANES_PER_TABLE + p]
            lit = "[" + ",".join(str(v) for v in row) + "]::BIGINT[]"
            dot = (
                f"list_sum(list_transform(generate_series(1, {EMB_DIM}), "
                f"i -> qe[i] * ({lit})[i]))"
            )
            terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        parts.append(
            f"SELECT vec_id, {t} AS tbl, ({' + '.join(terms)}) AS key FROM pv"
        )
    return " UNION ALL ".join(parts)


# planted near-dup embeddings (mirror of with_planted_vec_dupes)
_VPLANT = """ve AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 10000000,
           list_prepend((embedding[1] + 0.001)::FLOAT, embedding[2:]) AS embedding
    FROM embeddings WHERE vec_id % 20 = 0)"""


def _prepared_vecs(src_cte: str, src: str) -> str:
    return f"""{src_cte},
  prep AS (SELECT vec_id, {_quant_emb()} AS qe FROM {src}),
  pv AS (SELECT vec_id, qe, {_sql_dot('qe', 'qe')} AS n2 FROM prep)"""


PIPELINE_ORACLE_SQL: dict[str, str] = {
    "text_tokens": f"""WITH {_D}
        SELECT doc_id,
               len({_WORDS})::BIGINT AS n_ws_tokens,
               len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_word_tokens,
               len(regexp_extract_all(text, {_BPE_SQL}))::BIGINT AS n_bpe_tokens,
               length(text)::BIGINT AS n_text_chars
        FROM d""",
    "sample_mixture": None,  # filled below from sampling's constants
    "decontam": f"""WITH {_D},
        tr AS (SELECT doc_id, text FROM d WHERE doc_id % 37 <> 0),
        ev AS (SELECT doc_id, text FROM d WHERE doc_id % 37 = 0),
        ta AS (SELECT doc_id, list_distinct(
                 CASE WHEN len(w) >= 3
                      THEN list_transform(generate_series(1, len(w)-2),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                      ELSE [array_to_string(w, ' ')] END) AS sa
               FROM (SELECT doc_id, {_WORDS} AS w FROM tr)),
        te AS (SELECT doc_id, len(sa)::BIGINT AS ns, unnest(sa) AS shingle
               FROM ta),
        es AS (SELECT DISTINCT unnest(list_distinct(
                 CASE WHEN len(w) >= 3
                      THEN list_transform(generate_series(1, len(w)-2),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                      ELSE [array_to_string(w, ' ')] END)) AS shingle
               FROM (SELECT {_WORDS} AS w FROM ev))
        SELECT doc_id, min(ns) AS n_shingles, count(*)::BIGINT AS n_shared,
               (count(*) * 1000000 // min(ns))::BIGINT AS share_ppm
        FROM te JOIN es USING (shingle) GROUP BY 1""",
    "text_repetition": f"""WITH {_D},
        pw AS (SELECT doc_id, {_WORDS} AS w FROM d),
        b AS (SELECT doc_id, len(w)::BIGINT AS nw,
                     len(list_distinct(w))::BIGINT AS dw,
                     list_transform(generate_series(1, len(w)-1),
                                    i -> w[i] || ' ' || w[i+1]) AS g
              FROM pw WHERE len(w) >= 2),
        e AS (SELECT doc_id, nw, dw, unnest(g) AS gram FROM b),
        pg AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt,
                      min(nw) AS nw, min(dw) AS dw
               FROM e GROUP BY 1, 2),
        a AS (SELECT doc_id, min(nw) AS nw, min(dw) AS dw,
                     sum(cnt)::BIGINT AS n2, count(*)::BIGINT AS d2,
                     max(cnt)::BIGINT AS topc
              FROM pg GROUP BY 1)
        SELECT doc_id, nw AS n_words,
               ((nw - dw) * 1000000 // nw)::BIGINT AS dup_word_ppm,
               n2 AS n_2grams,
               ((n2 - d2) * 1000000 // n2)::BIGINT AS dup_2gram_ppm,
               (topc * 1000000 // n2)::BIGINT AS top_2gram_ppm
        FROM a""",
    "text_quality": f"""WITH {_D},
        t AS (SELECT doc_id, text, {_WORDS} AS w,
                     length(text)::BIGINT AS n_chars2,
                     length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::BIGINT AS n_punct,
                     length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS word_chars
              FROM d),
        s AS (SELECT doc_id, len(w)::BIGINT AS n_words, n_punct, n_chars2, word_chars,
                     len(list_filter(w, x -> list_contains({_STOPS_EN}, x)))::BIGINT AS hits
              FROM t)
        SELECT doc_id, n_words, n_punct,
               CAST(FLOOR(word_chars::DOUBLE / n_words::DOUBLE * 1000000) AS BIGINT)
                 AS mean_word_len_q,
               CAST(FLOOR(hits::DOUBLE / n_words::DOUBLE * 1000000) AS BIGINT)
                 AS stop_ratio_q,
               CAST(FLOOR((0.4 * (hits::DOUBLE / n_words::DOUBLE)
                         + 0.3 * least(n_words::DOUBLE / 100.0, 1.0)
                         + 0.3 * (1.0 - n_punct::DOUBLE / n_chars2::DOUBLE))
                          * 1000000) AS BIGINT) AS quality_q
        FROM s""",
    "text_langid": f"""WITH {_D},
        t AS (SELECT doc_id, lang, {_WORDS} AS w FROM d),
        s AS (SELECT doc_id, lang,
                     {_lang_hits('en')} AS s_en, {_lang_hits('de')} AS s_de,
                     {_lang_hits('fr')} AS s_fr, {_lang_hits('es')} AS s_es
              FROM t),
        p AS (SELECT lang,
                     CASE WHEN s_en >= greatest(s_de, s_fr, s_es, 1) THEN 'en'
                          WHEN s_de >= greatest(s_en, s_fr, s_es, 1) THEN 'de'
                          WHEN s_fr >= greatest(s_en, s_de, s_es, 1) THEN 'fr'
                          WHEN s_es >= greatest(s_en, s_de, s_fr, 1) THEN 'es'
                          ELSE 'und' END AS pred_lang
              FROM s)
        SELECT lang, pred_lang, count(*)::BIGINT AS n FROM p GROUP BY 1, 2""",
    "text_scrub": f"""WITH {_D},
        p AS (SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0
                             THEN ' u' || CAST(doc_id AS VARCHAR) || '@ex.com'
                             ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                             THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                             ELSE '' END
                     || CASE WHEN doc_id % 7 = 0
                             THEN ' +1-555-01' || CAST(doc_id % 10 AS VARCHAR)
                             ELSE '' END AS t
              FROM d)
        SELECT doc_id,
               len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]'))::BIGINT
                 AS n_email,
               len(regexp_extract_all(t, '([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}'))::BIGINT
                 AS n_ip,
               len(regexp_extract_all(t, '\\+[0-9][0-9-]{{5,}}[0-9]'))::BIGINT
                 AS n_phone,
               md5(regexp_replace(
                     regexp_replace(
                       regexp_replace(t,
                         '[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]', '<EMAIL>', 'g'),
                       '([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}', '<IP>', 'g'),
                     '\\+[0-9][0-9-]{{5,}}[0-9]', '<PHONE>', 'g')) AS scrub_md5
        FROM p""",
    "text_fingerprint": f"""WITH {_D},
        t AS (SELECT doc_id, {_WORDS} AS w FROM d)
        SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(w, x -> {_h60('x')} % 1000000007)),
                 (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint,
               md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS bag_fp
        FROM t""",
    "dedup_exact": f"""WITH {_D},
        planted AS (SELECT doc_id, text FROM d
                    UNION ALL
                    SELECT doc_id + 10000000, text FROM d WHERE doc_id % 10 = 0)
        SELECT md5(text) AS text_hash, count(*)::BIGINT AS n_docs,
               min(doc_id) AS keeper
        FROM planted GROUP BY 1 HAVING count(*) > 1""",
    "dedup_minhash": f"""WITH {_MH_CTES}
        {_MH_PAIRS_SELECT}""",
    "dedup_components": f"""WITH RECURSIVE {_MH_CTES},
        pairs AS ({_MH_PAIRS_SELECT}),
        bidir AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (SELECT DISTINCT u AS node, u AS r FROM bidir
                  UNION
                  SELECT reach.node, bidir.v
                  FROM reach JOIN bidir ON reach.r = bidir.u),
        lab AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
        SELECT cluster, count(*)::BIGINT AS n_members,
               sum(node)::BIGINT AS member_sum
        FROM lab GROUP BY cluster""",
    "dedup_simhash": f"""WITH {_SHINGLES},
        wh AS (SELECT doc_id, {_h60('shingle')} AS h FROM sh),
        bits AS (SELECT doc_id, j,
                        CASE WHEN sum(2 * ((h >> j) & 1) - 1) >= 0
                             THEN (1::BIGINT << j) ELSE 0 END AS bit
                 FROM wh CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS j)
                 GROUP BY doc_id, j),
        sim AS (SELECT doc_id, sum(bit)::BIGINT AS sh2 FROM bits GROUP BY 1),
        banded AS (SELECT doc_id, sh2, b AS band,
                          (sh2 >> (b * {_SH_BAND_BITS})) & {_SH_MASK} AS key
                   FROM sim CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS b)),
        safe AS (SELECT band, key FROM banded GROUP BY band, key
                 HAVING count(*) <= {SIMHASH_MAX_BUCKET}),
        guarded AS (SELECT banded.* FROM banded JOIN safe USING (band, key))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sh2, b.sh2))::BIGINT AS hamming
        FROM guarded a JOIN guarded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh2, b.sh2)) <= 7""",
    "dedup_jaccard": f"""WITH {_SHINGLES},
        keep AS (SELECT shingle FROM sh GROUP BY 1
                 HAVING count(*) <= {DEFAULT_MAX_DF}),
        shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM shf GROUP BY 1),
        shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          count(*)::BIGINT AS shared
                   FROM shf a JOIN shf b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
        j AS (SELECT doc_a, doc_b, shared,
                     CAST(FLOOR(shared::DOUBLE
                                / (na.n + nb.n - shared)::DOUBLE * 1000000)
                          AS BIGINT) AS jac_q
              FROM shared
              JOIN sizes na ON na.doc_id = doc_a
              JOIN sizes nb ON nb.doc_id = doc_b)
        SELECT doc_a, doc_b, shared, jac_q FROM j WHERE jac_q >= 500000""",
    "dedup_embed": f"""WITH {_prepared_vecs(_VPLANT, 've')},
        pb AS (SELECT vec_id, qe, n2, {_sql_bucket('qe')} AS bucket FROM pv)
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_sql_cos_q(_sql_dot('a.qe', 'b.qe'), 'a.n2', 'b.n2')} AS cos_q
        FROM pb a JOIN pb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {_sql_cos_q(_sql_dot('a.qe', 'b.qe'), 'a.n2', 'b.n2')} >= 990000""",
    "ann_topk": f"""WITH {_prepared_vecs('ve AS (SELECT vec_id, embedding FROM embeddings)', 've')},
        q AS (SELECT vec_id AS q_id, qe AS q_qe, n2 AS q_n2 FROM pv WHERE vec_id < 10),
        scored AS (SELECT q_id, vec_id AS neighbor_id,
                          {_sql_cos_q(_sql_dot('qe', 'q_qe'), 'n2', 'q_n2')} AS cos_q
                   FROM pv CROSS JOIN q WHERE vec_id <> q_id),
        r AS (SELECT q_id, neighbor_id, cos_q,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos_q DESC, neighbor_id) AS rank
              FROM scored)
        SELECT q_id, neighbor_id, cos_q, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 5""",
    "ann_lsh": f"""WITH {_prepared_vecs('ve AS (SELECT vec_id, embedding FROM embeddings)', 've')},
        banded AS ({_sql_table_keys()}),
        safe AS (SELECT tbl, key FROM banded GROUP BY tbl, key
                 HAVING count(*) <= {LSH_MAX_BUCKET}),
        guarded AS (SELECT banded.* FROM banded JOIN safe USING (tbl, key)),
        cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS neighbor_id
                 FROM guarded a JOIN guarded b
                   ON a.tbl = b.tbl AND a.key = b.key AND a.vec_id <> b.vec_id),
        scored AS (SELECT q_id, neighbor_id,
                          {_sql_cos_q(_sql_dot('qa.qe', 'nb.qe'), 'qa.n2', 'nb.n2')} AS cos_q
                   FROM cand
                   JOIN pv qa ON qa.vec_id = q_id
                   JOIN pv nb ON nb.vec_id = neighbor_id),
        r AS (SELECT q_id, neighbor_id, cos_q,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos_q DESC, neighbor_id) AS rank
              FROM scored)
        SELECT q_id, neighbor_id, cos_q, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 3""",
    "ann_ivf": f"""WITH {_prepared_vecs('ve AS (SELECT vec_id, embedding FROM embeddings)', 've')},
        dims AS (SELECT vec_id % {IVF_LISTS} AS lst, i AS pos, qe[i] AS v
                 FROM pv CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)),
        cent AS (SELECT lst, list(c ORDER BY pos) AS cent
                 FROM (SELECT lst, pos, CAST(FLOOR(avg(v)) AS BIGINT) AS c
                       FROM dims GROUP BY lst, pos) GROUP BY lst),
        dists AS (SELECT pv.vec_id, cent.lst,
                         list_sum(list_transform(generate_series(1, {EMB_DIM}),
                           i -> (qe[i] - cent[i]) * (qe[i] - cent[i]))) AS d2
                  FROM pv CROSS JOIN cent),
        assign AS (SELECT vec_id, lst,
                          row_number() OVER (PARTITION BY vec_id ORDER BY d2, lst) AS r
                   FROM dists),
        corpus AS (SELECT vec_id, lst FROM assign WHERE r = 1),
        probes AS (SELECT vec_id AS q_id, lst FROM assign WHERE r <= {IVF_PROBE}),
        cand AS (SELECT DISTINCT p.q_id, c.vec_id AS neighbor_id
                 FROM probes p JOIN corpus c USING (lst)
                 WHERE c.vec_id <> p.q_id),
        scored AS (SELECT q_id, neighbor_id,
                          {_sql_cos_q(_sql_dot('qa.qe', 'nb.qe'), 'qa.n2', 'nb.n2')} AS cos_q
                   FROM cand
                   JOIN pv qa ON qa.vec_id = q_id
                   JOIN pv nb ON nb.vec_id = neighbor_id),
        r AS (SELECT q_id, neighbor_id, cos_q,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos_q DESC, neighbor_id) AS rank
              FROM scored)
        SELECT q_id, neighbor_id, cos_q, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 3""",
    "pipeline_clean": f"""WITH {_D},
        planted AS (SELECT doc_id, text, lang, source FROM d
                    UNION ALL
                    SELECT doc_id + 10000000, text, lang, source FROM d
                    WHERE doc_id % 10 = 0),
        keepers AS (SELECT min(doc_id) AS doc_id FROM planted GROUP BY md5(text)),
        surv AS (SELECT p.* FROM planted p JOIN keepers USING (doc_id)),
        t AS (SELECT doc_id, source, text, {_WORDS} AS w,
                     length(text)::BIGINT AS n_chars2,
                     length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::BIGINT AS n_punct
              FROM surv),
        sc AS (SELECT doc_id, source, w, n_punct, n_chars2,
                      len(w)::BIGINT AS n_words, len(w)::BIGINT AS n_ws_tokens,
                      {_lang_hits('en')} AS s_en, {_lang_hits('de')} AS s_de,
                      {_lang_hits('fr')} AS s_fr, {_lang_hits('es')} AS s_es,
                      len(list_filter(w, x -> list_contains({_STOPS_EN}, x)))::BIGINT AS hits
               FROM t),
        prof AS (SELECT source,
                        CASE WHEN s_en >= greatest(s_de, s_fr, s_es, 1) THEN 'en'
                             WHEN s_de >= greatest(s_en, s_fr, s_es, 1) THEN 'de'
                             WHEN s_fr >= greatest(s_en, s_de, s_es, 1) THEN 'fr'
                             WHEN s_es >= greatest(s_en, s_de, s_fr, 1) THEN 'es'
                             ELSE 'und' END AS pred_lang,
                        CAST(FLOOR((0.4 * (hits::DOUBLE / n_words::DOUBLE)
                                  + 0.3 * least(n_words::DOUBLE / 100.0, 1.0)
                                  + 0.3 * (1.0 - n_punct::DOUBLE / n_chars2::DOUBLE))
                                   * 1000000) AS BIGINT) AS quality_q,
                        n_ws_tokens
                 FROM sc)
        SELECT source, pred_lang, count(*)::BIGINT AS n_docs,
               sum(n_ws_tokens)::BIGINT AS total_tokens,
               CAST(FLOOR(avg(quality_q)) AS BIGINT) AS mean_quality_q
        FROM prof WHERE quality_q >= 450000
        GROUP BY 1, 2""",
    "mm_features": f"""WITH {_D}
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               octet_length(encode(text))::BIGINT AS n_bytes,
               (list_sum(list_transform(generate_series(1, length(text)),
                  i -> ascii(substr(text, i, 1))))::BIGINT % 2147483647) AS checksum,
               (octet_length(encode(text)) // 1024 + 1)::BIGINT AS n_frames
        FROM d""",
    # K1 — concat-and-chunk packing: global exclusive prefix sum over
    # doc_id order (the relational form of packing.concat_pack_spans'
    # distributed prefix sum), then each doc unnested over the chunk
    # range it straddles.
    "pack_concat": f"""
        WITH d AS (SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_tok
                   FROM documents WHERE n_chars > 0),
        o AS (SELECT doc_id, n_tok,
                     (sum(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - n_tok)::BIGINT AS off
              FROM d),
        s AS (SELECT doc_id, n_tok, off,
                     unnest(generate_series(off // {PACK_CAPACITY},
                        (off + n_tok - 1) // {PACK_CAPACITY})) AS chunk_id
              FROM o)
        SELECT chunk_id::BIGINT AS chunk_id, doc_id,
               (greatest(off, chunk_id * {PACK_CAPACITY})
                - chunk_id * {PACK_CAPACITY})::BIGINT AS chunk_pos,
               (greatest(off, chunk_id * {PACK_CAPACITY}) - off)::BIGINT
                 AS doc_start,
               (least(off + n_tok, (chunk_id + 1) * {PACK_CAPACITY})
                - greatest(off, chunk_id * {PACK_CAPACITY}))::BIGINT AS span_len
        FROM s""",
    # K2 — greedy no-split packing: recursive CTE walks each md5
    # bucket in doc_id order threading (bin, fill) state — the exact
    # sequential rule packing.greedy_pack_bins runs per bucket.
    "pack_greedy": f"""
        WITH RECURSIVE b AS (
          SELECT ({_h60('CAST(doc_id AS VARCHAR)')} % {GREEDY_BUCKETS})::BIGINT
                   AS bucket,
                 doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n
          FROM documents),
        d AS (SELECT bucket, doc_id, n,
                     row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                       AS rn
              FROM b),
        walk AS (
          SELECT bucket, rn, doc_id, n,
                 0::BIGINT AS bin, 0::BIGINT AS bin_start, n AS fill
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.bucket, d.rn, d.doc_id, d.n,
                 CASE WHEN w.fill + d.n <= {GREEDY_CAPACITY}
                      THEN w.bin ELSE w.bin + 1 END,
                 CASE WHEN w.fill + d.n <= {GREEDY_CAPACITY}
                      THEN w.fill ELSE 0::BIGINT END,
                 CASE WHEN w.fill + d.n <= {GREEDY_CAPACITY}
                      THEN w.fill + d.n ELSE d.n END
          FROM walk w JOIN d ON d.bucket = w.bucket AND d.rn = w.rn + 1)
        SELECT bucket, doc_id, bin, bin_start FROM walk""",
}

# identical clusters regardless of CC algorithm -> same oracle
# mixture-sampling oracle, generated from sampling's ONE constant
# table so engine and oracle can never drift
def _mixture_oracle_sql() -> str:
    from .sampling import (
        DEFAULT_WEIGHT,
        MIXTURE_WEIGHTS,
        SAMPLE_DENOM,
        SAMPLE_SALT,
        _weight_maps,
    )

    whole, frac, d_whole, d_frac = _weight_maps(MIXTURE_WEIGHTS, DEFAULT_WEIGHT)
    w_case = " ".join(
        f"WHEN '{s}' THEN {whole[s]}" for s in sorted(MIXTURE_WEIGHTS)
    )
    f_case = " ".join(
        f"WHEN '{s}' THEN {frac[s]}" for s in sorted(MIXTURE_WEIGHTS)
    )
    bucket = (
        f"(('0x' || substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))"
        f"::BIGINT % {SAMPLE_DENOM})"
    )
    return f"""WITH {_D},
        c AS (SELECT doc_id, source,
                     (CASE source {w_case} ELSE {d_whole} END)
                     + (CASE WHEN {bucket} <
                             (CASE source {f_case} ELSE {d_frac} END)
                        THEN 1 ELSE 0 END) AS n
              FROM d),
        e AS (SELECT doc_id, source,
                     unnest(generate_series(0, n - 1)) AS copy_idx
              FROM c WHERE n > 0)
        SELECT source, count(*)::BIGINT AS n_emitted,
               count(DISTINCT doc_id)::BIGINT AS n_docs_kept,
               sum(doc_id)::BIGINT AS doc_id_sum,
               sum(copy_idx)::BIGINT AS copy_idx_sum
        FROM e GROUP BY 1"""


PIPELINE_ORACLE_SQL["pipeline_build"] = f"""WITH {_D},
    ev AS (SELECT text FROM d WHERE doc_id % 37 = 0),
    tr0 AS (SELECT * FROM d WHERE doc_id % 37 <> 0),
    keep AS (SELECT min(doc_id) AS doc_id FROM tr0 GROUP BY md5(text)),
    tr1 AS (SELECT t.* FROM tr0 t JOIN keep USING (doc_id)),
    ta AS (SELECT doc_id, list_distinct(
             CASE WHEN len(w) >= 3
                  THEN list_transform(generate_series(1, len(w)-2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [array_to_string(w, ' ')] END) AS sa
           FROM (SELECT doc_id, {_WORDS} AS w FROM tr1)),
    te AS (SELECT doc_id, len(sa)::BIGINT AS ns, unnest(sa) AS shingle
           FROM ta),
    es AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 3
                  THEN list_transform(generate_series(1, len(w)-2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [array_to_string(w, ' ')] END)) AS shingle
           FROM (SELECT {_WORDS} AS w FROM ev)),
    cont AS (SELECT doc_id
             FROM (SELECT doc_id, min(ns) AS ns, count(*) AS c
                   FROM te JOIN es USING (shingle) GROUP BY 1)
             WHERE c * 1000000 // ns >= 500000),
    tr2 AS (SELECT * FROM tr1 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
    t AS (SELECT doc_id, source, {_WORDS} AS w,
                 length(text)::BIGINT AS n_chars2,
                 length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::BIGINT AS n_punct
          FROM tr2),
    sc AS (SELECT doc_id, source, w, n_punct, n_chars2,
                  len(w)::BIGINT AS n_words, len(w)::BIGINT AS n_ws_tokens,
                  {_lang_hits('en')} AS s_en, {_lang_hits('de')} AS s_de,
                  {_lang_hits('fr')} AS s_fr, {_lang_hits('es')} AS s_es,
                  len(list_filter(w, x -> list_contains({_STOPS_EN}, x)))::BIGINT AS hits
           FROM t),
    prof AS (SELECT doc_id, source,
                    CASE WHEN s_en >= greatest(s_de, s_fr, s_es, 1) THEN 'en'
                         WHEN s_de >= greatest(s_en, s_fr, s_es, 1) THEN 'de'
                         WHEN s_fr >= greatest(s_en, s_de, s_es, 1) THEN 'fr'
                         WHEN s_es >= greatest(s_en, s_de, s_fr, 1) THEN 'es'
                         ELSE 'und' END AS pred_lang,
                    CAST(FLOOR((0.4 * (hits::DOUBLE / n_words::DOUBLE)
                              + 0.3 * least(n_words::DOUBLE / 100.0, 1.0)
                              + 0.3 * (1.0 - n_punct::DOUBLE / n_chars2::DOUBLE))
                               * 1000000) AS BIGINT) AS quality_q,
                    n_ws_tokens
             FROM sc),
    sp AS (SELECT source, pred_lang, n_ws_tokens,
                  ('0x' || substr(md5('split:v1:' ||
                     CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
                    AS bucket
           FROM prof WHERE quality_q >= 450000)
    SELECT CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split,
           source, pred_lang, count(*)::BIGINT AS n_docs,
           sum(n_ws_tokens)::BIGINT AS total_tokens
    FROM sp GROUP BY 1, 2, 3"""

PIPELINE_ORACLE_SQL["sample_mixture"] = _mixture_oracle_sql()
PIPELINE_ORACLE_SQL["dedup_components_star"] = PIPELINE_ORACLE_SQL["dedup_components"]
PIPELINE_ORACLE_SQL["dedup_components_auto"] = PIPELINE_ORACLE_SQL["dedup_components"]

# ann_recall: exact recall@3 of the two approximate indexes vs brute
# force, recomputed wholly in SQL by nesting the ann_lsh / ann_ivf
# oracles as CTE subqueries (DuckDB allows WITH inside parens).
PIPELINE_ORACLE_SQL["ann_recall"] = f"""WITH {_prepared_vecs("ve AS (SELECT vec_id, embedding FROM embeddings)", "ve")},
    truth AS (
      SELECT q_id, neighbor_id
      FROM (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY {_sql_cos_q(_sql_dot("a.qe", "b.qe"), "a.n2", "b.n2")} DESC,
                                b.vec_id) AS rnk
            FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
            WHERE a.vec_id % 10 = 0 AND a.vec_id < {10 * ANN_RECALL_PANEL_CAP})
      WHERE rnk <= 3),
    lsh AS (SELECT q_id, neighbor_id FROM ({PIPELINE_ORACLE_SQL["ann_lsh"]})
            WHERE q_id % 10 = 0 AND q_id < {10 * ANN_RECALL_PANEL_CAP}),
    ivf AS (SELECT q_id, neighbor_id FROM ({PIPELINE_ORACLE_SQL["ann_ivf"]})
            WHERE q_id % 10 = 0 AND q_id < {10 * ANN_RECALL_PANEL_CAP}),
    poss AS (SELECT 3 * count(*)::BIGINT AS possible FROM embeddings
             WHERE vec_id % 10 = 0 AND vec_id < {10 * ANN_RECALL_PANEL_CAP}),
    lh AS (SELECT count(*)::BIGINT AS hits FROM lsh JOIN truth USING (q_id, neighbor_id)),
    ih AS (SELECT count(*)::BIGINT AS hits FROM ivf JOIN truth USING (q_id, neighbor_id))
    SELECT 'lsh' AS method, hits, possible,
           ((hits * 1000000) // possible)::BIGINT AS recall_ppm,
           TRUE AS meets_floor
    FROM lh CROSS JOIN poss
    UNION ALL
    SELECT 'ivf' AS method, hits, possible,
           ((hits * 1000000) // possible)::BIGINT AS recall_ppm,
           TRUE AS meets_floor
    FROM ih CROSS JOIN poss"""
