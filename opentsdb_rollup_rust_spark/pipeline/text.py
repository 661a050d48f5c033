"""Text analysis operators: tokenization, language-ID, quality
scoring, rolling-hash fingerprints.

All built-in expressions (whole-stage codegen, zero Python). Each
operator is a narrow per-row map — no shuffle — so at 100 TB these
run at scan speed and pipeline into whatever aggregation follows.

Determinism: word hashes are md5-derived (cross-engine reproducible,
see functions.hashing.md5_int60); ratios are doubles derived from
exact integer counts, so DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60

# Tiny per-language stopword tables for the n-gram/stopword heuristic.
# Real deployments swap in bigger tables; the *shape* (broadcastable
# lookup folded into a literal array) is the scale-relevant part.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "is", "and", "to", "in", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "las", "una", "por", "que"),
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131


def doc_words(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


# GPT-2-style pre-tokenizer piece pattern, simplified to drop the
# lookaheads (ordered alternation is leftmost-first in BOTH Java regex
# (Spark) and RE2 (DuckDB), so counts match cross-engine exactly):
# contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, residual whitespace.
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"


def token_counts(text: Column | str) -> dict[str, Column]:
    """Token-counting suite: whitespace tokens, wordish tokens
    (``[a-z0-9]+`` pieces), GPT-2-ish pre-tokenizer pieces (the
    training-data "token budget" proxy), and characters. All exact
    longs."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_ws_tokens": F.size(doc_words(c)).cast("long"),
        "n_word_tokens": F.size(F.regexp_extract_all(c, F.lit("[a-z0-9]+"), 0)).cast(
            "long"
        ),
        "n_bpe_tokens": F.size(
            F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), 0)
        ).cast("long"),
        "n_chars": F.length(c).cast("long"),
    }


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``.
    Integer hit count / integer token count -> deterministic double."""
    w = doc_words(text)
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(stops, x)))
    return hits.cast("double") / F.size(w).cast("double")


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-heuristic core)."""
    w = doc_words(text)
    out: dict[str, Column] = {}
    for lang, stops in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(s) for s in stops])
        out[lang] = F.size(F.filter(w, lambda x: F.array_contains(arr, x))).cast(
            "long"
        )
    return out


def lang_id(text: Column | str, min_hits: int = 1) -> Column:
    """Predicted language = argmax of lang_scores, ties broken by
    fixed language order; 'und' when no language reaches min_hits."""
    scores = lang_scores(text)
    langs = list(LANG_STOPWORDS)
    expr_best = F.lit("und")
    for lang in reversed(langs):
        cond = scores[lang] >= F.greatest(
            *[scores[o] for o in langs if o != lang], F.lit(min_hits).cast("long")
        )
        # tie-break: an earlier language with an equal score overrides
        expr_best = F.when(cond, F.lit(lang)).otherwise(expr_best)
    return expr_best


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring components (all from exact integers):
    length, word count, mean word length, punctuation ratio,
    stopword ratio. ``quality_q`` is the composite, quantized to 1e-6
    integer units so cross-engine comparison is exact."""
    c = F.col(text) if isinstance(text, str) else text
    w = doc_words(c)
    n_chars = F.length(c).cast("long")
    n_words = F.size(w).cast("long")
    n_punct = F.length(F.regexp_replace(c, "[^.,!?;:]", "")).cast("long")
    word_chars = F.length(F.regexp_replace(c, r"\s", "")).cast("long")
    stop_r = stopword_ratio(c, "en")
    punct_r = n_punct.cast("double") / n_chars.cast("double")
    mean_wl = word_chars.cast("double") / n_words.cast("double")
    score = (
        F.lit(0.4) * stop_r
        + F.lit(0.3) * F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_r)
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "mean_word_len_q": F.floor(mean_wl * F.lit(1_000_000)).cast("long"),
        "stop_ratio_q": F.floor(stop_r * F.lit(1_000_000)).cast("long"),
        "quality_q": F.floor(score * F.lit(1_000_000)).cast("long"),
    }


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over word hashes, acc' = (acc*131 + h(word)) mod 1e9+7.

    h(word) = md5_int60(word) mod 1e9+7 keeps every intermediate
    product < 2^38 — exact under ANSI mode, reproducible in DuckDB via
    list_reduce. Sequential per row (F.aggregate is a left fold), but
    embarrassingly parallel across rows — scan-speed at 100 TB."""
    w = doc_words(text)
    m = F.lit(FINGERPRINT_MOD)
    return F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(FINGERPRINT_BASE) + F.pmod(md5_int60(x), m), m),
    )


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct word set — the exact-dedup key for shuffled/reflowed
    copies of the same content."""
    w = F.array_sort(F.array_distinct(doc_words(text)))
    return F.md5(F.array_join(w, " "))


def repetition_profile(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """T7: Gopher-style repetition signals — the quality filters that
    catch boilerplate and degenerate generations: duplicate-word
    fraction, duplicate-2gram fraction, and the fraction of all 2-gram
    occurrences taken by the single most frequent 2-gram. All three
    are exact-integer ppm (``x * 1e6 DIV total``) so the DuckDB oracle
    matches bit-for-bit.

    Scale shape: word stats are array HOFs (no shuffle); the 2-gram
    mode needs a real aggregation, done as explode -> partial-agg on
    (doc_id, gram) -> per-doc rollup — two map-side-combined shuffles
    keyed by doc_id, never a per-row quadratic scan of the gram array
    (O(L^2) per document would not survive book-length docs at 100 TB).
    Documents with fewer than two words have no 2-grams and drop out
    (mirrored in the oracle's ``len(w) >= 2`` filter)."""
    w = doc_words(F.col(text_col))
    tail = F.size(w) - F.lit(1)
    grams = F.zip_with(
        F.slice(w, 1, tail),
        F.slice(w, 2, tail),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.size(F.array_distinct(w)).cast("long").alias("d_words"),
        grams.alias("grams"),
    )
    e = base.select(
        "doc_id", "n_words", "d_words", F.explode("grams").alias("gram")
    )
    per_gram = e.groupBy("doc_id", "gram").agg(
        F.count("*").alias("cnt"),
        F.min("n_words").alias("n_words"),
        F.min("d_words").alias("d_words"),
    )
    agg = per_gram.groupBy("doc_id").agg(
        F.min("n_words").alias("n_words"),
        F.min("d_words").alias("d_words"),
        F.sum("cnt").alias("n_2grams"),
        F.count("*").alias("d_2grams"),
        F.max("cnt").alias("top_cnt"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        F.expr("(n_words - d_words) * 1000000 DIV n_words").alias(
            "dup_word_ppm"
        ),
        "n_2grams",
        F.expr("(n_2grams - d_2grams) * 1000000 DIV n_2grams").alias(
            "dup_2gram_ppm"
        ),
        F.expr("top_cnt * 1000000 DIV n_2grams").alias("top_2gram_ppm"),
    )


# PII patterns kept to plain character classes + bounded repeats so
# Java regex (Spark) and RE2 (DuckDB) match the identical spans —
# no lookarounds, no backrefs, no alternation-order subtleties.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]", "<EMAIL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9][0-9-]{5,}[0-9]", "<PHONE>"),
)


def pii_scrub(text: Column | str) -> dict[str, Column]:
    """T6: PII redaction — the standard scrubbing pass a training-data
    pipeline runs before packing: emails / IPv4s / phone numbers are
    replaced with typed placeholder tags, and per-document match
    counts are kept for lineage ("how much was redacted where").

    Counts are taken on the ORIGINAL text per pattern (so one
    pattern's replacement can never hide another's count); the scrub
    itself applies patterns in declaration order on the running
    result. Pure codegen'd expressions (regexp_count /
    regexp_replace) — per-row map, no shuffle, scan-speed at 100 TB.
    """
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    scrubbed = c
    for name, pat, tag in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(c, F.lit(pat)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    out["scrubbed"] = scrubbed
    return out


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: token counts + language +
    quality + fingerprints. Pure projection — no shuffle."""
    c = F.col(text_col)
    tc = token_counts(c)
    qf = quality_features(c)
    return docs.select(
        "doc_id",
        tc["n_ws_tokens"].alias("n_ws_tokens"),
        tc["n_word_tokens"].alias("n_word_tokens"),
        qf["n_punct"].alias("n_punct"),
        qf["mean_word_len_q"].alias("mean_word_len_q"),
        qf["stop_ratio_q"].alias("stop_ratio_q"),
        qf["quality_q"].alias("quality_q"),
        lang_id(c).alias("pred_lang"),
        rolling_fingerprint(c).alias("fingerprint"),
        bag_fingerprint(c).alias("bag_fp"),
    )
