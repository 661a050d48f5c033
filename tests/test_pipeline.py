"""Tests for the training-data pipeline operators (pipeline/*):
dedup, similarity search, text analysis, multimodal plumbing.

Inputs come from the driver-provided sf0.001 parquet fixtures
(TESTDATA.md) — never synthesized ad hoc — so these tests exercise the
same tables the correctness gate uses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
OFFSET = 10_000_000


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.trim("text").alias("text"), "lang", "source")
        .cache()
    )


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------- dedup

def test_exact_dedup_finds_all_planted(docs):
    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        exact_dup_clusters,
        with_planted_dupes,
    )

    planted = with_planted_dupes(docs, every=10, mutate=False)
    n_planted = docs.where(F.col("doc_id") % 10 == 0).count()
    clusters = exact_dup_clusters(planted).collect()
    assert len(clusters) == n_planted
    # keeper is always the original (smaller) id
    assert all(r["keeper"] < OFFSET and r["n_docs"] == 2 for r in clusters)


def test_minhash_lsh_recall_on_planted(docs):
    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        with_planted_dupes,
    )

    planted = with_planted_dupes(docs, every=10, mutate=True)
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(planted).collect()}
    expected = {
        (r["doc_id"], r["doc_id"] + OFFSET)
        for r in docs.where(F.col("doc_id") % 10 == 0).collect()
    }
    recall = len(pairs & expected) / len(expected)
    # near-dups have shingle-Jaccard ~0.98 >> the ~0.71 LSH threshold
    assert recall >= 0.9, f"recall={recall}"


def test_minhash_hot_bucket_cap_drops_degenerate_cluster(docs, spark):
    """MINHASH_MAX_BUCKET guard (r4 VERDICT task #2): a planted
    degenerate cluster — identical texts, so every band bucket holds
    the whole cluster — is dropped entirely when the cluster exceeds
    max_bucket, while an ordinary 2-doc duplicate pair elsewhere in
    the corpus still pairs. Without the cap the same cluster
    contributes O(B^2) candidate pairs out of the self-join."""
    from opentsdb_rollup_rust_spark.pipeline.dedup import minhash_lsh_pairs

    two = docs.orderBy("doc_id").limit(2).collect()
    hot_text, pair_text = two[0]["text"], two[1]["text"]
    rows = [(20_000_000 + i, hot_text) for i in range(12)]
    rows += [(30_000_000, pair_text), (30_000_001, pair_text)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(d, max_bucket=8).collect()
    }
    assert (30_000_000, 30_000_001) in capped
    assert all(a >= 30_000_000 for a, _ in capped), capped

    uncapped = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(d).collect()
    }
    assert sum(a < 30_000_000 for a, _ in uncapped) == 12 * 11 // 2


def test_ngram_jaccard_exact_on_planted(docs):
    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        ngram_jaccard_pairs,
        with_planted_dupes,
    )

    planted = with_planted_dupes(docs, every=10, mutate=True)
    rows = ngram_jaccard_pairs(planted, min_jaccard=0.5).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in rows}
    planted_ids = [r["doc_id"] for r in docs.where(F.col("doc_id") % 10 == 0).collect()]
    found = [d for d in planted_ids if (d, d + OFFSET) in by_pair]
    assert len(found) / len(planted_ids) >= 0.9
    # dropping the last word removes at most one distinct shingle:
    # jaccard >= (m-1)/m, worst case ~0.85 for the shortest (~10 word) docs
    for d in found:
        r = by_pair[(d, d + OFFSET)]
        assert r["jac_q"] >= 840_000, r


def test_jaccard_corner_cases(spark):
    """Posting-list formulation corners: identical docs (jaccard 1),
    docs shorter than k words (single-shingle fallback), df=1 postings
    (no in-row pairs — the descending-sequence guard), and the
    max_df boundary dropping a hot shingle from sizes AND pairs."""
    from opentsdb_rollup_rust_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact dup of 1
            (3, "xy zz"),  # < k words -> one shingle "xy zz"
            (4, "xy zz"),  # dup of 3
            (5, "solo only here once"),  # shares nothing
        ],
        "doc_id long, text string",
    )
    rows = {(r["doc_a"], r["doc_b"]): r for r in
            ngram_jaccard_pairs(docs, min_jaccard=0.5, max_df=20).collect()}
    assert set(rows) == {(1, 2), (3, 4)}
    assert rows[(1, 2)]["jac_q"] == 1_000_000
    assert rows[(3, 4)]["jac_q"] == 1_000_000

    # hot-shingle guard: a shingle in 3 docs with max_df=2 is dropped
    # everywhere, killing pairs that relied on it
    hot = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c")], "doc_id long, text string"
    )
    assert ngram_jaccard_pairs(hot, min_jaccard=0.5, max_df=2).count() == 0
    assert ngram_jaccard_pairs(hot, min_jaccard=0.5, max_df=3).count() == 3

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ngram_jaccard_pairs(hot, max_df=None)


def test_simhash_pairs_match_planted(docs):
    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        simhash_pairs,
        with_planted_dupes,
    )

    planted = with_planted_dupes(docs, every=10, mutate=True)
    # 60-bit simhash: near-dups sit within ~13 bits; 7 balances recall
    # against the 15-bit-band candidate filter (see simhash_pairs)
    rows = simhash_pairs(planted, max_hamming=7).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    expected = {
        (r["doc_id"], r["doc_id"] + OFFSET)
        for r in docs.where(F.col("doc_id") % 10 == 0).collect()
    }
    # shingle-level simhash: near-dups flip few bits; captured pairs
    # must be dominated by planted ones (no pathological collisions)
    assert len(pairs & expected) / len(expected) >= 0.5
    assert len(pairs - expected) <= len(expected)


def test_embedding_near_dup_finds_all_planted(embs):
    from opentsdb_rollup_rust_spark.pipeline.similarity import (
        embedding_near_dup_pairs,
        with_planted_vec_dupes,
    )

    planted = with_planted_vec_dupes(embs, every=20)
    rows = embedding_near_dup_pairs(planted, dim=64, min_cos_q=990_000).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
    expected = {
        (r["vec_id"], r["vec_id"] + OFFSET)
        for r in embs.where(F.col("vec_id") % 20 == 0).collect()
    }
    assert expected <= pairs  # every planted near-dup found
    assert all(r["cos_q"] >= 990_000 for r in rows)


# ---------------------------------------------------------------- similarity

def test_lsh_topk_agrees_with_brute_force_in_bucket(embs):
    from opentsdb_rollup_rust_spark.pipeline.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    q = embs.where(F.col("vec_id") < 20)
    bf = {
        r["q_id"]: r["neighbor_id"]
        for r in brute_force_topk(embs, q, k=1).collect()
    }
    lsh = {
        (r["q_id"], r["neighbor_id"])
        for r in lsh_topk(embs, dim=64, k=5).collect()
        if r["q_id"] < 20
    }
    # ANN recall@5 vs exact top-1: the true nearest neighbor usually
    # shares the LSH bucket; require a sane recall floor
    hits = sum(1 for qid, nid in bf.items() if (qid, nid) in lsh)
    assert hits / len(bf) >= 0.5, f"recall@5={hits}/{len(bf)}"


def test_ivf_topk_recall_vs_brute_force(embs):
    from opentsdb_rollup_rust_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    q = embs.where(F.col("vec_id") < 20)
    bf = {
        r["q_id"]: r["neighbor_id"] for r in brute_force_topk(embs, q, k=1).collect()
    }
    ivf = {
        (r["q_id"], r["neighbor_id"])
        for r in ivf_topk(embs, dim=64, k=5).collect()
        if r["q_id"] < 20
    }
    hits = sum(1 for qid, nid in bf.items() if (qid, nid) in ivf)
    # near-random 64-dim embeddings are the hard case for a coarse
    # quantizer; require a sane floor, not perfection
    assert hits / len(bf) >= 0.3, f"recall@5={hits}/{len(bf)}"


def test_brute_force_topk_is_exact(embs, spark):
    from opentsdb_rollup_rust_spark.pipeline.similarity import brute_force_topk

    import math

    q = embs.where(F.col("vec_id") == 0)
    got = [
        (r["neighbor_id"], r["cos_q"])
        for r in brute_force_topk(embs, q, k=3).orderBy("rank").collect()
    ]
    # python oracle with identical quantization
    vecs = {r["vec_id"]: r["embedding"] for r in embs.collect()}
    qv = [math.floor(x * 1000) for x in vecs[0]]
    qn = sum(x * x for x in qv)

    def cos_q(vid):
        v = [math.floor(x * 1000) for x in vecs[vid]]
        d = sum(a * b for a, b in zip(qv, v))
        return math.floor(d / (math.sqrt(qn) * math.sqrt(sum(x * x for x in v))) * 1e6)

    want = sorted(
        ((vid, cos_q(vid)) for vid in vecs if vid != 0),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert got == want


# ---------------------------------------------------------------- text

def test_fingerprints_order_sensitivity(spark):
    from opentsdb_rollup_rust_spark.pipeline.text import (
        bag_fingerprint,
        rolling_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], "doc_id long, text string"
    )
    rows = df.select(
        rolling_fingerprint("text").alias("roll"), bag_fingerprint("text").alias("bag")
    ).collect()
    assert rows[0]["roll"] != rows[1]["roll"]  # rolling hash is order-sensitive
    assert rows[0]["bag"] == rows[1]["bag"]  # bag fingerprint is not


def test_lang_id_prefers_stopword_language(spark):
    from opentsdb_rollup_rust_spark.pipeline.text import lang_id

    df = spark.createDataFrame(
        [
            ("the cat is in the hat",),
            ("der hund und die katze ist nicht",),
            ("xyzzy plugh quux",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "de", "und"]


def test_connected_components_matches_python_union_find(spark):
    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        cluster_summary,
        connected_components,
    )

    # Chain (1-2-3-4), triangle+pendant (10,11,12,13), isolated edge
    # (20,21): label propagation must find min-id labels per component
    # even through multi-hop chains.
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (12, 13), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels = {
        r.node: r.cluster for r in connected_components(df).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1,
                      10: 10, 11: 10, 12: 10, 13: 10,
                      20: 20, 21: 20}
    summary = {
        r.cluster: (r.n_members, r.member_sum)
        for r in cluster_summary(connected_components(df)).collect()
    }
    assert summary == {1: (4, 10), 10: (4, 46), 20: (2, 41)}


def test_twostar_matches_fixpoint(spark):
    # Property: on random graphs (including a long chain — the
    # adversarial-diameter case two-star exists for) the O(log n)
    # large-star/small-star labels equal the propagate-to-fixpoint
    # labels exactly. Batched into one DataFrame per case set; chain
    # case kept separate so its diameter actually stresses the rounds.
    import random

    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        connected_components,
        connected_components_twostar,
    )

    rng = random.Random(7)
    cases = []
    edges = []
    for g in range(8):
        base = g * 1000
        n = rng.randint(2, 30)
        for _ in range(rng.randint(1, 40)):
            a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if a != b:
                edges.append((base + a, base + b))
    cases.append(edges)
    cases.append([(i, i + 1) for i in range(60)])  # 61-node chain
    for es in cases:
        df = spark.createDataFrame(es, "doc_a long, doc_b long")
        # the chain needs diameter(=60) propagation rounds — precisely
        # the regime the O(log n) two-star variant exists for
        fix = {
            r.node: r.cluster
            for r in connected_components(df, max_iter=80).collect()
        }
        two = {
            r.node: r.cluster
            for r in connected_components_twostar(df).collect()
        }
        assert two == fix


def test_auto_cc_matches_fixpoint_both_paths(spark):
    # connected_components_auto: shallow graphs converge inside the
    # propagation probe (no contraction); the 61-node chain cannot
    # converge in probe_rounds=2, forcing the contract-then-two-star
    # fallback — both paths must equal the plain fixpoint labels.
    from opentsdb_rollup_rust_spark.pipeline.dedup import (
        connected_components,
        connected_components_auto,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    fix = {
        r.node: r.cluster
        for r in connected_components(chain, max_iter=80).collect()
    }
    auto = {
        r.node: r.cluster
        for r in connected_components_auto(chain, probe_rounds=2).collect()
    }
    assert auto == fix

    shallow = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    fix_s = {
        r.node: r.cluster for r in connected_components(shallow).collect()
    }
    auto_s = {
        r.node: r.cluster
        for r in connected_components_auto(shallow).collect()
    }
    assert auto_s == fix_s


def test_pii_scrub_counts_and_replacements(spark):
    from opentsdb_rollup_rust_spark.pipeline.text import pii_scrub

    rows = [
        (1, "write to bob.smith@corp.example now"),
        (2, "host 10.0.12.7 and 192.168.1.200 are up"),
        (3, "call +1-555-0134 or mail a@b.io from 8.8.8.8"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    s = pii_scrub(F.col("text"))
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            s["n_email"].alias("n_email"),
            s["n_ip"].alias("n_ip"),
            s["n_phone"].alias("n_phone"),
            s["scrubbed"].alias("scrubbed"),
        ).collect()
    }
    assert (got[1].n_email, got[1].n_ip, got[1].n_phone) == (1, 0, 0)
    assert got[1].scrubbed == "write to <EMAIL> now"
    assert (got[2].n_email, got[2].n_ip) == (0, 2)
    assert got[2].scrubbed == "host <IP> and <IP> are up"
    assert (got[3].n_email, got[3].n_ip, got[3].n_phone) == (1, 1, 1)
    assert got[3].scrubbed == "call <PHONE> or mail <EMAIL> from <IP>"
    assert got[4].scrubbed == "no pii here at all"


def test_quality_and_token_counts_consistent(docs):
    from opentsdb_rollup_rust_spark.pipeline.text import text_profile

    prof = text_profile(docs).collect()
    for r in prof[:50]:
        assert r["n_ws_tokens"] >= 1
        assert 0 <= r["stop_ratio_q"] <= 1_000_000
        assert 0 <= r["quality_q"] <= 1_000_000
        assert 0 <= r["fingerprint"] < 1_000_000_007


# ---------------------------------------------------------------- multimodal

def test_mm_extract_features_checksum_matches_python(docs):
    from opentsdb_rollup_rust_spark.pipeline.multimodal import (
        attach_media_payload,
        extract_features,
    )

    media = attach_media_payload(docs)
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    for r in docs.limit(20).collect():
        payload = r["text"].encode("utf-8")
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(payload)
        # codepoint sum — exact for non-ASCII too (oracle uses ascii())
        assert f["checksum"] == sum(map(ord, r["text"])) % 2_147_483_647
        assert f["n_frames"] == len(payload) // 1024 + 1


def test_mm_decode_stub_raises(docs):
    from opentsdb_rollup_rust_spark.pipeline.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG", "image")


def test_mm_real_pil_decoder_gated(spark):
    """r4 VERDICT task #6: env-gated REAL-decoder validation of the
    pluggable decode path (the Iceberg/TWS pattern, asserted both
    ways). Without PIL (this sandbox) the plug point must fail LOUDLY;
    with PIL (any deployment carrying media libs) a generated 2x1 PNG
    round-trips through extract_features(decoder=pil_image_decoder)
    and the checksum equals the known pixel sum — real decoding, not
    byte plumbing."""
    from opentsdb_rollup_rust_spark.pipeline.multimodal import (
        extract_features,
        pil_image_decoder,
    )

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        with pytest.raises(ImportError):
            pil_image_decoder(b"\x89PNG", "image")
        pytest.skip("PIL absent: pluggable decoder asserted to fail loudly")

    import io

    from PIL import Image

    im = Image.new("L", (2, 1))
    im.putdata([7, 9])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "doc_id long, modality string, payload binary",
    )
    row = extract_features(media, decoder=pil_image_decoder).collect()[0]
    assert row["n_bytes"] == len(png)
    assert row["checksum"] == 7 + 9
    assert row["n_frames"] == 1
    # non-image modalities refuse rather than guessing a codec
    with pytest.raises(NotImplementedError):
        pil_image_decoder(png, "audio")


def test_mm_frame_sample_plan(docs):
    from opentsdb_rollup_rust_spark.pipeline.multimodal import (
        attach_media_payload,
        frame_sample_plan,
    )

    media = attach_media_payload(docs).limit(10)
    plan = frame_sample_plan(media, stride=10)
    rows = plan.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    metas = {r["doc_id"]: r["media_frames"] for r in media.collect()}
    for r in rows:
        assert r["n"] == (metas[r["doc_id"]] - 1) // 10 + 1


def test_repetition_profile_golden(spark):
    """T7 golden: hand-computed repetition ppm on tiny docs, incl. a
    fully-repetitive doc, a no-repeat doc, and a 1-word doc (drops —
    no 2-grams, mirrored in the oracle's len(w)>=2 filter)."""
    from opentsdb_rollup_rust_spark.pipeline.text import repetition_profile

    rows = [
        (1, "a a a a"),          # words 4/distinct 1; grams: 'a a' x3
        (2, "x y z"),            # no repetition anywhere
        (3, "p q p q p"),        # grams: p q, q p, p q, q p -> top 2/4
        (4, "solo"),             # 1 word -> no 2-grams -> dropped
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    d1 = out[1]
    assert (d1["n_words"], d1["dup_word_ppm"]) == (4, 750000)
    assert (d1["n_2grams"], d1["dup_2gram_ppm"], d1["top_2gram_ppm"]) == (
        3, 666666, 1000000)
    d2 = out[2]
    assert (d2["dup_word_ppm"], d2["dup_2gram_ppm"], d2["top_2gram_ppm"]) == (
        0, 0, 500000)
    d3 = out[3]
    assert (d3["n_words"], d3["dup_word_ppm"]) == (5, 600000)
    assert (d3["n_2grams"], d3["dup_2gram_ppm"], d3["top_2gram_ppm"]) == (
        4, 500000, 500000)


def test_mixture_sample_rates_and_determinism(spark):
    """Q-MIX: realized per-source rates converge to the weights
    (hash-uniform, binomial noise), n_copies never exceeds ceil(w),
    and the sample is INVARIANT under repartitioning (pure per-key
    hash, no rand()) — the resumability property."""
    from opentsdb_rollup_rust_spark.pipeline.sampling import mixture_sample
    from tests.conftest import assert_df_equal

    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
    )
    weights = {"src0": 2.5, "src1": 1.0, "src2": 0.5}  # src3 -> 0.1
    out = mixture_sample(docs, weights)
    rates = {
        r["source"]: r["n"] / (n / 4)
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, w in [("src0", 2.5), ("src1", 1.0), ("src2", 0.5), ("src3", 0.1)]:
        got = rates.get(src, 0.0)
        assert abs(got - w) < 0.05, (src, got, w)
    # determinism: identical multiset from a differently-partitioned input
    assert_df_equal(out, mixture_sample(docs.repartition(13), weights))
    # copy_idx bounded by ceil(w)
    top = {
        r["source"]: r["m"]
        for r in out.groupBy("source").agg(F.max("copy_idx").alias("m")).collect()
    }
    assert top["src0"] <= 2 and top["src1"] <= 1 and top["src2"] == 0


def test_decontaminate_golden_and_broadcast(spark):
    """D7 golden: exact shared-shingle counts on a planted overlap,
    clean docs absent; and the eval side joins as a BROADCAST hash
    join (the corpus must never shuffle for decontamination)."""
    from opentsdb_rollup_rust_spark.pipeline.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words only here friend"),
            (3, "quick brown fox runs fast"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox jumps high")], "doc_id long, text string"
    )
    out = decontaminate(train, ev)
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    # doc 1 shares 'quick brown fox' + 'brown fox jumps'; doc 3 only the first
    assert set(rows) == {1, 3}
    assert rows[1]["n_shared"] == 2 and rows[1]["n_shingles"] == 7
    assert rows[3]["n_shared"] == 1
    assert rows[1]["share_ppm"] == 2 * 1_000_000 // 7
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_split_assign_coverage_ratios_determinism(spark):
    """Q2: every row gets exactly one split, realized shares track the
    ratios (hash-uniform), assignment is repartition-invariant, and a
    document's split never changes when the corpus grows (per-key
    hash — the no-leakage-on-append property)."""
    from opentsdb_rollup_rust_spark.pipeline.sampling import split_assign
    from tests.conftest import assert_df_equal

    n = 20_000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    out = split_assign(docs).cache()
    shares = {
        r["split"]: r["n"] / n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(shares) == {"train", "val", "test"}
    assert abs(shares["train"] - 0.9) < 0.02
    assert abs(shares["val"] - 0.05) < 0.01
    assert abs(shares["test"] - 0.05) < 0.01
    assert_df_equal(out, split_assign(docs.repartition(13)))
    # stability under corpus growth: the first half's assignment is a
    # strict subset of the full corpus's assignment
    half = split_assign(docs.where(F.col("doc_id") < n // 2))
    assert half.exceptAll(out).count() == 0


def test_split_assign_rejects_bad_ratios(spark):
    import pytest as _pytest

    from opentsdb_rollup_rust_spark.pipeline.sampling import split_assign

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError):
        split_assign(docs, {"train": 0.6, "val": 0.3})


def test_uid_roundtrip_dense_and_lossless(spark):
    """F9: uids are dense [0, |names|), assigned in name order,
    deterministic across partitionings, and encode->decode is the
    identity on the stream."""
    from opentsdb_rollup_rust_spark.functions.uid import (
        build_uid_table,
        decode_uids,
        encode_uids,
    )
    from tests.conftest import assert_df_equal

    df = spark.range(5_000).select(
        F.concat(F.lit("m"), (F.col("id") % 97).cast("string")).alias(
            "series_id"
        ),
        F.col("id").alias("value"),
    )
    uids = build_uid_table(df)
    rows = sorted(
        (r["name"], r["uid"]) for r in uids.collect()
    )
    names = sorted({f"m{i}" for i in range(97)})
    assert rows == [(nm, i) for i, nm in enumerate(names)]
    assert_df_equal(uids, build_uid_table(df.repartition(11)))
    decoded = decode_uids(encode_uids(df, uids), uids).select(
        "series_id", "value"
    )
    assert_df_equal(decoded, df)


def test_shard_order_layout_properties(spark):
    """Q3: (shard, pos) is a bijection onto contiguous slots per
    shard, shards balance (hash-uniform), the layout is repartition-
    invariant, and it actually SHUFFLES — input-adjacent keys do not
    stay adjacent in (shard, pos) order."""
    from opentsdb_rollup_rust_spark.pipeline.sampling import shard_order
    from tests.conftest import assert_df_equal

    n, shards = 8_000, 16
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    out = shard_order(docs, n_shards=shards).cache()
    per = {
        r["shard"]: r["n"]
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert set(per) == set(range(shards))
    assert max(per.values()) < 1.25 * n / shards
    # positions are exactly [0, |shard|) in every shard
    chk = out.groupBy("shard").agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi"),
        F.count("*").alias("n"),
    )
    for r in chk.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    assert_df_equal(out, shard_order(docs.repartition(7), n_shards=shards))
    # shuffledness: of the first 100 keys, far fewer than half sit
    # next to their key-predecessor in layout order
    rows = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
    adjacent = sum(
        1
        for i in range(1, 100)
        if rows[i][0] == rows[i - 1][0]
        and abs(rows[i][1] - rows[i - 1][1]) == 1
    )
    assert adjacent < 10


def test_pipeline_build_stage_order(spark):
    """The corpus-build composition's stage ORDER is observable:
    dedup keeps the LOWEST doc_id of an identical-text pair, so when
    that survivor is contamination-free but the dropped twin's id
    lands in the eval slice... the sharper corner is a contaminated
    text present twice in train — dedup first leaves ONE copy for the
    decontaminator to drop; decontam-then-dedup would also drop both
    copies here, but a split-then-clean bug is caught by split being
    a pure projection of the SURVIVING doc_id set. This test builds a
    tiny corpus with (a) an exact duplicate pair, (b) a doc sharing
    all its shingles with the eval doc, (c) a clean doc, and pins the
    surviving id set end to end."""
    from opentsdb_rollup_rust_spark.pipeline.dedup import decontaminate
    from opentsdb_rollup_rust_spark.pipeline.sampling import split_assign

    rows = [
        # eval doc (doc_id % 37 == 0)
        (0, "alpha beta gamma delta epsilon", "en", "web"),
        # contaminated: shares every 3-shingle with the eval doc
        (2, "alpha beta gamma delta epsilon", "en", "web"),
        # exact duplicate pair: keep-first keeps 3, drops 40
        (3, "one two three four five six seven", "en", "web"),
        (40, "one two three four five six seven", "en", "web"),
        # clean
        (5, "totally different words entirely here now", "en", "cc"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    panel = F.col("doc_id") % 37 == 0
    ev, tr = d.where(panel), d.where(~panel)
    keepers = (
        tr.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    tr1 = tr.join(keepers, "doc_id", "left_semi")
    assert sorted(r.doc_id for r in tr1.select("doc_id").collect()) == [2, 3, 5]
    contaminated = (
        decontaminate(tr1, ev)
        .where(F.col("share_ppm") >= 500_000)
        .select("doc_id")
    )
    assert [r.doc_id for r in contaminated.collect()] == [2]
    tr2 = tr1.join(contaminated, "doc_id", "left_anti")
    survivors = sorted(r.doc_id for r in tr2.select("doc_id").collect())
    assert survivors == [3, 5]
    # split is a pure projection of the surviving set — no survivor
    # gains or loses membership, every survivor gets exactly one label
    sp = split_assign(tr2)
    got = {(r.doc_id, r.split) for r in sp.select("doc_id", "split").collect()}
    assert sorted(x[0] for x in got) == survivors
    assert all(s in ("train", "val", "test") for _, s in got)


def test_shingles_regex_hybrid_matches_zipwith_chain(spark):
    """r6: _shingles_from_words' regex primary path and its per-row
    empty-word fallback both reproduce the r5 zip_with chain exactly —
    including the adversarial shapes the corpus never produces
    (leading tab -> empty first word, trailing tab -> empty last word,
    sub-k docs, empty text, unicode NBSP inside a word, regex
    metacharacters as words)."""
    from opentsdb_rollup_rust_spark.pipeline.dedup import _shingles_from_words
    from opentsdb_rollup_rust_spark.pipeline.text import doc_words

    def old_chain(w, k=3):
        n = F.size(w)
        acc = w
        for j in range(1, k):
            acc = F.zip_with(
                acc, F.slice(w, j + 1, n), lambda a, b: F.concat_ws(" ", a, b)
            )
        mk = F.slice(acc, 1, n - F.lit(k - 1))
        return F.array_distinct(
            F.when(n >= F.lit(k), mk).otherwise(F.array(F.array_join(w, " ")))
        )

    texts = [
        "a b c d e",
        "a b c",
        "a b",
        "a",
        "",
        "   ",
        "\tlead b c d",          # leading tab -> empty first word
        "a b c d\t",             # trailing tab -> empty last word
        "a\tb c d",              # tab separator mid-text
        "x y b c d",        # NBSP inside a word (not split)
        "a.* [b] (c) d+ e?",     # regex metacharacters as words
        "dup dup dup dup",
        "one two three four five six seven",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    ).select("i", doc_words(F.col("text")).alias("_w"))
    rows = df.select(
        "i",
        _shingles_from_words(F.col("_w")).alias("new"),
        old_chain(F.col("_w")).alias("old"),
    ).collect()
    for r in rows:
        assert r["new"] == r["old"], (texts[r["i"]], r["new"], r["old"])
