"""Invariants for the token-sequence packing operators (K1/K2).

Cross-engine exactness vs the DuckDB twins is covered by the driver
gate (pack_concat / pack_greedy in scripts/check_oracle.py); these
tests pin the packing algebra itself on adversarial length mixes the
testdata doesn't contain (zero-length docs, oversize docs, exact-fit
boundaries).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opentsdb_rollup_rust_spark.pipeline.packing import (
    concat_pack_spans,
    greedy_pack_bins,
    pack_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    # lengths engineered for boundaries: exact fill (60+40=100),
    # straddle (70 after 30 rem), oversize (250 > capacity 100),
    # zero-length (dropped by concat, own row in greedy)
    rows = [
        (0, 60), (1, 40), (2, 30), (3, 70), (4, 250), (5, 0),
        (6, 100), (7, 1), (8, 99), (9, 5),
    ]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


CAP = 100


def _spans(docs):
    return concat_pack_spans(
        docs, capacity=CAP, bucket_expr=F.floor(F.col("doc_id") / F.lit(3))
    )


def test_concat_conservation_and_full_chunks(docs):
    spans = _spans(docs).collect()
    total = sum(r.span_len for r in spans)
    assert total == 655  # sum of lengths, zero-length doc contributes 0
    by_chunk = {}
    for r in spans:
        by_chunk.setdefault(r.chunk_id, []).append(r)
    n_chunks = max(by_chunk) + 1
    assert sorted(by_chunk) == list(range(n_chunks))
    for cid, rs in by_chunk.items():
        fill = sum(r.span_len for r in rs)
        if cid < n_chunks - 1:
            assert fill == CAP, f"chunk {cid} under-full: {fill}"
        else:
            assert 0 < fill <= CAP
        # spans tile the chunk contiguously from 0
        rs = sorted(rs, key=lambda r: r.chunk_pos)
        pos = 0
        for r in rs:
            assert r.chunk_pos == pos
            pos += r.span_len


def test_concat_doc_reassembly(docs):
    """Each doc's spans cover [0, n_tok) contiguously across chunks —
    the straddle arithmetic loses no tokens."""
    spans = _spans(docs).collect()
    lens = {0: 60, 1: 40, 2: 30, 3: 70, 4: 250, 6: 100, 7: 1, 8: 99, 9: 5}
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(lens)  # doc 5 (len 0) emits nothing
    for d, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r.doc_start)
        pos = 0
        for r in rs:
            assert r.doc_start == pos
            pos += r.span_len
        assert pos == lens[d]
        # consecutive spans of one doc sit in consecutive chunks
        assert [r.chunk_id for r in rs] == list(
            range(rs[0].chunk_id, rs[0].chunk_id + len(rs))
        )


def test_concat_offsets_match_single_partition_reference(spark, docs):
    """Distributed prefix sum (bucketed) == the plain global cumsum
    a single partition would produce."""
    from pyspark.sql import Window

    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = (
        docs.filter(F.col("n_tok") > 0)
        .withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
        .collect()
    )
    ref_first_chunk = {r.doc_id: r.off // CAP for r in ref}
    got = {
        r.doc_id: r.chunk_id
        for r in _spans(docs).collect()
        if r.doc_start == 0
    }
    assert got == ref_first_chunk


def test_pack_stats(docs):
    st = pack_stats(_spans(docs), capacity=CAP).collect()[0]
    assert st.n_chunks == 7  # ceil(655/100)
    assert st.full_chunks == 6
    assert st.total_tokens == 655


def test_greedy_capacity_and_order(docs):
    out = greedy_pack_bins(docs, capacity=100, n_buckets=2).collect()
    assert len(out) == 10  # zero-length doc still placed
    lens = {0: 60, 1: 40, 2: 30, 3: 70, 4: 250, 5: 0,
            6: 100, 7: 1, 8: 99, 9: 5}
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bkt, rs in by_bucket.items():
        rs = sorted(rs, key=lambda r: r.doc_id)
        # bins are 0-based, non-decreasing in doc order
        assert rs[0].bin == 0
        for a, b in zip(rs, rs[1:]):
            assert b.bin in (a.bin, a.bin + 1)
        # each bin's fill: within capacity unless it holds one
        # oversize doc alone
        fills = {}
        members = {}
        for r in rs:
            fills[r.bin] = fills.get(r.bin, 0) + lens[r.doc_id]
            members.setdefault(r.bin, []).append(r.doc_id)
            # bin_start is the fill before this doc
            assert r.bin_start == fills[r.bin] - lens[r.doc_id]
        for b, fill in fills.items():
            assert fill <= 100 or len(members[b]) == 1
        # greedy: a doc never fits in the previous bin it skipped
        for r in rs:
            if r.bin > 0 and r.bin_start == 0 and lens[r.doc_id] <= 100:
                prev_fill = fills[r.bin - 1]
                assert prev_fill + lens[r.doc_id] > 100 or prev_fill > 100


def test_materialize_roundtrip(spark):
    """Reassembled context windows == the concatenated token stream in
    doc order: materialization loses/reorders nothing, chunk joints
    land exactly at capacity boundaries."""
    from opentsdb_rollup_rust_spark.pipeline.packing import (
        materialize_chunks,
    )

    rows = [
        (i, list(range(i * 10, i * 10 + n)))
        for i, n in enumerate([3, 7, 5, 11, 2, 9, 1, 6])
    ]
    docs = spark.createDataFrame(
        [(i, toks, len(toks)) for i, toks in rows],
        "doc_id long, tokens array<int>, n_tok long",
    )
    cap = 8
    spans = concat_pack_spans(
        docs, capacity=cap, bucket_expr=F.floor(F.col("doc_id") / F.lit(3))
    )
    chunks = sorted(
        materialize_chunks(spans, docs).collect(), key=lambda r: r.chunk_id
    )
    stream = [t for _, toks in rows for t in toks]
    got = [t for r in chunks for t in r.tokens]
    assert got == stream
    assert [r.chunk_id for r in chunks] == list(range(len(chunks)))
    for r in chunks[:-1]:
        assert r.n_tok == cap
    assert chunks[-1].n_tok == len(stream) - cap * (len(chunks) - 1)


def test_greedy_deterministic_bucketing(spark, docs):
    """Same md5 bucket assignment on repeated runs (no RNG anywhere)."""
    a = sorted(map(tuple, greedy_pack_bins(docs).collect()))
    b = sorted(map(tuple, greedy_pack_bins(docs).collect()))
    assert a == b


# ---------------------------------------------------------- property tests

from hypothesis import given, settings, strategies as st  # noqa: E402


def _greedy_reference(items, cap):
    """Pure-python mirror of the greedy rule (sorted by id; append
    while fill + n <= cap, else new bin; oversize doc owns its bin)."""
    out = {}
    cur, fill = 0, 0
    for i, (doc, n) in enumerate(sorted(items)):
        if i > 0 and fill + n > cap:
            cur, fill = cur + 1, 0
        out[doc] = (cur, fill)
        fill += n
    return out


@settings(max_examples=12, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    cap=st.integers(min_value=1, max_value=250),
)
def test_greedy_matches_pure_python_reference(spark, lens, cap):
    """The applyInPandas walk implements exactly the documented rule —
    checked per md5 bucket against an independent implementation over
    adversarial random lengths (zeros, oversize, exact fits)."""
    from opentsdb_rollup_rust_spark.functions.hashing import md5_int60

    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tok long"
    )
    nb = 3
    got = greedy_pack_bins(docs, capacity=cap, n_buckets=nb).collect()
    # reproduce the md5 bucket assignment driver-side
    bucket_of = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id",
            F.pmod(md5_int60(F.col("doc_id").cast("string")), F.lit(nb))
            .cast("long")
            .alias("b"),
        ).collect()
    }
    by_bucket = {}
    for i, n in enumerate(lens):
        by_bucket.setdefault(bucket_of[i], []).append((i, n))
    expect = {}
    for b, items in by_bucket.items():
        for doc, (bin_, start) in _greedy_reference(items, cap).items():
            expect[doc] = (b, bin_, start)
    assert {r.doc_id: (r.bucket, r.bin, r.bin_start) for r in got} == expect
