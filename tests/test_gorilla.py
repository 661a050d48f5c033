"""C1/C2 — Gorilla codec: hypothesis roundtrip, pure-python mirror
encoder (byte-identical), Spark encode/decode integration."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from opentsdb_rollup_rust_spark.codec.gorilla import (
    decode_chunk_arrays,
    decode_chunk_lanes,
    decode_chunks,
    encode_chunk_arrays,
    encode_chunks,
)


# ----------------------------------------------------------- mirror encoder

def _mirror_encode(ts_units, words):
    """Bit-string reference encoder (slow, obvious) — the test oracle
    for the vectorized bit-packer."""

    def emit(bits, code, n):
        bits.append(format(code, f"0{n}b") if n else "")

    tb, vb = [], []
    emit(tb, int(ts_units[0]), 14)
    prev_delta = int(ts_units[0])
    for i in range(1, len(ts_units)):
        delta = int(ts_units[i]) - int(ts_units[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            emit(tb, 0, 1)
        elif -63 <= dod <= 64:
            emit(tb, 0b10, 2), emit(tb, dod + 63, 7)
        elif -255 <= dod <= 256:
            emit(tb, 0b110, 3), emit(tb, dod + 255, 9)
        elif -2047 <= dod <= 2048:
            emit(tb, 0b1110, 4), emit(tb, dod + 2047, 12)
        else:
            emit(tb, 0b1111, 4), emit(tb, dod & 0xFFFFFFFF, 32)

    emit(vb, int(words[0]), 64)
    wlead = wtrail = None
    for i in range(1, len(words)):
        xor = int(words[i]) ^ int(words[i - 1])
        if xor == 0:
            emit(vb, 0, 1)
            continue
        lead = min(64 - xor.bit_length(), 31)
        trail = (xor & -xor).bit_length() - 1
        emit(vb, 1, 1)
        if wlead is not None and lead >= wlead and trail >= wtrail:
            mlen = 64 - wlead - wtrail
            emit(vb, 0, 1), emit(vb, xor >> wtrail, mlen)
        else:
            mlen = 64 - lead - trail
            emit(vb, 1, 1), emit(vb, lead, 5), emit(vb, mlen - 1, 6)
            emit(vb, xor >> trail, mlen)
        wlead, wtrail = lead, trail

    def to_bytes(parts):
        s = "".join(parts)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    return to_bytes(tb), to_bytes(vb)


# ------------------------------------------------------------- strategies

@st.composite
def chunks(draw):
    n = draw(st.integers(1, 300))
    first = draw(st.integers(0, 2**14 - 1))
    gaps = draw(
        st.lists(st.integers(1, 3000), min_size=n - 1, max_size=n - 1)
    )
    ts = np.cumsum([first] + gaps).astype(np.int64)
    kind = draw(st.sampled_from(["int", "float", "const", "walk"]))
    if kind == "int":
        vals = np.array(
            draw(
                st.lists(
                    st.integers(-(2**62), 2**62), min_size=n, max_size=n
                )
            ),
            dtype=np.int64,
        ).view(np.uint64)
    elif kind == "float":
        vals = np.array(
            draw(
                st.lists(
                    st.floats(allow_nan=False, allow_infinity=False),
                    min_size=n,
                    max_size=n,
                )
            ),
            dtype=np.float64,
        ).view(np.uint64)
    elif kind == "const":
        vals = np.full(n, draw(st.integers(0, 2**63)), dtype=np.uint64)
    else:
        steps = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
        vals = np.cumsum(steps).astype(np.int64).view(np.uint64)
    return ts, vals


@settings(max_examples=150, deadline=None)
@given(chunks())
def test_roundtrip_property(chunk):
    ts, vals = chunk
    tb, vb = encode_chunk_arrays(ts, vals)
    ts2, vals2 = decode_chunk_arrays(tb, vb, len(ts))
    assert np.array_equal(ts, ts2)
    assert np.array_equal(vals, vals2)


@settings(max_examples=60, deadline=None)
@given(chunks())
def test_vectorized_matches_mirror(chunk):
    ts, vals = chunk
    got = encode_chunk_arrays(ts, vals)
    want = _mirror_encode(ts, vals)
    assert got == want


def test_first_delta_overflow_raises():
    with pytest.raises(ValueError):
        encode_chunk_arrays(
            np.array([1 << 14], dtype=np.int64), np.array([0], dtype=np.uint64)
        )


def test_regular_series_one_bit_per_ts():
    """[GORILLA §4.1.1]: steady intervals -> dod=0 -> 1 bit/timestamp."""
    n = 4096
    ts = np.arange(n, dtype=np.int64)
    tb, _ = encode_chunk_arrays(ts, np.zeros(n, dtype=np.uint64))
    assert len(tb) <= (14 + (n - 1) * 1 + 7) // 8 + 1


def test_decode_throughput_floor():
    """The decode path sits on the chunk-table read path; pin the
    single-fetch-per-field reader's throughput so a regression back
    toward the per-bit loop (round 1: ~0.07 Mpts/s) fails loudly.
    Floor is ~3x under the measured 0.85 Mpts/s to stay unflaky."""
    import time

    rng = np.random.RandomState(7)
    n = 4096
    ts = np.arange(n, dtype=np.int64)
    words = rng.randint(0, 1_000_000, n).astype(np.int64).view(np.uint64)
    tb, vb = encode_chunk_arrays(ts, words)
    decode_chunk_arrays(tb, vb, n)  # warm
    best = 0.0
    for _ in range(3):  # best-of-batches: host noise bursts hit medians
        t0 = time.monotonic()
        reps = 5
        for _ in range(reps):
            decode_chunk_arrays(tb, vb, n)
        best = max(best, n * reps / (time.monotonic() - t0) / 1e6)
    assert best >= 0.25, f"decode throughput regressed: {best:.3f} Mpts/s"


# ------------------------------------------------------- lane-parallel decode

@settings(max_examples=40, deadline=None)
@given(st.lists(chunks(), min_size=1, max_size=8))
def test_lane_matches_scalar_property(batch):
    """The lane-parallel batch reader is bit-for-bit the scalar reader
    run chunk-by-chunk — on any mix of chunk shapes and sizes."""
    encs = [encode_chunk_arrays(ts, vals) for ts, vals in batch]
    ns = np.array([len(ts) for ts, _ in batch])
    got_ts, got_w = decode_chunk_lanes(
        [e[0] for e in encs], [e[1] for e in encs], ns
    )
    off = 0
    for (ts, vals), n in zip(batch, ns):
        assert np.array_equal(got_ts[off : off + n], ts)
        assert np.array_equal(got_w[off : off + n], vals)
        off += n


def test_lane_hetero_handoff():
    """One max-size chunk among many tiny ones drains the lane pool
    below _MIN_LANES: the survivor must hand off to the scalar resume
    path and still decode exactly (incl. carried-window state)."""
    rng = np.random.RandomState(11)
    batch = []
    for j in range(40):
        n = 3000 if j == 17 else rng.randint(1, 9)
        ts = np.cumsum(
            np.concatenate([[j % (1 << 14)], rng.randint(1, 999, n - 1)])
        ).astype(np.int64)
        # mixed values: runs of repeats (window carry) + jumps (fresh)
        vals = np.where(
            np.arange(n) % 3 == 0,
            rng.randint(0, 2**62, n).astype(np.uint64),
            np.uint64(7),
        ).astype(np.uint64)
        batch.append((ts, vals))
    encs = [encode_chunk_arrays(ts, vals) for ts, vals in batch]
    ns = np.array([len(ts) for ts, _ in batch])
    got_ts, got_w = decode_chunk_lanes(
        [e[0] for e in encs], [e[1] for e in encs], ns
    )
    off = 0
    for ts, vals in batch:
        n = len(ts)
        assert np.array_equal(got_ts[off : off + n], ts)
        assert np.array_equal(got_w[off : off + n], vals)
        off += n


def test_lane_throughput_floor():
    """Pin the lane reader's advantage on the worst case for the
    scalar loop (every point takes the value slow path): at 256 lanes
    it measures ~2-3 Mpts/s vs the scalar ~0.7 (6x at full Arrow-batch
    width); floor well under the measurement to stay unflaky."""
    import time

    rng = np.random.RandomState(7)
    n, L = 2048, 256
    ts = np.arange(n, dtype=np.int64)
    tbs, vbs = [], []
    for _ in range(L):
        words = rng.randint(0, 1_000_000, n).astype(np.int64).view(np.uint64)
        tb, vb = encode_chunk_arrays(ts, words)
        tbs.append(tb)
        vbs.append(vb)
    ns = np.full(L, n)
    decode_chunk_lanes(tbs, vbs, ns)  # warm
    best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        decode_chunk_lanes(tbs, vbs, ns)
        best = max(best, n * L / (time.monotonic() - t0) / 1e6)
    assert best >= 0.6, f"lane decode regressed: {best:.3f} Mpts/s"


# --------------------------------------------------------- Spark integration

def test_spark_encode_decode_roundtrip(spark, points):
    from opentsdb_rollup_rust_spark.operators.rollup import tumbling_rollup

    r1h = tumbling_rollup(points, "1h")
    chunks_df = encode_chunks(r1h, "1h").cache()
    assert chunks_df.where("enc_bytes <= 0").count() == 0
    decoded = decode_chunks(chunks_df)

    from pyspark.sql import functions as F

    back = (
        decoded.groupBy("series_id", "window_start")
        .pivot("agg", ["sum", "count", "min", "max"])
        .agg(F.first("value"))
        .withColumn("interval", F.lit("1h"))
        .select("series_id", "window_start", "interval", "sum", "count", "min", "max")
    )
    assert back.exceptAll(r1h).count() == 0
    assert r1h.exceptAll(back).count() == 0


def test_compression_beats_raw(spark, points):
    from opentsdb_rollup_rust_spark.codec.gorilla import compression_stats
    from opentsdb_rollup_rust_spark.operators.rollup import tumbling_rollup

    r1m = tumbling_rollup(points, "1m")
    stats = compression_stats(encode_chunks(r1m, "1m")).collect()
    assert all(row.ratio > 1.0 for row in stats)
