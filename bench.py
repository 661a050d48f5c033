"""Bench harness — the driver's per-round feedback loop.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two measurements:

1. **Headline** — the flagship tier pipeline (read sequences ->
   derive points -> 1m rollup -> 1h -> 1d cascade -> noop sink) over a
   deterministic synthetic sequences table sized to the scale factor.
   Input generation (synth + parquet write) is NOT timed — the table
   is materialized to a temp dir first, so the timed window is
   read -> agg -> write, per the protocol in BASELINE.md. Reported as
   `points_per_sec` (input metric points consumed / wall sec) plus
   `bytes_per_point` from the Gorilla encode of the 1m tier.

2. **Per-query wall** — every `__spark_entry__.queries()` entry at
   `$SPARK_GRAFT_SF_DIR`, each forced through a full materialization
   via the `noop` sink (no driver collect, no result truncation).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32 — also used for shuffle partitions),
     BENCH_SEQS         (override synthetic sequence count),
     BENCH_QUERIES      (comma-list subset; default all).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sink(df) -> None:
    """Force full computation with zero driver-side result transfer."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import __spark_entry__ as E
    from opentsdb_rollup_rust_spark.session import get_spark
    from opentsdb_rollup_rust_spark.sources.synth import synth_sequences
    from opentsdb_rollup_rust_spark.operators.points import derive_points
    from opentsdb_rollup_rust_spark.operators.rollup import (
        cascade_reagg,
        tumbling_rollup,
    )
    from opentsdb_rollup_rust_spark.codec.gorilla import (
        compression_stats,
        encode_chunks,
    )

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # ---------------- headline: tier pipeline throughput ----------------
    n_seqs = int(os.environ.get("BENCH_SEQS", str(int(sf * 4_000_000))))
    n_seqs = max(n_seqs, 10_000)
    seq_path = f"/tmp/spark_graft_bench/seqs_{n_seqs}.parquet"
    if not os.path.exists(seq_path):  # untimed input materialization
        # fixed 64-file layout so every parallelism level reads the
        # exact same input split structure (scaling-run fairness)
        synth_sequences(spark, n_seqs, partitions=64).write.mode(
            "overwrite"
        ).parquet(seq_path)

    n_points = n_seqs * 6  # 6 token stats per sequence (config.TOKEN_STATS)

    t0 = time.monotonic()
    seqs = spark.read.parquet(seq_path)
    pts = derive_points(seqs)
    r1m = tumbling_rollup(pts, "1m")
    r1h = cascade_reagg(r1m, "1h")
    r1d = cascade_reagg(r1h, "1d")
    # one pass: cache 1m (it feeds both the cascade and the codec)
    r1m.persist()
    rolled_1m = r1m.count()
    _sink(r1h)
    _sink(r1d)
    pipeline_sec = time.monotonic() - t0

    t0 = time.monotonic()
    chunks = encode_chunks(r1m, "1m")
    stats = compression_stats(chunks).collect()
    encode_sec = time.monotonic() - t0
    enc = sum(r["enc_bytes"] for r in stats)
    npts = sum(r["points"] for r in stats)
    bytes_per_point = enc / max(npts, 1)
    r1m.unpersist()

    # ---------------- per-query walls at sf_dir ----------------
    only = os.environ.get("BENCH_QUERIES")
    only_set = set(only.split(",")) if only else None
    qtimes: dict[str, float] = {}
    for name, fn in E.queries().items():
        if only_set and name not in only_set:
            continue
        t0 = time.monotonic()
        try:
            _sink(fn(spark, sf_dir))
            qtimes[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # a failing query must not kill the bench
            qtimes[name] = -1.0
            print(f"bench: query {name} failed: {exc}", file=sys.stderr)

    out = {
        "metric": "tier_pipeline_wall",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "cpus": cpus,
        "n_sequences": n_seqs,
        "n_points": n_points,
        "rolled_rows_1m": rolled_1m,
        "points_per_sec": round(n_points / pipeline_sec, 1),
        "encode_sec": round(encode_sec, 3),
        "bytes_per_point": round(bytes_per_point, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
