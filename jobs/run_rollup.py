#!/usr/bin/env python
"""CLI entry point for the tier rollup job (BASELINE.json:14:
packaged for `spark-submit --py-files engine.zip`).

Examples:
  # synthesize input, then run the full 1m -> 1h -> 1d cascade
  spark-submit --py-files engine.zip jobs/run_rollup.py \
      --root /tmp/rollup_store --synthesize 100000 --tier all \
      --buckets 32 --salts 16

  # resume a single tier after a crash (re-runs only missing buckets)
  spark-submit --py-files engine.zip jobs/run_rollup.py \
      --root /tmp/rollup_store --tier 1h --run-id retry-1

Local test (no spark-submit needed): python jobs/run_rollup.py ...
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")  # allow running from the repo root w/o --py-files

from opentsdb_rollup_rust_spark.plans.job import (  # noqa: E402
    apply_retention,
    run_cascade,
    run_rollup_job,
)
from opentsdb_rollup_rust_spark.session import get_spark  # noqa: E402
from opentsdb_rollup_rust_spark.sources.store import make_store  # noqa: E402
from opentsdb_rollup_rust_spark.sources.synth import synth_sequences  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="store root directory")
    ap.add_argument("--tier", default="all", help="1m | 1h | 1d | all")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--no-encode", action="store_true")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N sequences into the store first")
    ap.add_argument("--retention-now", type=int, default=None,
                    help="epoch seconds 'now' for a retention pass")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"rollup-{args.tier}", master=args.master)
    # real Iceberg catalog when the runtime jar is present, manifest
    # store otherwise — identical surface either way
    store = make_store(spark, args.root)

    if args.synthesize:
        snap = store.append("sequences", synth_sequences(spark, args.synthesize))
        print(json.dumps({"synthesized": args.synthesize, "snapshot": snap}))

    kw = dict(
        n_buckets=args.buckets,
        salts=args.salts,
        run_id=args.run_id,
        encode=not args.no_encode,
    )
    results = (
        run_cascade(spark, store, **kw)
        if args.tier == "all"
        else [run_rollup_job(spark, store, args.tier, **kw)]
    )
    for r in results:
        print(json.dumps(r.__dict__))

    if args.retention_now is not None:
        for tier in ("1m", "1h", "1d"):
            kept = apply_retention(spark, store, tier, args.retention_now)
            print(json.dumps({"retention_tier": tier, "rows_kept": kept}))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
