#!/usr/bin/env python
"""CLI entry point for /api/query execution — the read-side
spark-submit surface (the write side is jobs/run_rollup.py).

Takes either request spelling the public HTTP API documents — the
GET query string or the POST JSON body — and executes the composed
endpoint (plans/api_query.py) over a tagged point table, optionally
routed through materialized rollup tiers.

Examples:
  # GET spelling over a parquet points table, result to parquet
  spark-submit --py-files engine.zip jobs/run_query.py \
      --points /data/points.parquet \
      --qs 'start=0&end=86400&m=sum:1h-sum-zero:cpu{host=*}' \
      --out /tmp/result

  # POST JSON body from a file, tier-routed, first rows to stdout
  spark-submit --py-files engine.zip jobs/run_query.py \
      --points /data/points.parquet --json-file request.json \
      --tier /data/tier_1h.parquet:1h --limit 20

Local test (no spark-submit needed): python jobs/run_query.py ...
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")  # allow running from the repo root w/o --py-files

from opentsdb_rollup_rust_spark.plans.api_query import (  # noqa: E402
    api_query,
    api_query_hist,
    api_query_multi,
    parse_query_json,
    parse_query_string,
)
from opentsdb_rollup_rust_spark.session import get_spark  # noqa: E402


def _parse_request(args) -> list[tuple]:
    """--qs / --json / --json-file -> [(QuerySpec, permilles), ...];
    exactly one request form, both parsers share validation."""
    forms = [f for f in (args.qs, args.json, args.json_file) if f]
    if len(forms) != 1:
        raise ValueError("give exactly one of --qs / --json / --json-file")
    if args.qs:
        return parse_query_string(args.qs)
    body = args.json
    if args.json_file:
        with open(args.json_file) as f:
            body = f.read()
    return parse_query_json(body)


def run(spark, args) -> "DataFrame":  # noqa: F821 - doc type
    points = spark.read.parquet(args.points)
    tiers = []
    for t in args.tier or ():
        path, _, interval = t.rpartition(":")
        if not path or not interval:
            raise ValueError(f"--tier wants <parquet_path>:<interval>: {t!r}")
        tiers.append((spark.read.parquet(path), interval))
    parsed = _parse_request(args)
    cols = dict(
        metric_col=args.metric_col,
        tags_col=args.tags_col,
        ts_col=args.ts_col,
        value_col=args.value_col,
    )
    with_pct = [(s, p) for s, p in parsed if p]
    if with_pct and len(parsed) > 1:
        # api_query_multi's union schema carries one int64 value per
        # row; histogram permille outputs don't fit it — refuse
        # loudly rather than drop the percentiles.
        raise ValueError(
            "percentiles are supported for single-sub-query requests only"
        )
    if with_pct:
        ((spec, permilles),) = parsed
        return api_query_hist(
            points, spec, permilles, tiers=tiers or None, **cols
        )
    if len(parsed) == 1:
        ((spec, _),) = parsed
        return api_query(points, spec, tiers=tiers or None, **cols)
    if tiers:
        raise ValueError(
            "tier routing is supported for single-sub-query requests only"
        )
    specs = {f"q{i}": s for i, (s, _) in enumerate(parsed)}
    return api_query_multi(points, specs, **cols)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--points", required=True,
                    help="parquet path of the tagged point table "
                         "(metric, ts, value, tags map<string,string>)")
    ap.add_argument("--qs", default=None,
                    help="GET query string ([OTSDB-API] spelling)")
    ap.add_argument("--json", default=None,
                    help="POST JSON body, inline")
    ap.add_argument("--json-file", default=None,
                    help="POST JSON body, from a file")
    ap.add_argument("--tier", action="append", default=None,
                    metavar="PATH:INTERVAL",
                    help="materialized tagged rollup tier (repeatable); "
                         "rollupUsage in the request decides fallback")
    ap.add_argument("--metric-col", default="series_id")
    ap.add_argument("--tags-col", default="tags")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--value-col", default="value")
    ap.add_argument("--out", default=None,
                    help="write the full result to this parquet dir "
                         "(distributed write — no driver collect)")
    ap.add_argument("--limit", type=int, default=50,
                    help="without --out: print at most N rows as JSON "
                         "lines (w_start ascending)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="api-query", master=args.master)
    out = run(spark, args)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"written": args.out}))
    else:
        # bounded preview: limit() caps the transfer, never a full
        # collect of an unbounded result
        for row in out.orderBy(*out.columns).limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
