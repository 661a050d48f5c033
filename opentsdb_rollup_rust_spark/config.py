"""Tier configuration — the analogue of an OpenTSDB rollup config.

OpenTSDB rollup configs declare (interval, table, aggregators) per
tier; only SUM/COUNT/MIN/MAX are materialized and AVG is derived at
query time (docs.opentsdb.net, "Rollup And Pre-Aggregates"). The
cascade 1m -> 1h -> 1d re-aggregates the finer tier (BASELINE.json:6).
"""

from __future__ import annotations

from dataclasses import dataclass

# Stored aggregators. AVG is intentionally absent: storing sum+count
# keeps rollups losslessly re-aggregable into coarser tiers.
STORED_AGGS = ("sum", "count", "min", "max")

INTERVAL_SECONDS = {
    "1s": 1,
    "10s": 10,
    "1m": 60,
    "5m": 300,
    "10m": 600,
    "1h": 3600,
    "1d": 86400,
}


def resolve_interval_seconds(interval: str) -> int:
    """Seconds for an interval name. Named tiers resolve through the
    table above; ad-hoc read-path resolutions use the '<N>s' form
    (e.g. '7200s') and are parsed here WITHOUT mutating the global
    table — the query planner must stay pure (r3 VERDICT purity nit:
    rollup_read_pipeline used to setdefault() into INTERVAL_SECONDS
    at query time)."""
    sec = INTERVAL_SECONDS.get(interval)
    if sec is not None:
        return sec
    if interval.endswith("s") and interval[:-1].isdigit():
        return int(interval[:-1])
    raise KeyError(interval)


@dataclass(frozen=True)
class TierSpec:
    """One retention tier of the downsample cascade."""

    interval: str  # e.g. "1m"
    source: str | None  # finer tier this one re-aggregates, None = raw points
    retention_seconds: int | None  # None = keep forever
    chunk_points: int = 4096  # max points per Gorilla chunk (paper uses 2h blocks)

    @property
    def interval_seconds(self) -> int:
        return INTERVAL_SECONDS[self.interval]

    @property
    def chunk_seconds(self) -> int:
        # Chunk extent: interval * chunk_points, so a chunk can never
        # hold more than chunk_points windows (monotone, aligned).
        return self.interval_seconds * self.chunk_points


# Default cascade per BASELINE.json:6 — retention grows with coarseness
# (mirrors OpenTSDB per-interval rollup tables + TTLs).
DEFAULT_TIERS: dict[str, TierSpec] = {
    "1m": TierSpec("1m", source=None, retention_seconds=7 * 86400),
    "1h": TierSpec("1h", source="1m", retention_seconds=90 * 86400),
    "1d": TierSpec("1d", source="1h", retention_seconds=None),
}

# Per-sequence token statistics emitted into the metric stream
# (BASELINE.json:6 "treating per-sequence token statistics as the
# metric stream"). All int64 => bit-exact, reorder-invariant sums.
TOKEN_STATS = ("n_tok", "tok_sum", "tok_min", "tok_max", "tok_first", "tok_last")

# Deterministic event-time derivation for synthesized sequences
# (FIXTURES.md §2): epoch('2024-01-01') + xxhash64(doc_id) % horizon.
EPOCH_BASE = "2024-01-01 00:00:00"
EPOCH_BASE_SECONDS = 1704067200
HORIZON_SECONDS = 2_592_000  # 30 days

SERIES_SEP = ":"  # series_id = source + ':' + stat  (metric+tags analogue)
