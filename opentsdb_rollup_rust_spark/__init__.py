"""opentsdb_rollup_rust_spark — a PySpark-native time-series rollup engine.

A from-scratch reimplementation of the *capabilities* of
``datto/opentsdb-rollup-rust`` (an external batch rollup generator for
OpenTSDB), re-expressed Spark-first per the contract in BASELINE.json:

- tumbling-window continuous aggregates (sum/count/min/max; avg derived
  at read time, never stored) per series per window,
- a 1m -> 1h -> 1d downsample cascade over re-aggregable rollups,
- gap-fill (zero / forward-fill / null / none) for missing windows,
- delta-of-delta timestamp + Gorilla XOR value compression in
  vectorized pandas/Arrow UDFs (no per-row Python),
- explicit partitioning: series-hash bucketing, salted repartition for
  hot-key skew, sort-within-partition for monotone timestamp encoding,
- retention, resumability from snapshot checkpoints, per-partition
  lineage and metrics tables.

Semantics authority (the reference checkout is empty — see SURVEY.md §0):
BASELINE.json, public OpenTSDB rollup/downsample docs, and the Gorilla
VLDB'15 paper. No code is derived from the reference repository.
"""

__version__ = "0.1.0"
