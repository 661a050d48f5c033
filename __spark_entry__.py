"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``     — flagship: full tier-rollup pipeline (derive
                       points -> 1m rollup -> 1h cascade -> gap-fill ->
                       derived avg) over a sequences table derived from
                       the sf0.001 documents parquet.
``queries()``        — one demo per implemented operator (SURVEY.md §2),
                       each (spark, sf_dir) -> DataFrame.
``oracle_sql()``     — DuckDB ANSI-SQL twins over the same parquet views.

Cross-engine determinism rules used throughout (so the driver's
row-count + schema + value-hash comparison is bit-exact):
  - window starts are epoch-second BIGINTs (no timestamp tz ambiguity);
  - money/metric doubles are quantized to integer units with FLOOR
    before any SUM (double addition is order-dependent; long sums are
    reorder-invariant and exact);
  - cross-engine hashes use md5 (identical in Spark and DuckDB);
  - struct-min/max used instead of min_by/max_by so ties break
    deterministically in both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opentsdb_rollup_rust_spark.session import pin_session_conf
from opentsdb_rollup_rust_spark.operators.rollup import (
    cascade_reagg,
    derived_avg,
    fused_tier_rollup,
    histogram_cascade,
    histogram_rollup,
    percentile_from_histogram,
    preaggregate,
    tumbling_rollup,
)
from opentsdb_rollup_rust_spark.operators.gapfill import gap_fill
from opentsdb_rollup_rust_spark.operators.tagquery import (
    TagFilter,
    compile_tag_filter,
    suggest,
    tag_filter_rollup,
)
from opentsdb_rollup_rust_spark.operators.skew import salted_rollup, topk_hot_series
from opentsdb_rollup_rust_spark.functions.hashing import md5_bucket
from opentsdb_rollup_rust_spark.functions.uid import (
    build_uid_table,
    decode_uids,
    encode_uids,
)
from opentsdb_rollup_rust_spark.pipeline.sampling import (
    shard_order,
    split_assign,
)
from opentsdb_rollup_rust_spark.sources.synth import MAX_LEN, VOCAB


# ---------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demo metric stream: events as (series_id, ts, value-long).

    value is quantized to integer thousandths so every engine sums it
    exactly (see module docstring).
    """
    return _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("series_id"),
        F.col("ts"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("value"),
    )


# DuckDB twin of _event_points, used as a CTE by most oracles.
_PTS_CTE = (
    "WITH pts AS (SELECT event_type AS series_id, ts, "
    "CAST(FLOOR(value*1000) AS BIGINT) AS value FROM events)"
)

# DuckDB twin of _tagged_points: the map tags re-derived as plain
# columns (the synthesis is deterministic off user_id/event_type).
_TAGGED_CTE = """WITH tp AS (
    SELECT event_type AS series_id, ts,
           CAST(FLOOR(value*1000) AS BIGINT) AS value,
           'web' || CAST(user_id % 12 AS VARCHAR) AS host,
           event_type AS dc,
           'r' || CAST(user_id % 3 AS VARCHAR) AS rack,
           CASE WHEN user_id % 5 = 0 THEN 'prod' ELSE 'dev' END AS env
    FROM events)"""


def _epoch(col: str = "window_start") -> F.Column:
    return F.unix_timestamp(F.col(col)).cast("long").alias("w_start")


def _rollup_sql(interval_sec: int, interval: str) -> str:
    return f"""{_PTS_CTE}
    SELECT series_id,
           CAST(FLOOR(epoch(ts)/{interval_sec})*{interval_sec} AS BIGINT) AS w_start,
           '{interval}' AS "interval",
           sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
           min(value) AS "min", max(value) AS "max"
    FROM pts GROUP BY 1, 2"""


def _rollup_out(r: DataFrame) -> DataFrame:
    return r.select(
        "series_id", _epoch(), "interval", "sum", "count", "min", "max"
    )


def _seqs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequences-shaped table derived from the documents parquet
    (FIXTURES.md §3: documents shadows the sequences shape)."""
    docs = _t(spark, sf_dir, "documents").select(
        F.format_string("doc-%012d", F.col("doc_id")).alias("doc_id"),
        F.col("source"),
    )
    length = (F.pmod(F.xxhash64("doc_id"), F.lit(MAX_LEN)) + F.lit(1)).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), length - F.lit(1)),
        lambda j: F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(VOCAB)).cast("int"),
    )
    return docs.select(
        "doc_id",
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        "source",
    )


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: hourly token stats per source, gap-filled,
    with read-time avg — the full M0+M1 pipeline."""
    pin_session_conf(spark)
    seqs = _seqs_from_documents(spark, "/root/testdata/sf0.001")
    # the job's fused wide-form scale path; == tumbling_rollup(
    # derive_points(seqs), "1m") by golden test
    r1m = fused_tier_rollup(seqs, "1m")
    r1h = cascade_reagg(r1m, "1h")
    filled = gap_fill(r1h, "1h", "zero")
    return derived_avg(filled).orderBy("series_id", "window_start")


# ---------------------------------------------------------------- queries

def _q_rollup_1m(spark, sf_dir):
    return _rollup_out(tumbling_rollup(_event_points(spark, sf_dir), "1m"))


def _q_rollup_1h(spark, sf_dir):
    # cascade from 1m — the oracle computes 1h directly from raw, so a
    # value-hash match here *is* the cascade-correctness proof.
    r1m = tumbling_rollup(_event_points(spark, sf_dir), "1m")
    return _rollup_out(cascade_reagg(r1m, "1h"))


def _q_rollup_1d(spark, sf_dir):
    r1m = tumbling_rollup(_event_points(spark, sf_dir), "1m")
    return _rollup_out(cascade_reagg(cascade_reagg(r1m, "1h"), "1d"))


def _q_hist_rollup(spark, sf_dir):
    """A14 via the cascade: 1h histogram tier re-aggregated from the
    1m tier. The oracle computes the 1h histogram DIRECTLY from raw
    points, so the value-hash match proves bucket counts cascade
    exactly (the property that makes tiered percentiles possible)."""
    h1m = histogram_rollup(_event_points(spark, sf_dir), "1m")
    h1h = histogram_cascade(h1m, "1h")
    return h1h.select("series_id", _epoch(), "interval", "bucket", "n")


def _q_hist_percentile(spark, sf_dir):
    """A15: read-time p95 estimate from the 1h histogram tier —
    integer threshold arithmetic (DIV) so the bucket pick is exact in
    both engines; window functions run over <=64 histogram rows per
    (series, window), never raw points."""
    h1h = histogram_rollup(_event_points(spark, sf_dir), "1h")
    p = percentile_from_histogram(h1h, 950)
    return p.select("series_id", _epoch(), "bucket", "est_max", "total")


def _q_agg_distinct_sketch(spark, sf_dir):
    """A16 under the FULL driver gate (r3 VERDICT task #2): DuckDB's
    HLL cannot reproduce Spark's Datasketches estimates, but it does
    not need to — the registered surface is the sketch tier's
    INVARIANTS, all SQL-expressible from raw:

      exact_distinct  — per (series, 1h window) exact countDistinct
                        (both engines compute it independently);
      delta_est       — estimate(cascade 1m->1h sketch union) minus
                        estimate(direct 1h sketch): always 0, because
                        HLL register state unions by per-register max
                        (order-independent), the mergeability that
                        makes the tier re-aggregable;
      within_err      — |est_direct - exact| <= ceil(5% * exact)
                        (lg_k=12 => ~1.6% std err; 3-sigma bound).

    The oracle emits the same grid with literal 0/true, so the hash
    match PROVES cascade==direct and the error bound per window under
    the gate, not just in pytest. Exact register equality + estimate
    determinism remain pinned by
    tests/test_rollup.py::test_distinct_sketch_cascade_equals_direct."""
    from opentsdb_rollup_rust_spark.functions.timeutil import time_bucket
    from opentsdb_rollup_rust_spark.operators.rollup import (
        distinct_from_sketch,
        distinct_sketch_cascade,
        distinct_sketch_rollup,
    )

    pts = _event_points(spark, sf_dir)
    casc = (
        distinct_from_sketch(
            distinct_sketch_cascade(distinct_sketch_rollup(pts, "1m"), "1h")
        )
        .withColumnRenamed("distinct_est", "est_cascade")
        .drop("interval")
    )
    direct = pts.groupBy(
        "series_id", time_bucket("ts", 3600).alias("window_start")
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("value", 12))
        .cast("long")
        .alias("est_direct"),
        F.countDistinct("value").alias("exact_distinct"),
    )
    j = direct.join(casc, ["series_id", "window_start"])
    return j.select(
        "series_id",
        _epoch(),
        "exact_distinct",
        (F.col("est_cascade") - F.col("est_direct")).alias("delta_est"),
        (
            F.abs(F.col("est_direct") - F.col("exact_distinct"))
            <= F.ceil(F.col("exact_distinct") * F.lit(0.05))
        ).alias("within_err"),
    )


def _q_avg_derived(spark, sf_dir):
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    return derived_avg(r1h).select("series_id", _epoch(), "sum", "count", "avg")


def _q_preagg_source(spark, sf_dir):
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    pre = preaggregate(r1h, F.lit("all"))
    return pre.select(
        F.col("group_key"), _epoch(), "sum", "count", "min", "max"
    )


def _q_agg_salted(spark, sf_dir):
    return _rollup_out(salted_rollup(_event_points(spark, sf_dir), "1h", salts=8))


def _q_agg_distinct(spark, sf_dir):
    pts = _event_points(spark, sf_dir)
    from opentsdb_rollup_rust_spark.functions.timeutil import time_bucket_epoch

    return (
        pts.groupBy(time_bucket_epoch("ts", 86400).alias("day_start"))
        .agg(
            F.countDistinct("series_id").alias("n_series"),
            F.count("*").alias("n_points"),
        )
    )


def _q_agg_first_last(spark, sf_dir):
    pts = _event_points(spark, sf_dir)
    from opentsdb_rollup_rust_spark.functions.timeutil import time_bucket_epoch

    return (
        pts.groupBy("series_id", time_bucket_epoch("ts", 3600).alias("w_start"))
        .agg(
            F.min(F.struct("ts", "value")).getField("value").alias("first_val"),
            F.max(F.struct("ts", "value")).getField("value").alias("last_val"),
        )
    )


def _md5_token_seqs(spark, sf_dir, numeric_id: bool = False):
    """Shared DuckDB-reproducible token source for derive_points,
    rollup_fused, pack_materialize and tok_topk: tokens[j] =
    md5_int60(doc_id || '-' || j) % 997, length = n_chars % 8 + 1 (the
    production path uses xxhash64, which DuckDB lacks — the operator
    logic under test is identical). Keep in lockstep with the `seqs`
    CTE in the oracle SQL strings. ``numeric_id`` keeps doc_id BIGINT
    (pack_materialize orders by it; string order "10" < "2" differs
    from numeric) while the token hash stays on the string form."""
    from opentsdb_rollup_rust_spark.functions.hashing import md5_int60

    d = _t(spark, sf_dir, "documents")
    length = (F.pmod(F.col("n_chars"), F.lit(8)) + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: F.pmod(
            md5_int60(F.concat(F.col("doc_id").cast("string"), F.lit("-"), j.cast("string"))),
            F.lit(997),
        ).cast("int"),
    )
    id_col = (
        F.col("doc_id").cast("long")
        if numeric_id
        else F.col("doc_id").cast("string")
    )
    return d.select(
        id_col.alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        "source",
    )


def _q_derive_points(spark, sf_dir):
    """S3 demo over the shared md5-token source (_md5_token_seqs)."""
    seqs = _md5_token_seqs(spark, sf_dir)
    from opentsdb_rollup_rust_spark.functions.arrays import token_array_stats

    stats = token_array_stats("tokens", sum_acc="int")
    return seqs.select(
        "doc_id",
        "source",
        *[stats[s].alias(s) for s in ("n_tok", "tok_sum", "tok_min", "tok_max", "tok_first", "tok_last")],
    )


def _q_dedup_seq_exact(spark, sf_dir):
    """D1b: SEQUENCE-level exact dedup — the token-payload twin of
    the text dedup_exact: the key is md5 over the comma-joined token
    array itself, so byte-identical token sequences collapse no matter
    what document text produced them (post-tokenization dedup is what
    a packing pipeline actually needs — same text tokenized twice, or
    different text normalizing to the same ids). Planted duplicates
    relabel every 10th sequence with a shifted id while KEEPING its
    token array. hash-groupBy, partial agg collapses per task."""
    seqs = _md5_token_seqs(spark, sf_dir, numeric_id=True)
    dup = seqs.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    planted = seqs.unionByName(dup)
    key = F.md5(
        F.array_join(
            F.transform("tokens", lambda x: x.cast("string")), ","
        )
    )
    return (
        planted.select(key.alias("seq_hash"), "doc_id")
        .groupBy("seq_hash")
        .agg(F.count("*").alias("n_seqs"), F.min("doc_id").alias("keeper"))
        .where(F.col("n_seqs") > 1)
    )


def _q_rollup_fused(spark, sf_dir):
    """A1/A5/S3 fused scale path (rollup.fused_rollup_wide) over a
    DuckDB-reproducible wide source: same md5-token sequences as
    derive_points, event time = EPOCH_BASE + md5_int60(doc_id) %
    HORIZON (the production path's xxhash64 has no DuckDB twin).
    Exercises the wide-form agg + unpivot the tier job runs at scale,
    salted, against an exact relational oracle."""
    from opentsdb_rollup_rust_spark.config import (
        EPOCH_BASE_SECONDS,
        HORIZON_SECONDS,
        TOKEN_STATS,
    )
    from opentsdb_rollup_rust_spark.functions.arrays import token_array_stats
    from opentsdb_rollup_rust_spark.functions.hashing import md5_int60
    from opentsdb_rollup_rust_spark.operators.rollup import fused_rollup_wide

    seqs = _md5_token_seqs(spark, sf_dir)
    stats = token_array_stats("tokens", sum_acc="int")
    wide = seqs.select(
        "source",
        (F.lit(EPOCH_BASE_SECONDS) + F.pmod(md5_int60(F.col("doc_id")), F.lit(HORIZON_SECONDS))).alias("ts_sec"),
        *[stats[s].alias(s) for s in TOKEN_STATS],
    )
    fused = fused_rollup_wide(wide, "1h", salts=4)
    return fused.select(
        "series_id", _epoch(), F.col("interval"), "sum", "count", "min", "max"
    )


def _q_pack_materialize(spark, sf_dir):
    """K1 end-to-end: concat-and-chunk packing of the md5-token
    sequences, then chunk materialization — the actual packed context
    windows. Token arrays cross exactly one shuffle (the gather join on
    doc_id); the packing plan itself moves lengths only.

    The registered output projects the token array to a deterministic
    per-chunk checksum (chunk_id, n_tok, tok_md5) — the driver's pandas
    canonicalizer cannot hash array cells (CORRECTNESS_r02 ERR), so the
    array itself is pinned by tests/test_packing.py while the driver
    gate value-checks the md5 of its exact contents."""
    from opentsdb_rollup_rust_spark.pipeline.packing import (
        concat_pack_spans,
        materialize_chunks,
    )

    seqs = _md5_token_seqs(spark, sf_dir, numeric_id=True)
    spans = concat_pack_spans(
        seqs,
        capacity=64,
        bucket_expr=F.floor(F.col("doc_id") / F.lit(128)).cast("long"),
    )
    chunks = materialize_chunks(spans, seqs)
    return chunks.select(
        "chunk_id",
        "n_tok",
        F.md5(
            F.array_join(F.transform("tokens", lambda x: x.cast("string")), ",")
        ).alias("tok_md5"),
    )


def _q_tok_topk(spark, sf_dir):
    """Heavy hitters: top-10 most frequent tokens per source, exact.
    Two-phase (source, token) count — partial agg collapses per task,
    the shuffle is bounded by |sources| x |vocab| — then a per-source
    window rank over at most |vocab| rows per partition (partitioned
    window; never the global-window trap). With an unbounded vocab at
    100 TB the same plan holds because the agg output, not the scan,
    bounds the window input; a sketch (count-min / SpaceSaving) would
    only be needed if even (source, token) cardinality blew up."""
    seqs = _md5_token_seqs(spark, sf_dir)
    counts = (
        seqs.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("tok"))
    return counts.select(
        "source", "tok", "cnt", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 10)


def _q_agg_dev(spark, sf_dir):
    """A13: OpenTSDB `dev` aggregator ([OTSDB-AGG]) — per-series
    hourly population standard deviation, computed from the two
    integer power sums (n, sum x, sum x^2) so the radicand
    n*sxx - sx^2 is EXACT int64 in both engines; the final
    sqrt(radicand)/n is one deterministic IEEE double expression,
    quantized 1e-6. This is also the decomposable form a rollup tier
    would store to make dev re-aggregable (sum/sumsq/count merge
    across windows; plain dev values do not)."""
    pts = _event_points(spark, sf_dir)
    from opentsdb_rollup_rust_spark.functions.timeutil import time_bucket_epoch

    g = pts.groupBy(
        "series_id", time_bucket_epoch("ts", 3600).alias("w_start")
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sx"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
    )
    radicand = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dev = F.sqrt(radicand) / F.col("n").cast("double")
    return g.select(
        "series_id",
        "w_start",
        "n",
        F.floor(dev * F.lit(1_000_000)).cast("long").alias("dev_q"),
    )


def _q_agg_interp(spark, sf_dir):
    """A12: cross-series aggregation with LINEAR INTERPOLATION at
    missing windows — OpenTSDB's query-time aggregation rule
    ([OTSDB-AGG]: when summing series, a series without a data point
    at timestamp t contributes its linearly interpolated value
    between its surrounding points; outside its extent it contributes
    nothing). Grid = union of all series' hourly windows; per
    (series, t): the stored value if present, else
    vp + (vn - vp) * (t - tp) / (tn - tp) from the nearest stored
    neighbors. Both engines evaluate the identical double expression
    on identical ints, then the SUM is quantized 1e-3.

    Scale shape: the grid cross join is |series| x |windows| (the
    dense interpolation matrix — inherent to the semantics), the
    neighbor search is two partitioned windows (last/first with
    ignorenulls), and the final agg is a partial-aggregated groupBy
    on the window start."""
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h").select(
        "series_id", _epoch(), F.col("sum").alias("v")
    )
    grid = r1h.select("w_start").distinct()
    series = r1h.select("series_id").distinct()
    dense = series.crossJoin(grid).join(r1h, ["series_id", "w_start"], "left")

    wb = (
        Window.partitionBy("series_id")
        .orderBy("w_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("series_id")
        .orderBy("w_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_w = F.when(F.col("v").isNotNull(), F.col("w_start"))
    prev_v = F.last("v", ignorenulls=True).over(wb)
    prev_w = F.last(known_w, ignorenulls=True).over(wb)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_w = F.first(known_w, ignorenulls=True).over(wf)
    interp = F.when(F.col("v").isNotNull(), F.col("v").cast("double")).otherwise(
        prev_v.cast("double")
        + (next_v - prev_v).cast("double")
        * (
            (F.col("w_start") - prev_w).cast("double")
            / (next_w - prev_w).cast("double")
        )
    )
    # quantize each contribution BEFORE the sum (module rule: double
    # addition is order-dependent, long sums are exact)
    contrib = dense.select(
        "w_start", F.floor(interp * F.lit(1000)).cast("long").alias("iv_q")
    ).where(F.col("iv_q").isNotNull())
    return contrib.groupBy("w_start").agg(
        F.sum("iv_q").alias("sum_q"),
        F.count("*").alias("n_series"),
    )


def _q_agg_zimsum(spark, sf_dir):
    """A18: the non-interpolating cross-series aggregator family —
    OpenTSDB's zimsum / mimmin / mimmax ([OTSDB-AGG]). Where the
    default sum/min/max aggregators interpolate a missing series at
    timestamp t (A12 `agg_interp`), the zim/mim family SKIPS missing
    series entirely: zimsum sums the series present at t (missing
    contributes zero), mimmin/mimmax ignore missing rather than
    interpolating toward them. Same grid semantics, opposite
    missing-window policy — both policies now exist side by side.

    Scale shape: no dense grid needed at all (skipping missing means
    only stored rows participate) — one partial-agg-collapsed groupBy
    on the window start."""
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h").select(
        "series_id", _epoch(), F.col("sum").alias("v")
    )
    return r1h.groupBy("w_start").agg(
        F.sum("v").alias("zimsum"),
        F.min("v").alias("mimmin"),
        F.max("v").alias("mimmax"),
        F.count("*").alias("n_present"),
    )


def _q_expr_ratio(spark, sf_dir):
    """A19: metric-expression query (OpenTSDB 2.3 /api/query/exp):
    arithmetic ACROSS TWO METRIC SERIES of the same tag set, per
    (tags, window), after each side is aggregated — here
    mean token value = `source:tok_sum` tier series divided by
    `source:n_tok` tier series at 1h. The two series are read as a
    conditional-aggregation pivot (two agg buffers over one scan of
    the wide stats — the same numbers the long 1h tier stores for
    those two series_ids), so the whole expression costs ONE
    partial-agg-collapsed groupBy; a join-based expression engine
    would shuffle the tier twice and SMJ. The ratio is an IEEE
    double of two exact longs, quantized 1e-6 (module exactness
    rule; n_tok >= 1 so the denominator is never 0)."""
    from opentsdb_rollup_rust_spark.config import (
        EPOCH_BASE_SECONDS,
        HORIZON_SECONDS,
    )
    from opentsdb_rollup_rust_spark.functions.arrays import token_array_stats
    from opentsdb_rollup_rust_spark.functions.hashing import md5_int60

    seqs = _md5_token_seqs(spark, sf_dir)
    stats = token_array_stats("tokens", sum_acc="int")
    ts_sec = F.lit(EPOCH_BASE_SECONDS) + F.pmod(
        md5_int60(F.col("doc_id")), F.lit(HORIZON_SECONDS)
    )
    wide = seqs.select(
        "source",
        (F.floor(ts_sec / 3600) * 3600).cast("long").alias("w_start"),
        stats["tok_sum"].alias("tok_sum"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )
    g = wide.groupBy("source", "w_start").agg(
        F.sum("tok_sum").alias("sum_tok_sum"),
        F.sum("n_tok").alias("sum_n_tok"),
    )
    ratio = F.col("sum_tok_sum").cast("double") / F.col("sum_n_tok").cast(
        "double"
    )
    return g.select(
        "source",
        "w_start",
        "sum_tok_sum",
        "sum_n_tok",
        F.floor(ratio * F.lit(1_000_000)).cast("long").alias("ratio_q"),
    )


def _q_agg_percentile(spark, sf_dir):
    """A9: exact p50/p95/p99 per series via discrete selection (the
    value at rank ceil(p*n) of the sorted values) — integer-exact, no
    interpolation-float ambiguity across engines.

    Rank-based formulation (row_number + conditional agg), NOT
    collect_list: the per-series sort is a spillable WindowExec, so a
    hot series costs disk instead of an unbounded in-memory array
    (round-1 VERDICT flagged the collect_list variant). The value at a
    given rank is well-defined under ties, so non-deterministic tie
    order cannot change the result."""
    pts = _event_points(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("value")
    r = pts.select(
        "series_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("series_id")).alias("n"),
    )

    def pick(p):
        at = F.ceil(F.col("n") * F.lit(p)).cast("int")
        return F.max(F.when(F.col("rn") == at, F.col("value")))

    return r.groupBy("series_id").agg(
        pick(0.5).alias("p50"),
        pick(0.95).alias("p95"),
        pick(0.99).alias("p99"),
        F.max("n").alias("n"),
    )


def _q_agg_rollup_sets(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
            F.count("*").alias("n"),
        )
    )


def _q_tok_coverage(spark, sf_dir):
    """T8: per-source vocabulary coverage — tokenizer QA numbers: total
    token occurrences, distinct vocab size, and the exact-ppm share of
    occurrences covered by the top-10 tokens (Zipf head mass — a
    skewed head is how you spot a tokenizer/corpus mismatch). Same
    two-phase shape as tok_topk: the (source, token) partial agg
    bounds everything downstream by |vocab|, not the scan."""
    seqs = _md5_token_seqs(spark, sf_dir)
    counts = (
        seqs.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = counts.select(
        "source", "cnt", F.row_number().over(w).alias("rank")
    )
    return ranked.groupBy("source").agg(
        F.sum("cnt").alias("n_occ"),
        F.count("*").alias("n_vocab"),
        F.expr(
            "sum(CASE WHEN rank <= 10 THEN cnt ELSE 0 END) * 1000000"
            " DIV sum(cnt)"
        ).alias("top10_ppm"),
    )


def _q_win_topk(spark, sf_dir):
    return topk_hot_series(_event_points(spark, sf_dir), k=3)


def _q_win_delta(spark, sf_dir):
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    w = Window.partitionBy("series_id").orderBy("window_start")
    return r1h.select(
        "series_id",
        _epoch(),
        (F.col("sum") - F.lag("sum").over(w)).alias("delta_sum"),
    )


def _q_win_rate(spark, sf_dir):
    """W6: OpenTSDB counter-`rate` semantics ([OTSDB-AGG]) over a
    deterministic sawtooth counter: per series, cumulative hourly sum
    mod 1e6 (so genuine counter RESETS occur), then rate/sec with the
    reset rule — a negative delta means the counter restarted, so the
    rate counts from zero (value/dt) instead of going negative. Rate
    is a double from exact integer delta/dt (IEEE division is
    deterministic), quantized 1e-6; the first row per series is NULL
    in both engines (lag has no previous)."""
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    w = Window.partitionBy("series_id").orderBy("window_start")
    cum = F.sum("sum").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_ctr = r1h.select(
        "series_id", _epoch(), F.pmod(cum, F.lit(1_000_000)).alias("counter")
    )
    prev = F.lag("counter").over(
        Window.partitionBy("series_id").orderBy("w_start")
    )
    prev_t = F.lag("w_start").over(
        Window.partitionBy("series_id").orderBy("w_start")
    )
    dt = (F.col("w_start") - prev_t).cast("double")
    delta = F.col("counter") - prev
    rate = F.when(delta >= 0, delta.cast("double") / dt).otherwise(
        F.col("counter").cast("double") / dt
    )
    return with_ctr.select(
        "series_id",
        "w_start",
        "counter",
        F.floor(rate * F.lit(1_000_000)).cast("long").alias("rate_q"),
    )


def _q_win_rate_wrap(spark, sf_dir):
    """W6b: the other half of OpenTSDB's rate options — counterMax
    WRAP correction plus resetValue spike suppression. A negative
    delta on a counter is assumed to be a wrap, so counterMax is added
    back (recovering the true delta for a counter stored mod M); but
    if the corrected delta exceeds resetValue the sample is treated as
    a genuine restart and the rate is 0 (OpenTSDB's guard against the
    colossal false rate a real reset would otherwise produce under
    wrap correction). Same sawtooth counter as win_rate, so the two
    demos differ ONLY in the rate rule."""
    counter_max, reset_value = 1_000_000, 500_000
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    w = Window.partitionBy("series_id").orderBy("window_start")
    cum = F.sum("sum").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_ctr = r1h.select(
        "series_id", _epoch(), F.pmod(cum, F.lit(counter_max)).alias("counter")
    )
    ws = Window.partitionBy("series_id").orderBy("w_start")
    delta = F.col("counter") - F.lag("counter").over(ws)
    dt = (F.col("w_start") - F.lag("w_start").over(ws)).cast("double")
    corrected = F.when(delta < 0, delta + F.lit(counter_max)).otherwise(delta)
    rate = F.when(corrected > F.lit(reset_value), F.lit(0.0)).otherwise(
        corrected.cast("double") / dt
    )
    return with_ctr.select(
        "series_id",
        "w_start",
        "counter",
        F.floor(rate * F.lit(1_000_000)).cast("long").alias("rate_q"),
    )


def _q_win_rate_drop(spark, sf_dir):
    """W6c: OpenTSDB's `dropResets` rate option — the third reset
    policy. Where `rate` counts a reset from zero and `counterMax`
    wrap-corrects it, dropResets simply EMITS NOTHING for the sample
    after a reset (and, as in OpenTSDB, nothing for the first sample
    of a series — there is no previous point to difference). Same
    sawtooth counter as win_rate/win_rate_wrap so the three queries
    differ only in the rate rule; the delta>=0 predicate drops both
    the NULL first rows and the negative-delta resets."""
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    w = Window.partitionBy("series_id").orderBy("window_start")
    cum = F.sum("sum").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_ctr = r1h.select(
        "series_id", _epoch(), F.pmod(cum, F.lit(1_000_000)).alias("counter")
    )
    ws = Window.partitionBy("series_id").orderBy("w_start")
    delta = F.col("counter") - F.lag("counter").over(ws)
    dt = (F.col("w_start") - F.lag("w_start").over(ws)).cast("double")
    return (
        with_ctr.select(
            "series_id", "w_start", "counter", delta.alias("delta"), dt.alias("dt")
        )
        .where(F.col("delta") >= 0)
        .select(
            "series_id",
            "w_start",
            "counter",
            F.floor(F.col("delta") / F.col("dt") * F.lit(1_000_000))
            .cast("long")
            .alias("rate_q"),
        )
    )


def _tagged_points(spark, sf_dir, stored_series=False):
    """The demo TAGGED metric stream: events with a deterministic
    map<string,string> tag set (host/dc/rack/env derived from
    user_id/event_type — no randomness, so the DuckDB oracle derives
    the identical tags as plain columns).

    ``stored_series=True`` additionally lands STORED_SERIES_COL — the
    sorted 'k=v,...' full-tag identity as a plain codegen concat over
    the same derived values (sorted key order dc < env < host < rack,
    exactly what _series_key produces from this map). The stored-tsuid
    model: api_query and the tier builders consume the stored column
    instead of re-deriving the identity per point with an
    array_sort/transform HOF (see plans/api_query.STORED_SERIES_COL
    for the measured effect) — plus one plain ``_tag_<k>`` column per
    tag (operators.tagquery.TAG_COL_PREFIX): the tag-filter compilers
    consume those instead of element_at on the map alias, which filter
    pushdown otherwise INLINES (whole create_map re-built once per
    pushed predicate — see TAG_COL_PREFIX for the measured effect)."""
    from opentsdb_rollup_rust_spark.operators.tagquery import TAG_COL_PREFIX
    from opentsdb_rollup_rust_spark.plans.api_query import STORED_SERIES_COL

    e = _t(spark, sf_dir, "events")
    uid = F.col("user_id")
    env = F.when(F.pmod(uid, F.lit(5)) == 0, F.lit("prod")).otherwise(
        F.lit("dev")
    )
    host = F.concat(F.lit("web"), F.pmod(uid, F.lit(12)).cast("string"))
    rack = F.concat(F.lit("r"), F.pmod(uid, F.lit(3)).cast("string"))
    extra = (
        [
            F.concat(
                F.lit("dc="),
                F.col("event_type"),
                F.lit(",env="),
                env,
                F.lit(",host=web"),
                F.pmod(uid, F.lit(12)).cast("string"),
                F.lit(",rack=r"),
                F.pmod(uid, F.lit(3)).cast("string"),
            ).alias(STORED_SERIES_COL),
            host.alias(TAG_COL_PREFIX + "host"),
            F.col("event_type").alias(TAG_COL_PREFIX + "dc"),
            rack.alias(TAG_COL_PREFIX + "rack"),
            env.alias(TAG_COL_PREFIX + "env"),
        ]
        if stored_series
        else []
    )
    return e.select(
        F.col("event_type").alias("series_id"),
        F.col("ts"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("value"),
        F.create_map(
            F.lit("host"),
            F.concat(F.lit("web"), F.pmod(uid, F.lit(12)).cast("string")),
            F.lit("dc"),
            F.col("event_type"),
            F.lit("rack"),
            F.concat(F.lit("r"), F.pmod(uid, F.lit(3)).cast("string")),
            F.lit("env"),
            env,
        ).alias("tags"),
        *extra,
    )


# OpenTSDB /api/query filter spec exercised by query_tag_filters —
# one of each implemented family, mirrored literally in the oracle.
_TAG_FILTERS = [
    TagFilter("iwildcard", "host", "WEB1*", group_by=True),
    TagFilter("literal_or", "dc", "click|view"),
    TagFilter("regexp", "rack", "r[01]"),
    TagFilter("not_literal_or", "env", "dev"),
]


def _q_query_tag_filters(spark, sf_dir):
    """P6: OpenTSDB 2.2 /api/query tag-filter semantics over a
    map-typed tag column: iwildcard (case-insensitive glob, groupBy
    dimension), literal_or, full-match regexp, and not_literal_or
    AND together; non-groupBy series collapse under the aggregator
    (daily sum/count/min/max + derived avg). The whole predicate is a
    codegen'd expression over the map — no UDF, no explode."""
    return tag_filter_rollup(
        _tagged_points(spark, sf_dir, stored_series=True),
        _TAG_FILTERS,
        86400,
    )


def _q_query_tag_filters_not(spark, sf_dir):
    """P6c (r5): the two remaining documented TagVFilter types —
    ``not_iliteral_or`` (tag present, value NOT in the list, compared
    case-insensitively) and ``not_key`` (series must not carry the
    key at all). The demo stream adds an OPTIONAL 'canary' tag
    (present on 1-in-7 users only, via map_filter dropping the null
    value) so key-absence is actually exercised — the base tagged
    stream carries every key on every series. Filters AND together:
    host wildcard (groupBy dimension), dc not_iliteral_or
    'CLICK|Purchase' (case-folds against lowercase stored values),
    canary not_key. Still one codegen'd map predicate, no UDF."""
    e = _t(spark, sf_dir, "events")
    uid = F.col("user_id")
    tags = F.map_filter(
        F.create_map(
            F.lit("host"),
            F.concat(F.lit("web"), F.pmod(uid, F.lit(12)).cast("string")),
            F.lit("dc"),
            F.col("event_type"),
            F.lit("canary"),
            F.when(F.pmod(uid, F.lit(7)) == 0, F.lit("on")),
        ),
        lambda k, v: v.isNotNull(),
    )
    from opentsdb_rollup_rust_spark.operators.tagquery import TAG_COL_PREFIX

    pts = e.select(
        F.col("event_type").alias("series_id"),
        F.col("ts"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("value"),
        tags.alias("tags"),
        # stored tag columns (TAG_COL_PREFIX contract): null when the
        # optional key is absent, exactly element_at's semantics
        F.concat(F.lit("web"), F.pmod(uid, F.lit(12)).cast("string")).alias(
            TAG_COL_PREFIX + "host"
        ),
        F.col("event_type").alias(TAG_COL_PREFIX + "dc"),
        F.when(F.pmod(uid, F.lit(7)) == 0, F.lit("on")).alias(
            TAG_COL_PREFIX + "canary"
        ),
    )
    return tag_filter_rollup(
        pts,
        [
            TagFilter("wildcard", "host", "web*", group_by=True),
            TagFilter("not_iliteral_or", "dc", "CLICK|Purchase"),
            TagFilter("not_key", "canary", ""),
        ],
        86400,
    )


def _q_suggest(spark, sf_dir):
    """/api/suggest autocomplete, all three kinds in one result:
    metrics capped at 3 (the `max` param doing real work), every tag
    key, and tag values under prefix 'web' capped at 5 (lexicographic,
    so web10 < web2 — string order, as in OpenTSDB). DISTINCT
    collapses map-side; only the name dictionary shuffles."""
    pts = _tagged_points(spark, sf_dir)
    return (
        suggest(pts, "metrics", "", 3)
        .unionAll(suggest(pts, "tagk", "", 25))
        .unionAll(suggest(pts, "tagv", "web", 5))
    )


def _q_lookup_series(spark, sf_dir):
    """P8: /api/search/lookup — enumerate the distinct series (metric
    + full tag set) matching a tag filter, with point counts, never
    touching values. The filter predicate is the same compiled
    expression family as query_tag_filters; DISTINCT-with-count
    collapses map-side so only the series dictionary shuffles."""
    from opentsdb_rollup_rust_spark.operators.tagquery import tag_value_col

    pts = _tagged_points(spark, sf_dir, stored_series=True)
    tags = F.col("tags")
    tv = lambda k: tag_value_col(pts, "tags", k)
    pred = compile_tag_filter(
        tags, TagFilter("wildcard", "host", "web*"), value=tv("host")
    ) & compile_tag_filter(
        tags, TagFilter("literal_or", "dc", "click|error"), value=tv("dc")
    )
    return (
        pts.where(pred)
        .select(
            F.col("series_id").alias("metric"),
            tv("host").alias("host"),
            tv("dc").alias("dc"),
            tv("rack").alias("rack"),
            tv("env").alias("env"),
        )
        .groupBy("metric", "host", "dc", "rack", "env")
        .agg(F.count("*").alias("n_points"))
    )


def _q_annotation_overlay(spark, sf_dir):
    """P9: /api/annotation read path — OpenTSDB attaches time-ranged
    annotations (incidents, deploys) to series and queries return the
    ones overlapping each window. Annotations here are synthesized
    deterministically (error events with value > 4.5 open a 30-minute
    incident), then overlaid on the error series' hourly rollup via
    an interval join: window [w, w+1h) x annotation [a_start, a_end).
    The annotation side is tiny and BROADCAST, so the tier never
    shuffles for the overlay — the same small-dim join shape as J3."""
    pts = _event_points(spark, sf_dir)
    anns = (
        _t(spark, sf_dir, "events")
        .where((F.col("event_type") == "error") & (F.col("value") > 4.5))
        .select(
            F.col("event_id").alias("ann_id"),
            F.unix_timestamp("ts").cast("long").alias("a_start"),
            (F.unix_timestamp("ts").cast("long") + F.lit(1800)).alias(
                "a_end"
            ),
        )
    )
    r1h = tumbling_rollup(pts.where(F.col("series_id") == "error"), "1h")
    windows = r1h.select(
        "series_id", _epoch(), F.col("sum").alias("sum")
    )
    joined = windows.join(
        F.broadcast(anns),
        (F.col("a_start") < F.col("w_start") + F.lit(3600))
        & (F.col("a_end") > F.col("w_start")),
        "left",
    )
    return joined.groupBy("series_id", "w_start", "sum").agg(
        F.count("ann_id").alias("n_annotations"),
        F.min("ann_id").alias("first_ann"),
    )


def _q_shard_order(spark, sf_dir):
    """Q3: deterministic global shuffle + shard layout for a training
    dataloader — every doc gets (shard, pos) as a pure function of
    its key. Full per-doc assignment under the gate (500 rows at
    sf0.01); the oracle recomputes the identical hash rank in SQL."""
    d = shard_order(_t(spark, sf_dir, "documents"), n_shards=8)
    return d.select("doc_id", "shard", "pos")


def _q_query_explicit_tags(spark, sf_dir):
    """P11: OpenTSDB 2.3 explicitTags — the tag SET must be exactly
    the filtered keys, so series carrying any extra tag are excluded
    even when every filter matches. Demo stream has heterogeneous tag
    sets ({host,dc} vs {host,dc,rack}, deterministic off user_id);
    filters on host+dc with explicitTags=true keep only the rack-less
    rows. Still one codegen'd predicate: size equality + the per-
    filter presence checks IS set equality."""
    e = _t(spark, sf_dir, "events")
    uid = F.col("user_id")
    base = F.create_map(
        F.lit("host"),
        F.concat(F.lit("web"), F.pmod(uid, F.lit(12)).cast("string")),
        F.lit("dc"),
        F.col("event_type"),
    )
    with_rack = F.map_concat(
        base,
        F.create_map(
            F.lit("rack"),
            F.concat(F.lit("r"), F.pmod(uid, F.lit(3)).cast("string")),
        ),
    )
    from opentsdb_rollup_rust_spark.operators.tagquery import TAG_COL_PREFIX

    pts = e.select(
        F.col("ts"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("value"),
        F.when(F.pmod(uid, F.lit(4)) == 0, base)
        .otherwise(with_rack)
        .alias("tags"),
        # stored tag columns (TAG_COL_PREFIX contract) — the explicit-
        # tags size check still reads the map, but per-filter checks
        # and the groupBy extraction stay on cheap plain columns
        F.concat(F.lit("web"), F.pmod(uid, F.lit(12)).cast("string")).alias(
            TAG_COL_PREFIX + "host"
        ),
        F.col("event_type").alias(TAG_COL_PREFIX + "dc"),
    )
    return tag_filter_rollup(
        pts,
        [
            TagFilter("wildcard", "host", "web*", group_by=True),
            TagFilter("literal_or", "dc", "click|view"),
        ],
        86400,
        explicit_tags=True,
    )


def _q_query_last(spark, sf_dir):
    """P10: /api/query/last — the most recent data point per matching
    series at query time (OpenTSDB's dashboard-current-value
    endpoint), composed WITH the tag-filter family: filter first,
    then one struct-max aggregation picks (ts, value) atomically per
    series+host (no self-join, no window over the full stream; ties
    on ts broken by value inside the struct comparison, deterministic
    in both engines)."""
    from opentsdb_rollup_rust_spark.operators.tagquery import tag_value_col

    pts = _tagged_points(spark, sf_dir, stored_series=True)
    pred = compile_tag_filter(
        F.col("tags"),
        TagFilter("literal_or", "dc", "click|error"),
        value=tag_value_col(pts, "tags", "dc"),
    )
    narrow = pts.where(pred).select(
        "series_id",
        tag_value_col(pts, "tags", "host").alias("host"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        "value",
    )
    last = narrow.groupBy("series_id", "host").agg(
        F.max(F.struct("sec", "value")).alias("s")
    )
    return last.select(
        "series_id",
        "host",
        F.col("s.sec").alias("last_sec"),
        F.col("s.value").alias("last_value"),
    )


def _q_tok_pair_topk(spark, sf_dir):
    """T8: one BPE-training iteration's core statistic — adjacent
    token-pair frequencies over the corpus, global top-20 merge
    candidates. The pair stream is an in-stage generator (arrays_zip
    of two slices, exploded), collapsed by a map-side-combined
    count whose key space is bounded by |vocab|^2 intersected with
    observed adjacencies — at 100 TB the shuffle carries the pair
    dictionary, never the corpus. Top-k over the aggregated counts is
    a TakeOrdered, not a global sort."""
    seqs = _md5_token_seqs(spark, sf_dir)
    n = F.size("tokens")
    pairs = seqs.select(
        F.explode(
            F.arrays_zip(
                F.slice("tokens", 1, n - 1),
                F.slice("tokens", 2, n - 1),
            )
        ).alias("p")
    ).select(
        F.col("p.0").alias("t1"), F.col("p.1").alias("t2")
    )
    counts = pairs.groupBy("t1", "t2").agg(F.count("*").alias("cnt"))
    return counts.orderBy(
        F.desc("cnt"), F.asc("t1"), F.asc("t2")
    ).limit(20)


def _q_uid_encode(spark, sf_dir):
    """F9: the tsdb-uid dictionary round trip under the gate — build
    the deterministic name->uid table, ENCODE the stream (broadcast
    join, points never shuffle), aggregate daily by the 8-byte uid,
    then DECODE for presentation. The oracle rebuilds the same
    dictionary with a SQL row_number over sorted distinct names, so a
    hash match proves both the dense-rank assignment and that encode
    -> agg -> decode loses nothing."""
    pts = _event_points(spark, sf_dir)
    uids = build_uid_table(pts)
    enc = encode_uids(pts, uids)
    daily = (
        enc.withColumn(
            "w_start",
            F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
            * F.lit(86400),
        )
        .groupBy("uid", "w_start")
        .agg(F.sum("value").alias("sum"), F.count("value").alias("count"))
    )
    return decode_uids(daily, uids).select(
        "series_id", "uid", "w_start", "sum", "count"
    )


def _q_split_assign(spark, sf_dir):
    """Q2: deterministic hash train/val/test split (90/5/5) over the
    documents table, reported as per-(source, split) doc counts and
    char sums — any document migrating between splits moves integer
    mass between rows, so the gate pins the full assignment."""
    d = split_assign(_t(spark, sf_dir, "documents"))
    return d.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _q_win_moving(spark, sf_dir):
    r1d = tumbling_rollup(_event_points(spark, sf_dir), "1d")
    w = (
        Window.partitionBy("series_id")
        .orderBy("window_start")
        .rowsBetween(-2, 0)
    )
    return r1d.select(
        "series_id", _epoch(), F.avg("sum").over(w).alias("moving_avg")
    )


def _q_win_rank(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


def _q_filter_range(spark, sf_dir):
    pts = _event_points(spark, sf_dir).where(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00"))
    )
    return pts.groupBy("series_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )


def _q_filter_retention(spark, sf_dir):
    """Keep only windows within 7 days of the stream's max ts —
    retention relative to data, so it is deterministic."""
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    horizon = r1h.agg(
        (F.max(F.unix_timestamp("window_start")) - F.lit(7 * 86400)).alias("cut")
    )
    return (
        r1h.crossJoin(F.broadcast(horizon))
        .where(F.unix_timestamp("window_start") >= F.col("cut"))
        .groupBy("series_id")
        .agg(F.count("*").alias("kept_windows"), F.sum("count").alias("kept_points"))
    )


def _q_filter_series(spark, sf_dir):
    pts = _event_points(spark, sf_dir).where(
        F.col("series_id").isin("click", "error")
    )
    return pts.groupBy("series_id").agg(F.count("*").alias("n"))


def _q_join_broadcast(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("long")).alias(
                "acctbal_cents"
            ),
        )
    )


def _q_join_anti(spark, sf_dir):
    # orders with no high-quantity lineitem (resume-style exclusion)
    o = _t(spark, sf_dir, "orders")
    hi = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(hi, o.o_orderkey == hi.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def _q_join_semi(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return n.join(
        c, n.n_nationkey == c.c_nationkey, "left_semi"
    ).select("n_nationkey", "n_name")


def _q_join_equi(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def _q_join_range(spark, sf_dir):
    """Range join via MARKER COUNTING (r6): pairs of events of
    different types within 1 hour (b in [a.ts, a.ts+1h)), counted per
    (a_series, b_series) without ever materializing a pair row.

    The r1-r5 plan hour-bucketized both sides and equi-joined on the
    bucket — correct, but the join still streams every qualifying
    pair (~2.8e9 rows at sf1.0, 26 s; quadratic in sf). The count
    only needs, per a-event and b-series, the CUMULATIVE event count
    C(<t) at the band edges: |[a.ts, a.ts+1h)| = C(<a.ts+1h) -
    C(<a.ts). So each a-event emits two signed markers per other
    series (start -1, end +1), markers union with the events, one
    window partitioned by (b_series, hour block) ordered by
    (t_us, markers-before-events) forms the block-local running event
    count, and the distributed exclusive prefix over per-block totals
    (the concat_pack_spans idiom: |series x hours| rows through a
    tiny per-series window, broadcast back) lifts it to the global C.
    sum(sign * C) grouped by (a_series, b_series) is exactly the pair
    count; groups the old inner join never produced (zero pairs) are
    filtered. Linear rows (~9M at sf1.0), parallelism =
    |series x hour blocks|, no quadratic anything."""
    HOUR_US = 3_600_000_000
    pts = _event_points(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    series = pts.select(F.col("series_id").alias("b_series")).distinct()
    markers = (
        pts.crossJoin(F.broadcast(series))
        .where(F.col("series_id") != F.col("b_series"))
        .select(
            F.col("series_id").alias("a_series"),
            "b_series",
            F.explode(
                F.array(
                    F.struct(
                        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
                        F.lit(-1).cast("long").alias("sign"),
                    ),
                    F.struct(
                        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(HOUR_US)).alias("t_us"),
                        F.lit(1).cast("long").alias("sign"),
                    ),
                )
            ).alias("mk"),
        )
        .select(
            "a_series",
            "b_series",
            F.col("mk.t_us").alias("t_us"),
            F.col("mk.sign").alias("sign"),
            F.lit(0).cast("long").alias("is_event"),
        )
    )
    events = pts.select(
        F.lit(None).cast("string").alias("a_series"),
        F.col("series_id").alias("b_series"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.lit(0).cast("long").alias("sign"),
        F.lit(1).cast("long").alias("is_event"),
    )
    stream = markers.unionByName(events).withColumn(
        "hb", F.floor(F.col("t_us") / F.lit(HOUR_US))
    )
    # exclusive prefix of per-(series, hour-block) event totals: tiny
    # (|series x hours| rows), per-series window, broadcast back
    wb = (
        Window.partitionBy("b_series")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = F.broadcast(
        stream.groupBy("b_series", "hb")
        .agg(F.sum("is_event").alias("blk"))
        .withColumn(
            "off", F.coalesce(F.sum("blk").over(wb), F.lit(0).cast("long"))
        )
        .select("b_series", "hb", "off")
    )
    wloc = (
        Window.partitionBy("b_series", "hb")
        .orderBy("t_us", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = stream.join(offs, ["b_series", "hb"]).withColumn(
        "c", F.col("off") + F.sum("is_event").over(wloc)
    )
    return (
        cum.where(F.col("is_event") == 0)
        .groupBy("a_series", "b_series")
        .agg(F.sum(F.col("sign") * F.col("c")).alias("n_pairs"))
        .where(F.col("n_pairs") > 0)
    )


def _q_join_asof(spark, sf_dir):
    """J8: general backward AS-OF join — every raw point picks up the
    config value effective at or before its timestamp (config rows =
    one per series per 6h boundary with an hourly observation, cfg =
    md5 bucket of (series, boundary)). Implemented as union + ONE
    per-series window (last ignorenulls, dim-first on ties), never a
    range join — the composition that survives a 100 TB fact table.
    Points before their series' first config row keep null cfg (both
    engines)."""
    from opentsdb_rollup_rust_spark.operators.asof import asof_join

    pts = _event_points(spark, sf_dir)
    facts = pts.select(
        "series_id", F.unix_timestamp("ts").cast("long").alias("ts_e"), "value"
    )
    r1h = tumbling_rollup(pts, "1h")
    dims = r1h.select(
        "series_id", _epoch()
    ).where(F.pmod(F.col("w_start"), F.lit(21600)) == 0).select(
        "series_id",
        F.col("w_start").alias("eff_ts"),
        md5_bucket(
            F.concat_ws("-", F.col("series_id"), F.col("w_start")), 1000
        ).cast("long").alias("cfg"),
    )
    return asof_join(facts, dims, fact_ts="ts_e")


def _q_route_read(spark, sf_dir):
    """§3.2 read path through the tier ROUTER: a 2h-resolution query
    routes to the 1h tier (re-aggregated 2x), never the 1m tier (120x)
    — the 'answer coarse queries from coarse tiers' rewrite — then
    zero-fills and derives avg. The oracle computes the 2h answer
    directly from raw points, so the hash match proves routing +
    re-aggregation + fill + derived-avg compose exactly."""
    from opentsdb_rollup_rust_spark.plans.tier_router import (
        rollup_read_pipeline,
        route_tier,
    )

    tier = route_tier(7200)
    assert tier == "1h", tier  # the router contract this demo pins
    pts = _event_points(spark, sf_dir)
    r1h = cascade_reagg(tumbling_rollup(pts, "1m"), "1h")
    out = rollup_read_pipeline(r1h, tier, 7200, fill="zero", with_avg=True)
    return out.select(
        "series_id", _epoch(), "sum", "count", "min", "max", "avg"
    )


def _q_route_read_stored(spark, sf_dir):
    """S4+S6+P5 composition — the PRODUCTION read path under the gate
    (r3 VERDICT task #4): the 1h tier is WRITTEN through ManifestStore
    (bucketed + sort-within-partition series-major layout, snapshot-
    pinned commit) and the 2h query is answered from the STORED table
    via read_rollup (route -> pruned scan of the tier parquet ->
    re-agg -> zero-fill -> derived avg). Same direct-from-raw oracle
    as route_read, so the hash match proves the store round-trip
    composes exactly with routing — not just the in-memory cascade."""
    import tempfile

    from opentsdb_rollup_rust_spark.functions.hashing import (
        series_hash_bucket,
    )
    from opentsdb_rollup_rust_spark.plans.tier_router import read_rollup
    from opentsdb_rollup_rust_spark.sources.store import ManifestStore

    store = ManifestStore(
        spark, tempfile.mkdtemp(prefix="spark_graft_route_stored_")
    )
    r1h = cascade_reagg(tumbling_rollup(_event_points(spark, sf_dir), "1m"), "1h")
    tier_df = (
        r1h.withColumn("bucket", series_hash_bucket("series_id", 8))
        .repartition(8, "bucket")
        .sortWithinPartitions("series_id", "window_start")
    )
    store.append("rollup_1h", tier_df)
    out = read_rollup(store, 7200, fill="zero", with_avg=True)
    return out.select(
        "series_id", _epoch(), "sum", "count", "min", "max", "avg"
    )


def _events_rowcount_from_footers(sf_dir):
    """Total row count of the events parquet from footer metadata
    (num_rows is always exact) — sizes the delete demo's store layout
    without a count job. None when unreadable."""
    import glob as _glob

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return None
    path = os.path.join(sf_dir, "events.parquet")
    files = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    total = 0
    for fp in files:
        try:
            total += pq.ParquetFile(fp).metadata.num_rows
        except Exception:
            return None
    return total or None


def _events_ts_range_from_footers(sf_dir):
    """(lo, hi) = (min, max) of unix_timestamp(ts) over the events
    parquet, read from ROW-GROUP FOOTER STATISTICS — the same exact
    min/max a full Spark aggregation computes (timestamp statistics
    are exact, and floor-to-seconds is monotone), for the cost of a
    metadata read instead of a 10^6-row scan job per api demo (guide
    §6: make the format's metadata do the skipping). Returns None
    when any row group lacks exact stats or holds nulls — callers
    fall back to the aggregation probe."""
    import calendar
    import glob as _glob
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return None
    path = os.path.join(sf_dir, "events.parquet")
    files = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        return None
    mn = mx = None
    for fp in files:
        try:
            md = pq.ParquetFile(fp).metadata
        except Exception:
            return None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = None
            for j in range(rg.num_columns):
                c = rg.column(j)
                if c.path_in_schema == "ts":
                    st = c.statistics
                    break
            if st is None or not st.has_min_max or (st.null_count or 0) > 0:
                return None
            lo_s = calendar.timegm(st.min.timetuple())
            hi_s = calendar.timegm(st.max.timetuple())
            mn = lo_s if mn is None else min(mn, lo_s)
            mx = hi_s if mx is None else max(mx, hi_s)
    if mn is None:
        return None
    return mn, mx


def _api_spec_range(spark, sf_dir):
    """[start, end) for the api_query demos: the tagged stream's full
    span — from parquet footer statistics when exact (r6; identical
    values to the 1-row min/max agg probe, which remains the
    fallback). The oracle recomputes the identical range in SQL, so
    both engines build the same fill spine.

    The returned stream also carries STORED_SERIES_COL (r6) — see
    _tagged_points(stored_series=True)."""
    pts = _tagged_points(spark, sf_dir, stored_series=True)
    rng = _events_ts_range_from_footers(sf_dir)
    if rng is None:
        lo, hi = pts.agg(
            F.min(F.unix_timestamp("ts")).alias("lo"),
            F.max(F.unix_timestamp("ts")).alias("hi"),
        ).first()
    else:
        lo, hi = rng
    return pts, int(lo), int(hi) + 1


def _q_api_query_ds_rate(spark, sf_dir):
    """THE composed end-user read (r4 VERDICT task #1): one OpenTSDB
    /api/query spec through plans/api_query.py — metric + tag filter ->
    groupBy host -> per-SERIES 1h-sum downsample -> ZERO fill over the
    aligned query range -> cross-series sum per host -> plain rate,
    LAST ([OTSDB-API] order of operations). The zero-fill-before-rate
    order is observable: empty hours pull the aggregate to 0, so the
    rate shows the genuine negative/positive spikes at gap edges — the
    exact composition signature a rate-before-fill bug would erase.
    The oracle recomputes the whole composition direct from raw
    events, so the hash pins every stage boundary."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        RateOptions,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("1h", "sum", fill="zero"),
        rate=RateOptions(),
    )
    return api_query(pts, spec)


def _q_api_query_group_avg(spark, sf_dir):
    """Second /api/query composition: explicitTags over the full tag
    set (host wildcard groupBy, dc literal, rack regexp, env
    literal_or), per-series calendar-free 1d-avg downsample (ppm
    quantized), fill=none, MAX across each host's series. Exercises
    the filter/groupBy/downsample-avg/aggregate boundaries without
    fill or rate, so the pair of api_query gate rows separates a fill
    or rate regression from a filter/groupBy one."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="max",
        filters=(
            TagFilter("iwildcard", "host", "*", group_by=True),
            TagFilter("literal_or", "dc", "view"),
            TagFilter("regexp", "rack", "r[0-2]"),
            TagFilter("literal_or", "env", "prod|dev"),
        ),
        explicit_tags=True,
        downsample=Downsample("1d", "avg", fill="none"),
    )
    return api_query(pts, spec)


def _q_api_query_tier(spark, sf_dir):
    """Third /api/query composition — the TIER-ROUTED read, the other
    half of r4 VERDICT task #1's P5 leg: a materialized 1h tagged tier
    (build_tagged_tier: per full-series sum/count/min/max, tags
    preserved) answers a 2h query by factor-window re-aggregation —
    2 tier rows per bucket, the raw stream never read — then the same
    zero-fill -> cross-series sum -> rate pipeline as api_query_ds_rate.
    The oracle computes direct from RAW events at 2h, so the hash match
    proves the tier route is exact end-to-end (decomposable
    sum/count/min/max recombination, bucket-aligned range)."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        RateOptions,
        api_query,
        build_tagged_tier,
    )

    pts, lo, end_raw = _api_spec_range(spark, sf_dir)
    start = lo // 7200 * 7200
    end = ((end_raw - 1) // 7200 + 1) * 7200
    tier = build_tagged_tier(pts, "1h")
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("7200s", "sum", fill="zero"),
        rate=RateOptions(),
    )
    return api_query(pts, spec, tier=tier, tier_interval="1h")


def _q_api_query_exp(spark, sf_dir):
    """/api/query/exp composition ([OTSDB-EXP]): two sub-query
    variables — a = click-sum per host per hour, b = view-sum per host
    per hour, both zero-filled over the same aligned range so the
    intersection join is dense — combined as the ppm ratio
    (a * 1e6) DIV (b + 1), all int64 (the +1 keeps the zero-filled
    denominator defined without leaving integer arithmetic). The
    oracle recomputes both sub-pipelines AND the join direct from raw
    events, so the hash pins sub-query alignment + join policy +
    expression evaluation, not just each variable."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        ExprSpec,
        QuerySpec,
        api_query_exp,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)

    def sub(metric):
        return QuerySpec(
            metric=metric,
            start=start,
            end=end,
            aggregator="sum",
            filters=(
                TagFilter("iwildcard", "host", "WEB*", group_by=True),
                TagFilter("literal_or", "env", "prod"),
            ),
            downsample=Downsample("1h", "sum", fill="zero"),
        )

    spec = ExprSpec(
        expr="(a * 1000000) DIV (b + 1)",
        variables=(("a", sub("click")), ("b", sub("view"))),
        join="intersection",
    )
    return api_query_exp(pts, spec)


def _q_api_query_multi(spark, sf_dir):
    """A full /api/query REQUEST: OpenTSDB takes a LIST of sub-queries
    per call; this runs two heterogeneous ones — q0: click hourly
    sum grouped by host (zero-filled), q1: view daily max grouped by
    rack+env (no fill) — and unions them under the canonical
    (query, group_tags) envelope. The sub-queries differ in metric,
    groupBy keys, interval, aggregator AND fill, so a hash match pins
    the envelope canonicalization (sorted k=v group_tags string) plus
    both compositions at once."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_multi,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    specs = {
        "q0": QuerySpec(
            metric="click",
            start=start,
            end=end,
            aggregator="sum",
            filters=(
                TagFilter("iwildcard", "host", "WEB*", group_by=True),
                TagFilter("literal_or", "env", "prod"),
            ),
            downsample=Downsample("1h", "sum", fill="zero"),
        ),
        "q1": QuerySpec(
            metric="view",
            start=start,
            end=end,
            aggregator="max",
            filters=(
                TagFilter("regexp", "rack", "r[0-2]", group_by=True),
                TagFilter("literal_or", "env", "prod|dev", group_by=True),
            ),
            downsample=Downsample("1d", "max", fill="none"),
        ),
    }
    return api_query_multi(pts, specs)


def _q_api_query_p95(spark, sf_dir):
    """Percentile downsampler through the composed endpoint (OpenTSDB
    2.4 p-downsamplers): per-SERIES daily p950 — exact discrete
    selection, value at integer rank (n*950 + 999) DIV 1000 of the
    sorted window — then MAX across each host's series. NOT
    decomposable, so api_query refuses to tier-route it (pytest pins
    the refusal); the scale answer for stored percentiles remains the
    histogram tier (A14/A15). Oracle recomputes the rank selection
    with the identical integer-ceil rule."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="max",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod|dev"),
        ),
        downsample=Downsample("1d", "p950", fill="none"),
    )
    return api_query(pts, spec)


def _q_api_query_shift(spark, sf_dir):
    """OpenTSDB 2.3 timeShift through the expression endpoint: the
    DAY-OVER-DAY DELTA — cur = click hourly sum per host (prod,
    zero-filled), prev = the IDENTICAL spec with time_shift=1d, i.e.
    evaluated over [start-1d, end-1d) and re-aligned onto the request
    timeline, joined bucket-for-bucket as (cur - prev). Pins the two
    halves of the shift contract at once: the shifted variable's
    filter/spine/fill all run on the SHIFTED range (the oracle
    recomputes prev direct from raw with explicit shifted epoch
    bounds — first time the api oracles exercise a range that
    actually excludes data), and the +shift re-alignment lands
    exactly on cur's bucket grid (intersection join non-empty)."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        ExprSpec,
        QuerySpec,
        api_query_exp,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)

    def sub(shift):
        return QuerySpec(
            metric="click",
            start=start,
            end=end,
            aggregator="sum",
            filters=(
                TagFilter("iwildcard", "host", "WEB*", group_by=True),
                TagFilter("literal_or", "env", "prod"),
            ),
            downsample=Downsample("1h", "sum", fill="zero"),
            time_shift=shift,
        )

    spec = ExprSpec(
        expr="cur - prev",
        variables=(("cur", sub(0)), ("prev", sub(86400))),
        join="intersection",
    )
    return api_query_exp(pts, spec)


def _q_api_query_gexp(spark, sf_dir):
    """/api/query/gexp (OpenTSDB 2.3 Graphite-style functions):
    highestMax(scale(sum:view{host=*,env=prod}, 2), 3) — the hourly
    per-host sums doubled, then only the 3 hosts whose (scaled) series
    reach the highest peak survive, every bucket of the winners kept.
    Selector ranking is the per-group aggregate of the query's own
    output (|hosts| rows) with the deterministic (max DESC, host ASC)
    tie-break, and the winners rejoin as a broadcast semi-join — the
    TakeOrdered pattern, no shuffle of the output stream. Oracle
    mirrors rank + tie-break literally."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_gexp,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("1h", "sum", fill="none"),
    )
    return api_query_gexp(pts, spec, (("scale", 2), ("highestMax", 3)))


def _q_api_query_fallback(spark, sf_dir):
    """rollupUsage=ROLLUP_FALLBACK_RAW (OpenTSDB 2.4): the supplied 1h
    tier CANNOT serve a 90-minute downsample (5400 % 3600 != 0) —
    under the default nofallback policy this exact call raises (pytest
    pins it); under fallback_raw it runs the raw path and must produce
    the raw answer. The oracle computes direct from raw at 5400s, so
    the hash pins that the fallback neither half-uses the tier nor
    perturbs the composition."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
        build_tagged_tier,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    tier = build_tagged_tier(pts, "1h")
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("5400s", "sum", fill="none"),
        rollup_usage="fallback_raw",
    )
    return api_query(pts, spec, tier=tier, tier_interval="1h")


def _q_api_query_linear(spark, sf_dir):
    """Linear fill through the composed endpoint — the bucket-level
    analogue of OpenTSDB's aggregation-time lerp interpolation,
    exposed as a downsample fill policy: 2h per-series sums, gaps lerped between the bracketing
    observed buckets of the SAME series (pure-int64 floor lerp — the
    J2b gapfill exactness rule, prev + (next-prev)*dt with pmod-floor
    division), spine buckets off a series' observed edges stay null
    and fall out of the cross-series sum. The oracle reproduces the
    lerp bit-for-bit with the identical pmod arithmetic."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, lo, end_raw = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="click",
        start=lo,
        end=end_raw,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("7200s", "sum", fill="linear"),
    )
    return api_query(pts, spec)


def _q_api_query_hist(spark, sf_dir):
    """/api/query percentiles[] on a histogram metric (OpenTSDB 2.4):
    per (host, 1d bucket), p500/p950/p990 estimated from the GROUP-
    MERGED msb histogram — the point of histogram metrics: exact
    per-series percentiles don't aggregate across series, bucket
    counts do, so the cross-series aggregate IS the histogram merge
    and ONE shuffle goes straight from filtered points to |groups x
    buckets x <=64| rows (no per-series stage at all). A15's
    integer-ceil rank rule per requested permille; est_max = the
    one-power-of-two bound. Oracle recomputes the merge + rank
    selection with identical integer arithmetic."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_hist,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("1d", "sum", fill="none"),
    )
    return api_query_hist(pts, spec, (500, 950, 990))


def _q_api_query_hist_tier(spark, sf_dir):
    """The tier-routed histogram percentile read: a materialized 1h
    TAGGED histogram tier (build_tagged_hist_tier) answers a 2h
    percentile query by factor-window COUNT re-aggregation — and
    unlike every other percentile shortcut, the answer is IDENTICAL
    to direct-from-raw (counts are exact; the estimate happens once,
    after the merge). Oracle computes direct from raw at 2h, so the
    hash proves tier == raw end-to-end."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_hist,
        build_tagged_hist_tier,
    )

    pts, lo, end_raw = _api_spec_range(spark, sf_dir)
    start = lo // 7200 * 7200
    end = ((end_raw - 1) // 7200 + 1) * 7200
    tier = build_tagged_hist_tier(pts, "1h")
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("7200s", "sum", fill="none"),
    )
    return api_query_hist(pts, spec, (950,), tier=tier, tier_interval="1h")


def _q_api_query_json(spark, sf_dir):
    """The /api/query POST body itself ([OTSDB-API]): a literal JSON
    request — nested rateOptions (counter + counterMax), a timeShift
    duration string, filter objects, a '2h-sum-zero' downsample
    string — parsed by parse_query_json and executed. Pins the
    parser's field mapping under the driver hash: the oracle computes
    the day-shifted, zero-filled, counter-wrapped composition direct
    from raw, so a mis-parsed field (shift dropped, counterMax
    ignored, fill mis-read) cannot hash-match."""
    import json

    from opentsdb_rollup_rust_spark.plans.api_query import (
        api_query,
        parse_query_json,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    body = json.dumps(
        {
            "start": start,
            "end": end,
            "queries": [
                {
                    "metric": "view",
                    "aggregator": "sum",
                    "downsample": "2h-sum-zero",
                    "rate": True,
                    "rateOptions": {
                        "counter": True,
                        "counterMax": 1099511627776,
                    },
                    "timeShift": "1d",
                    "filters": [
                        {
                            "type": "iwildcard",
                            "tagk": "host",
                            "filter": "WEB*",
                            "groupBy": True,
                        },
                        {
                            "type": "literal_or",
                            "tagk": "env",
                            "filter": "prod",
                        },
                    ],
                }
            ],
        }
    )
    ((spec, permilles),) = parse_query_json(body)
    assert permilles == ()
    return api_query(pts, spec)


def _q_api_query_qs(spark, sf_dir):
    """The GET spelling of /api/query ([OTSDB-API] HTTP query string
    format) — the form every CLI/dashboard client actually sends: a
    literal percent-encoded query string parsed by parse_query_string
    and executed. The string exercises the GET-only surface: brace-
    group position semantics (FIRST group = groupBy dimensions,
    second = plain filters), the 2.0 ``web*`` glob shorthand, an
    explicit literal_or(...) filter function, the ``dropcounter``
    rate spelling (negative deltas emit nothing), and a
    '1h-sum-zero' downsample segment. The oracle recomputes the
    whole composition direct from raw, so a mis-parsed segment
    (groups swapped, glob mis-mapped, dropcounter read as plain
    rate) cannot hash-match."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        api_query,
        parse_query_string,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    qs = (
        f"start={start}&end={end}"
        "&m=sum:1h-sum-zero:rate%7Bdropcounter%7D:"
        "signup%7Bhost=web*%7D%7Benv=literal_or(prod)%7D"
    )
    ((spec, permilles),) = parse_query_string(qs)
    assert permilles == ()
    return api_query(pts, spec)


def _q_api_query_tier_multi(spark, sf_dir):
    """rollupUsage=ROLLUP_FALLBACK across a tier LIST (the OpenTSDB
    rollup-table selection rule): 1h and 2h tagged tiers supplied, a
    3h query's best match (the coarsest, 2h) does not divide 10800 —
    nofallback would refuse (pytest pins it) — so the FALLBACK policy
    walks down and serves from the 1h tier, raw never read. Oracle
    computes direct from raw at 3h: the hash proves the walked-to
    tier answers exactly."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
        build_tagged_tier,
    )

    pts, lo, end_raw = _api_spec_range(spark, sf_dir)
    start = lo // 10800 * 10800
    end = ((end_raw - 1) // 10800 + 1) * 10800
    tiers = [
        (build_tagged_tier(pts, "1h"), "1h"),
        (build_tagged_tier(pts, "7200s"), "7200s"),
    ]
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="max",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("10800s", "sum", fill="none"),
        rollup_usage="fallback",
    )
    return api_query(pts, spec, tiers=tiers)


def _q_api_query_tsuid_none(spark, sf_dir):
    """The two remaining /api/query sub-query modes in one gate row:
    tsuids (direct series selection — the engine TSUID is
    '<metric>|<sorted k=v>', the columnar analogue of OpenTSDB's
    metric-UID + tag-UID concatenation) and aggregator='none' (no
    cross-series aggregation: every listed series passes through as
    its own output series). Three tsuids spanning TWO metrics — a
    filter query cannot express that at all — daily-summed per
    series. Oracle rebuilds the identical tsuid strings from the
    deterministic tag synthesis, so the hash pins the series-identity
    format, the exact-member selection, and the passthrough."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="",
        start=start,
        end=end,
        aggregator="none",
        downsample=Downsample("1d", "sum", fill="none"),
        tsuids=(
            "click|dc=click,env=prod,host=web0,rack=r0",
            "view|dc=view,env=prod,host=web0,rack=r0",
            "click|dc=click,env=prod,host=web3,rack=r0",
        ),
    )
    return api_query(pts, spec)


def _q_api_query_0all(spark, sf_dir):
    """OpenTSDB's whole-range downsample ('0all-avg'): ONE bucket
    spanning [start, end), anchored at the query START rather than
    the epoch grid, per host — the form dashboards use for
    single-number summaries. avg makes the ppm int64 quantization
    load-bearing over the largest possible window. The oracle
    recomputes the range anchor (min epoch of the stream, the same
    1-row probe _api_spec_range uses) and the whole-range per-host
    average direct from raw."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="avg",
        filters=(
            TagFilter("iwildcard", "host", "WEB*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("0all", "avg"),
    )
    return api_query(pts, spec)


def _q_api_query_gexp_moving(spark, sf_dir):
    """sumSeries(movingAverage(sum:1h-sum-zero:view{host=*,env=prod},
    3)) — the gexp windowed-transform + combiner family: each host's
    zero-filled hourly sums smoothed by the trailing-3 ppm mean
    (leading buckets average what exists, Graphite semantics), then
    every host collapsed into ONE series. Order is load-bearing:
    smoothing after the collapse would average a different stream.
    The oracle mirrors the trailing window (ROWS 2 PRECEDING) and the
    collapse literally."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_gexp,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("1h", "sum", fill="zero"),
    )
    return api_query_gexp(
        pts, spec, (("movingAverage", 3), ("sumSeries", None))
    )


def _q_api_query_dev(spark, sf_dir):
    """Cross-series aggregator 'dev' ([OTSDB-AGG]) through the
    composed endpoint: per rack, the population std-dev ACROSS that
    rack's host series of their daily view sums — the A13
    integer-power-sums rule lifted to stage 5 (the radicand
    n*Σv² − (Σv)² is exact int64 in both engines, one IEEE sqrt, ppm
    floor). groupBy rack because each rack carries 4 host series
    (user_id % 12 determines % 3), so the deviation is over a real
    population; groupBy host would degenerate to singletons."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="dev",
        filters=(
            TagFilter("regexp", "rack", "r.*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("1d", "sum", fill="none"),
    )
    return api_query(pts, spec)


def _q_api_query_p50(spark, sf_dir):
    """Cross-series percentile aggregator through the composed
    endpoint: per env, the MEDIAN (p500 in the repo's permille
    spelling of OpenTSDB's p50 family) of that env's ~12 host-series
    daily view sums — the A9 exact discrete-rank rule at stage 5
    (value at rank ceil(n*500/1000) of the sorted observed values,
    integer ceil, rank-based row_number + filter, never
    collect_list). The oracle runs the identical rank arithmetic, so
    the hash pins the rank formula, the tie semantics, and the
    skip-missing policy."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="p500",
        filters=(TagFilter("iwildcard", "env", "*", group_by=True),),
        downsample=Downsample("1d", "sum", fill="none"),
    )
    return api_query(pts, spec)


def _q_api_query_gexp_combine(spark, sf_dir):
    """The gexp combiner family in one gate row, labeled by leg:
    'diff' = diffSeries over the zero-filled hourly host sums (first
    series by identity ascending — web0 — minus the sum of the other
    eleven; exact int64), 'ratio' = divideSeries of exactly two hosts
    (web2/web7 ppm integer ratio; buckets where the divisor is
    missing or zero emit NULL, not an ANSI throw). The oracle
    recomputes both legs direct from raw and unions them under the
    same labels, so the hash pins the first-series ordering rule, the
    rest-sum, the binary-ratio arithmetic, and the NULL edges."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_gexp,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    diff_spec = QuerySpec(
        metric="view",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("iwildcard", "host", "*", group_by=True),
            TagFilter("literal_or", "env", "prod"),
        ),
        downsample=Downsample("1h", "sum", fill="zero"),
    )
    diff = api_query_gexp(pts, diff_spec, (("diffSeries", None),))
    ratio_spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("literal_or", "host", "web2|web7", group_by=True),
        ),
        downsample=Downsample("1h", "sum", fill="none"),
    )
    ratio = api_query_gexp(pts, ratio_spec, (("divideSeries", None),))
    return diff.select(F.lit("diff").alias("fn"), "w_start", "value").unionAll(
        ratio.select(F.lit("ratio").alias("fn"), "w_start", "value")
    )


def _q_api_query_first_last(spark, sf_dir):
    """first/last downsamplers through the composed endpoint
    ([OTSDB-AGG]: the order-dependent, downsample-only aggregators)
    under the multi-request envelope: q0 = click per-series 2h-FIRST
    -> cross-series sum per host; q1 = view per-series 1d-LAST ->
    cross-series min per rack. Neither is answerable from a
    sum/count/min/max tier, so both take the raw path (tier routing
    refuses them — pytest pins the refusal). The selection key is the
    exact int64 (microseconds, value) pair; the oracle reproduces it
    with row_number over (epoch_us, value) asc / desc, so the hash
    pins the tie rule and the µs resolution, not just the happy
    path. One mergeable min_by/max_by aggregate per sub-query — no
    window sort, partial aggregation still collapses map-side."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_multi,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    specs = {
        "q0": QuerySpec(
            metric="click",
            start=start,
            end=end,
            aggregator="sum",
            filters=(
                TagFilter("iwildcard", "host", "WEB*", group_by=True),
                TagFilter("literal_or", "env", "prod"),
            ),
            downsample=Downsample("7200s", "first", fill="none"),
        ),
        "q1": QuerySpec(
            metric="view",
            start=start,
            end=end,
            aggregator="min",
            filters=(
                TagFilter("regexp", "rack", "r[0-2]", group_by=True),
                TagFilter("literal_or", "env", "prod|dev"),
            ),
            downsample=Downsample("1d", "last", fill="none"),
        ),
    }
    return api_query_multi(pts, specs)


def _q_api_query_gexp_multiply(spark, sf_dir):
    """gexp multiplySeries — the last function of the official
    [OTSDB-EXP] gexp set: per-rack daily click totals (per-series
    1d-count downsample, cross-series sum per rack) collapsed to ONE
    series as the exact int64 product of the three rack series per
    bucket. count-downsampled inputs keep the product far inside
    int64 (the dev-radicand domain rule). The oracle folds the same
    per-bucket value list with list_reduce, so a hash match pins the
    skip-missing policy and the exact integer product — a
    float-product (exp-sum-of-logs) implementation would drift."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_gexp,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)
    spec = QuerySpec(
        metric="click",
        start=start,
        end=end,
        aggregator="sum",
        filters=(
            TagFilter("regexp", "rack", "r[0-2]", group_by=True),
            TagFilter("literal_or", "env", "prod|dev"),
        ),
        downsample=Downsample("1d", "count", fill="none"),
    )
    return api_query_gexp(pts, spec, (("multiplySeries", None),))


def _q_api_query_ep(spark, sf_dir):
    """Estimated-percentile cross-series aggregators (OpenTSDB 2.4
    ep<pct>r<3|7> — the Commons Math R_3/R_7 estimation rules) under
    the multi envelope: q0 = hourly per-rack ep95r7 (the Excel/NumPy
    linear rule — ppm-quantized exact-int64 lerp between bracketing
    order statistics), q1 = daily per-rack ep50r3 (H&F type 3 —
    order-statistic selection with the ties-to-even index rule,
    numpy/R-verified). Rack groups carry up to 8 (host, env) series
    per bucket, so both the interpolated and the tie branch are
    load-bearing. The oracle reproduces the identical integer index
    arithmetic (floor-div j, permille fraction, clamp), so a hash
    match pins both estimation rules bit-for-bit — with these, every
    aggregator on the documented OpenTSDB list is implemented."""
    from opentsdb_rollup_rust_spark.plans.api_query import (
        Downsample,
        QuerySpec,
        api_query_multi,
    )

    pts, start, end = _api_spec_range(spark, sf_dir)

    def sub(metric, agg, interval):
        return QuerySpec(
            metric=metric,
            start=start,
            end=end,
            aggregator=agg,
            filters=(
                TagFilter("regexp", "rack", "r[0-2]", group_by=True),
                TagFilter("literal_or", "env", "prod|dev"),
            ),
            downsample=Downsample(interval, "sum", fill="none"),
        )

    return api_query_multi(
        pts,
        {
            "q0": sub("click", "ep95r7", "1h"),
            "q1": sub("view", "ep50r3", "1d"),
        },
    )


def _q_api_query_delete_read(spark, sf_dir):
    """The /api/query DELETE flag composed over the snapshot store
    ([OTSDB-API]: HTTP DELETE removes every data point MATCHING the
    query): the tagged stream is written through ManifestStore, then
    api_query_delete drops prod web1/web3 clicks in the MIDDLE THIRD
    of the range (replace_range under a series predicate —
    metadata-first file pruning, keep-filter one codegen'd predicate,
    atomic manifest swap), and the result is the surviving table's
    daily per-(series, host) sum/count read back FROM THE STORE. The
    oracle recomputes the survivors direct from raw with the identical
    NOT(match AND in-range) predicate and integer third-split, so a
    hash match proves exactly the right rows died: matching-but-
    outside-range and in-range-but-not-matching rows must all
    survive, byte-for-byte."""
    import tempfile

    from opentsdb_rollup_rust_spark.plans.api_query import (
        QuerySpec,
        api_query_delete,
    )
    from opentsdb_rollup_rust_spark.sources.store import ManifestStore

    pts, lo, end = _api_spec_range(spark, sf_dir)
    t0 = lo + (end - lo) // 3
    t1 = lo + 2 * ((end - lo) // 3)
    store = ManifestStore(
        spark, tempfile.mkdtemp(prefix="spark_graft_api_delete_")
    )
    # the stored-identity helper columns are a READ-side contract; the
    # persisted table keeps the r5 4-column schema (writing them would
    # only grow the store round-trip this demo times). Time-clustered
    # layout (r6, guide §6.3): range-partition + sort by ts so parquet
    # footers carry tight disjoint [min, max] ranges — replace_range's
    # metadata-first pruning then carries the out-of-range files over
    # untouched and the keep-scan's pushed range predicate skips them
    # at scan time, instead of rewriting every file (random-ts layout
    # makes every file straddle the delete range). SCALE-ADAPTIVE:
    # file count targets ~2M source events per file, derived free from
    # the parquet footers — at gate scale that is ONE file (identical
    # to the r5 layout + an in-task sort; a fixed 32-way split was
    # measured +0.2 s here, all shuffle + tiny-file overhead), while
    # bigger inputs get real range-clustered files for the delete to
    # prune against. Identical rows stored; only layout changes.
    n_rows = _events_rowcount_from_footers(sf_dir)
    n_files = max(1, min(64, (n_rows or 0) // 2_000_000 + 1))
    base = pts.select("series_id", "ts", "value", "tags")
    if n_files > 1:
        base = base.repartitionByRange(n_files, F.col("ts"))
    store.append("api_pts", base.sortWithinPartitions("ts"))
    spec = QuerySpec(
        metric="click",
        start=t0,
        end=t1,
        filters=(
            TagFilter("literal_or", "host", "web1|web3"),
            TagFilter("literal_or", "env", "prod"),
        ),
    )
    api_query_delete(store, "api_pts", spec)
    rem = store.read("api_pts")
    return rem.groupBy(
        "series_id",
        F.element_at("tags", F.lit("host")).alias("host"),
        (F.floor(F.unix_timestamp("ts") / 86400).cast("long") * 86400).alias(
            "w_start"
        ),
    ).agg(
        F.sum("value").cast("long").alias("sum_v"),
        F.count("*").alias("cnt"),
    )


def _parquet_data_sig(src: str) -> str:
    """Cache-key fingerprint of a parquet dataset: md5 over the sorted
    per-file (path, mtime, size) list — robust to in-place rewrites
    that keep file names (directory st_mtime/st_size are not). Shared
    by every local demo cache (_chunk_table, the tag store)."""
    import hashlib

    paths = (
        sorted(
            os.path.join(src, p)
            for p in os.listdir(src)
            if p.endswith(".parquet")
        )
        if os.path.isdir(src)
        else [src]
    )
    return hashlib.md5(
        "|".join(
            f"{p}:{os.path.getmtime(p):.0f}:{os.path.getsize(p)}"
            for p in paths
        ).encode()
    ).hexdigest()[:10]


def _q_tag_read_pruned(spark, sf_dir):
    """P6b: the STORAGE half of the tag-query scale story. A map-typed
    tag predicate can never reach a parquet footer, so at 100 TB the
    hot group-by tagks must be storage dimensions: the tagged stream
    is written PARTITIONED BY dc (Hive-style directory layout, the
    columnar analogue of OpenTSDB prefixing row keys with the tag
    UID), with the remaining tags kept as a map column. The dc filter
    of the /api/query then prunes whole directories at planning time
    (PartitionFilters in the scan — pinned by
    tests/test_plans.py::test_tag_read_partition_pruned) and only the
    map-residual filters evaluate per row. Same result as the
    all-in-memory query_tag_filters family; the oracle computes
    direct from the raw events, so the hash match proves the
    partitioned round trip loses nothing."""
    import tempfile

    base = os.environ.get("SPARK_GRAFT_TAGSTORE", None)
    if base is None:
        # fold the source data's identity into the cache key so a
        # regenerated testdata dir can't serve a stale layout (the
        # r3-ADVICE chunk-cache bug class). Per-FILE mtime+size (the
        # _chunk_table fingerprint, r4 ADVICE): a directory's own
        # st_mtime only changes on entry add/remove, so an in-place
        # rewrite keeping the same file names would alias the key.
        key = _parquet_data_sig(os.path.join(sf_dir, "events.parquet"))
        base = f"/tmp/spark_graft_tagstore_{key}"
    read_path = base
    if not os.path.isdir(base):
        tmp = tempfile.mkdtemp(prefix="tagstore_build_")
        _tagged_points(spark, sf_dir).withColumn(
            "dc", F.element_at(F.col("tags"), F.lit("dc"))
        ).write.partitionBy("dc").mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, base)
        except OSError:
            # concurrent builder won the rename (theirs is equal) — or
            # the rename failed outright (e.g. cross-device /tmp): fall
            # back to reading our own tmp build rather than erroring on
            # a missing base (r4 ADVICE)
            if not os.path.isdir(base):
                read_path = tmp
    stored = spark.read.parquet(read_path)
    pred = compile_tag_filter(
        F.col("tags"), TagFilter("iwildcard", "host", "WEB1*")
    ) & F.col("dc").isin("click", "view")
    narrow = stored.where(pred).select(
        F.element_at(F.col("tags"), F.lit("host")).alias("host"),
        (
            F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
            * F.lit(86400)
        ).alias("w_start"),
        "value",
    )
    return narrow.groupBy("host", "w_start").agg(
        F.sum("value").alias("sum"),
        F.count("value").alias("count"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    )


def _q_route_read_spliced(spark, sf_dir):
    """P5b — REAL-TIME continuous-aggregate read: the 1h tier is
    materialized only up to a watermark; the 2h query is answered by
    splicing tier rows (< watermark) with an on-the-fly 1h rollup of
    raw points (>= watermark) at FINE granularity, then re-aggregating
    to 2h. The watermark is deliberately an ODD multiple of 3600, so
    one 2h output window straddles it — its cold half comes from the
    tier and its hot half from raw, and the hash match against the
    direct-from-raw oracle proves the splice recombines it exactly.
    The watermark probe is a 1-row min/max aggregate (not a data
    collect)."""
    from opentsdb_rollup_rust_spark.plans.tier_router import (
        realtime_read_pipeline,
    )

    pts = _event_points(spark, sf_dir)
    lo, hi = (
        pts.agg(
            F.min(F.unix_timestamp("ts")).alias("lo"),
            F.max(F.unix_timestamp("ts")).alias("hi"),
        ).first()
    )
    wm = ((lo + hi) // 2) // 7200 * 7200 + 3600
    tier_1h = cascade_reagg(tumbling_rollup(pts, "1m"), "1h").where(
        F.col("window_start") < F.timestamp_seconds(F.lit(wm))
    )
    out = realtime_read_pipeline(
        tier_1h, pts, "1h", 7200, wm, fill="zero", with_avg=True
    )
    return out.select(
        "series_id", _epoch(), "sum", "count", "min", "max", "avg"
    )


def _q_gapfill_zero(spark, sf_dir):
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    return _rollup_out(gap_fill(r1h, "1h", "zero"))


def _q_gapfill_ffill(spark, sf_dir):
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    return gap_fill(r1h, "1h", "ffill").select("series_id", _epoch(), "sum")


def _q_gapfill_interp(spark, sf_dir):
    # J2b/W7: OpenTSDB "lerp" fill — integer floor-division lerp between
    # the bracketing observed windows (operators/gapfill.py policy
    # "interp"); exact in both engines, no float division anywhere.
    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    return _rollup_out(gap_fill(r1h, "1h", "interp"))


def _q_rollup_cal_week(spark, sf_dir):
    # A17: calendar-aligned downsample (OpenTSDB '1wc') cascaded
    # 1m -> 1h -> 1d -> ISO week; oracle computes direct from raw, so
    # the hash match proves cascade == direct over NON-uniform windows.
    from opentsdb_rollup_rust_spark.operators.rollup import calendar_rollup

    r1d = cascade_reagg(
        cascade_reagg(tumbling_rollup(_event_points(spark, sf_dir), "1m"), "1h"),
        "1d",
    )
    return _rollup_out(calendar_rollup(r1d, "week"))


def _q_rollup_cal_day_tz(spark, sf_dir):
    """A17b: timezone-aligned calendar-day downsample (OpenTSDB 2.3
    downsample timezone option), cascaded 1m -> 1h -> America/New_York
    local days. The oracle computes direct from raw via DuckDB's ICU
    timezone math, so a hash match proves BOTH engines agree on the
    tz boundary placement AND that the cascade is exact; the DST
    non-uniform-day behavior (23 h / 25 h) is pinned separately in
    pytest — the gate's January window has no transition."""
    from opentsdb_rollup_rust_spark.operators.rollup import calendar_rollup_tz

    r1h = cascade_reagg(
        tumbling_rollup(_event_points(spark, sf_dir), "1m"), "1h"
    )
    return calendar_rollup_tz(r1h, "America/New_York").select(
        "series_id", "w_start", "interval", "sum", "count", "min", "max"
    )


def _q_set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return c.unionByName(s).distinct()


def _q_set_except(spark, sf_dir):
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").cast("int").alias("nationkey"))
        .distinct()
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
        .distinct()
    )
    return c.exceptAll(s)


def _q_set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return c.intersect(s)


def _q_sort_global(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "o_orderstatus")
    )


def _q_sort_limit(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def _q_scan_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate", "l_extendedprice"
    )
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
    )


def _q_fn_bucket(spark, sf_dir):
    from opentsdb_rollup_rust_spark.functions.timeutil import time_bucket_epoch

    pts = _event_points(spark, sf_dir)
    return (
        pts.select(time_bucket_epoch("ts", 300).alias("bucket5m"))
        .groupBy("bucket5m")
        .agg(F.count("*").alias("n"))
    )


def _q_fn_hash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(md5_bucket(F.col("doc_id").cast("string"), 16).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def _q_fn_array(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    arr = F.sequence(F.lit(1), (F.pmod(F.col("n_chars"), F.lit(8)) + 1).cast("int"))
    stats = d.select(
        "doc_id",
        F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")).alias(
            "arr_sum"
        ),
        F.array_min(arr).cast("long").alias("arr_min"),
        F.array_max(arr).cast("long").alias("arr_max"),
        F.element_at(arr, 1).cast("long").alias("arr_first"),
        F.element_at(arr, -1).cast("long").alias("arr_last"),
        F.size(arr).cast("long").alias("arr_len"),
    )
    return stats


def _q_fn_invariant(spark, sf_dir):
    e1 = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e2 = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("vid2"), F.col("embedding").alias("emb2")
    )
    j = e1.join(e2, e1.vec_id == e2.vid2)
    return j.select(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("embedding") == F.col("emb2"), 1).otherwise(0)).alias(
            "n_equal"
        ),
    )


def _q_fn_string(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("tagged"),
        F.substring_index(F.col("c_name"), "#", -1).alias("name_num"),
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.length(F.col("c_name")).alias("name_len"),
    )


def _q_fn_json(spark, sf_dir):
    # r6 note: staging the parsed value was A/B'd and is a no-op here —
    # Spark deduplicates identical aggregate input expressions, so the
    # JSON is already parsed once per row (2.33 s direct vs 2.34 s
    # staged at sf1.0; the parse alone is 2.17 s). Left as-is.
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.count(k).alias("k_count"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


def _q_fn_math(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_abs"),
        F.floor(F.col("l_extendedprice")).alias("price_floor"),
        F.pmod(F.col("l_partkey"), F.lit(7)).alias("part_mod"),
    )


def _q_fn_map(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return (
        ev.select(
            F.element_at(m, "type").alias("mtype"),
            F.element_at(m, "uid").alias("muid"),
        )
        .groupBy("mtype")
        .agg(F.countDistinct("muid").alias("n_users"))
    )


def _q_codec_roundtrip(spark, sf_dir):
    """Gorilla encode -> decode -> re-aggregate; the oracle computes the
    same rollup directly in SQL, so a value match proves the codec
    round-trips bit-exactly on real data."""
    from opentsdb_rollup_rust_spark.codec.gorilla import decode_chunks, encode_chunks

    r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    decoded = decode_chunks(encode_chunks(r1h, "1h"))
    back = (
        decoded.groupBy("series_id", "window_start")
        .pivot("agg", ["sum", "count", "min", "max"])
        .agg(F.first("value"))
    )
    return back.select(
        "series_id", _epoch(), F.lit("1h").alias("interval"),
        "sum", "count", "min", "max",
    )


#: [t0, t1) for the pruned-read demo — Jan 10 .. Jan 20 UTC, the
#: middle third of the events table's fixed 30-day span, so with
#: 64-window chunks (~2.7 days at 1h) most chunks are pruned unread.
_PRUNE_T0, _PRUNE_T1 = 1704844800, 1705708800


def _chunk_table(spark, sf_dir, chunk_points: int) -> DataFrame:
    """The 1h-tier Gorilla chunk TABLE for the read-path demos — what
    S5 persists in the real job. Materialized to a local cache dir
    keyed by a fingerprint of the codec source (stale-proof across
    code changes), so codec_stats / codec_pruned_read measure their
    actual operator — scanning + pruning + decoding a chunk table —
    rather than re-paying the encode on every call (r2 VERDICT: 'the
    encode dominates the timing')."""
    import hashlib
    import os

    import opentsdb_rollup_rust_spark.codec.gorilla as G
    from opentsdb_rollup_rust_spark.codec.gorilla import encode_chunks

    with open(G.__file__, "rb") as f:
        fp = hashlib.md5(f.read()).hexdigest()[:10]
    # Fold the SOURCE DATA into the key too (per-file mtime+size of
    # every events parquet): regenerated testdata at the same path must
    # not serve a stale chunk table (ADVICE r3 — stale cache reads as
    # wrong bench timings / spurious gate mismatches).
    data_sig = _parquet_data_sig(os.path.join(sf_dir, "events.parquet"))
    path = (
        f"/tmp/spark_graft_cache/chunks_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_1h_c{chunk_points}_{fp}_{data_sig}.parquet"
    )
    if not os.path.exists(path):
        r1h = tumbling_rollup(_event_points(spark, sf_dir), "1h")
        encode_chunks(r1h, "1h", chunk_points=chunk_points).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def _q_codec_pruned_read(spark, sf_dir):
    """C2/C4 read path with chunk pruning: answer a 10-day range query
    over the 1h chunk table (64-point chunks) by dropping whole chunks
    on chunk_start metadata BEFORE decode (footer-pushable filter) +
    exact residual filter after. The oracle computes the range rollup
    directly from raw, so a value match proves pruning loses nothing
    at either chunk edge."""
    from opentsdb_rollup_rust_spark.codec.gorilla import pruned_read

    chunks = _chunk_table(spark, sf_dir, chunk_points=64)
    dec = pruned_read(chunks, _PRUNE_T0, _PRUNE_T1, chunk_points=64)
    back = (
        dec.groupBy("series_id", "window_start")
        .pivot("agg", ["sum", "count", "min", "max"])
        .agg(F.first("value"))
    )
    return back.select(
        "series_id", _epoch(), F.lit("1h").alias("interval"),
        "sum", "count", "min", "max",
    )


def _q_codec_stats(spark, sf_dir):
    from opentsdb_rollup_rust_spark.codec.gorilla import compression_stats

    return compression_stats(_chunk_table(spark, sf_dir, chunk_points=4096))


def _q_codec_check(spark, sf_dir):
    """C1/C2/C3 as gate-checked INVARIANTS (r3 VERDICT task #2 applied
    to the codec, the same move that greened the HLL sketch): DuckDB
    cannot reproduce Gorilla bitstreams, but it can verify what they
    must preserve. Per agg kind the Spark side emits
      - points: total points across the 1h chunk table (sum of chunk
        n) — must equal the direct 1h rollup's row count, proving the
        chunk table covers every (series, window) exactly once;
      - mismatch_rows: full-outer compare of decode(encode(tier))
        against the directly-computed rollup — any missing, extra, or
        value-different row counts here (always 0);
      - bpp_ok: bytes/point in (0, 16] — 2x the uncompressed 8B word
        as the sanity ceiling, catching a codec that 'roundtrips' by
        storing raw.
    The oracle computes the same grid from raw with literal
    0/true, so a hash match proves the lossless-roundtrip, coverage,
    and compression-sanity invariants under the driver gate."""
    from opentsdb_rollup_rust_spark.codec.gorilla import (
        compression_stats,
        decode_chunks,
    )

    chunks = _chunk_table(spark, sf_dir, chunk_points=4096)
    decoded = decode_chunks(chunks)
    direct = tumbling_rollup(_event_points(spark, sf_dir), "1h")
    d_long = direct.select(
        "series_id",
        "window_start",
        F.stack(
            F.lit(4),
            F.lit("sum"), F.col("sum"),
            F.lit("count"), F.col("count"),
            F.lit("min"), F.col("min"),
            F.lit("max"), F.col("max"),
        ).alias("agg", "dval"),
    )
    j = decoded.join(
        d_long, ["series_id", "window_start", "agg"], "full_outer"
    )
    mism = (
        j.where(
            F.col("value").isNull()
            | F.col("dval").isNull()
            | (F.col("value") != F.col("dval"))
        )
        .groupBy("agg")
        .agg(F.count("*").alias("mismatch_rows"))
    )
    stats = compression_stats(chunks).select(
        "agg",
        F.col("points").cast("long").alias("points"),
        (
            (F.col("bytes_per_point") > 0) & (F.col("bytes_per_point") <= 16)
        ).alias("bpp_ok"),
    )
    return stats.join(mism, "agg", "left").select(
        "agg",
        "points",
        F.coalesce(F.col("mismatch_rows"), F.lit(0)).cast("long").alias(
            "mismatch_rows"
        ),
        "bpp_ok",
    )


def _q_udaf_hist(spark, sf_dir):
    """A10: grouped-map pandas UDAF — per-source histogram of document
    lengths (bucket = 200 chars). Two-phase since r3: the histogram
    counts collapse JVM-side (partial-agg'd groupBy — the scan never
    reaches Python), and the grouped-map runs over the PRE-AGGREGATED
    (source, bucket, n) rows, so each pandas group is bounded by
    |buckets|, not |rows|. Round-2's single-phase form materialized an
    entire source's rows in one pandas frame — parallelism = |sources|
    and an executor OOM at 100 TB (r2 VERDICT "What's wrong" #3). The
    oracle reproduces the result in SQL, so the Arrow grouped-map path
    itself stays value-checked."""
    import pandas as pd

    pre = (
        _t(spark, sf_dir, "documents")
        .groupBy(
            "source",
            F.floor(F.col("n_chars") / F.lit(200)).cast("long").alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        # bounded by |buckets| rows per source; the pandas stage is the
        # A10 demo surface (merge partial histograms, order buckets)
        out = (
            pdf.groupby("bucket", as_index=False)["n"].sum().sort_values("bucket")
        )
        out.insert(0, "source", pdf["source"].iloc[0])
        return out[["source", "bucket", "n"]]

    return pre.groupBy("source").applyInPandas(
        finish, "source string, bucket long, n long"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opentsdb_rollup_rust_spark.pipeline.queries import PIPELINE_QUERIES

    qs = {
        "rollup_1m": _q_rollup_1m,
        "rollup_1h": _q_rollup_1h,
        "rollup_1d": _q_rollup_1d,
        "hist_rollup": _q_hist_rollup,
        "hist_percentile": _q_hist_percentile,
        "agg_distinct_sketch": _q_agg_distinct_sketch,
        "avg_derived": _q_avg_derived,
        "preagg_source": _q_preagg_source,
        "agg_salted": _q_agg_salted,
        "agg_distinct": _q_agg_distinct,
        "agg_first_last": _q_agg_first_last,
        "agg_dev": _q_agg_dev,
        "agg_interp": _q_agg_interp,
        "agg_zimsum": _q_agg_zimsum,
        "expr_ratio": _q_expr_ratio,
        "agg_percentile": _q_agg_percentile,
        "agg_rollup_sets": _q_agg_rollup_sets,
        "derive_points": _q_derive_points,
        "dedup_seq_exact": _q_dedup_seq_exact,
        "rollup_fused": _q_rollup_fused,
        "pack_materialize": _q_pack_materialize,
        "tok_topk": _q_tok_topk,
        "tok_coverage": _q_tok_coverage,
        "win_topk": _q_win_topk,
        "win_delta": _q_win_delta,
        "win_rate": _q_win_rate,
        "win_rate_wrap": _q_win_rate_wrap,
        "win_rate_drop": _q_win_rate_drop,
        "api_query_ds_rate": _q_api_query_ds_rate,
        "api_query_group_avg": _q_api_query_group_avg,
        "api_query_tier": _q_api_query_tier,
        "api_query_exp": _q_api_query_exp,
        "api_query_multi": _q_api_query_multi,
        "api_query_p95": _q_api_query_p95,
        "api_query_shift": _q_api_query_shift,
        "api_query_gexp": _q_api_query_gexp,
        "api_query_fallback": _q_api_query_fallback,
        "api_query_linear": _q_api_query_linear,
        "api_query_hist": _q_api_query_hist,
        "api_query_hist_tier": _q_api_query_hist_tier,
        "api_query_json": _q_api_query_json,
        "api_query_qs": _q_api_query_qs,
        "api_query_tier_multi": _q_api_query_tier_multi,
        "api_query_tsuid_none": _q_api_query_tsuid_none,
        "api_query_0all": _q_api_query_0all,
        "api_query_gexp_moving": _q_api_query_gexp_moving,
        "api_query_dev": _q_api_query_dev,
        "api_query_p50": _q_api_query_p50,
        "api_query_gexp_combine": _q_api_query_gexp_combine,
        "api_query_first_last": _q_api_query_first_last,
        "api_query_gexp_multiply": _q_api_query_gexp_multiply,
        "api_query_delete_read": _q_api_query_delete_read,
        "api_query_ep": _q_api_query_ep,
        "query_tag_filters": _q_query_tag_filters,
        "query_tag_filters_not": _q_query_tag_filters_not,
        "suggest_names": _q_suggest,
        "uid_encode": _q_uid_encode,
        "split_assign": _q_split_assign,
        "lookup_series": _q_lookup_series,
        "annotation_overlay": _q_annotation_overlay,
        "shard_order": _q_shard_order,
        "query_last": _q_query_last,
        "tok_pair_topk": _q_tok_pair_topk,
        "query_explicit_tags": _q_query_explicit_tags,
        "tag_read_pruned": _q_tag_read_pruned,
        "win_moving": _q_win_moving,
        "win_rank": _q_win_rank,
        "filter_range": _q_filter_range,
        "filter_retention": _q_filter_retention,
        "filter_series": _q_filter_series,
        "join_broadcast": _q_join_broadcast,
        "join_anti": _q_join_anti,
        "join_semi": _q_join_semi,
        "join_equi": _q_join_equi,
        "join_range": _q_join_range,
        "join_asof": _q_join_asof,
        "route_read": _q_route_read,
        "route_read_stored": _q_route_read_stored,
        "route_read_spliced": _q_route_read_spliced,
        "gapfill_zero": _q_gapfill_zero,
        "gapfill_ffill": _q_gapfill_ffill,
        "gapfill_interp": _q_gapfill_interp,
        "rollup_cal_week": _q_rollup_cal_week,
        "rollup_cal_day_tz": _q_rollup_cal_day_tz,
        "set_union": _q_set_union,
        "set_except": _q_set_except,
        "set_intersect": _q_set_intersect,
        "sort_global": _q_sort_global,
        "sort_limit": _q_sort_limit,
        "scan_project": _q_scan_project,
        "fn_bucket": _q_fn_bucket,
        "fn_hash": _q_fn_hash,
        "fn_array": _q_fn_array,
        "fn_invariant": _q_fn_invariant,
        "fn_string": _q_fn_string,
        "fn_json": _q_fn_json,
        "fn_math": _q_fn_math,
        "fn_map": _q_fn_map,
        "codec_roundtrip": _q_codec_roundtrip,
        "codec_pruned_read": _q_codec_pruned_read,
        "codec_stats": _q_codec_stats,
        "codec_check": _q_codec_check,
        "udaf_hist": _q_udaf_hist,
    }
    qs.update(PIPELINE_QUERIES)

    # The driver gate samples 50 of the registered queries preserving
    # dict order. Round-5 front, per the r4 VERDICT rotation policy:
    # first the keys NEW or CHANGED this round (they must land in
    # CORRECTNESS_r05), then every other key ordered OLDEST driver
    # evidence first (r1 keys, then r2, then r3 — the r4-green keys
    # rotate out; all keys are additionally re-verified locally each
    # round via scripts/check_oracle.py). The r3-evidence keys that
    # no longer fit the 50 slots are front-of-line for r06:
    # rollup_fused, tok_topk, win_delta, win_moving, win_rank,
    # win_rate, win_topk, and (displaced by this round's nineteen new
    # api_query keys) derive_points, filter_range, filter_retention,
    # filter_series, gapfill_ffill, gapfill_zero, join_anti,
    # join_broadcast, join_equi, join_range, join_semi, plus — after
    # the session-5 trio — agg_first_last, agg_interp, agg_percentile,
    # — after the session-6 trio — udaf_hist, agg_dev, agg_distinct,
    # and — after the session-7 additions — set_union, sort_global,
    # sort_limit, text_tokens. Session 9 (query_tag_filters_not)
    # shifts the boundary one more. Note codec_stats (oracle-less,
    # rows-only) did NOT consume one of r04's 50 oracle slots, so
    # counting oracled keys the 50-slot sample ends at set_except;
    # set_intersect onward is r06 front-of-line.
    front = [
        # new this round (the composed /api/query endpoint + the
        # session-2 additions: expression endpoint, multi-sub-query
        # request envelope, percentile downsampler; session-3:
        # timeShift, gexp selectors, rollupUsage fallback; session-5:
        # tsuid sub-queries + aggregator none, 0all whole-range
        # downsample, gexp movingAverage/sumSeries; session-6: dev /
        # p<permille> / mimmin/mimmax cross-series aggregators, gexp
        # diffSeries/divideSeries; session-7: first/last downsamplers,
        # gexp multiplySeries, the delete flag over the store, the
        # ep estimated-percentile aggregator family)
        # session-9: the last two documented TagVFilter types
        # (not_iliteral_or, not_key) over an optional-key tag stream,
        # and the GET query-string request form (parse_query_string)
        "api_query_qs",
        "query_tag_filters_not",
        "api_query_first_last",
        "api_query_gexp_multiply",
        "api_query_delete_read",
        "api_query_ep",
        "api_query_dev",
        "api_query_p50",
        "api_query_gexp_combine",
        "api_query_tsuid_none",
        "api_query_0all",
        "api_query_gexp_moving",
        "api_query_shift",
        "api_query_gexp",
        "api_query_fallback",
        "api_query_linear",
        "api_query_hist",
        "api_query_hist_tier",
        "api_query_json",
        "api_query_tier_multi",
        "pipeline_build",
        "api_query_ds_rate",
        "api_query_group_avg",
        "api_query_tier",
        "api_query_exp",
        "api_query_multi",
        "api_query_p95",
        # changed this round: minhash hot-bucket cap (engine+oracle,
        # also shared by the components oracle), ann_recall panel cap
        # + literal-TRUE floor oracle, asof struct-wrap, lane-parallel
        # decode (codec_roundtrip + codec_check both execute it)
        "dedup_minhash",
        "ann_recall",
        "dedup_components",
        "join_asof",
        "codec_roundtrip",
        "codec_check",
        # driver evidence from r1
        "dedup_exact",
        "dedup_jaccard",
        "dedup_simhash",
        "text_fingerprint",
        "text_langid",
        "text_quality",
        # driver evidence from r2
        "codec_pruned_read",
        "codec_stats",
        "fn_array",
        "fn_bucket",
        "fn_hash",
        "fn_invariant",
        "fn_json",
        "fn_map",
        "fn_math",
        "fn_string",
        "scan_project",
        "set_except",
        "set_intersect",
        "set_union",
        "sort_global",
        "sort_limit",
        "text_tokens",
        "udaf_hist",
        # driver evidence from r3
        "agg_dev",
        "agg_distinct",
        "agg_first_last",
        "agg_interp",
        "agg_percentile",
        "agg_rollup_sets",
        "agg_salted",
        "derive_points",
        "filter_range",
        "filter_retention",
        "filter_series",
        "gapfill_ffill",
        "gapfill_zero",
        "join_anti",
        "join_broadcast",
        "join_equi",
        "join_range",
        "join_semi",
    ]
    qs = {k: qs[k] for k in front} | {
        k: v for k, v in qs.items() if k not in front
    }

    def _pinned(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {k: _pinned(v) for k, v in qs.items()}


def _rollup_fused_sql() -> str:
    from opentsdb_rollup_rust_spark.config import (
        EPOCH_BASE_SECONDS,
        HORIZON_SECONDS,
        SERIES_SEP,
        TOKEN_STATS,
    )

    agg_cols = ",\n                   ".join(
        f"sum({s})::BIGINT AS s_{s}, min({s}) AS mn_{s}, max({s}) AS mx_{s}"
        for s in TOKEN_STATS
    )
    arms = "\n            UNION ALL ".join(
        f"SELECT source || '{SERIES_SEP}' || '{s}' AS series_id, w_start, "
        f"'1h' AS \"interval\", s_{s} AS \"sum\", cnt AS \"count\", "
        f"mn_{s} AS \"min\", mx_{s} AS \"max\" FROM agg"
        for s in TOKEN_STATS
    )
    return f"""
            WITH seqs AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            wide AS (
              SELECT source,
                     {EPOCH_BASE_SECONDS} + (('0x' || substr(md5(doc_id), 1, 15))::BIGINT % {HORIZON_SECONDS}) AS ts_sec,
                     len(tokens)::BIGINT AS n_tok,
                     list_sum(list_transform(tokens, x -> CAST(x AS BIGINT)))::BIGINT AS tok_sum,
                     list_min(tokens)::BIGINT AS tok_min,
                     list_max(tokens)::BIGINT AS tok_max,
                     tokens[1]::BIGINT AS tok_first,
                     tokens[-1]::BIGINT AS tok_last
              FROM seqs),
            agg AS (
              SELECT source, CAST(FLOOR(ts_sec/3600)*3600 AS BIGINT) AS w_start,
                   {agg_cols},
                   count(*)::BIGINT AS cnt
              FROM wide GROUP BY 1, 2)
            {arms}"""


_ROLLUP_FUSED_SQL = _rollup_fused_sql()


def _expr_ratio_sql() -> str:
    from opentsdb_rollup_rust_spark.config import (
        EPOCH_BASE_SECONDS,
        HORIZON_SECONDS,
    )

    return f"""
            WITH seqs AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            wide AS (
              SELECT source,
                     {EPOCH_BASE_SECONDS} + (('0x' || substr(md5(doc_id), 1, 15))::BIGINT % {HORIZON_SECONDS}) AS ts_sec,
                     list_aggregate(tokens, 'sum')::BIGINT AS tok_sum,
                     len(tokens)::BIGINT AS n_tok
              FROM seqs),
            g AS (SELECT source,
                         CAST(FLOOR(ts_sec/3600)*3600 AS BIGINT) AS w_start,
                         sum(tok_sum)::BIGINT AS sum_tok_sum,
                         sum(n_tok)::BIGINT AS sum_n_tok
                  FROM wide GROUP BY 1, 2)
            SELECT source, w_start, sum_tok_sum, sum_n_tok,
                   CAST(FLOOR((sum_tok_sum::DOUBLE / sum_n_tok::DOUBLE) * 1000000)
                        AS BIGINT) AS ratio_q
            FROM g"""


_EXPR_RATIO_SQL = _expr_ratio_sql()


def oracle_sql() -> dict[str, str]:
    from opentsdb_rollup_rust_spark.pipeline.queries import PIPELINE_ORACLE_SQL

    out = dict(PIPELINE_ORACLE_SQL)
    out.update({
        "pack_materialize": """
            WITH seqs AS (
              SELECT doc_id::BIGINT AS doc_id,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            d AS (SELECT doc_id, tokens, len(tokens)::BIGINT AS n_tok FROM seqs),
            o AS (SELECT doc_id, tokens, n_tok,
                         (sum(n_tok) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - n_tok)::BIGINT AS off
                  FROM d),
            s AS (SELECT doc_id, tokens, n_tok, off,
                         unnest(generate_series(off // 64, (off + n_tok - 1) // 64))
                           AS chunk_id
                  FROM o),
            spans AS (SELECT chunk_id::BIGINT AS chunk_id,
                             (greatest(off, chunk_id * 64) - chunk_id * 64)::BIGINT
                               AS chunk_pos,
                             tokens[(greatest(off, chunk_id * 64) - off + 1)::BIGINT
                                    : (least(off + n_tok, (chunk_id + 1) * 64) - off)::BIGINT]
                               AS piece
                      FROM s)
            SELECT chunk_id,
                   len(flatten(list(piece ORDER BY chunk_pos)))::BIGINT AS n_tok,
                   md5(array_to_string(flatten(list(piece ORDER BY chunk_pos)), ','))
                     AS tok_md5
            FROM spans GROUP BY chunk_id""",
        "tok_topk": """
            WITH seqs AS (
              SELECT source,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            c AS (SELECT source, unnest(tokens) AS tok FROM seqs),
            g AS (SELECT source, tok, count(*)::BIGINT AS cnt FROM c GROUP BY 1, 2),
            r AS (SELECT source, tok, cnt,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY cnt DESC, tok ASC) AS rank
                  FROM g)
            SELECT source, tok, cnt, rank FROM r WHERE rank <= 10""",
        "rollup_1m": _rollup_sql(60, "1m"),
        "rollup_1h": _rollup_sql(3600, "1h"),
        "rollup_1d": _rollup_sql(86400, "1d"),
        # direct-from-raw 1h histogram: a hash match against the Spark
        # side's 1m->1h cascade proves bucket counts re-aggregate exactly
        "hist_rollup": f"""{_PTS_CTE}
            SELECT series_id,
                   CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                   '1h' AS "interval",
                   (CASE WHEN value = 0 THEN 0
                         WHEN value > 0 THEN length(bin(value))
                         ELSE -1 END)::BIGINT AS bucket,
                   count(*)::BIGINT AS n
            FROM pts GROUP BY 1, 2, 4""",
        "hist_percentile": f"""{_PTS_CTE},
            h AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         (CASE WHEN value = 0 THEN 0
                               WHEN value > 0 THEN length(bin(value))
                               ELSE -1 END)::BIGINT AS bucket,
                         count(*)::BIGINT AS n
                  FROM pts GROUP BY 1, 2, 3),
            c AS (SELECT series_id, w_start, bucket, n,
                         sum(n) OVER (PARTITION BY series_id, w_start
                                      ORDER BY bucket
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum,
                         sum(n) OVER (PARTITION BY series_id, w_start)
                           AS total
                  FROM h)
            SELECT series_id, w_start, min(bucket) AS bucket,
                   (CASE WHEN min(bucket) < 0 THEN -1
                         WHEN min(bucket) = 0 THEN 0
                         ELSE ((1::BIGINT << (min(bucket) - 1)) - 1)
                              + (1::BIGINT << (min(bucket) - 1))
                    END)::BIGINT AS est_max,
                   min(total)::BIGINT AS total
            FROM c WHERE cum >= (total * 950 + 999) // 1000
            GROUP BY 1, 2""",
        "avg_derived": f"""{_PTS_CTE}
            SELECT series_id,
                   CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
                   (sum(value)::DOUBLE) / (count(value)::DOUBLE) AS avg
            FROM pts GROUP BY 1, 2""",
        "preagg_source": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS s, count(value)::BIGINT AS c,
                         min(value) AS mn, max(value) AS mx
                  FROM pts GROUP BY 1, 2)
            SELECT 'all' AS group_key, w_start,
                   sum(s)::BIGINT AS "sum", sum(c)::BIGINT AS "count",
                   min(mn) AS "min", max(mx) AS "max"
            FROM r GROUP BY 2""",
        "agg_salted": _rollup_sql(3600, "1h"),
        "agg_distinct": f"""{_PTS_CTE}
            SELECT CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS day_start,
                   count(DISTINCT series_id)::BIGINT AS n_series,
                   count(*)::BIGINT AS n_points
            FROM pts GROUP BY 1""",
        "agg_first_last": f"""{_PTS_CTE}
            SELECT series_id,
                   CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                   (min(struct_pack(ts := ts, value := value))).value AS first_val,
                   (max(struct_pack(ts := ts, value := value))).value AS last_val
            FROM pts GROUP BY 1, 2""",
        "rollup_fused": _ROLLUP_FUSED_SQL,
        "expr_ratio": _EXPR_RATIO_SQL,
        "derive_points": """
            WITH seqs AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents)
            SELECT doc_id, source,
                   len(tokens)::BIGINT AS n_tok,
                   list_sum(list_transform(tokens, x -> CAST(x AS BIGINT)))::BIGINT AS tok_sum,
                   list_min(tokens)::BIGINT AS tok_min,
                   list_max(tokens)::BIGINT AS tok_max,
                   tokens[1]::BIGINT AS tok_first,
                   tokens[-1]::BIGINT AS tok_last
            FROM seqs""",
        "agg_percentile": f"""{_PTS_CTE},
            g AS (SELECT series_id, list_sort(list(value)) AS vs,
                         count(*)::BIGINT AS n
                  FROM pts GROUP BY 1)
            SELECT series_id,
                   vs[CAST(ceil(n * 0.5) AS INT)] AS p50,
                   vs[CAST(ceil(n * 0.95) AS INT)] AS p95,
                   vs[CAST(ceil(n * 0.99) AS INT)] AS p99,
                   n
            FROM g""",
        "agg_rollup_sets": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(FLOOR(l_extendedprice*100) AS BIGINT))::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
        "win_topk": f"""{_PTS_CTE},
            c AS (SELECT series_id, count(*)::BIGINT AS cnt FROM pts GROUP BY 1),
            r AS (SELECT series_id, cnt,
                         row_number() OVER (ORDER BY cnt DESC, series_id) AS rank
                  FROM c)
            SELECT series_id, cnt, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3""",
        "win_delta": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS s
                  FROM pts GROUP BY 1, 2)
            SELECT series_id, w_start,
                   s - lag(s) OVER (PARTITION BY series_id ORDER BY w_start) AS delta_sum
            FROM r""",
        "agg_dev": f"""{_PTS_CTE}
            SELECT series_id,
                   CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                   count(*)::BIGINT AS n,
                   CAST(FLOOR(1000000 * (sqrt((count(*)::BIGINT * sum(value*value)::BIGINT
                              - sum(value)::BIGINT * sum(value)::BIGINT)::DOUBLE)
                        / count(*)::DOUBLE)) AS BIGINT) AS dev_q
            FROM pts GROUP BY 1, 2""",
        "agg_interp": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS v
                  FROM pts GROUP BY 1, 2),
            dense AS (SELECT s.series_id, g.w_start, r.v
                      FROM (SELECT DISTINCT series_id FROM r) s
                      CROSS JOIN (SELECT DISTINCT w_start FROM r) g
                      LEFT JOIN r ON r.series_id = s.series_id
                                 AND r.w_start = g.w_start),
            nb AS (SELECT series_id, w_start, v,
                          last_value(v IGNORE NULLS) OVER
                            (PARTITION BY series_id ORDER BY w_start
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                          last_value(CASE WHEN v IS NOT NULL THEN w_start END IGNORE NULLS) OVER
                            (PARTITION BY series_id ORDER BY w_start
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pw,
                          first_value(v IGNORE NULLS) OVER
                            (PARTITION BY series_id ORDER BY w_start
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                          first_value(CASE WHEN v IS NOT NULL THEN w_start END IGNORE NULLS) OVER
                            (PARTITION BY series_id ORDER BY w_start
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nw
                   FROM dense),
            iv AS (SELECT w_start,
                          CAST(FLOOR(1000 * (CASE WHEN v IS NOT NULL THEN v::DOUBLE
                                ELSE pv::DOUBLE + (nv - pv)::DOUBLE
                                     * ((w_start - pw)::DOUBLE / (nw - pw)::DOUBLE)
                                END)) AS BIGINT) AS iv_q
                   FROM nb)
            SELECT w_start, sum(iv_q)::BIGINT AS sum_q,
                   count(*)::BIGINT AS n_series
            FROM iv WHERE iv_q IS NOT NULL GROUP BY w_start""",
        "tok_coverage": """
            WITH seqs AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            c AS (SELECT source, unnest(tokens) AS tok FROM seqs),
            g AS (SELECT source, tok, count(*)::BIGINT AS cnt
                  FROM c GROUP BY 1, 2),
            rk AS (SELECT source, cnt,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY cnt DESC, tok ASC) AS rank
                   FROM g)
            SELECT source, sum(cnt)::BIGINT AS n_occ,
                   count(*)::BIGINT AS n_vocab,
                   (sum(CASE WHEN rank <= 10 THEN cnt ELSE 0 END) * 1000000
                    // sum(cnt))::BIGINT AS top10_ppm
            FROM rk GROUP BY 1""",
        "dedup_seq_exact": """
            WITH seqs AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            planted AS (
              SELECT doc_id, tokens FROM seqs
              UNION ALL
              SELECT doc_id + 10000000, tokens FROM seqs WHERE doc_id % 10 = 0)
            SELECT md5(array_to_string(tokens, ',')) AS seq_hash,
                   count(*)::BIGINT AS n_seqs, min(doc_id) AS keeper
            FROM planted GROUP BY 1 HAVING count(*) > 1""",
        "win_rate_wrap": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS s
                  FROM pts GROUP BY 1, 2),
            c AS (SELECT series_id, w_start,
                         (sum(s) OVER (PARTITION BY series_id ORDER BY w_start
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          % 1000000)::BIGINT AS counter
                  FROM r),
            d AS (SELECT series_id, w_start, counter,
                         counter - lag(counter) OVER
                           (PARTITION BY series_id ORDER BY w_start) AS delta,
                         (w_start - lag(w_start) OVER
                           (PARTITION BY series_id ORDER BY w_start))::DOUBLE AS dt
                  FROM c),
            e AS (SELECT series_id, w_start, counter, dt,
                         CASE WHEN delta < 0 THEN delta + 1000000
                              ELSE delta END AS corrected
                  FROM d)
            SELECT series_id, w_start, counter,
                   CAST(FLOOR(1000000 * CASE WHEN corrected > 500000 THEN 0.0
                                             ELSE corrected::DOUBLE / dt END)
                        AS BIGINT) AS rate_q
            FROM e""",
        "tag_read_pruned": f"""{_TAGGED_CTE}
            SELECT host,
                   CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
                   min(value) AS "min", max(value) AS "max"
            FROM tp
            WHERE lower(host) LIKE 'web1%' AND dc IN ('click', 'view')
            GROUP BY 1, 2""",
        "query_explicit_tags": """
            WITH tp AS (
              SELECT ts, CAST(FLOOR(value*1000) AS BIGINT) AS value,
                     'web' || CAST(user_id % 12 AS VARCHAR) AS host,
                     event_type AS dc,
                     CASE WHEN user_id % 4 = 0 THEN NULL
                          ELSE 'r' || CAST(user_id % 3 AS VARCHAR) END
                       AS rack
              FROM events)
            SELECT host,
                   CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
                   min(value) AS "min", max(value) AS "max",
                   (sum(value)::DOUBLE) / (count(value)::DOUBLE) AS avg
            FROM tp
            WHERE host LIKE 'web%' AND dc IN ('click', 'view')
              AND rack IS NULL
            GROUP BY 1, 2""",
        "query_last": f"""{_TAGGED_CTE},
            f AS (SELECT series_id, host,
                         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, value
                  FROM tp WHERE dc IN ('click', 'error')),
            m AS (SELECT series_id, host, max(sec) AS last_sec
                  FROM f GROUP BY 1, 2)
            SELECT f.series_id, f.host, m.last_sec,
                   max(f.value) AS last_value
            FROM f JOIN m ON f.series_id = m.series_id
                         AND f.host = m.host AND f.sec = m.last_sec
            GROUP BY 1, 2, 3""",
        "tok_pair_topk": """
            WITH seqs AS (
              SELECT list_transform(generate_series(0, CAST(n_chars % 8 AS INT)),
                       j -> CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' || j), 1, 15))::BIGINT % 997) AS INT))
                       AS tokens
              FROM documents),
            p AS (SELECT unnest(tokens[1:len(tokens)-1]) AS t1,
                         unnest(tokens[2:len(tokens)]) AS t2
                  FROM seqs WHERE len(tokens) >= 2)
            SELECT t1, t2, count(*)::BIGINT AS cnt
            FROM p GROUP BY 1, 2
            ORDER BY cnt DESC, t1, t2 LIMIT 20""",
        "lookup_series": f"""{_TAGGED_CTE}
            SELECT series_id AS metric, host, dc, rack, env,
                   count(*)::BIGINT AS n_points
            FROM tp
            WHERE host LIKE 'web%' AND dc IN ('click', 'error')
            GROUP BY 1, 2, 3, 4, 5""",
        "annotation_overlay": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                           AS w_start,
                         sum(value)::BIGINT AS s
                  FROM pts WHERE series_id = 'error' GROUP BY 1, 2),
            a AS (SELECT event_id AS ann_id,
                         CAST(FLOOR(epoch(ts)) AS BIGINT) AS a_start,
                         CAST(FLOOR(epoch(ts)) AS BIGINT) + 1800 AS a_end
                  FROM events
                  WHERE event_type = 'error' AND value > 4.5)
            SELECT r.series_id, r.w_start, r.s AS "sum",
                   count(a.ann_id)::BIGINT AS n_annotations,
                   min(a.ann_id) AS first_ann
            FROM r LEFT JOIN a
              ON a.a_start < r.w_start + 3600 AND a.a_end > r.w_start
            GROUP BY 1, 2, 3""",
        "shard_order": """
            WITH s AS (
              SELECT doc_id,
                     ('0x' || substr(md5('shard:v1:' ||
                        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM documents)
            SELECT doc_id, CAST(h % 8 AS INT) AS shard,
                   (row_number() OVER (PARTITION BY h % 8
                                       ORDER BY h, doc_id) - 1)::BIGINT
                     AS pos
            FROM s""",
        "uid_encode": f"""{_PTS_CTE},
            u AS (SELECT name,
                         (row_number() OVER (ORDER BY name) - 1)::BIGINT
                           AS uid
                  FROM (SELECT DISTINCT series_id AS name FROM pts)),
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT)
                           AS w_start,
                         sum(value)::BIGINT AS "sum",
                         count(value)::BIGINT AS "count"
                  FROM pts GROUP BY 1, 2)
            SELECT r.series_id, u.uid, r.w_start, r."sum", r."count"
            FROM r JOIN u ON r.series_id = u.name""",
        "split_assign": """
            WITH s AS (
              SELECT source, n_chars,
                     ('0x' || substr(md5('split:v1:' ||
                        CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
                       AS bucket
              FROM documents)
            SELECT source,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM s GROUP BY 1, 2""",
        "win_rate_drop": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS s
                  FROM pts GROUP BY 1, 2),
            c AS (SELECT series_id, w_start,
                         (sum(s) OVER (PARTITION BY series_id ORDER BY w_start
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          % 1000000)::BIGINT AS counter
                  FROM r),
            d AS (SELECT series_id, w_start, counter,
                         counter - lag(counter) OVER
                           (PARTITION BY series_id ORDER BY w_start) AS delta,
                         (w_start - lag(w_start) OVER
                           (PARTITION BY series_id ORDER BY w_start))::DOUBLE AS dt
                  FROM c)
            SELECT series_id, w_start, counter,
                   CAST(FLOOR(1000000 * (delta::DOUBLE / dt)) AS BIGINT)
                     AS rate_q
            FROM d WHERE delta >= 0""",
        # api_query composition oracles: the full /api/query pipeline
        # (filter -> groupBy -> per-series downsample -> fill ->
        # cross-series aggregate -> rate LAST) recomputed direct from
        # raw events. The series identity collapses to (host,rack,env)
        # because dc == the metric filter and those are the only other
        # tags in the demo stream.
        "api_query_ds_rate": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b
                    FROM tp),
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            sd AS (SELECT DISTINCT host, rack, env FROM ds),
            spine AS (SELECT sd.host, sd.rack, sd.env, gs.w_start
                      FROM sd CROSS JOIN (
                        SELECT unnest(generate_series(first_b, last_b, 3600))
                               AS w_start FROM rng) gs),
            filled AS (SELECT spine.host, spine.rack, spine.env,
                              spine.w_start, COALESCE(ds.v, 0)::BIGINT AS v
                       FROM spine LEFT JOIN ds
                         USING (host, rack, env, w_start)),
            g AS (SELECT host, w_start, sum(v)::BIGINT AS value
                  FROM filled GROUP BY 1, 2),
            r AS (SELECT host, w_start,
                         value - lag(value) OVER
                           (PARTITION BY host ORDER BY w_start) AS delta,
                         w_start - lag(w_start) OVER
                           (PARTITION BY host ORDER BY w_start) AS dt
                  FROM g)
            SELECT host, w_start,
                   CAST(FLOOR(delta::DOUBLE / dt::DOUBLE * 1000000) AS BIGINT)
                     AS value
            FROM r WHERE delta IS NOT NULL""",
        # tier-routed twin: the oracle is DIRECT FROM RAW at 2h, so a
        # hash match proves the 1h-tier factor-window route loses
        # nothing (range is 2h-aligned by construction: floor(min) /
        # ceil(max+1), mirrored here as floor(min)/floor(max) bucket
        # bounds)
        "api_query_tier": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/7200)*7200 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/7200)*7200 AS BIGINT) AS last_b
                    FROM tp),
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            sd AS (SELECT DISTINCT host, rack, env FROM ds),
            spine AS (SELECT sd.host, sd.rack, sd.env, gs.w_start
                      FROM sd CROSS JOIN (
                        SELECT unnest(generate_series(first_b, last_b, 7200))
                               AS w_start FROM rng) gs),
            filled AS (SELECT spine.host, spine.rack, spine.env,
                              spine.w_start, COALESCE(ds.v, 0)::BIGINT AS v
                       FROM spine LEFT JOIN ds
                         USING (host, rack, env, w_start)),
            g AS (SELECT host, w_start, sum(v)::BIGINT AS value
                  FROM filled GROUP BY 1, 2),
            r AS (SELECT host, w_start,
                         value - lag(value) OVER
                           (PARTITION BY host ORDER BY w_start) AS delta,
                         w_start - lag(w_start) OVER
                           (PARTITION BY host ORDER BY w_start) AS dt
                  FROM g)
            SELECT host, w_start,
                   CAST(FLOOR(delta::DOUBLE / dt::DOUBLE * 1000000) AS BIGINT)
                     AS value
            FROM r WHERE delta IS NOT NULL""",
        "api_query_group_avg": f"""{_TAGGED_CTE},
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'view'
                    AND lower(host) LIKE '%' AND dc IN ('view')
                    AND regexp_matches(rack, '^(?:r[0-2])$')
                    AND env IN ('prod', 'dev')),
            ds AS (SELECT host, rack, env, w_start,
                          ((sum(value) * 1000000) // count(value))::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4)
            SELECT host, w_start, max(v)::BIGINT AS value
            FROM ds GROUP BY 1, 2""",
        # /api/query/exp: both variable sub-pipelines (filter ->
        # per-series hourly sum -> zero-fill spine -> per-host sum)
        # recomputed direct from raw, joined on (host, bucket), ppm
        # ratio in pure integer arithmetic — a hash match pins
        # sub-query alignment + intersection join + expression eval
        "api_query_exp": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b
                    FROM tp),
            fa AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'click'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')),
            dsa AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM fa GROUP BY 1, 2, 3, 4),
            sda AS (SELECT DISTINCT host, rack, env FROM dsa),
            spa AS (SELECT sda.host, sda.rack, sda.env, gs.w_start
                    FROM sda CROSS JOIN (
                      SELECT unnest(generate_series(first_b, last_b, 3600))
                             AS w_start FROM rng) gs),
            fla AS (SELECT spa.host, spa.w_start,
                           COALESCE(dsa.v, 0)::BIGINT AS v
                    FROM spa LEFT JOIN dsa
                      USING (host, rack, env, w_start)),
            ga AS (SELECT host, w_start, sum(v)::BIGINT AS a
                   FROM fla GROUP BY 1, 2),
            fb AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'view'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')),
            dsb AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM fb GROUP BY 1, 2, 3, 4),
            sdb AS (SELECT DISTINCT host, rack, env FROM dsb),
            spb AS (SELECT sdb.host, sdb.rack, sdb.env, gs.w_start
                    FROM sdb CROSS JOIN (
                      SELECT unnest(generate_series(first_b, last_b, 3600))
                             AS w_start FROM rng) gs),
            flb AS (SELECT spb.host, spb.w_start,
                           COALESCE(dsb.v, 0)::BIGINT AS v
                    FROM spb LEFT JOIN dsb
                      USING (host, rack, env, w_start)),
            gb AS (SELECT host, w_start, sum(v)::BIGINT AS b
                   FROM flb GROUP BY 1, 2)
            SELECT ga.host, ga.w_start,
                   ((ga.a * 1000000) // (gb.b + 1))::BIGINT AS value
            FROM ga JOIN gb
              ON ga.host = gb.host AND ga.w_start = gb.w_start""",
        # multi-sub-query request envelope: both heterogeneous
        # sub-pipelines direct from raw, unioned under the canonical
        # sorted-k=v group_tags string
        "api_query_multi": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b
                    FROM tp),
            f0 AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'click'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')),
            ds0 AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM f0 GROUP BY 1, 2, 3, 4),
            sd0 AS (SELECT DISTINCT host, rack, env FROM ds0),
            sp0 AS (SELECT sd0.host, sd0.rack, sd0.env, gs.w_start
                    FROM sd0 CROSS JOIN (
                      SELECT unnest(generate_series(first_b, last_b, 3600))
                             AS w_start FROM rng) gs),
            fl0 AS (SELECT sp0.host, sp0.w_start,
                           COALESCE(ds0.v, 0)::BIGINT AS v
                    FROM sp0 LEFT JOIN ds0
                      USING (host, rack, env, w_start)),
            g0 AS (SELECT host, w_start, sum(v)::BIGINT AS value
                   FROM fl0 GROUP BY 1, 2),
            f1 AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'view'
                     AND regexp_matches(rack, '^(?:r[0-2])$')
                     AND env IN ('prod', 'dev')),
            ds1 AS (SELECT host, rack, env, w_start, max(value)::BIGINT AS v
                    FROM f1 GROUP BY 1, 2, 3, 4),
            g1 AS (SELECT rack, env, w_start, max(v)::BIGINT AS value
                   FROM ds1 GROUP BY 1, 2, 3)
            SELECT 'q0' AS query, 'host=' || host AS group_tags,
                   w_start, value
            FROM g0
            UNION ALL
            SELECT 'q1' AS query,
                   'env=' || env || ',rack=' || rack AS group_tags,
                   w_start, value
            FROM g1""",
        # percentile downsampler: the identical integer-ceil rank
        # selection ((n*950 + 999) // 1000 over the sorted window),
        # then cross-series max per host
        "api_query_p95": f"""{_TAGGED_CTE},
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod', 'dev')),
            r AS (SELECT host, rack, env, w_start, value,
                         row_number() OVER (PARTITION BY host, rack, env, w_start
                                            ORDER BY value) AS rn,
                         count(*) OVER (PARTITION BY host, rack, env, w_start)
                           AS n
                  FROM f),
            ds AS (SELECT host, rack, env, w_start, value::BIGINT AS v
                   FROM r WHERE rn = (n * 950 + 999) // 1000)
            SELECT host, w_start, max(v)::BIGINT AS value
            FROM ds GROUP BY 1, 2""",
        # timeShift: cur is the full-span hourly pipeline; prev is the
        # SAME pipeline with explicit shifted epoch bounds (the upper
        # bound excludes the last day of raw data — the lower bound
        # min-86400 excludes nothing and is omitted) and its buckets
        # re-aligned +86400 onto the request timeline, where they land
        # exactly on cur's spine (86400 is a multiple of 3600, so
        # floor((t-1d)/1h)*1h + 1d = floor(t/1h)*1h). Day-over-day
        # delta on the intersection join.
        "api_query_shift": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b,
                           CAST(max(epoch(ts)) + 1 - 86400 AS BIGINT) AS hi_p
                    FROM tp),
            fc AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'click'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')),
            dsc AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM fc GROUP BY 1, 2, 3, 4),
            sdc AS (SELECT DISTINCT host, rack, env FROM dsc),
            spc AS (SELECT sdc.host, sdc.rack, sdc.env, gs.w_start
                    FROM sdc CROSS JOIN (
                      SELECT unnest(generate_series(first_b, last_b, 3600))
                             AS w_start FROM rng) gs),
            flc AS (SELECT spc.host, spc.w_start,
                           COALESCE(dsc.v, 0)::BIGINT AS v
                    FROM spc LEFT JOIN dsc
                      USING (host, rack, env, w_start)),
            gc AS (SELECT host, w_start, sum(v)::BIGINT AS cur
                   FROM flc GROUP BY 1, 2),
            fp AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 + 86400 AS BIGINT)
                            AS w_start,
                          value
                   FROM tp, rng
                   WHERE series_id = 'click'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')
                     AND epoch(ts) < rng.hi_p),
            dsp AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM fp GROUP BY 1, 2, 3, 4),
            sdp AS (SELECT DISTINCT host, rack, env FROM dsp),
            spp AS (SELECT sdp.host, sdp.rack, sdp.env, gs.w_start
                    FROM sdp CROSS JOIN (
                      SELECT unnest(generate_series(first_b, last_b, 3600))
                             AS w_start FROM rng) gs),
            flp AS (SELECT spp.host, spp.w_start,
                           COALESCE(dsp.v, 0)::BIGINT AS v
                    FROM spp LEFT JOIN dsp
                      USING (host, rack, env, w_start)),
            gp AS (SELECT host, w_start, sum(v)::BIGINT AS prev
                   FROM flp GROUP BY 1, 2)
            SELECT gc.host, gc.w_start, (gc.cur - gp.prev)::BIGINT AS value
            FROM gc JOIN gp
              ON gc.host = gp.host AND gc.w_start = gp.w_start""",
        # gexp highestMax(scale(q, 2), 3): sum-downsample composed
        # with sum-aggregate collapses to one direct GROUP BY; scale
        # applies AFTER aggregation (Spark applies it to the api_query
        # output), ranking is (scaled max DESC, host ASC) — the
        # deterministic tie-break both engines share
        "api_query_gexp": f"""{_TAGGED_CTE},
            g AS (SELECT host,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         (sum(value) * 2)::BIGINT AS value
                  FROM tp
                  WHERE series_id = 'view'
                    AND lower(host) LIKE '%' AND env IN ('prod')
                  GROUP BY 1, 2),
            rk AS (SELECT host, max(value) AS m FROM g GROUP BY 1),
            win AS (SELECT host FROM rk ORDER BY m DESC, host ASC LIMIT 3)
            SELECT g.host, g.w_start, g.value
            FROM g JOIN win USING (host)""",
        # ROLLUP_FALLBACK tier walk: direct from raw at 3h — the
        # fallen-to 1h tier must lose nothing (per-series sums re-add)
        "api_query_tier_multi": f"""{_TAGGED_CTE},
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/10800)*10800 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4)
            SELECT host, w_start, max(v)::BIGINT AS value
            FROM ds GROUP BY 1, 2""",
        # cross-series dev: per rack, population std-dev across the
        # rack's host series of daily view sums — the A13 power-sums
        # rule verbatim (exact int64 radicand, one IEEE sqrt, ppm
        # floor), so a hash match pins the whole float expression
        "api_query_dev": f"""{_TAGGED_CTE},
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT)
                           AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'view'
                    AND regexp_matches(rack, '^(?:r.*)$')
                    AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4)
            SELECT rack, w_start,
                   CASE WHEN count(v) = 0 THEN NULL
                        ELSE CAST(FLOOR(1000000 *
                             (sqrt((count(v)::BIGINT * sum(v*v)::BIGINT
                                    - sum(v)::BIGINT * sum(v)::BIGINT)::DOUBLE)
                              / count(v)::DOUBLE)) AS BIGINT) END AS value
            FROM ds GROUP BY 1, 2""",
        # cross-series p500: the A9 discrete-rank rule at stage 5 —
        # value at rank ceil(n*500/1000) of each (env, day) bucket's
        # sorted per-series sums, integer rank arithmetic mirrored
        "api_query_p50": f"""{_TAGGED_CTE},
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT)
                           AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'view' AND lower(env) LIKE '%'),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            ranked AS (SELECT env, w_start, v,
                              row_number() OVER (PARTITION BY env, w_start
                                                 ORDER BY v) AS rn,
                              count(v) OVER (PARTITION BY env, w_start) AS n
                       FROM ds)
            SELECT env, w_start, v::BIGINT AS value
            FROM ranked WHERE rn = (n * 500 + 999) // 1000""",
        # gexp combiners, both legs under one hash: diff = min-host
        # series minus the sum of the rest over the zero-filled hourly
        # spine; ratio = web2/web7 ppm integer division with NULL on
        # missing/zero divisor buckets
        "api_query_gexp_combine": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b
                    FROM tp),
            fd AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'view'
                     AND lower(host) LIKE '%' AND env IN ('prod')),
            dsd AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM fd GROUP BY 1, 2, 3, 4),
            sdd AS (SELECT DISTINCT host, rack, env FROM dsd),
            spd AS (SELECT sdd.host, sdd.rack, sdd.env, gs.w_start
                    FROM sdd CROSS JOIN (
                      SELECT unnest(generate_series(first_b, last_b, 3600))
                             AS w_start FROM rng) gs),
            fld AS (SELECT spd.host, spd.w_start,
                           COALESCE(dsd.v, 0)::BIGINT AS v
                    FROM spd LEFT JOIN dsd
                      USING (host, rack, env, w_start)),
            gd AS (SELECT host, w_start, sum(v)::BIGINT AS value
                   FROM fld GROUP BY 1, 2),
            lo AS (SELECT min(host) AS h FROM gd),
            diffq AS (SELECT 'diff' AS fn, w_start,
                             sum(CASE WHEN host = lo.h THEN value
                                      ELSE -value END)::BIGINT AS value
                      FROM gd, lo GROUP BY 1, 2),
            fr AS (SELECT host,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'click' AND host IN ('web2', 'web7')),
            dsr AS (SELECT host, w_start, sum(value)::BIGINT AS v
                    FROM fr GROUP BY 1, 2),
            d2 AS (SELECT w_start, v FROM dsr WHERE host = 'web2'),
            d7 AS (SELECT w_start, v FROM dsr WHERE host = 'web7'),
            ratioq AS (SELECT 'ratio' AS fn,
                              COALESCE(d2.w_start, d7.w_start) AS w_start,
                              CASE WHEN d7.v IS NULL OR d7.v = 0 THEN NULL
                                   ELSE ((d2.v * 1000000) // d7.v)::BIGINT
                              END AS value
                       FROM d2 FULL OUTER JOIN d7
                         ON d2.w_start = d7.w_start)
            SELECT fn, w_start, value FROM diffq
            UNION ALL
            SELECT fn, w_start, value FROM ratioq""",
        # first/last downsamplers: the engine's min_by/max_by over the
        # exact int64 (epoch_us, value) pair, reproduced here as a
        # row_number over the identical total order (asc for first,
        # desc for last) — a hash match pins the µs resolution AND the
        # tie rule, then each sub-query's cross-series aggregator
        "api_query_first_last": f"""{_TAGGED_CTE},
            f0 AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w_start,
                          epoch_us(ts) AS tus, value
                   FROM tp
                   WHERE series_id = 'click'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')),
            r0 AS (SELECT host, rack, env, w_start, value,
                          row_number() OVER (
                            PARTITION BY host, rack, env, w_start
                            ORDER BY tus, value) AS rn
                   FROM f0),
            g0 AS (SELECT host, w_start, sum(value)::BIGINT AS value
                   FROM r0 WHERE rn = 1 GROUP BY 1, 2),
            f1 AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                          epoch_us(ts) AS tus, value
                   FROM tp
                   WHERE series_id = 'view'
                     AND regexp_matches(rack, '^(?:r[0-2])$')
                     AND env IN ('prod', 'dev')),
            r1 AS (SELECT host, rack, env, w_start, value,
                          row_number() OVER (
                            PARTITION BY host, rack, env, w_start
                            ORDER BY tus DESC, value DESC) AS rn
                   FROM f1),
            g1 AS (SELECT rack, w_start, min(value)::BIGINT AS value
                   FROM r1 WHERE rn = 1 GROUP BY 1, 2)
            SELECT 'q0' AS query, 'host=' || host AS group_tags,
                   w_start, value
            FROM g0
            UNION ALL
            SELECT 'q1' AS query, 'rack=' || rack AS group_tags,
                   w_start, value
            FROM g1""",
        # multiplySeries: the same per-rack daily pipeline, then an
        # exact-BIGINT fold of each bucket's value list — a hash match
        # pins the integer product (a float exp-sum-of-logs product
        # would drift) and the skip-missing policy
        "api_query_gexp_multiply": f"""{_TAGGED_CTE},
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'click'
                    AND regexp_matches(rack, '^(?:r[0-2])$')
                    AND env IN ('prod', 'dev')),
            ds AS (SELECT host, rack, env, w_start,
                          count(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            g AS (SELECT rack, w_start, sum(v)::BIGINT AS value
                  FROM ds GROUP BY 1, 2)
            SELECT w_start,
                   list_reduce(list(value),
                               (a, b) -> CAST(a * b AS BIGINT))::BIGINT
                     AS value
            FROM g GROUP BY 1""",
        # the delete flag: survivors = NOT (series match AND inside
        # the integer middle third of the range) — the same epoch
        # truncation and floor-div split the engine computes, so a
        # hash match proves exactly the right rows died in the store
        "api_query_delete_read": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))) AS BIGINT) AS lo,
                           CAST(FLOOR(max(epoch(ts))) + 1 AS BIGINT) AS hi
                    FROM tp),
            del AS (SELECT lo + (hi - lo) // 3 AS t0,
                           lo + 2 * ((hi - lo) // 3) AS t1
                    FROM rng),
            rem AS (SELECT tp.* FROM tp, del
                    WHERE NOT (series_id = 'click'
                               AND host IN ('web1', 'web3')
                               AND env IN ('prod')
                               AND FLOOR(epoch(ts)) >= t0
                               AND FLOOR(epoch(ts)) < t1))
            SELECT series_id, host,
                   CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS sum_v,
                   count(*)::BIGINT AS cnt
            FROM rem GROUP BY 1, 2, 3""",
        # ep estimated percentiles: the identical integer index
        # arithmetic — R_7's floor-div j + permille fraction lerp
        # (ppm-scaled), R_3's ties-to-even selection with clamp
        "api_query_ep": f"""{_TAGGED_CTE},
            f0 AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'click'
                     AND regexp_matches(rack, '^(?:r[0-2])$')
                     AND env IN ('prod', 'dev')),
            ds0 AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM f0 GROUP BY 1, 2, 3, 4),
            r0 AS (SELECT rack, w_start, v,
                          row_number() OVER (PARTITION BY rack, w_start
                                             ORDER BY v) AS rn,
                          count(*) OVER (PARTITION BY rack, w_start) AS n
                   FROM ds0),
            j0 AS (SELECT *, ((n - 1) * 950 + 1000) // 1000 AS j,
                             ((n - 1) * 950 + 1000) % 1000 AS fr
                   FROM r0),
            g0 AS (SELECT rack, w_start,
                          max(CASE WHEN rn = j THEN v END) AS vl,
                          max(CASE WHEN rn = j + 1 THEN v END) AS vh,
                          max(fr) AS fr2
                   FROM j0 WHERE rn = j OR rn = j + 1
                   GROUP BY 1, 2),
            q0 AS (SELECT rack, w_start,
                          (vl * 1000000
                           + COALESCE((vh - vl) * fr2 * 1000, 0))::BIGINT
                            AS value
                   FROM g0),
            f1 AS (SELECT host, rack, env,
                          CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                          value
                   FROM tp
                   WHERE series_id = 'view'
                     AND regexp_matches(rack, '^(?:r[0-2])$')
                     AND env IN ('prod', 'dev')),
            ds1 AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                    FROM f1 GROUP BY 1, 2, 3, 4),
            r1 AS (SELECT rack, w_start, v,
                          row_number() OVER (PARTITION BY rack, w_start
                                             ORDER BY v) AS rn,
                          count(*) OVER (PARTITION BY rack, w_start) AS n
                   FROM ds1),
            j1 AS (SELECT *, greatest(1, least(n,
                     CASE WHEN (n * 500 - 500) % 1000 = 0
                          AND ((n * 500 - 500) // 1000) % 2 = 1
                          THEN (n * 500 - 500) // 1000
                          ELSE (n * 500 - 500) // 1000 + 1 END)) AS j
                   FROM r1),
            q1 AS (SELECT rack, w_start, v::BIGINT AS value
                   FROM j1 WHERE rn = j)
            SELECT 'q0' AS query, 'rack=' || rack AS group_tags,
                   w_start, value
            FROM q0
            UNION ALL
            SELECT 'q1' AS query, 'rack=' || rack AS group_tags,
                   w_start, value
            FROM q1""",
        # tsuids + aggregator none: the oracle REBUILDS the engine's
        # '<metric>|<sorted k=v>' tsuid strings from the deterministic
        # tag synthesis and selects the same three exact series, so
        # the hash pins identity format + membership + passthrough
        "api_query_tsuid_none": f"""{_TAGGED_CTE},
            f AS (SELECT series_id || '|dc=' || dc || ',env=' || env
                           || ',host=' || host || ',rack=' || rack AS series,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT)
                           AS w_start,
                         value
                  FROM tp)
            SELECT series, w_start, sum(value)::BIGINT AS value
            FROM f
            WHERE series IN ('click|dc=click,env=prod,host=web0,rack=r0',
                             'view|dc=view,env=prod,host=web0,rack=r0',
                             'click|dc=click,env=prod,host=web3,rack=r0')
            GROUP BY 1, 2""",
        # 0all: one bucket anchored at the stream's min epoch (the
        # same probe the engine uses for the request range); avg at
        # both stages mirrors the engine's per-series-then-group ppm
        # quantization literally
        "api_query_0all": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(min(epoch(ts)) AS BIGINT) AS lo FROM tp),
            ds AS (SELECT host, rack, env,
                          ((sum(value) * 1000000) // count(value))::BIGINT
                            AS v
                   FROM tp
                   WHERE series_id = 'view'
                     AND lower(host) LIKE 'web%' AND env IN ('prod')
                   GROUP BY 1, 2, 3)
            SELECT host, rng.lo AS w_start,
                   ((sum(v) * 1000000) // count(v))::BIGINT AS value
            FROM ds, rng GROUP BY 1, 2""",
        # gexp movingAverage -> sumSeries: trailing-3 ppm mean per
        # host over the zero-filled hourly sums, then ONE collapsed
        # series — order is load-bearing and mirrored literally
        "api_query_gexp_moving": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b
                    FROM tp),
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'view'
                    AND lower(host) LIKE '%' AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            sd AS (SELECT DISTINCT host, rack, env FROM ds),
            spine AS (SELECT sd.host, sd.rack, sd.env, gs.w_start
                      FROM sd CROSS JOIN (
                        SELECT unnest(generate_series(first_b, last_b, 3600))
                               AS w_start FROM rng) gs),
            filled AS (SELECT spine.host, spine.w_start,
                              COALESCE(ds.v, 0)::BIGINT AS v
                       FROM spine LEFT JOIN ds
                         USING (host, rack, env, w_start)),
            g AS (SELECT host, w_start, sum(v)::BIGINT AS value
                  FROM filled GROUP BY 1, 2),
            ma AS (SELECT host, w_start,
                          ((sum(value) OVER (PARTITION BY host ORDER BY w_start
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                            * 1000000)
                           // count(value) OVER (PARTITION BY host ORDER BY w_start
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                          )::BIGINT AS value
                   FROM g)
            SELECT w_start, sum(value)::BIGINT AS value
            FROM ma GROUP BY 1""",
        # the JSON body key: day-shifted (+1d realign), zero-filled 2h
        # sums per host, counter rate with 2^40 wrap — every parsed
        # field is load-bearing in this arithmetic
        # GET query-string twin of api_query_json: same composition
        # machinery, dropcounter tail (delta >= 0 survives, nothing
        # wraps), case-SENSITIVE glob from the 'web*' shorthand
        "api_query_qs": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/3600)*3600 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/3600)*3600 AS BIGINT) AS last_b
                    FROM tp),
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'signup'
                    AND host LIKE 'web%' AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            sd AS (SELECT DISTINCT host, rack, env FROM ds),
            spine AS (SELECT sd.host, sd.rack, sd.env, gs.w_start
                      FROM sd CROSS JOIN (
                        SELECT unnest(generate_series(first_b, last_b, 3600))
                               AS w_start FROM rng) gs),
            filled AS (SELECT spine.host, spine.w_start,
                              COALESCE(ds.v, 0)::BIGINT AS v
                       FROM spine LEFT JOIN ds
                         USING (host, rack, env, w_start)),
            g AS (SELECT host, w_start, sum(v)::BIGINT AS value
                  FROM filled GROUP BY 1, 2),
            r AS (SELECT host, w_start,
                         value - lag(value) OVER
                           (PARTITION BY host ORDER BY w_start) AS delta,
                         w_start - lag(w_start) OVER
                           (PARTITION BY host ORDER BY w_start) AS dt
                  FROM g)
            SELECT host, w_start,
                   CAST(FLOOR(delta::DOUBLE / dt::DOUBLE * 1000000) AS BIGINT)
                     AS value
            FROM r WHERE delta IS NOT NULL AND delta >= 0""",
        "api_query_json": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/7200)*7200 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/7200)*7200 AS BIGINT) AS last_b,
                           CAST(max(epoch(ts)) + 1 - 86400 AS BIGINT) AS hi_p
                    FROM tp),
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/7200)*7200 + 86400 AS BIGINT)
                           AS w_start,
                         value
                  FROM tp, rng
                  WHERE series_id = 'view'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')
                    AND epoch(ts) < rng.hi_p),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            sd AS (SELECT DISTINCT host, rack, env FROM ds),
            spine AS (SELECT sd.host, sd.rack, sd.env, gs.w_start
                      FROM sd CROSS JOIN (
                        SELECT unnest(generate_series(first_b, last_b, 7200))
                               AS w_start FROM rng) gs),
            filled AS (SELECT spine.host, spine.w_start,
                              COALESCE(ds.v, 0)::BIGINT AS v
                       FROM spine LEFT JOIN ds
                         USING (host, rack, env, w_start)),
            g AS (SELECT host, w_start, sum(v)::BIGINT AS value
                  FROM filled GROUP BY 1, 2),
            r AS (SELECT host, w_start,
                         value - lag(value) OVER
                           (PARTITION BY host ORDER BY w_start) AS delta,
                         w_start - lag(w_start) OVER
                           (PARTITION BY host ORDER BY w_start) AS dt
                  FROM g)
            SELECT host, w_start,
                   CAST(FLOOR((CASE WHEN delta < 0
                                    THEN delta + 1099511627776
                                    ELSE delta END)::DOUBLE
                              / dt::DOUBLE * 1000000) AS BIGINT) AS value
            FROM r WHERE delta IS NOT NULL""",
        # histogram percentiles: group-merged msb histogram, A15's
        # integer-ceil rank per requested permille (UNNEST mirrors the
        # engine's explode), est_max in pure int64 shifts
        "api_query_hist": f"""{_TAGGED_CTE},
            h AS (SELECT host,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                         (CASE WHEN value = 0 THEN 0
                               WHEN value > 0 THEN length(bin(value))
                               ELSE -1 END)::BIGINT AS bucket,
                         count(*)::BIGINT AS n
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')
                  GROUP BY 1, 2, 3),
            c AS (SELECT host, w_start, bucket, n,
                         sum(n) OVER (PARTITION BY host, w_start
                                      ORDER BY bucket
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum,
                         sum(n) OVER (PARTITION BY host, w_start) AS total
                  FROM h),
            x AS (SELECT c.*, pq.permille
                  FROM c CROSS JOIN
                    (SELECT unnest([500, 950, 990]) AS permille) pq)
            SELECT host, w_start, permille, min(bucket) AS bucket,
                   (CASE WHEN min(bucket) < 0 THEN -1
                         WHEN min(bucket) = 0 THEN 0
                         ELSE ((1::BIGINT << (min(bucket) - 1)) - 1)
                              + (1::BIGINT << (min(bucket) - 1))
                    END)::BIGINT AS est_max,
                   min(total)::BIGINT AS total
            FROM x WHERE cum >= (total * permille + 999) // 1000
            GROUP BY 1, 2, 3""",
        # tier-routed twin, direct from raw at 2h: hash match proves
        # the 1h hist tier's count re-aggregation loses nothing
        "api_query_hist_tier": f"""{_TAGGED_CTE},
            h AS (SELECT host,
                         CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w_start,
                         (CASE WHEN value = 0 THEN 0
                               WHEN value > 0 THEN length(bin(value))
                               ELSE -1 END)::BIGINT AS bucket,
                         count(*)::BIGINT AS n
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')
                  GROUP BY 1, 2, 3),
            c AS (SELECT host, w_start, bucket, n,
                         sum(n) OVER (PARTITION BY host, w_start
                                      ORDER BY bucket
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum,
                         sum(n) OVER (PARTITION BY host, w_start) AS total
                  FROM h),
            x AS (SELECT c.*, pq.permille
                  FROM c CROSS JOIN
                    (SELECT unnest([950]) AS permille) pq)
            SELECT host, w_start, permille, min(bucket) AS bucket,
                   (CASE WHEN min(bucket) < 0 THEN -1
                         WHEN min(bucket) = 0 THEN 0
                         ELSE ((1::BIGINT << (min(bucket) - 1)) - 1)
                              + (1::BIGINT << (min(bucket) - 1))
                    END)::BIGINT AS est_max,
                   min(total)::BIGINT AS total
            FROM x WHERE cum >= (total * permille + 999) // 1000
            GROUP BY 1, 2, 3""",
        # linear fill: identical pure-int64 floor lerp as the engine
        # (pmod-floor: (a - ((a % d + d) % d)) // d), spine buckets
        # outside a series' observed bracket stay NULL and vanish in
        # the null-skipping cross-series sum
        "api_query_linear": f"""{_TAGGED_CTE},
            rng AS (SELECT CAST(FLOOR(min(epoch(ts))/7200)*7200 AS BIGINT) AS first_b,
                           CAST(FLOOR(max(epoch(ts))/7200)*7200 AS BIGINT) AS last_b
                    FROM tp),
            f AS (SELECT host, rack, env,
                         CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w_start,
                         value
                  FROM tp
                  WHERE series_id = 'click'
                    AND lower(host) LIKE 'web%' AND env IN ('prod')),
            ds AS (SELECT host, rack, env, w_start, sum(value)::BIGINT AS v
                   FROM f GROUP BY 1, 2, 3, 4),
            sd AS (SELECT DISTINCT host, rack, env FROM ds),
            spine AS (SELECT sd.host, sd.rack, sd.env, gs.w_start
                      FROM sd CROSS JOIN (
                        SELECT unnest(generate_series(first_b, last_b, 7200))
                               AS w_start FROM rng) gs),
            j AS (SELECT spine.host, spine.rack, spine.env, spine.w_start,
                         ds.v
                  FROM spine LEFT JOIN ds
                    USING (host, rack, env, w_start)),
            k AS (SELECT host, rack, env, w_start, v,
                         last_value(CASE WHEN v IS NOT NULL THEN w_start END
                                    IGNORE NULLS) OVER wp AS pt,
                         first_value(CASE WHEN v IS NOT NULL THEN w_start END
                                     IGNORE NULLS) OVER wn AS nt,
                         last_value(v IGNORE NULLS) OVER wp AS pv,
                         first_value(v IGNORE NULLS) OVER wn AS nv
                  FROM j
                  WINDOW wp AS (PARTITION BY host, rack, env ORDER BY w_start
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         wn AS (PARTITION BY host, rack, env ORDER BY w_start
                                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
            fl AS (SELECT host, w_start,
                          CASE WHEN v IS NOT NULL THEN v
                               WHEN pt IS NOT NULL AND nt IS NOT NULL
                                    AND nt > pt THEN
                                 pv + ((((nv-pv)*(w_start-pt))
                                   - (((((nv-pv)*(w_start-pt)) % (nt-pt))
                                       + (nt-pt)) % (nt-pt)))
                                  // (nt-pt))
                               ELSE NULL END AS v
                   FROM k)
            SELECT host, w_start, sum(v)::BIGINT AS value
            FROM fl GROUP BY 1, 2""",
        # rollupUsage fallback: the answer must be the RAW 90-minute
        # composition (sum-of-sums collapses to one GROUP BY) — a
        # half-used 1h tier could not produce these buckets at all
        "api_query_fallback": f"""{_TAGGED_CTE}
            SELECT host,
                   CAST(FLOOR(epoch(ts)/5400)*5400 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS value
            FROM tp
            WHERE series_id = 'click'
              AND lower(host) LIKE 'web%' AND env IN ('prod')
            GROUP BY 1, 2""",
        "query_tag_filters_not": """WITH tpn AS (
    SELECT CAST(FLOOR(value*1000) AS BIGINT) AS value, ts,
           'web' || CAST(user_id % 12 AS VARCHAR) AS host,
           event_type AS dc,
           CASE WHEN user_id % 7 = 0 THEN 'on' ELSE NULL END AS canary
    FROM events)
            SELECT host,
                   CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
                   min(value) AS "min", max(value) AS "max",
                   (sum(value)::DOUBLE) / (count(value)::DOUBLE) AS avg
            FROM tpn
            WHERE host LIKE 'web%'
              AND lower(dc) NOT IN ('click', 'purchase')
              AND canary IS NULL
            GROUP BY 1, 2""",
        "query_tag_filters": f"""{_TAGGED_CTE}
            SELECT host,
                   CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                   sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
                   min(value) AS "min", max(value) AS "max",
                   (sum(value)::DOUBLE) / (count(value)::DOUBLE) AS avg
            FROM tp
            WHERE lower(host) LIKE 'web1%'
              AND dc IN ('click', 'view')
              AND regexp_matches(rack, '^(?:r[01])$')
              AND env NOT IN ('dev')
            GROUP BY 1, 2""",
        "suggest_names": f"""{_TAGGED_CTE},
            m AS (SELECT 'metrics' AS kind, name FROM (
                    SELECT DISTINCT series_id AS name FROM tp)
                  ORDER BY name LIMIT 3),
            k AS (SELECT 'tagk' AS kind, name FROM (
                    SELECT DISTINCT unnest(['host', 'dc', 'rack', 'env'])
                      AS name)
                  ORDER BY name LIMIT 25),
            v AS (SELECT 'tagv' AS kind, name FROM (
                    SELECT DISTINCT name FROM (
                      SELECT host AS name FROM tp
                      UNION ALL SELECT dc FROM tp
                      UNION ALL SELECT rack FROM tp
                      UNION ALL SELECT env FROM tp))
                  WHERE name LIKE 'web%' ORDER BY name LIMIT 5)
            SELECT * FROM m UNION ALL SELECT * FROM k
            UNION ALL SELECT * FROM v""",
        "win_rate": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS s
                  FROM pts GROUP BY 1, 2),
            c AS (SELECT series_id, w_start,
                         (sum(s) OVER (PARTITION BY series_id ORDER BY w_start
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          % 1000000)::BIGINT AS counter
                  FROM r),
            d AS (SELECT series_id, w_start, counter,
                         counter - lag(counter) OVER
                           (PARTITION BY series_id ORDER BY w_start) AS delta,
                         (w_start - lag(w_start) OVER
                           (PARTITION BY series_id ORDER BY w_start))::DOUBLE AS dt
                  FROM c)
            SELECT series_id, w_start, counter,
                   CAST(FLOOR(1000000 * CASE WHEN delta >= 0
                                             THEN delta::DOUBLE / dt
                                             ELSE counter::DOUBLE / dt END)
                        AS BIGINT) AS rate_q
            FROM d""",
        "win_moving": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS s
                  FROM pts GROUP BY 1, 2)
            SELECT series_id, w_start,
                   avg(s) OVER (PARTITION BY series_id ORDER BY w_start
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
            FROM r""",
        "win_rank": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
            FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                         rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                  FROM orders) WHERE rnk <= 5""",
        "filter_range": f"""{_PTS_CTE}
            SELECT series_id, count(*)::BIGINT AS n, sum(value)::BIGINT AS total
            FROM pts
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <  TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY 1""",
        "filter_retention": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         count(value)::BIGINT AS c
                  FROM pts GROUP BY 1, 2),
            cut AS (SELECT max(w_start) - 7*86400 AS cut FROM r)
            SELECT series_id, count(*)::BIGINT AS kept_windows,
                   sum(c)::BIGINT AS kept_points
            FROM r, cut WHERE r.w_start >= cut.cut GROUP BY 1""",
        "filter_series": f"""{_PTS_CTE}
            SELECT series_id, count(*)::BIGINT AS n FROM pts
            WHERE series_id IN ('click', 'error') GROUP BY 1""",
        "join_broadcast": """
            SELECT n_name, count(*)::BIGINT AS n_customers,
                   sum(CAST(FLOOR(c_acctbal*100) AS BIGINT))::BIGINT AS acctbal_cents
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1""",
        "join_asof": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start
                  FROM pts GROUP BY 1, 2),
            dims AS (SELECT series_id, w_start AS eff_ts,
                            (('0x' || substr(md5(series_id || '-' ||
                               CAST(w_start AS VARCHAR)), 1, 8))::BIGINT
                             % 1000) AS cfg
                     FROM r WHERE w_start % 21600 = 0),
            u AS (SELECT series_id, eff_ts AS t, 1 AS is_dim, cfg,
                         NULL::BIGINT AS ts_e, NULL::BIGINT AS value
                  FROM dims
                  UNION ALL
                  -- DuckDB epoch() keeps fractional seconds; floor to
                  -- match Spark's unix_timestamp. Dims are integer-
                  -- aligned, so flooring never flips the <= relation.
                  SELECT series_id, CAST(FLOOR(epoch(ts)) AS BIGINT), 0,
                         NULL, CAST(FLOOR(epoch(ts)) AS BIGINT), value
                  FROM pts),
            carried AS (SELECT series_id, is_dim, ts_e, value,
                               last_value(cfg IGNORE NULLS) OVER
                                 (PARTITION BY series_id
                                  ORDER BY t ASC, is_dim DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cfg
                        FROM u)
            SELECT series_id, ts_e, value, cfg
            FROM carried WHERE is_dim = 0""",
        "join_anti": """
            SELECT o_orderpriority, count(*)::BIGINT AS n FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_quantity > 45)
            GROUP BY 1""",
        "join_semi": """
            SELECT n_nationkey, n_name FROM nation
            WHERE n_nationkey IN (SELECT c_nationkey FROM customer)""",
        "join_equi": """
            SELECT o_orderpriority,
                   sum(CAST(FLOOR(l_extendedprice*(1-l_discount)*100) AS BIGINT))::BIGINT
                     AS revenue_cents,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1""",
        "join_range": f"""{_PTS_CTE}
            SELECT a.series_id AS a_series, b.series_id AS b_series,
                   count(*)::BIGINT AS n_pairs
            FROM pts a JOIN pts b
              ON b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
             AND a.series_id <> b.series_id
            GROUP BY 1, 2""",
        "route_read_stored": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w,
                         sum(value)::BIGINT AS s, count(value)::BIGINT AS c,
                         min(value) AS mn, max(value) AS mx
                  FROM pts GROUP BY 1, 2),
            b AS (SELECT series_id, min(w) AS w0, max(w) AS w1 FROM r GROUP BY 1),
            spine AS (SELECT series_id, unnest(generate_series(w0, w1, 7200)) AS w
                      FROM b)
            SELECT spine.series_id, spine.w AS w_start,
                   coalesce(s, 0)::BIGINT AS "sum", coalesce(c, 0)::BIGINT AS "count",
                   coalesce(mn, 0)::BIGINT AS "min", coalesce(mx, 0)::BIGINT AS "max",
                   CASE WHEN coalesce(c, 0) > 0
                        THEN (s::DOUBLE) / (c::DOUBLE) END AS avg
            FROM spine LEFT JOIN r ON spine.series_id = r.series_id AND spine.w = r.w""",
        "agg_distinct_sketch": f"""{_PTS_CTE}
            SELECT series_id,
                   CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                   count(DISTINCT value)::BIGINT AS exact_distinct,
                   0::BIGINT AS delta_est,
                   true AS within_err
            FROM pts GROUP BY 1, 2""",
        # spliced real-time read: same direct-from-raw 2h answer — the
        # hash match proves tier<watermark ∪ raw>=watermark ≡ direct
        "route_read_spliced": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w,
                         sum(value)::BIGINT AS s, count(value)::BIGINT AS c,
                         min(value) AS mn, max(value) AS mx
                  FROM pts GROUP BY 1, 2),
            b AS (SELECT series_id, min(w) AS w0, max(w) AS w1 FROM r GROUP BY 1),
            spine AS (SELECT series_id, unnest(generate_series(w0, w1, 7200)) AS w
                      FROM b)
            SELECT spine.series_id, spine.w AS w_start,
                   coalesce(s, 0)::BIGINT AS "sum", coalesce(c, 0)::BIGINT AS "count",
                   coalesce(mn, 0)::BIGINT AS "min", coalesce(mx, 0)::BIGINT AS "max",
                   CASE WHEN coalesce(c, 0) > 0
                        THEN (s::DOUBLE) / (c::DOUBLE) END AS avg
            FROM spine LEFT JOIN r ON spine.series_id = r.series_id AND spine.w = r.w""",
        "route_read": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/7200)*7200 AS BIGINT) AS w,
                         sum(value)::BIGINT AS s, count(value)::BIGINT AS c,
                         min(value) AS mn, max(value) AS mx
                  FROM pts GROUP BY 1, 2),
            b AS (SELECT series_id, min(w) AS w0, max(w) AS w1 FROM r GROUP BY 1),
            spine AS (SELECT series_id, unnest(generate_series(w0, w1, 7200)) AS w
                      FROM b)
            SELECT spine.series_id, spine.w AS w_start,
                   coalesce(s, 0)::BIGINT AS "sum", coalesce(c, 0)::BIGINT AS "count",
                   coalesce(mn, 0)::BIGINT AS "min", coalesce(mx, 0)::BIGINT AS "max",
                   CASE WHEN coalesce(c, 0) > 0
                        THEN (s::DOUBLE) / (c::DOUBLE) END AS avg
            FROM spine LEFT JOIN r ON spine.series_id = r.series_id AND spine.w = r.w""",
        "gapfill_zero": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w,
                         sum(value)::BIGINT AS s, count(value)::BIGINT AS c,
                         min(value) AS mn, max(value) AS mx
                  FROM pts GROUP BY 1, 2),
            b AS (SELECT series_id, min(w) AS w0, max(w) AS w1 FROM r GROUP BY 1),
            spine AS (SELECT series_id, unnest(generate_series(w0, w1, 3600)) AS w
                      FROM b)
            SELECT spine.series_id, spine.w AS w_start, '1h' AS "interval",
                   coalesce(s, 0)::BIGINT AS "sum", coalesce(c, 0)::BIGINT AS "count",
                   coalesce(mn, 0)::BIGINT AS "min", coalesce(mx, 0)::BIGINT AS "max"
            FROM spine LEFT JOIN r ON spine.series_id = r.series_id AND spine.w = r.w""",
        "gapfill_ffill": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w,
                         sum(value)::BIGINT AS s
                  FROM pts GROUP BY 1, 2),
            b AS (SELECT series_id, min(w) AS w0, max(w) AS w1 FROM r GROUP BY 1),
            spine AS (SELECT series_id, unnest(generate_series(w0, w1, 3600)) AS w
                      FROM b),
            j AS (SELECT spine.series_id, spine.w, s
                  FROM spine LEFT JOIN r ON spine.series_id = r.series_id
                                        AND spine.w = r.w)
            SELECT series_id, w AS w_start,
                   last_value(s IGNORE NULLS)
                     OVER (PARTITION BY series_id ORDER BY w
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "sum"
            FROM j""",
        "agg_zimsum": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w_start,
                         sum(value)::BIGINT AS v
                  FROM pts GROUP BY 1, 2)
            SELECT w_start, sum(v)::BIGINT AS zimsum, min(v) AS mimmin,
                   max(v) AS mimmax, count(*)::BIGINT AS n_present
            FROM r GROUP BY 1""",
        "gapfill_interp": f"""{_PTS_CTE},
            r AS (SELECT series_id,
                         CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS w,
                         sum(value)::BIGINT AS s, count(value)::BIGINT AS c,
                         min(value) AS mn, max(value) AS mx
                  FROM pts GROUP BY 1, 2),
            b AS (SELECT series_id, min(w) AS w0, max(w) AS w1 FROM r GROUP BY 1),
            spine AS (SELECT series_id, unnest(generate_series(w0, w1, 3600)) AS w
                      FROM b),
            j AS (SELECT spine.series_id, spine.w, s, c, mn, mx
                  FROM spine LEFT JOIN r ON spine.series_id = r.series_id
                                        AND spine.w = r.w),
            k AS (SELECT series_id, w, s, c, mn, mx,
                         last_value(CASE WHEN c IS NOT NULL THEN w END IGNORE NULLS)
                           OVER wp AS pt,
                         first_value(CASE WHEN c IS NOT NULL THEN w END IGNORE NULLS)
                           OVER wn AS nt,
                         last_value(s IGNORE NULLS) OVER wp AS ps,
                         first_value(s IGNORE NULLS) OVER wn AS ns,
                         last_value(mn IGNORE NULLS) OVER wp AS pn,
                         first_value(mn IGNORE NULLS) OVER wn AS nn,
                         last_value(mx IGNORE NULLS) OVER wp AS px,
                         first_value(mx IGNORE NULLS) OVER wn AS nx
                  FROM j
                  WINDOW wp AS (PARTITION BY series_id ORDER BY w
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         wn AS (PARTITION BY series_id ORDER BY w
                                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            SELECT series_id, w AS w_start, '1h' AS "interval",
                   CASE WHEN c IS NOT NULL THEN s
                        ELSE ps + ((((ns-ps)*(w-pt))
                              - (((((ns-ps)*(w-pt)) % (nt-pt)) + (nt-pt)) % (nt-pt)))
                             // (nt-pt)) END AS "sum",
                   coalesce(c, 0)::BIGINT AS "count",
                   CASE WHEN c IS NOT NULL THEN mn
                        ELSE pn + ((((nn-pn)*(w-pt))
                              - (((((nn-pn)*(w-pt)) % (nt-pt)) + (nt-pt)) % (nt-pt)))
                             // (nt-pt)) END AS "min",
                   CASE WHEN c IS NOT NULL THEN mx
                        ELSE px + ((((nx-px)*(w-pt))
                              - (((((nx-px)*(w-pt)) % (nt-pt)) + (nt-pt)) % (nt-pt)))
                             // (nt-pt)) END AS "max"
            FROM k""",
        "rollup_cal_day_tz": f"""{_PTS_CTE}
            SELECT series_id,
                   epoch(timezone('America/New_York',
                     date_trunc('day', timezone('America/New_York',
                       timezone('UTC', ts)))))::BIGINT AS w_start,
                   '1dc-America/New_York' AS "interval",
                   sum(value)::BIGINT AS "sum",
                   count(value)::BIGINT AS "count",
                   min(value) AS "min", max(value) AS "max"
            FROM pts GROUP BY 1, 2""",
        "rollup_cal_week": f"""{_PTS_CTE}
            SELECT series_id,
                   epoch(date_trunc('week', ts))::BIGINT AS w_start,
                   '1wc' AS "interval",
                   sum(value)::BIGINT AS "sum", count(value)::BIGINT AS "count",
                   min(value) AS "min", max(value) AS "max"
            FROM pts GROUP BY 1, 2""",
        "set_union": """
            SELECT DISTINCT nationkey FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL SELECT s_nationkey FROM supplier)""",
        "set_except": """
            SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
            EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000""",
        "set_intersect": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier""",
        "sort_global": """
            SELECT o_orderstatus, count(*)::BIGINT AS n FROM orders
            GROUP BY 1 ORDER BY n DESC, o_orderstatus""",
        "sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "scan_project": """
            SELECT l_returnflag, count(*)::BIGINT AS n,
                   sum(CAST(FLOOR(l_extendedprice*100) AS BIGINT))::BIGINT AS price_cents
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1""",
        "fn_bucket": f"""{_PTS_CTE}
            SELECT CAST(FLOOR(epoch(ts)/300)*300 AS BIGINT) AS bucket5m,
                   count(*)::BIGINT AS n
            FROM pts GROUP BY 1""",
        "fn_hash": """
            SELECT CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16)
                        AS INT) AS bucket,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1""",
        "fn_array": """
            SELECT doc_id,
                   list_aggregate(generate_series(1, CAST(n_chars % 8 + 1 AS INT)), 'sum')::BIGINT AS arr_sum,
                   list_min(generate_series(1, CAST(n_chars % 8 + 1 AS INT)))::BIGINT AS arr_min,
                   list_max(generate_series(1, CAST(n_chars % 8 + 1 AS INT)))::BIGINT AS arr_max,
                   (generate_series(1, CAST(n_chars % 8 + 1 AS INT)))[1]::BIGINT AS arr_first,
                   (generate_series(1, CAST(n_chars % 8 + 1 AS INT)))[-1]::BIGINT AS arr_last,
                   len(generate_series(1, CAST(n_chars % 8 + 1 AS INT)))::BIGINT AS arr_len
            FROM documents""",
        "fn_invariant": """
            SELECT count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN e1.embedding = e2.embedding THEN 1 ELSE 0 END)::BIGINT
                     AS n_equal
            FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id = e2.vec_id""",
        "fn_string": """
            SELECT c_custkey,
                   c_mktsegment || '|' || c_name AS tagged,
                   split_part(c_name, '#', 2) AS name_num,
                   upper(c_mktsegment) AS seg_upper,
                   CAST(length(c_name) AS INT) AS name_len
            FROM customer""",
        "fn_json": """
            SELECT event_type,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_sum,
                   count(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_count,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
            FROM events GROUP BY 1""",
        "fn_math": """
            SELECT l_orderkey, l_linenumber,
                   sqrt(l_quantity) AS qty_sqrt,
                   abs(l_discount - 0.05) AS disc_abs,
                   CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
                   l_partkey % 7 AS part_mod
            FROM lineitem WHERE l_orderkey % 97 = 0""",
        "fn_map": """
            SELECT event_type AS mtype, count(DISTINCT CAST(user_id AS VARCHAR))::BIGINT
                     AS n_users
            FROM events GROUP BY 1""",
        "codec_roundtrip": _rollup_sql(3600, "1h"),
        "codec_pruned_read": f"""SELECT * FROM ({_rollup_sql(3600, "1h")})
            WHERE w_start >= {_PRUNE_T0} AND w_start < {_PRUNE_T1}""",
        # codec_stats: rows-only (depends on codec internals by design);
        # codec_check pins its invariants under the gate instead:
        "codec_check": f"""WITH r AS ({_rollup_sql(3600, "1h")})
            SELECT t.agg,
                   (SELECT count(*) FROM r)::BIGINT AS points,
                   CAST(0 AS BIGINT) AS mismatch_rows,
                   true AS bpp_ok
            FROM (VALUES ('sum'), ('count'), ('min'), ('max')) AS t(agg)""",
        "udaf_hist": """
            SELECT source, CAST(n_chars // 200 AS BIGINT) AS bucket,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1, 2""",
    })
    return out
