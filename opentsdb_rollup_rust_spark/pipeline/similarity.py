"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k (the exactness baseline) and a
random-hyperplane LSH-bucketed variant (the scale path), plus
embedding-cosine near-duplicate detection.

Exactness strategy: embeddings are quantized to integer thousandths
first; dot products and squared norms are then exact int64 arithmetic
(reorder-invariant), and cosine = dot / (sqrt(n2a) * sqrt(n2b)) is a
double derived from identical integers in every engine — so DuckDB
oracles match bit-for-bit. ``cos_q = floor(cosine * 1e6)`` is the
comparison unit.

Scale notes (10^9+ vectors):
- brute-force: broadcast the (small) query set, map-side cross join —
  no shuffle of the big side; per-partition top-k then global top-k
  via the window only on the k*|queries| survivors would be the next
  refinement at extreme scale.
- LSH: 8 deterministic hyperplanes -> 256 buckets; candidate join is
  an equi-join on the bucket id. Recall/cost tunes with n_planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60

QUANT = 1000  # embedding quantization: thousandths
N_PLANES = 8
PLANE_WEIGHT_MOD = 1001  # weights in [-500, 500]
#: hot-bucket cap for the LSH band join (mirrored in the DuckDB
#: ann_lsh oracle — both engines must drop the same buckets)
LSH_MAX_BUCKET = 4096


def quantize_embedding(emb: Column | str, scale: int = QUANT) -> Column:
    """array<float> -> array<long> of floor(x * scale): every later
    dot/norm is exact integer math."""
    c = F.col(emb) if isinstance(emb, str) else emb
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def int_norm2(a: Column) -> Column:
    return int_dot(a, a)


def cosine_q(dot: Column, n2a: Column, n2b: Column) -> Column:
    """floor(1e6 * dot / (|a| * |b|)) from exact integer inputs."""
    return F.floor(
        dot.cast("double")
        / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double")))
        * F.lit(1_000_000)
    ).cast("long")


def _prepared(embeddings: DataFrame, emb_col: str = "embedding") -> DataFrame:
    q = quantize_embedding(emb_col)
    return embeddings.select(
        F.col("vec_id"),
        q.alias("qe"),
    ).withColumn("n2", int_norm2(F.col("qe")))


def _gather_table(prepared: DataFrame):
    """Materialize a prepared frame (vec_id, qe, n2) into a numpy
    gather table broadcast to the executors: (sorted ids, int64 matrix
    in id order, n2 in id order).

    This is the SAME driver-memory shape as the F.broadcast(...) hash
    relations the r1-r5 rerank plans already built from `prepared`
    (Spark collects a broadcast side to the driver to frame it), just
    exposed as columnar numpy instead of a row hash table — ~40 B +
    8*dim per vector, 10 MB at 20k vectors/64 dims. The vectorized
    scorers below gather rows from it by id instead of shuffling a
    copy of both embedding payloads onto every candidate pair (guide
    §8: decide with small rows, attach heavy bytes via a broadcast
    plan). At a corpus too big to broadcast, the same scorers accept a
    per-bucket collect_list of (id, qe, n2) structs — the vectors then
    move through exactly one (bucket-keyed) shuffle — but below the
    broadcast cap the gather table is strictly less data movement."""
    import numpy as np

    pdf = prepared.select("vec_id", "qe", "n2").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    if len(ids):
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qe"]])
    else:
        mat = np.zeros((0, 1), dtype=np.int64)
    n2 = pdf["n2"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    return prepared.sparkSession.sparkContext.broadcast(
        (ids[order], mat[order].astype(np.float64), n2[order])
    )


def _np_cos_q(S, sq_a, sq_b):
    """floor(1e6 * dot / (|a| * |b|)) on float64 — the EXACT mirror of
    cosine_q: dots are integers < 2^53 (so the float64 matmul that
    produced S is exact), sqrt is correctly rounded IEEE in numpy and
    the JVM alike, and the op order (divide, then *1e6, then floor)
    matches the Column expression term for term."""
    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.floor(S / (sq_a[:, None] * sq_b[None, :]) * 1_000_000.0)
    # JVM double->long cast semantics for degenerate zero-norm rows
    c = np.where(np.isnan(c), 0.0, c)
    return np.clip(c, -9.2233720368547e18, 9.2233720368547e18).astype(np.int64)


#: chunk of score-matrix rows per numpy slab: bounds peak memory at
#: chunk x max_bucket x 8 B (~64 MB at the 4096 bucket cap) per task.
_SCORE_CHUNK = 2048


def _topk_rows_from_scores(C, row_ids, col_ids, k, exclude_self=True):
    """Per-row top-k of an int64 cos_q matrix with the engine's exact
    tie-break (cos desc, id asc), via the composite int64 key
    cos_q * 2^32 - id (|cos_q| <= 1e6, id < 2^32 => no overflow, total
    order identical to the window's ORDER BY). Returns (q, v, c)
    arrays."""
    import numpy as np

    key = C * (1 << 32) - col_ids[None, :]
    if exclude_self:
        # self-slots sink below every valid key; the `keep` filter
        # drops them, so each row yields its top-min(k, n_valid)
        key = np.where(row_ids[:, None] == col_ids[None, :], np.int64(-(1 << 62)), key)
    n_rows, n_cols = key.shape
    kk = min(k, n_cols)
    if kk <= 0 or n_rows == 0:
        e = np.zeros(0, dtype=np.int64)
        return e, e, e
    if kk < n_cols:
        top = np.argpartition(key, n_cols - kk, axis=1)[:, n_cols - kk :]
    else:
        top = np.broadcast_to(np.arange(n_cols), (n_rows, n_cols)).copy()
    tkey = np.take_along_axis(key, top, axis=1)
    keep = tkey > np.int64(-(1 << 62))  # drop self-slots when kk > valid
    q = np.repeat(row_ids, kk)[keep.ravel()]
    v = col_ids[top.ravel()][keep.ravel()]
    c = np.take_along_axis(C, top, axis=1).ravel()[keep.ravel()]
    return q, v, c


def _scored_topk_out(spark_df, k):
    """Shared tail: (q_id, neighbor_id, cos_q) candidate superset ->
    per-query global top-k with rank, the same window the r1-r5 plans
    ran — but over the per-bucket-pruned survivors (10^5-ish rows)
    instead of every scored pair (10^8 at sf1.0)."""
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("neighbor_id"))
    return (
        spark_df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_q", "rank")
    )


_PAIR_SCHEMA = "q_id long, neighbor_id long, cos_q long"


def _bucket_topk_scores(
    buckets: DataFrame, table_bc, k: int, directed: bool = False
) -> DataFrame:
    """Bucketed exact scoring: one input row = one candidate bucket.

    Undirected (LSH) buckets carry `ms` (member ids) — every ordered
    (q, v), q != v, in-bucket pair is a candidate. Directed (IVF)
    buckets carry `qs` (probe ids) and `ms` (corpus ids).

    For each bucket the member vectors are GATHERED from the broadcast
    table and scored as one float64 BLAS matmul (exact: every
    intermediate is an integer < 2^53), then pruned to the per-bucket
    top-k per query before anything re-enters the JVM: any globally
    top-k neighbor of q is by definition top-k within every bucket
    containing the pair, so the union of per-bucket top-k rows is a
    superset of the global top-k and the final window re-ranks it
    identically (same composite order). This replaces r5's plan —
    bucket self-equi-join streaming ~10^8 (id,id) pairs into a
    dropDuplicates shuffle, a broadcast-join re-attach of both
    vectors, ~10^8 interpreted zip_with/aggregate dot products, and a
    10^8-row ranking window — with one narrow shuffle of (bucket, id)
    rows and O(sum B^2) exact dgemm flops. Row chunking (_SCORE_CHUNK)
    bounds the per-task score slab at the 4096-member bucket cap."""

    def score(it):
        import numpy as np
        import pyarrow as pa

        ids, matf, n2 = table_bc.value
        sq = np.sqrt(n2.astype(np.float64))
        for batch in it:
            d = batch.to_pydict()
            ms_rows = d["ms"]
            qs_rows = d["qs"] if directed else d["ms"]
            outq, outv, outc = [], [], []
            for ms, qs in zip(ms_rows, qs_rows):
                col_ids = np.asarray(ms, dtype=np.int64)
                row_ids = np.asarray(qs, dtype=np.int64)
                if len(col_ids) == 0 or len(row_ids) == 0:
                    continue
                ci = np.searchsorted(ids, col_ids)
                Gc = matf[ci]
                sqc = sq[ci]
                for lo in range(0, len(row_ids), _SCORE_CHUNK):
                    rid = row_ids[lo : lo + _SCORE_CHUNK]
                    ri = np.searchsorted(ids, rid)
                    S = matf[ri] @ Gc.T
                    C = _np_cos_q(S, sq[ri], sqc)
                    q, v, c = _topk_rows_from_scores(C, rid, col_ids, k)
                    outq.append(q)
                    outv.append(v)
                    outc.append(c)
            if outq:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(outq), pa.int64()),
                        pa.array(np.concatenate(outv), pa.int64()),
                        pa.array(np.concatenate(outc), pa.int64()),
                    ],
                    names=["q_id", "neighbor_id", "cos_q"],
                )

    return buckets.mapInArrow(score, _PAIR_SCHEMA)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    emb_col: str = "embedding",
    impl: str = "scored",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` defaults to the corpus itself filtered elsewhere; the
    query side is tiny by construction and rides along as a broadcast
    gather table, so the big corpus is never shuffled — each scan task
    scores its Arrow batches against the query matrix as one exact
    float64 dgemm and emits only its per-batch top-k per query
    (a superset of the global top-k); the ranking window then sees
    O(tasks * |queries| * k) rows instead of |corpus| * |queries|.
    The r1-r5 plan broadcast-joined the query rows onto every corpus
    row and paid an interpreted HOF dot per (corpus, query) pair.

    The corpus is quantized INSIDE the scorer (np.floor(x * 1000.0) on
    float64 — float32 -> float64 is exact and the multiply/floor are
    the same IEEE ops as quantize_embedding's cast/floor chain), so
    the whole-corpus interpreted HOF quantize projection disappears
    from this plan too.

    ``impl="join"`` keeps the r5 all-JVM broadcast-join plan — for a
    HANDFUL of query vectors (|corpus| x |queries| dots ~ 10^5) its
    single JVM-only job beats the scorer's fixed two-job + Arrow
    overhead (measured 0.53 s vs 0.72 s warm on 20k x 10 at sf1.0);
    the vectorized path wins from panel-sized query sets up
    (2000 x 20k: the interpreted plan is the 10^8-dot regime the r6
    rework removed everywhere else). Both return identical rows."""
    if impl == "join":
        return _brute_force_topk_join(embeddings, queries, k, emb_col)
    corpus = embeddings.select("vec_id", F.col(emb_col).alias("emb"))
    if queries is None:
        queries = embeddings
    q_bc = _gather_table(_prepared(queries, emb_col))
    scale = float(QUANT)

    def score(it):
        import numpy as np
        import pyarrow as pa

        q_ids, q_matf, q_n2 = q_bc.value
        q_sq = np.sqrt(q_n2.astype(np.float64))
        for batch in it:
            d = batch.to_pydict()
            bids = np.asarray(d["vec_id"], dtype=np.int64)
            if len(bids) == 0:
                continue
            bmat = np.floor(
                np.asarray(d["emb"], dtype=np.float64) * scale
            ).reshape(len(bids), -1)
            bsq = np.sqrt((bmat * bmat).sum(axis=1))
            outq, outv, outc = [], [], []
            for lo in range(0, len(q_ids), _SCORE_CHUNK):
                qid = q_ids[lo : lo + _SCORE_CHUNK]
                S = q_matf[lo : lo + _SCORE_CHUNK] @ bmat.T
                C = _np_cos_q(S, q_sq[lo : lo + _SCORE_CHUNK], bsq)
                q, v, c = _topk_rows_from_scores(C, qid, bids, k)
                outq.append(q)
                outv.append(v)
                outc.append(c)
            if outq:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(outq), pa.int64()),
                        pa.array(np.concatenate(outv), pa.int64()),
                        pa.array(np.concatenate(outc), pa.int64()),
                    ],
                    names=["q_id", "neighbor_id", "cos_q"],
                )

    scored = corpus.mapInArrow(score, _PAIR_SCHEMA)
    return _scored_topk_out(scored, k)


def _brute_force_topk_join(
    embeddings: DataFrame,
    queries: DataFrame | None,
    k: int,
    emb_col: str,
) -> DataFrame:
    """The r5 plan, kept for tiny query sets (see brute_force_topk):
    broadcast the prepared query rows, map-side theta-join against the
    corpus, HOF dot per surviving pair, per-query ranking window."""
    corpus = _prepared(embeddings, emb_col)
    if queries is None:
        queries = embeddings
    qs = _prepared(queries, emb_col).select(
        F.col("vec_id").alias("q_id"),
        F.col("qe").alias("q_qe"),
        F.col("n2").alias("q_n2"),
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("vec_id") != F.col("q_id"))
        .withColumn("dot", int_dot(F.col("qe"), F.col("q_qe")))
        .withColumn("cos_q", cosine_q(F.col("dot"), F.col("n2"), F.col("q_n2")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_q", "rank")
    )


def hyperplane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes, reproducible in SQL:
    w[p][i] = md5_int60('p|i') % 1001 - 500."""
    import hashlib

    out = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[:15], 16)
            row.append(h % PLANE_WEIGHT_MOD - PLANE_WEIGHT_MOD // 2)
        out.append(row)
    return out


def with_lsh_bucket(
    prepared: DataFrame, dim: int, n_planes: int = N_PLANES
) -> DataFrame:
    """prepared + a `bucket` column: random-hyperplane LSH bucket id
    in [0, 2^n_planes), bit p set iff dot(qe, w_p) >= 0. The plane
    matrix is staged as broadcast DATA, not inlined literals — the
    same Catalyst-analysis-cost fix as banded_table_keys (an 8x64
    literal+HOF tree costs ~1-2s of analysis per fresh query call,
    dwarfing its evaluation)."""
    spark = prepared.sparkSession
    ws = hyperplane_weights(n_planes, dim)
    wdf = F.broadcast(
        spark.createDataFrame([(ws,)], "W: array<array<bigint>>")
    )
    bitv = F.transform(
        F.transform(F.col("W"), lambda w: int_dot(F.col("qe"), w)),
        lambda d, j: F.when(
            d >= 0,
            F.element_at(
                F.array(*[F.lit(1 << p).cast("long") for p in range(n_planes)]),
                j + F.lit(1).cast("int"),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    bucket = F.aggregate(
        F.col("_bitv"), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return (
        prepared.crossJoin(wdf)
        .withColumn("_bitv", bitv)
        .withColumn("bucket", bucket)
        .drop("W", "_bitv")
    )


def exact_rerank_topk(cand: DataFrame, prepared: DataFrame, k: int) -> DataFrame:
    """Shared exact-cosine rerank: candidate (q_id, vec_id) pairs ->
    per-query top-k by cos_q. Vectors are joined back on each side, so
    the ids-only candidates stay narrow through the shuffles; the
    dot/cosine stays JVM-side (zip_with/aggregate expressions).

    Measured note: a numpy mapInArrow rerank was tried and REVERTED —
    shipping both 64-long vectors per candidate pair through Arrow IPC
    (~1 KB/pair) cost more than the interpreted-lambda dot it saved
    (9.4s vs 6.7s at sf0.1). The HOF dot is evaluated once per pair on
    data already JVM-resident; Python pays two serializations first."""
    qs = prepared.select(
        F.col("vec_id").alias("q_id"),
        F.col("qe").alias("q_qe"),
        F.col("n2").alias("q_n2"),
    )
    scored = (
        cand.join(prepared, "vec_id")
        .join(qs, "q_id")
        .withColumn("dot", int_dot(F.col("qe"), F.col("q_qe")))
        .withColumn("cos_q", cosine_q(F.col("dot"), F.col("n2"), F.col("q_n2")))
        .select("q_id", "vec_id", "cos_q")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_q", "rank")
    )


def exact_rerank_topk_symmetric(
    pairs: DataFrame, prepared: DataFrame, k: int
) -> DataFrame:
    """exact_rerank_topk for a SYMMETRIC candidate relation, given as
    unordered (id_a < id_b) pairs: cosine is symmetric, so each pair
    is scored once and mirrored into both query orientations before
    the per-query top-k window. Halves the expensive part — the
    interpreted-HOF dot over 2x dim longs per pair — at the cost of a
    cheap post-score union. Only valid when (q, v) candidates imply
    (v, q); the LSH band join is symmetric by construction, IVF
    probing is not (use exact_rerank_topk there)."""
    scored = (
        pairs.join(
            prepared.select(
                F.col("vec_id").alias("id_a"),
                F.col("qe").alias("a_qe"),
                F.col("n2").alias("a_n2"),
            ),
            "id_a",
        )
        .join(
            prepared.select(
                F.col("vec_id").alias("id_b"),
                F.col("qe").alias("b_qe"),
                F.col("n2").alias("b_n2"),
            ),
            "id_b",
        )
        .withColumn("dot", int_dot(F.col("a_qe"), F.col("b_qe")))
        .withColumn("cos_q", cosine_q(F.col("dot"), F.col("a_n2"), F.col("b_n2")))
        .select("id_a", "id_b", "cos_q")
    )
    both = scored.select(
        F.col("id_a").alias("q_id"), F.col("id_b").alias("vec_id"), "cos_q"
    ).unionAll(
        scored.select(
            F.col("id_b").alias("q_id"), F.col("id_a").alias("vec_id"), "cos_q"
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_q"), F.asc("vec_id"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_q", "rank")
    )


LSH_TABLES = 8
LSH_PLANES_PER_TABLE = 4


def banded_table_keys(
    prepared: DataFrame,
    dim: int,
    n_tables: int = LSH_TABLES,
    planes_per_table: int = LSH_PLANES_PER_TABLE,
) -> DataFrame:
    """(vec_id, tbl, key) — one row per vector per LSH table.

    The T*P hyperplane weights are staged as broadcast DATA (a 1-row
    array<array<long>> frame cross-joined in), NOT as literal arrays
    inside the expression: inlining 32 x 64 literals with a HOF dot
    each builds a ~10^4-node expression tree whose Catalyst
    analysis/optimization costs ~7s COLD — 40x the actual evaluation
    (0.16s for 2k rows) — and every fresh query() call re-pays it
    (new expression IDs miss every compile cache). With the matrix as
    data the tree is a few nested lambdas; per-element work is
    identical. Measured: ann_lsh 7.4s -> see BENCH. Same values as
    hyperplane_weights (the DuckDB twin inlines them as SQL literals;
    DuckDB's planner handles that fine)."""
    spark = prepared.sparkSession
    ws = hyperplane_weights(n_tables * planes_per_table, dim)
    wdf = F.broadcast(
        spark.createDataFrame([(ws,)], "W: array<array<bigint>>")
    )
    # dots[j] = <qe, W[j]>; bitv[j] = 2^(j mod P) if dots[j] >= 0
    pows = [1 << p for p in range(planes_per_table)]
    dots = F.transform(F.col("W"), lambda w: int_dot(F.col("qe"), w))
    bitv = F.transform(
        dots,
        lambda d, j: F.when(
            d >= 0,
            F.element_at(
                F.array(*[F.lit(v).cast("long") for v in pows]),
                (j % planes_per_table) + F.lit(1).cast("int"),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    tables = []
    for t in range(n_tables):
        key = F.element_at(F.col("bitv"), t * planes_per_table + 1)
        for p in range(1, planes_per_table):
            key = key + F.element_at(F.col("bitv"), t * planes_per_table + p + 1)
        tables.append(F.struct(F.lit(t).alias("tbl"), key.alias("key")))
    return (
        prepared.crossJoin(wdf)
        .select("vec_id", "qe", bitv.alias("bitv"))
        .select("vec_id", F.explode(F.array(*tables)).alias("tk"))
        .select(
            "vec_id", F.col("tk.tbl").alias("tbl"), F.col("tk.key").alias("key")
        )
    )


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_tables: int = LSH_TABLES,
    planes_per_table: int = LSH_PLANES_PER_TABLE,
    emb_col: str = "embedding",
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """Approximate top-k: union candidates over the LSH tables, then
    exact cosine rerank.

    Plan shape: banded keys (tiny tree — see banded_table_keys) ->
    hot-bucket guard -> self equi-join on (tbl, key) over 3 narrow
    columns (never the embedding payload) -> distinct unordered pair
    -> symmetric rerank. Cosine is symmetric, so each unordered pair
    is scored once and mirrored into both query orientations
    (exact_rerank_topk_symmetric) — half the dot-product work of a
    directed candidate set. (A posting-list expansion — collect ids
    per bucket, expand the upper triangle in-row as ngram_jaccard does
    — was measured SLOWER here: LSH buckets run ~n/2^P members, so the
    in-row expansion allocates thousands of structs per row in
    interpreted lambdas, while the equi-join streams the same pairs
    through codegen. Jaccard postings win because max_df caps them at
    a few dozen docs.)

    ``max_bucket`` drops degenerate hot buckets BEFORE any pair is
    formed (a bucket of B members contributes B^2/2 pairs — at 10^9
    rows a stop-bucket is quadratic death, and real LSH systems cap or
    re-split); the size filter on the collected bucket is the same
    guard the r5 count-aggregation join applied, in the same shuffle.

    r6 plan (replaces the banded self-equi-join + 10^8-pair
    dropDuplicates + broadcast-join rerank + full-pair window): ONE
    (tbl, key) shuffle collects each guarded bucket's member ids
    (bounded by max_bucket), the bucketed numpy scorer computes every
    in-bucket pair's exact cos_q as a float64 dgemm and emits only the
    per-bucket top-k per member, a cross-bucket id dedup (identical
    cos_q on every duplicate) shrinks that to one row per candidate
    edge direction, and the global window re-ranks the survivors —
    provably the same top-k (see _bucket_topk_scores)."""
    prepared = _prepared(embeddings, emb_col)
    banded = banded_table_keys(prepared, dim, n_tables, planes_per_table)
    buckets = (
        banded.groupBy("tbl", "key")
        .agg(F.collect_list("vec_id").alias("ms"))
        .where((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
        .select("ms")
    )
    scored = _bucket_topk_scores(buckets, _gather_table(prepared), k)
    return _scored_topk_out(scored.dropDuplicates(["q_id", "neighbor_id"]), k)


IVF_LISTS = 16
IVF_PROBE = 4


def ivf_centroids(prepared: DataFrame, n_lists: int = IVF_LISTS) -> DataFrame:
    """Deterministic IVF coarse quantizer: seed list s = vec_id %
    n_lists, centroid[i] = floor(avg(qe[i])) over the seed members —
    exact int64 from identical IEEE double division in every engine.
    Element-wise array aggregation via posexplode -> groupBy(list, pos)
    -> re-assemble sorted; |lists| x dim rows only."""
    return (
        prepared.select(
            (F.col("vec_id") % n_lists).alias("lst"),
            F.posexplode("qe").alias("pos", "v"),
        )
        .groupBy("lst", "pos")
        .agg(F.floor(F.avg("v")).cast("long").alias("c"))
        .groupBy("lst")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cent")
        )
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 distance of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    prepared: DataFrame, centroids: DataFrame, n_keep: int = 1
) -> DataFrame:
    """(vec_id, lst, rank) — each vector's n_keep nearest inverted
    lists by exact squared distance (ties on list id). The centroid
    table is tiny (n_lists rows) and broadcast, so assignment is a
    map-only pass over the corpus."""
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("lst"))
    return (
        prepared.crossJoin(F.broadcast(centroids))
        .withColumn("d2", _sq_dist(F.col("qe"), F.col("cent")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_keep)
        .select("vec_id", "lst", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = IVF_LISTS,
    n_probe: int = IVF_PROBE,
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_lists`` inverted lists (each vector filed under its nearest
    centroid), probe each query's ``n_probe`` nearest lists, exact
    cosine rerank of the probed candidates.

    Scale shape: centroid build touches |lists x dim| aggregated rows;
    assignment and probing are map-only against the broadcast centroid
    table; the candidate join is an equi-join on the list id, so cost
    scales with n_probe/n_lists of the corpus per query instead of the
    O(n^2) cross join. The standard recall/cost dial is (n_lists,
    n_probe). Same integer-exact quantization as the LSH path, so the
    DuckDB oracle reproduces centroids, assignments, and top-k
    bit-for-bit.

    r6 plan (replaces the probes x corpus equi-join streaming ~10^8
    (q, v) id pairs into a dropDuplicates shuffle + broadcast-join
    rerank + full-pair window): ONE shuffle keyed by list id collects
    each inverted list's corpus members (rank 1) and probe members
    (ranks 1..n_probe) side by side, the bucketed numpy scorer
    computes the probe x member exact cos_q block as a float64 dgemm
    and emits only each probe's per-list top-k, and the global window
    re-ranks the survivors — the same top-k (a vector is filed under
    exactly one list, so candidate (q, v) pairs are unique across
    lists, and any global top-k neighbor is top-k within its own
    list's block)."""
    prepared = _prepared(embeddings, emb_col)
    cents = ivf_centroids(prepared, n_lists)
    # one assignment pass serves both roles: rank 1 = the corpus filing,
    # ranks 1..n_probe = the query-side probe set (identical subtree ->
    # the window/exchange is computed once and reused)
    assign = ivf_assign(prepared, cents, n_keep=n_probe)
    lists = (
        assign.groupBy("lst")
        .agg(
            F.collect_list(
                F.when(F.col("rank") == 1, F.col("vec_id"))
            ).alias("ms"),
            F.collect_list("vec_id").alias("qs"),
        )
        .where(F.size("ms") >= 1)
        .select("ms", "qs")
    )
    scored = _bucket_topk_scores(lists, _gather_table(prepared), k, directed=True)
    return _scored_topk_out(scored.dropDuplicates(["q_id", "neighbor_id"]), k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    min_cos_q: int = 990_000,
    n_planes: int = N_PLANES,
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b) with
    cosine >= min_cos_q/1e6, found via the LSH buckets.
    Near-identical vectors land in the same bucket with probability
    ~(1 - theta/pi)^n_planes ~ 1 for tiny angles.

    r6 plan: one bucket-keyed shuffle collects member ids, each
    bucket's pair block is scored as one exact float64 dgemm and only
    the a < b pairs at or above the threshold are emitted (the r5
    self-equi-join shuffled both embedding payloads onto every
    in-bucket pair and paid an interpreted HOF dot per pair). Each
    vector has exactly ONE bucket, so no cross-bucket dedup exists to
    lose; .distinct() is kept because the oracle spells it."""
    prep = _prepared(embeddings, emb_col)
    prepared = with_lsh_bucket(prep, dim, n_planes)
    buckets = (
        prepared.groupBy("bucket")
        .agg(F.collect_list("vec_id").alias("ms"))
        .where(F.size("ms") >= 2)
        .select("ms")
    )
    table_bc = _gather_table(prep)

    def score(it):
        import numpy as np
        import pyarrow as pa

        ids, matf, n2 = table_bc.value
        sq = np.sqrt(n2.astype(np.float64))
        for batch in it:
            outa, outb, outc = [], [], []
            for ms in batch.to_pydict()["ms"]:
                mids = np.sort(np.asarray(ms, dtype=np.int64))
                mi = np.searchsorted(ids, mids)
                G = matf[mi]
                sqm = sq[mi]
                for lo in range(0, len(mids), _SCORE_CHUNK):
                    rid = mids[lo : lo + _SCORE_CHUNK]
                    S = matf[np.searchsorted(ids, rid)] @ G.T
                    C = _np_cos_q(S, sq[np.searchsorted(ids, rid)], sqm)
                    # upper triangle (vec_a < vec_b) at/above threshold
                    hit = (C >= min_cos_q) & (rid[:, None] < mids[None, :])
                    r, cix = np.nonzero(hit)
                    outa.append(rid[r])
                    outb.append(mids[cix])
                    outc.append(C[hit])
            if outa:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(outa), pa.int64()),
                        pa.array(np.concatenate(outb), pa.int64()),
                        pa.array(np.concatenate(outc), pa.int64()),
                    ],
                    names=["vec_a", "vec_b", "cos_q"],
                )

    return buckets.mapInArrow(
        score, "vec_a long, vec_b long, cos_q long"
    ).distinct()


def with_planted_vec_dupes(
    embeddings: DataFrame,
    every: int = 20,
    id_offset: int = 10_000_000,
    emb_col: str = "embedding",
) -> DataFrame:
    """Plant near-duplicate vectors: every ``every``-th vector is
    copied (vec_id + id_offset) with +0.001 added to its first
    element — cosine vs the original ~ 0.9999+. Mirrored in SQL."""
    mutated = (
        embeddings.where(F.col("vec_id") % every == 0)
        .withColumn("vec_id", F.col("vec_id") + F.lit(id_offset))
        .withColumn(
            emb_col,
            F.concat(
                F.array((F.element_at(F.col(emb_col), 1) + F.lit(0.001)).cast("float")),
                F.slice(F.col(emb_col), 2, 100_000),
            ),
        )
    )
    return embeddings.unionByName(mutated)
