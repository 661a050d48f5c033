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


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` defaults to the corpus itself filtered elsewhere; the
    query side is broadcast (small by construction), so the big corpus
    is never shuffled — the join is map-side, followed by a top-k
    window partitioned by query (k*|queries| rows reach the shuffle)."""
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

    ``max_bucket`` drops degenerate hot buckets BEFORE the self-join
    (a bucket of B members contributes B^2/2 pairs — at 10^9 rows a
    stop-bucket is quadratic death, and real LSH systems cap or
    re-split). The guard is a constant-memory count aggregation; both
    it and the join probe shuffle the same banded subtree, so
    ReuseExchange computes the banding once."""
    prepared = _prepared(embeddings, emb_col)
    banded = banded_table_keys(prepared, dim, n_tables, planes_per_table)
    safe = (
        banded.groupBy("tbl", "key")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") <= max_bucket)
        .select("tbl", "key")
    )
    guarded = banded.join(safe, ["tbl", "key"])
    a = guarded.select(F.col("vec_id").alias("q_id"), "tbl", "key")
    pairs = (
        a.join(guarded, ["tbl", "key"])
        .where(F.col("q_id") < F.col("vec_id"))
        .select(F.col("q_id").alias("id_a"), F.col("vec_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return exact_rerank_topk_symmetric(pairs, prepared, k)


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
    bit-for-bit."""
    prepared = _prepared(embeddings, emb_col)
    cents = ivf_centroids(prepared, n_lists)
    # one assignment pass serves both roles: rank 1 = the corpus filing,
    # ranks 1..n_probe = the query-side probe set (identical subtree ->
    # the window/exchange is computed once and reused)
    assign = ivf_assign(prepared, cents, n_keep=n_probe)
    corpus_assign = assign.where(F.col("rank") == 1).select("vec_id", "lst")
    probes = assign.select(F.col("vec_id").alias("q_id"), "lst")
    cand = (
        probes.join(corpus_assign, "lst")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .dropDuplicates(["q_id", "vec_id"])
    )
    return exact_rerank_topk(cand, prepared, k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    min_cos_q: int = 990_000,
    n_planes: int = N_PLANES,
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b) with
    cosine >= min_cos_q/1e6, found via the LSH bucket equi-join.
    Near-identical vectors land in the same bucket with probability
    ~(1 - theta/pi)^n_planes ~ 1 for tiny angles."""
    prepared = with_lsh_bucket(_prepared(embeddings, emb_col), dim, n_planes)
    a = prepared.select(
        F.col("vec_id").alias("vec_a"),
        F.col("qe").alias("qe_a"),
        F.col("n2").alias("n2_a"),
        "bucket",
    )
    b = prepared.select(
        F.col("vec_id").alias("vec_b"),
        F.col("qe").alias("qe_b"),
        F.col("n2").alias("n2_b"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", int_dot(F.col("qe_a"), F.col("qe_b")))
        .withColumn("cos_q", cosine_q(F.col("dot"), F.col("n2_a"), F.col("n2_b")))
        .where(F.col("cos_q") >= min_cos_q)
        .select("vec_a", "vec_b", "cos_q")
        .distinct()
    )


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
