"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path is an
LSH/IVF-style bucketed variant that prunes the candidate space with a
coarse quantizer before the exact rerank — both pure DataFrame
compositions (dot products via ``F.zip_with`` + ``F.aggregate``,
JVM-side; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _pair_cosine(a_vec: Column, b_vec: Column, a_norm: Column, b_norm: Column) -> Column:
    """cosine with the norms hoisted out: higher-order array folds are
    interpreted (not codegen'd), so computing ``l2_norm`` per PAIR costs
    2 extra 64-dim folds per candidate — precomputing it per VECTOR
    (it is a pure per-row function) cuts the fold count 3×. The value is
    bit-identical to :func:`cosine` (same sqrt of the same fold, merely
    evaluated earlier), so oracle parity is unaffected."""
    return dot(a_vec, b_vec) / (a_norm * b_norm)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, window top-k per query.

    Returns (q_id, vec_id, score, rank). The corpus-side scan
    parallelizes across partitions; the only shuffle is the final
    per-query top-k (tiny: k rows per query per partition after the
    window's partial ordering).
    """
    cn = corpus.withColumn("__cn", l2_norm(F.col(c_vec)))
    qn = queries.select(F.col(q_id), F.col(q_vec)).withColumn(
        "__qn", l2_norm(F.col(q_vec))
    )
    pairs = cn.crossJoin(F.broadcast(qn)).withColumn(
        "score",
        _pair_cosine(F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn")),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(c_id).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )


def _bucket_of(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane → integer."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes (driver-side, tiny, broadcast as
    literals into the plan)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets prune the
    candidate space (equi-join on bucket id instead of a cross join),
    then exact cosine rerank within candidates.

    With 2^n_planes buckets the pair space shrinks ~2^n_planes×; recall
    is tunable via n_planes (fewer planes = bigger buckets = higher
    recall). This is the 100 TB path: the bucket join shuffles on a
    small int key and never materializes the full pair space.
    """
    planes = deterministic_planes(dim, n_planes, seed)
    cb = corpus.withColumn("__bucket", _bucket_of(F.col(c_vec), planes)).withColumn(
        "__cn", l2_norm(F.col(c_vec))
    )
    qb = queries.withColumn("__bucket", _bucket_of(F.col(q_vec), planes)).withColumn(
        "__qn", l2_norm(F.col(q_vec))
    )
    pairs = cb.join(F.broadcast(qb), "__bucket").withColumn(
        "score",
        _pair_cosine(F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn")),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(c_id).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 3,
    threshold: float = 0.4,
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing — the
    default (scale-safe) near-dup API.

    Each hash table assigns every vector ONE random-hyperplane bucket;
    candidates are same-bucket pairs only, then the exact cosine filter.
    The plan is a bucket equi-join per table: the pair space never
    materializes O(n²) rows — expected bucket size n/2^n_planes bounds
    the fanout, and the join shuffles on a small int key.

    Recall knobs: fewer planes = bigger buckets = higher recall per
    table; ``n_tables > 1`` OR-combines independent plane sets (a pair
    is a candidate if it collides in ANY table — miss probability
    decays exponentially in n_tables) at proportional cost, exploded as
    (table, bucket) keys in ONE join, deduped per pair. The exact
    all-pairs formulation remains available as the oracle twin
    (``embedding_near_dups_exact`` in the query library) — do NOT use
    it beyond dim-table scale: it is a BroadcastNestedLoopJoin.

    Returns (id_a, id_b, cos) with id_a < id_b, cos ≥ threshold.
    """
    tables = [
        (t, deterministic_planes(dim, n_planes, seed + 1000 * t))
        for t in range(n_tables)
    ]
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("__n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        _bucket_of(F.col(vec_col), planes).alias("b"),
                    )
                    for t, planes in tables
                ]
            )
        ).alias("__tb"),
    ).select("id", "v", "__n", F.col("__tb.t").alias("__t"), F.col("__tb.b").alias("__bucket"))
    pairs = (
        b.alias("a")
        .join(b.alias("b"), ["__t", "__bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _pair_cosine(
                    F.col("a.v"), F.col("b.v"), F.col("a.__n"), F.col("b.__n")
                ),
                6,
            ).alias("cos"),
        )
    )
    if n_tables > 1:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs.filter(F.col("cos") >= threshold)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    out_col: str = "__cluster",
) -> Column | DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine).

    Centroids are driver-side literals broadcast into the plan (the
    coarse codebook is tiny even at 100 TB — thousands of entries);
    the argmax is the array_max-over-structs trick: one fused
    projection, no shuffle, no Python. The row vector's norm is folded
    once (not per centroid) and each centroid's norm is a precomputed
    literal — same doubles as folding in-plan, 2×|codebook| fewer
    interpreted array folds per row.
    """
    import math

    vn = l2_norm(F.col(vec_col))
    scored = []
    for cid, cvec in centroids:
        cv = F.array(*[F.lit(float(x)) for x in cvec])
        cn = math.sqrt(sum(float(x) * float(x) for x in cvec))
        scored.append(
            F.struct(
                (dot(F.col(vec_col), cv) / (F.col("__vn") * F.lit(cn))).alias("s"),
                F.lit(cid).alias("c"),
            )
        )
    best = F.array_max(F.array(*scored))
    return df.withColumn("__vn", vn).withColumn(out_col, best["c"]).drop("__vn")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k.

    Build: a coarse codebook of ``n_clusters`` centroids (deterministic:
    hash-spread corpus vectors — at scale you'd Lloyd-iterate, but
    centroid quality only moves recall, not the plan shape); every
    corpus vector is assigned to its nearest centroid (one projection).
    Query: each query probes its ``nprobe`` nearest clusters and
    brute-forces only those inverted lists — the candidate space shrinks
    ~n_clusters/nprobe×. The probe join shuffles on a small int key;
    the codebook and the query set are broadcast.
    """
    # hash-spread centroid pick, ordered by md5 of the id so the exact
    # same codebook is derivable in plain SQL (the DuckDB oracle mirrors
    # this ORDER BY md5(CAST(id AS VARCHAR)) LIMIT n); at scale you'd
    # Lloyd-iterate, which only moves recall, not the plan shape.
    cents = [
        (int(r[0]), list(r[1]))
        for r in corpus.select(c_id, c_vec)
        .withColumn("__h", F.md5(F.col(c_id).cast("string")))
        .orderBy("__h")
        .limit(n_clusters)
        .collect()
    ]
    import math

    cb = ivf_assign(corpus, cents, c_vec).withColumn("__cn", l2_norm(F.col(c_vec)))

    # per query: nprobe nearest clusters → (q, cluster) probe pairs
    probes = []
    for cid, cvec in cents:
        cv = F.array(*[F.lit(float(x)) for x in cvec])
        cn = math.sqrt(sum(float(x) * float(x) for x in cvec))
        probes.append(
            F.struct(
                (dot(F.col(q_vec), cv) / (F.col("__qn") * F.lit(cn))).alias("s"),
                F.lit(cid).alias("c"),
            )
        )
    qp = queries.withColumn("__qn", l2_norm(F.col(q_vec))).withColumn(
        "__cluster",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(F.array(*probes))), 1, nprobe),
                lambda x: x["c"],
            )
        ),
    )
    pairs = cb.join(F.broadcast(qp), "__cluster").withColumn(
        "score",
        _pair_cosine(F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn")),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(c_id).asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "score", "rank")
    )
