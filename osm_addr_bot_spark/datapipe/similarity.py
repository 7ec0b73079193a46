"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; two scale paths:
random-hyperplane LSH bucketing (probe only matching buckets — at 10^12
rows the bucket predicate replaces the full scan) and IVF
(nearest-of-n-centroids cells, probe the query's n_probe nearest
cells). Hyperplanes and centroid choice are deterministic md5-derived
so the DuckDB oracle can replay them exactly; iterative k-means
refinement of the IVF centroids is deliberately out of scope — it
changes WHERE cell boundaries fall, not the cell-filtered scan + local
top-k shape that matters for the plan, and md5-ranked sampling is
exactly k-means++'s seeding step.

All vector math is native (`F.zip_with` + `F.aggregate`), JVM-side.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def deterministic_planes(num_planes: int, dim: int, seed: str = "lsh") -> list[list[float]]:
    """Pseudo-random hyperplanes in [-1, 1), reproducible from md5 —
    identical in any engine that has md5."""
    planes = []
    for p in range(num_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            vals.append((int(h[:15], 16) / float(1 << 60)) * 2.0 - 1.0)
        planes.append(vals)
    return planes


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sign-bit string over the hyperplanes (native)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(_dot(vec, lit) >= 0, F.lit(1 << i)).otherwise(0)
    return bucket


def brute_force_topk(
    embeddings: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding", key: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        embeddings.select(
            F.col(key).alias("vec_id"),
            cosine_sim(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def lsh_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 6,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.
    At scale the bucket predicate prunes the scan (bucket is a stored,
    partition-prunable column); here it is computed inline."""
    planes = deterministic_planes(num_planes, len(query))
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query, plane)) >= 0:
            q_bucket += 1 << i
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        embeddings.withColumn("_bucket", lsh_bucket_expr(vec, planes))
        .filter(F.col("_bucket") == F.lit(q_bucket))
        .select(F.col(key).alias("vec_id"), cosine_sim(vec, q).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------- IVF
def ivf_centroids(
    embeddings: DataFrame, n_centroids: int = 32, vec_col: str = "embedding", key: str = "vec_id"
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer centroids: the ``n_centroids``
    vectors ranking first by md5 of their key — a reproducible
    pseudo-random sample (k-means++ seeding without the iterations; see
    module docstring). Returns [(cell_id, vector)] ordered by cell id.
    The collect is n_centroids rows — the coarse quantizer IS a
    broadcast-sized dim, never O(data)."""
    rows = (
        embeddings.select(F.col(key).alias("k"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.md5(F.col("k").cast("string")), "k")
        .limit(n_centroids)
        .collect()
    )
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def _cos_to_lit(vec: Column, lit_vec: list[float]) -> Column:
    lit = F.array(*[F.lit(float(v)) for v in lit_vec])
    return cosine_sim(vec, lit)


def ivf_assign_expr(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Cell id = argmax cosine over the centroid list, native exprs.
    Scores are rounded to 4 decimals before the argmax (matching the
    oracle's fp-safety convention); ties break to the LARGER cell id
    (array_max on struct<score, id> — mirrored in SQL)."""
    scored = F.array(
        *[
            F.struct(
                F.round(_cos_to_lit(vec, cvec), 4).alias("s"), F.lit(cid).alias("i")
            )
            for cid, cvec in centroids
        ]
    )
    return F.array_max(scored)["i"]


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 4,
    vec_col: str = "embedding",
    key: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k, IVF shape: score only vectors whose cell is
    among the query's ``n_probe`` nearest centroids. At scale the cell
    id is a stored partition/cluster key, so the cell predicate prunes
    the scan exactly like the LSH bucket does — recall is tuned by
    n_probe instead of plane count."""
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, vec_col, key)

    def _cos_py(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    probe = sorted(
        ((round(_cos_py(query, cvec), 4), cid) for cid, cvec in centroids),
        key=lambda t: (-t[0], -t[1]),
    )[:n_probe]
    probe_cells = [cid for _, cid in probe]
    vec = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        embeddings.withColumn("_cell", ivf_assign_expr(vec, centroids))
        .filter(F.col("_cell").isin(probe_cells))
        .select(F.col(key).alias("vec_id"), cosine_sim(vec, q).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    k: int = 3,
    num_planes: int = 3,
    vec_col: str = "embedding",
    key: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup detection, scale path: top-k cosine neighbors
    within each (label, LSH-bucket) block.

    Label alone is NOT a scale-safe blocking key — with ~10 labels each
    block is ~10% of the corpus and the within-block all-pairs is
    O(n²/10). The random-hyperplane bucket subdivides every label into
    2^num_planes cells whose population shrinks with num_planes, so the
    per-block pair count is tunable independently of corpus size (at
    10^12 rows: more planes, same math). Trade-off: a true near-dup pair
    split by a hyperplane is missed — standard LSH recall, raised by
    num_planes↓ or multi-probe. Deterministic md5-derived planes keep
    the DuckDB oracle bit-identical.
    """
    from pyspark.sql import Window

    if dim is None:
        # plan-construction-time job: acceptable interactively, but pass
        # dim explicitly in pipelines — and empty input has no dim at all
        row = embeddings.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if row is None:
            kt = embeddings.schema[key].dataType.simpleString()
            lt = embeddings.schema["label"].dataType.simpleString()
            return embeddings.sparkSession.createDataFrame(
                [], f"vec_a {kt}, vec_b {kt}, label {lt}, cosine double"
            )
        dim = len(row[0])
    planes = deterministic_planes(num_planes, dim)
    e = embeddings.select(
        F.col(key).alias("vec_id"),
        F.col("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", lsh_bucket_expr(F.col("v"), planes))
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.label").alias("label"),
        cosine_sim(F.col("a.v"), F.col("b.v")).alias("cosine"),
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc(F.round("cosine", 4)), "vec_b")
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def pairwise_topk_per_label(
    embeddings: DataFrame, k: int = 3, vec_col: str = "embedding", key: str = "vec_id"
) -> DataFrame:
    """Embedding near-dup detection, EXACT small-scale variant: top-k
    cosine neighbors within each label group. The label block bounds the
    join but stays O(n²/#labels) — use embedding_near_dups at scale."""
    from pyspark.sql import Window

    e = embeddings.select(
        F.col(key).alias("vec_id"), F.col("label"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
    )
    # rank on the ROUNDED score: engines may differ in the last ulp of a
    # float dot product, and a raw-score order could flip the k-boundary
    w = Window.partitionBy("vec_a").orderBy(F.desc(F.round("cosine", 4)), "vec_b")
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")
