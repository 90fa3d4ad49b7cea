"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the baseline and the verifier.
  Dot products are ``zip_with`` + ``aggregate`` JVM expressions; the only
  shuffle is the top-k window. At 100 TB you broadcast the (small) query set
  and scan the corpus once.
- ``lsh_bucket_ann``: the scale path — deterministic random-hyperplane
  signatures bucket the corpus; queries probe their own bucket only, then
  exact-rerank inside it. Sub-linear candidate volume, same top-k plan shape.
- ``cosine_pairs``: all pairs above a threshold (embedding near-dup dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): (query_id,
    neighbor_id, rank). Ties break on neighbor id for determinism."""
    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    scored = q.join(F.broadcast(c), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "rank")
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Deterministic random-hyperplane LSH signature (a bit per plane).
    Plane components derive from a hash of (seed, plane, component) — no
    stored model, reproducible across engines and replays."""
    bits = []
    for p in range(n_planes):
        comps = [
            (F.conv(F.substring(F.md5(F.lit(f"{seed}:{p}:{j}")), 1, 15), 16, 10).cast("long")
             % 2001 - 1000).cast("double") / 1000.0
            for j in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*comps),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** p))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, exact-rerank within
    the query's bucket. Returns (query_id, neighbor_id, rank)."""
    sig = lambda df, a: df.select(  # noqa: E731
        F.col(id_col).alias(f"{a}_id"),
        _as_double(F.col(vec_col)).alias(f"{a}_vec"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias(f"{a}_sig"),
    )
    c = sig(corpus, "n")
    q = sig(queries, "q")
    scored = q.join(
        c, (F.col("q_sig") == F.col("n_sig")) & (F.col("q_id") != F.col("n_id"))
    ).select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "rank")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cosine above threshold, a_id < b_id."""
    v = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec"))
    return (
        v.alias("a")
        .join(v.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
