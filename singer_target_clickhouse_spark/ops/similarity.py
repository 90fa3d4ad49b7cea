"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the baseline and the verifier.
  Dot products are ``zip_with`` + ``aggregate`` JVM expressions; the only
  shuffle is the top-k window. At 100 TB you broadcast the (small) query set
  and scan the corpus once.
- ``lsh_bucket_ann``: the scale path — deterministic random-hyperplane
  signatures bucket the corpus; queries probe their own bucket only, then
  exact-rerank inside it. Sub-linear candidate volume, same top-k plan shape.
- ``ivf_topk``: the other classic ANN scale path — an inverted-file (IVF)
  index with a deterministic sampled coarse quantizer: every vector is
  assigned to its nearest centroid (broadcast nested-loop + map-side
  ``max_by``), queries probe their ``nprobe`` nearest cells, and only those
  cells' members are exact-reranked.
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


def _staged_vec(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """(id, vec, nrm) staging used by every pair-scoring operator: the
    double-cast vector materializes in one projection, the norm reads the
    STAGED column in a second projection (CollapseProject keeps the
    non-cheap transform staged — referencing ``_as_double(col)`` twice in
    one select would evaluate the cast per reference).

    Precomputing the norm per VECTOR is the round-6 optimization: the
    per-pair ``cosine(a, b)`` re-derived both norms for every scored pair —
    an O(pairs·dim) interpreted overhead for an O(rows·dim) quantity (the
    dot/norm HOFs are CodegenFallback, evaluated element-by-element). The
    staged norm is the identical expression over the identical doubles, so
    every downstream similarity is bit-unchanged (same IEEE ops, same
    order) and the DuckDB oracles still value-match."""
    staged = df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        _as_double(F.col(vec_col)).alias(f"{prefix}_vec"),
    )
    return staged.select(
        f"{prefix}_id",
        f"{prefix}_vec",
        norm(F.col(f"{prefix}_vec")).alias(f"{prefix}_nrm"),
    )


def _pair_sim(a: str, b: str) -> Column:
    """Cosine of two staged vectors: one dot product per pair, norms read
    from the staging (bit-identical to ``cosine(a_vec, b_vec)``)."""
    return dot(F.col(f"{a}_vec"), F.col(f"{b}_vec")) / (
        F.col(f"{a}_nrm") * F.col(f"{b}_nrm")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): (query_id,
    neighbor_id, rank). Ties break on neighbor id for determinism. Norms
    are staged per vector (see ``_staged_vec``), not re-derived per pair."""
    c = _staged_vec(corpus, id_col, vec_col, "n")
    q = _staged_vec(queries, id_col, vec_col, "q")
    scored = q.join(F.broadcast(c), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", _pair_sim("q", "n").alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "rank")
    )


def plane_components(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplane components: component(p, j) =
    (int(md5(f'{seed}:{p}:{j}')[:15], 16) % 2001 - 1000) / 1000.0. Computed
    HOST-side (hashlib) and emitted as literal doubles — the earlier
    in-plan form (conv(substring(md5(lit),...))) built ~8 expression nodes
    per component and Catalyst spent MINUTES analyzing/folding the
    multi-table signature trees (67 s planning for 48 planes x 64 dims,
    data-independent). Identical values either way: both engines reduce the
    same integer arithmetic to the same IEEE double, which is what lets the
    DuckDB oracle reproduce signatures bit-exactly."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
            / 1000.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Deterministic random-hyperplane LSH signature (a bit per plane).
    Plane components derive from a hash of (seed, plane, component) — no
    stored model, reproducible across engines and replays.

    Round-6 plan shape: all plane components pack into ONE nested array
    literal and the per-plane projections run as a higher-order traversal of
    it, instead of ``n_planes`` separate per-plane expression trees each
    holding ``dim`` scalar literals. Catalyst sees ~20 nodes per signature
    rather than ~n_planes·dim — the 6-table x 8-plane x 64-dim staging in
    ``cosine_pairs_lsh`` measured ~1 s less driver-side plan work per build.
    Values are bit-identical: each plane's projection is the same
    zip_with/aggregate fold in the same order, and the bit sum adds exact
    powers of two (doubles represent them exactly for any n_planes < 53;
    callers use <= 16)."""
    planes = F.lit(plane_components(dim, n_planes, seed))
    powers = F.lit([float(2 ** p) for p in range(n_planes)])

    def proj(plane: Column) -> Column:
        return F.aggregate(
            F.zip_with(vec, plane, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bits = F.zip_with(
        planes, powers,
        lambda plane, pw: F.when(proj(plane) >= 0, pw).otherwise(F.lit(0.0)),
    )
    return F.aggregate(bits, F.lit(0.0), lambda a, b: a + b).cast("long")


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
    the query's bucket. Returns (query_id, neighbor_id, rank). Norms are
    staged per vector (see ``_staged_vec``), not re-derived per pair."""
    sig = lambda df, a: _staged_vec(df, id_col, vec_col, a).withColumn(  # noqa: E731
        f"{a}_sig", hyperplane_signature(F.col(f"{a}_vec"), dim, n_planes)
    )
    c = sig(corpus, "n")
    q = sig(queries, "q")
    scored = q.join(
        c, (F.col("q_sig") == F.col("n_sig")) & (F.col("q_id") != F.col("n_id"))
    ).select("q_id", "n_id", _pair_sim("q", "n").alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_stride: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF-flat) index: (query_id,
    neighbor_id, rank).

    Coarse quantizer: the vectors whose ``id % cell_stride == 0`` ARE the
    centroids — a deterministic uniform sample, the zero-training end of the
    IVF design space (k-means centroids drop into the same plan as a
    broadcast table; sampling keeps the whole operator reproducible across
    engines, which is what lets a DuckDB oracle value-match it).

    Plan shape, sized for 100 TB:
    - centroids broadcast (C ~ N/stride; choose stride so C*dim doubles fit
      a broadcast, e.g. C=sqrt(N) cells — the standard IVF sizing);
    - assignment is a broadcast nested-loop scan (N*C*dim flops, the same
      cost real IVF training/assignment pays) whose output carries THREE
      SCALARS per (vector, cell) — the vector itself stays out of the N*C
      intermediate (the first draft carried the dim-double array through
      every centroid comparison: ~20x row-size amplification at dim=64);
    - the winning cell per vector reduces through a map-side-combinable
      ``max_by``-only aggregate. ``max_by``'s struct-typed buffer keeps it
      off HashAggregate (Spark's fixed-width-buffer requirement), so the
      reduce is a partial SortAggregate — acceptable because its input
      rows are 3 scalars and the sort's comparisons are dwarfed by the
      dim-wide fma work that produced each row; the partial phase still
      combines map-side, so the only exchange carries one row per vector;
    - vectors re-attach by an id-keyed join with the corpus (N rows on
      both sides, the normal shuffle-hash path);
    - queries probe their ``nprobe`` nearest cells and broadcast into the
      inverted lists, so the rerank join is shuffle-free on the corpus side
      and touches ~nprobe/C of the data — the IVF speedup.
    - ties (assignment and rank) break on ascending cell / neighbor id, so
      output is deterministic given deterministic float sums.

    A hot cell (skewed quantizer) fans its members to every probing query;
    with sampled centroids cells are near-uniform by construction. Recall
    vs brute force is asserted in tests/test_ops.py.

    Round 6: vector and centroid norms are staged per ROW (``_staged_vec``)
    instead of re-derived inside the N*C fan-out — the per-pair cosine paid
    3 interpreted dim-wide HOF passes (dot + both norms) per (vector, cell)
    comparison; now the fan-out pays exactly one. Same expressions over the
    same doubles, so every similarity (and every assignment/rank tie-break)
    is bit-unchanged."""
    cents = _staged_vec(
        corpus.where((F.col(id_col) % cell_stride) == 0), id_col, vec_col, "cell"
    ).select(
        F.col("cell_id").alias("cell"),
        "cell_vec",
        "cell_nrm",
    )

    def scored_cells(df: DataFrame, a: str) -> DataFrame:
        # (id, cell, cell_sim) only — scalars through the N*C fan-out
        return (
            _staged_vec(df, id_col, vec_col, a)
            .crossJoin(F.broadcast(cents))
            .select(
                f"{a}_id",
                "cell",
                _pair_sim(a, "cell").alias("cell_sim"),
            )
        )

    # max_by over struct(sim, -cell): highest similarity wins, ties to the
    # lowest cell id — mirrored by the oracle's ORDER BY sim DESC, cell ASC.
    nassign = (
        scored_cells(corpus, "n")
        .groupBy("n_id")
        .agg(
            F.max_by(
                "cell", F.struct(F.col("cell_sim"), (-F.col("cell")).alias("tb"))
            ).alias("cell")
        )
        .join(_staged_vec(corpus, id_col, vec_col, "n"), "n_id")
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("cell_sim").desc(), F.col("cell").asc()
    )
    qprobe = (
        scored_cells(queries, "q")
        .withColumn("cn", F.row_number().over(wq))
        .where(F.col("cn") <= nprobe)
        .join(_staged_vec(queries, id_col, vec_col, "q"), "q_id")
        .select("q_id", "q_vec", "q_nrm", "cell")
    )
    scored = (
        F.broadcast(qprobe)
        .join(nassign, "cell")
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", _pair_sim("q", "n").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "rank"
        )
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, brute force: cosine above threshold,
    a_id < b_id. All-pairs nested-loop — the SMALL-N VERIFIER ONLY; the scale
    path is ``cosine_pairs_lsh`` (bucketed candidates, exact verify). Norms
    are staged per vector (see ``_staged_vec``)."""
    va = _staged_vec(df, id_col, vec_col, "a")
    vb = _staged_vec(df, id_col, vec_col, "b")
    return (
        va.join(vb, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(_pair_sim("a", "b"), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def signature_probes(sig: Column, n_planes: int, radius: int = 1) -> Column:
    """Multi-probe set for one LSH signature: the bucket itself plus every
    flip of up to ``radius`` bits — pairs within hamming distance <= radius
    become join candidates (1 + k + C(k,2) probes at radius 2)."""
    probes = [sig] + [sig.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    if radius >= 2:
        probes += [
            sig.bitwiseXOR(F.lit((1 << p) | (1 << q)))
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    return F.array(*probes)


#: Seed stride between OR-amplified signature tables (any odd constant works;
#: fixed so engine and oracle derive identical plane sets per table).
TABLE_SEED_STRIDE = 7919


def cosine_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
    probe_bits: int = 1,
) -> DataFrame:
    """Embedding near-dup pairs at scale: OR-amplified hyperplane-LSH bucket
    joins + exact cosine verify (no all-pairs cartesian).

    Per table, one side keeps its exact signature and the other explodes its
    multi-probe set (signature + all flips of <= ``probe_bits`` bits), so
    any pair within hamming distance ``probe_bits`` of each other's buckets
    is a candidate; candidates
    from all ``n_tables`` independent tables (plane seeds ``seed +
    TABLE_SEED_STRIDE * t``) union, dedup on (a_id, b_id), and only then
    fetch vectors for the exact verify. The only shuffles are the signature
    equi-joins (bucket-local fan-out) and the candidate dedup (id pairs
    only). Signatures are md5-derived, so a DuckDB oracle reproduces the
    exact output.

    Recall model (advisor round 2 — single-table hamming<=1 probing found
    only ~10% of cos>=0.35 pairs): a pair at cosine c agrees per plane with
    p = 1 - arccos(c)/pi; one table finds it with P1 = P[Binom(k, 1-p) <=
    probe_bits] (k = n_planes), and L tables with 1-(1-P1)^L. Size (L,
    probe_bits) to the target recall AND to plan size — the signature
    expression holds L*k*dim plane constants, and Catalyst/codegen time
    grows superlinearly in it (18 tables at radius 1 hit ~3 min of
    planning; 6 tables at radius 2 deliver the same measured 0.945 recall
    at cos>=0.35 on the sf0.01 corpus with a third of the expression —
    asserted as a sampled brute-force recall check in tests/test_ops.py).
    Low thresholds are inherently expensive for sign-random-projection LSH
    (p1/p0 gap shrinks toward 0.5): at c>=0.8, P1(radius 1)≈0.49 and L=4
    already reaches 0.93 with far fewer candidates."""
    sigs = [
        hyperplane_signature(
            F.col(vec_col), dim, n_planes, seed + TABLE_SEED_STRIDE * t
        ).alias(f"sig{t}")
        for t in range(n_tables)
    ]
    # ONE staged projection carries all table signatures, then ONE bucket
    # join keyed on (table, signature) — the minhash banding pattern. A
    # per-table join loop (the first draft) duplicated the n_tables
    # signature expression trees into every join branch (18 tables ->
    # ~18^2 sig trees in the plan) and planning/codegen blew up.
    #
    # Branch layout (round-5): the signature frame (id + n_tables longs) is
    # lazily localCheckpointed, so the L*k*dim-literal expression tree exists
    # in exactly ONE plan — `exact` and `probed` read the materialized
    # scalars (at scale this IS the signature table every LSH system
    # materializes), and the verify branches (`va`/`vb`) derive from a
    # sig-free projection. The previous layout inlined the literal tree
    # into all four branches and Catalyst analysis walked each copy.
    v = df.select(F.col(id_col).alias("id"), *sigs).localCheckpoint(eager=False)
    exact = v.select(
        "id",
        F.posexplode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), F.col(f"sig{t}").alias("key"))
                for t in range(n_tables)
            ])
        ).alias("__i", "tk"),
    ).select("id", "tk.t", "tk.key")
    def tag(t: int):
        # NB: single-arg closure — a `lambda p, t=t` would have arity 2 and
        # pyspark would pass the ARRAY INDEX as the second argument,
        # silently replacing the table id (HOF arity comes from the Python
        # signature).
        return lambda p: F.struct(F.lit(t).alias("t"), p.alias("key"))

    probed = v.select(
        F.col("id").alias("b_id"),
        F.explode(
            F.flatten(
                F.array(*[
                    F.transform(
                        signature_probes(F.col(f"sig{t}"), n_planes, probe_bits), tag(t)
                    )
                    for t in range(n_tables)
                ])
            )
        ).alias("tk"),
    ).select("b_id", F.col("tk.t").alias("bt"), F.col("tk.key").alias("probe"))
    cand = (
        exact.join(
            probed,
            (F.col("t") == F.col("bt"))
            & (F.col("key") == F.col("probe"))
            & (F.col("id") < F.col("b_id")),
        )
        .select(F.col("id").alias("a_id"), "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    # exact verify on candidates only; norms staged per vector so each
    # candidate pair pays ONE interpreted dot instead of dot + two norms
    # (bit-identical values, see _staged_vec)
    va = _staged_vec(df, id_col, vec_col, "a")
    vb = _staged_vec(df, id_col, vec_col, "b")
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(_pair_sim("a", "b"), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
