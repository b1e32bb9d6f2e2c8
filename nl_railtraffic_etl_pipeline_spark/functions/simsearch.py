"""Similarity search over embedding columns (``array<float>``).

Two strategies (SURVEY north-star: ANN over the ``embeddings`` table):

- ``knn_bruteforce``: exact top-k cosine for a (small) query set — the
  query side is broadcast, the corpus side streams; one shuffle for the
  per-query top-k (window).  Exact baseline and verification oracle.
- ``lsh_bucket_topk``: random-hyperplane LSH — deterministic md5-derived
  hyperplanes, sign-bit bucket key, candidates restricted to matching
  buckets (multi-probe over bands).  Sub-quadratic scale path: at 100 TB
  the corpus is bucketed once (write-side partitioning) and each query
  touches its band buckets only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _materialize, _spread, cosine


def knn_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Deterministic: cosine rounded to 6 before ranking, ties broken by
    neighbor id.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = _spread(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    )
    cos = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _assign_to_centroids(
    base: DataFrame, cents: DataFrame, dim: int | None
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    cosine argmax with centroid_id tiebreak — the partition-by-list step."""
    from .dedup import _dot

    cent_cos = F.round(
        _dot(F.col("_v"), F.col("cv"), dim) / (F.col("_n") * F.col("cn")), 6
    )
    w_assign = Window.partitionBy("_id").orderBy(
        F.desc("_ccos"), F.asc("centroid_id")
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .withColumn("_ccos", cent_cos)
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select("_id", "_v", "_n", "centroid_id")
    )


def kmeans_centroids(
    base: DataFrame,
    n_centroids: int = 8,
    max_iter: int = 5,
    dim: int | None = None,
    train_mod: int | None = None,
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means over (_id, _v, _n) rows.

    Public algorithm (Lloyd 1982), Spark-first: each iteration is one
    broadcast-assignment (cosine argmax, centroid_id tiebreak) plus one
    elementwise-mean aggregation — per-position DECIMAL(38,18) sums, so
    the result is bit-identical under ANY partitioning / AQE replan (double
    addition does not commute; decimal addition does).  Init is the
    ``n_centroids`` lowest-id vectors (deterministic; a k-means|| sampler
    would slot in without changing the contract).  Empty clusters keep
    their previous centroid.  Each iteration's 8-row centroid table is
    checkpointed so the plan stays flat across iterations.

    ``train_mod``: at 100 TB Lloyd's does not iterate the full corpus —
    train on the deterministic 1/train_mod id-hash sample
    (``xxhash64(_id) % train_mod == 0``; reproducible under ANY
    partitioning, unlike ``DataFrame.sample``), then assign ALL vectors
    once.  ``None`` trains on everything (the gate setting).
    """
    from .dedup import _materialize, _norm

    if train_mod is not None:
        base = base.filter(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(train_mod)) == 0
        )
    w_init = Window.orderBy("_id")
    cents = _materialize(
        base.orderBy("_id")
        .limit(n_centroids)
        .select(
            (F.row_number().over(w_init) - 1).alias("centroid_id"),
            F.col("_v").alias("cv"),
            F.col("_n").alias("cn"),
        )
    )
    for _ in range(max_iter):
        memb = _assign_to_centroids(base, cents, dim)
        means = (
            memb.select("centroid_id", F.posexplode("_v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
        )
        newc = means.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m,
            ).alias("cv")
        )
        cents = _materialize(
            cents.select("centroid_id", F.col("cv").alias("_prev_cv"))
            .join(newc, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("cv", "_prev_cv").alias("cv"),
            )
            .withColumn("cn", _norm(F.col("cv")))
        )
    return cents


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 8,
    max_iter: int = 5,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids_path: str | None = None,
    train_mod: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: ``(centroids, assigned lists)``, materialized.

    Index construction is the offline phase of any ANN engine — at cluster
    scale ``assigned`` is written out bucketed by ``centroid_id`` so each
    probe touches only its buckets' files; here the materialized frames
    play that role and are reusable across queries.

    1. **Coarse centroids**: deterministic Lloyd's k-means
       (``kmeans_centroids``) — real cluster centers, so probe recall is a
       property of the data, not of an id-sampling accident.
    2. **Assignment**: every vector joins its nearest centroid (broadcast
       cross join over ``n_centroids`` rows, cosine argmax with id
       tiebreak) — this is the partition-by-list step.

    ``centroids_path`` materializes the centroid table as parquet — the
    published index artifact.  Downstream (and the DuckDB correctness
    oracle) consume the WRITTEN table, so both engines score against the
    same centroid bits.
    """
    from .dedup import _materialize, _norm, _spread

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _materialize(
        _spread(
            embeddings.select(
                F.col(id_col).alias("_id"), vd.alias("_v"), _norm(vd).alias("_n")
            )
        )
    )
    cents = kmeans_centroids(base, n_centroids, max_iter, dim, train_mod)
    if centroids_path is not None:
        cents.write.mode("overwrite").parquet(centroids_path)
        # Re-read then checkpoint: the index serves the exact bits the
        # published artifact holds, independent of later writes to the path.
        cents = _materialize(
            embeddings.sparkSession.read.parquet(centroids_path)
        )
    assigned = _materialize(_assign_to_centroids(base, cents, dim))
    return cents, assigned


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize, probe, rank.

    ``index`` is a prebuilt ``ivf_build`` result (the offline artifact);
    when omitted the index is built inline.

    3. **Probe + rank**: each query scores the ``nprobe`` nearest
       centroids, then ranks exact cosine only within those lists.

    Recall is tunable via ``nprobe``/``n_centroids``; candidates scanned
    per query drop from N to ~N*nprobe/n_centroids.
    """
    from .dedup import _dot

    if index is None:
        index = ivf_build(
            embeddings, n_centroids, dim=dim, vec_col=vec_col, id_col=id_col
        )
    cents, assigned = index

    def _cos(va, na, vb, nb) -> F.Column:
        return F.round(_dot(va, vb, dim) / (na * nb), 6)

    q = assigned.filter(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("_ccos"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_ccos", _cos(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn")))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "centroid_id")
    )

    cand_cos = _cos(F.col("qv"), F.col("qn"), F.col("_v"), F.col("_n"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    # probes is |queries| x nprobe rows — always the broadcast side; the
    # assigned corpus streams (SMJ here would shuffle the whole corpus).
    return (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            cand_cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )


def hyperplane_components(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j of plane i is
    ``h32("p<i>:<j>")`` mapped to [-1, 1] — reproducible on any engine.

    Evaluated driver-side with the md5 formula shared with the oracle
    dialect (functions/text.py docstring); the same float literals are
    embedded in the Spark plan and in the DuckDB oracle SQL.
    """
    import hashlib

    return [
        (int(hashlib.md5(f"p{plane_idx}:{j}".encode()).hexdigest()[:8], 16))
        % 2001
        / 1000.0
        - 1.0
        for j in range(dim)
    ]


def _hyperplane(dim: int, plane_idx: int) -> F.Column:
    return F.array(*[F.lit(c) for c in hyperplane_components(dim, plane_idx)])


def lsh_signature(vec, dim: int, num_planes: int = 8) -> F.Column:
    """Sign-bit signature of ``vec`` against the deterministic hyperplanes."""
    bits = []
    for i in range(num_planes):
        plane = _hyperplane(dim, i)
        dot = F.aggregate(
            F.zip_with(
                F.transform(vec, lambda x: x.cast("double")),
                plane,
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(2**i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_build(
    embeddings: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Build the LSH index: every vector tagged with its bucket signature.

    The offline phase — at cluster scale this frame is written out
    partitioned by ``_sig``; materialized here so both join branches (and
    repeated queries) reuse it instead of recomputing the 8-plane fold.
    """
    sig = lsh_signature(F.col(vec_col), dim, num_planes)
    return _materialize(
        _spread(
            embeddings.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_v"),
                sig.alias("_sig"),
            )
        )
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Equi-join on the signature (hash shuffle on an int key) replaces the
    cross join — the plan that survives a 1000-executor corpus.  Recall is
    tunable via ``num_planes`` (fewer planes = bigger buckets).  ``index``
    is a prebuilt ``lsh_build`` result; built inline when omitted.
    """
    tagged = (
        index
        if index is not None
        else lsh_build(embeddings, dim, num_planes, vec_col, id_col)
    )
    q = tagged.filter(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_sig").alias("_sig"),
    )
    cos = F.round(cosine(F.col("qv"), F.col("_v")), 6)
    scored = (
        tagged.join(F.broadcast(q), "_sig")
        .filter(F.col("_id") != F.col("query_id"))
        .select(
            "query_id", F.col("_id").alias("neighbor_id"), cos.alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def group_centroids(
    embeddings: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group mean-pooled embedding (the vector-aggregation primitive:
    class prototypes, cluster summaries, user profiles from item vectors).

    Returns (group_col, dim, centroid, n_vectors) — one row per group and
    vector position, centroid rounded to 6.  ``n_vectors`` counts the
    FINITE elements that entered the mean at that position.

    Non-finite elements (NULL, NaN, ±Inf) are EXCLUDED from both the sum
    and the count before aggregation — without the guard Spark's SUM
    silently drops them (NaN casts to decimal as NULL in non-ANSI mode)
    while still counting them in the denominator, biasing the mean, and
    an oracle engine that errors on ``CAST('nan' AS DECIMAL)`` diverges
    entirely.  Filtering them symmetrically gives both engines one
    defined semantics: the centroid is the mean of the finite values.

    Per-position sums are DECIMAL(38,18), so the mean is independent of
    partitioning and AQE replan (double addition does not commute across
    an arbitrary reduction tree; decimal addition does) — the same
    contract as the k-means index build (``_kmeans_fit``).  The
    float->decimal conversion goes through the float's shortest-roundtrip
    STRING: engines disagree in the last ulp when converting binary
    floats to decimal directly (shortest-repr vs exact expansion), but
    every engine prints the same shortest string, so string-parsed
    decimals sum bit-identically anywhere.  Plan shape: one posexplode
    (map-side) + one (group, dim)-keyed aggregation; state per reducer is
    a single decimal — scale-invariant.
    """
    x = F.col("x")
    finite = x.isNotNull() & ~F.isnan(x) & (F.abs(x) != F.lit(float("inf")))
    exact = x.cast("string").cast("decimal(38,18)")
    return (
        embeddings.select(group_col, F.posexplode(vec_col).alias("dim", "x"))
        .filter(finite)
        .groupBy(group_col, "dim")
        .agg(
            F.round(
                F.sum(exact).cast("double") / F.count("*"), 6
            ).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
    )


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column — the
    4x memory compression step before shipping vectors to an ANN index.

    Per vector: ``scale = max|x| / 127``; ``q[i] = trunc(x[i] / scale)``
    (toward zero, so every element lands in [-127, 127]).  Returns
    (id_col, scale, qvec, max_abs_err) with the reconstruction error
    ``max|x - q*scale|`` as the quantization-quality signal.  All
    arithmetic is elementwise IEEE (one division, one truncation per
    element — no accumulation), so results are bit-identical cross-engine;
    an all-zero vector quantizes to zeros with scale 0.

    Plan shape: pure map-side array expressions off the scan — no
    shuffle, no UDF, no collect; composes with column pruning (only the
    vector column is read).
    """
    base = emb.select(F.col(id_col), F.col(vec_col).alias("e"))
    staged = base.select(
        id_col,
        "e",
        (
            F.array_max(F.transform("e", lambda x: F.abs(x))) / F.lit(127.0)
        ).alias("scale"),
    )
    q = F.when(
        F.col("scale") > 0,
        F.transform("e", lambda x: (x / F.col("scale")).cast("int")),
    ).otherwise(F.transform("e", lambda x: F.lit(0)))
    staged = staged.select(id_col, "e", "scale", q.alias("qvec"))
    # Compute the error in its own projection, NOT alongside the rounded
    # output alias: a sibling `round(scale) AS scale` would capture the
    # `scale` reference via lateral column alias resolution and silently
    # measure error against the display-rounded scale.
    err = F.array_max(
        F.zip_with("e", "qvec", lambda x, qq: F.abs(x - qq * F.col("scale")))
    )
    staged = staged.select(id_col, "scale", "qvec", err.alias("_err"))
    return staged.select(
        F.col(id_col),
        F.round(F.col("scale"), 6).alias("scale"),
        F.col("qvec"),
        F.round(F.col("_err"), 6).alias("max_abs_err"),
    )


def hard_negatives(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: per anchor, the ``k`` most
    cosine-similar vectors carrying a DIFFERENT label — the highest-loss
    negatives a contrastive/triplet trainer wants.

    Same contract and plan shape as :func:`knn_bruteforce` (broadcast
    anchors, rounded cosine, id tiebreak) with the label-mismatch
    predicate in the join; this is the exact baseline — at corpus scale
    substitute the LSH-bucketed candidate generator (:func:`lsh_build` /
    :func:`lsh_bucket_topk`) and apply the same label filter to its
    candidates, exactly as sim_knn_lsh substitutes for sim_knn_bruteforce.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("q_label"),
    )
    from .dedup import _spread

    c = _spread(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.col(label_col).alias("n_label"),
        )
    )
    cos = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_label") != F.col("q_label"))
        .select(
            "query_id", "neighbor_id", "n_label", cos.alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("n_label").alias("neighbor_label"),
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def silhouette(
    assigned: DataFrame,
    cents: DataFrame,
    dim: int | None = None,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per vector — the standard
    clustering-quality readout: ``s = (b - a) / max(a, b)`` where ``a``
    is the cosine distance to the OWN centroid and ``b`` the distance to
    the nearest OTHER centroid.  ``s`` near 1 = well inside its cluster,
    near 0 = on a boundary, negative = probably mis-assigned.

    Full silhouette averages pairwise distances inside each cluster —
    quadratic per cluster and hopeless at corpus scale; the centroid
    form is the accepted linear substitute (one pass over vectors x K
    centroids) and what the IVF index actually optimizes.

    Inputs are :func:`ivf_build` outputs.  All cosines go through the
    same rounded-6 contract as assignment/probing, so ``a`` and ``b``
    are engine-replayable; the closing chain is one subtraction, one
    ``greatest``, one division.  ``s = 0`` when both distances are zero
    (duplicate of its centroid and of another).

    Plan: K-row broadcast cross join (K = n_centroids, metadata-scale)
    + ONE _id-keyed partial-aggregated shuffle.  Output: (vec_id,
    centroid_id, dist_own, dist_other, silhouette).
    """
    from .dedup import _dot

    k = F.round(
        _dot(F.col("_v"), F.col("cv"), dim) / (F.col("_n") * F.col("cn")),
        6,
    )
    per = assigned.crossJoin(
        F.broadcast(
            cents.select(
                F.col("centroid_id").alias("_cid"), "cv", "cn"
            )
        )
    ).select(
        "_id",
        "centroid_id",
        F.col("_cid"),
        k.alias("_c"),
    )
    ag = per.groupBy("_id", "centroid_id").agg(
        F.max(
            F.when(F.col("_cid") == F.col("centroid_id"), F.col("_c"))
        ).alias("_cos_own"),
        F.max(
            F.when(F.col("_cid") != F.col("centroid_id"), F.col("_c"))
        ).alias("_cos_other"),
    )
    a = F.lit(1.0) - F.col("_cos_own")
    b = F.lit(1.0) - F.col("_cos_other")
    return ag.select(
        F.col("_id").alias("vec_id"),
        "centroid_id",
        a.alias("dist_own"),
        b.alias("dist_other"),
        F.when(
            F.greatest(a, b) > 0,
            F.round((b - a) / F.greatest(a, b), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("silhouette"),
    )


def pq_encode(
    embeddings: DataFrame,
    dim: int,
    m: int = 4,
    n_centroids: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Product quantization (Jegou et al. 2011): split each vector into
    ``m`` subvectors, k-means each subspace independently, and encode
    every vector as ``m`` small centroid ids — the memory-compression
    layer under billion-scale ANN (codes are m bytes instead of dim
    floats; IVF+PQ is the standard pairing).

    Deterministic end to end: each subspace codebook comes from the
    same exact-decimal Lloyd's as the IVF index (:func:`kmeans_centroids`
    — cosine argmax, id-tiebreak init); assignment is a cosine argmax
    with centroid_id tiebreak.  ``codebook_path`` publishes the
    codebook parquet so downstream (and the correctness oracle) scores
    against the exact written bits — the ivf_build contract.
    Zero-norm subvectors are assumed absent (assert upstream: a zero
    subvector has no cosine-nearest codeword).

    Returns (codebook, codes): codebook = (subspace, centroid_id, cv,
    cn); codes = (id_col, subspace, code) in long form.

    100 TB shape: the ``m`` trainings iterate the corpus (sampling via
    kmeans_centroids' ``train_mod`` slots in); encoding is ONE pass —
    the m slices posexplode map-side, the m*n_centroids-row codebook
    broadcasts, argmax is a (vector, subspace)-keyed window whose frame
    is the codebook size.  No shuffle grows with m.
    """
    from .dedup import _dot, _materialize, _norm, _spread

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    full = _materialize(
        _spread(
            embeddings.select(F.col(id_col).alias("_id"), vd.alias("_full"))
        )
    )
    codebook = None
    for s in range(m):
        sl = F.slice(F.col("_full"), s * sub + 1, sub)
        base_s = _materialize(
            full.select("_id", sl.alias("_v"), _norm(sl).alias("_n"))
        )
        cents = kmeans_centroids(base_s, n_centroids, max_iter, sub).select(
            F.lit(s).cast("int").alias("subspace"), "centroid_id", "cv", "cn"
        )
        codebook = cents if codebook is None else codebook.unionByName(cents)
    if codebook_path is not None:
        codebook.write.mode("overwrite").parquet(codebook_path)
        codebook = _materialize(
            embeddings.sparkSession.read.parquet(codebook_path)
        )
    else:
        codebook = _materialize(codebook)
    slices = F.array(
        *[F.slice(F.col("_full"), s * sub + 1, sub) for s in range(m)]
    )
    long = full.select(
        "_id", F.posexplode(slices).alias("subspace", "_v")
    ).withColumn("_n", _norm(F.col("_v")))
    cos = F.round(
        _dot(F.col("_v"), F.col("cv"), sub) / (F.col("_n") * F.col("cn")), 6
    )
    w = Window.partitionBy("_id", "subspace").orderBy(
        F.desc("_ccos"), F.asc("centroid_id")
    )
    codes = (
        long.join(F.broadcast(codebook), "subspace")
        .withColumn("_ccos", cos)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("subspace").cast("int").alias("subspace"),
            F.col("centroid_id").cast("int").alias("code"),
        )
    )
    return codebook, codes


def pq_fidelity(
    embeddings: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    dim: int,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Reconstruction fidelity of PQ codes: cosine between each vector
    and its codeword reconstruction — the governance readout for a
    deployed codebook (pair of :func:`pq_encode`, as sim_ivf_recall is
    to the IVF index).  Distortion shows up as fidelity < 1.

    The cosine decomposes over subspaces: ``dot(v, r) = SUM_s
    dot(v_s, c_s)`` and ``|r|^2 = SUM_s |c_s|^2`` — each per-subspace
    term is the deterministic sequential fold (`_dot`), and the
    cross-subspace sums go through exact DECIMAL so the result is
    partition-order-free; the final chain is ``dot / (|v| * sqrt(|r|^2))``
    (sqrt correctly rounded), rounded to the repo-wide cosine-6 contract.

    Plan: the m slices posexplode map-side; codes join vector-keyed
    (the code table is corpus-sized); the m*k codebook broadcasts; one
    vector-keyed partial agg.
    """
    from .dedup import _dot, _norm

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    full = embeddings.select(
        F.col(id_col).alias("_id"), vd.alias("_full"), _norm(vd).alias("_vn")
    )
    slices = F.array(
        *[F.slice(F.col("_full"), s * sub + 1, sub) for s in range(m)]
    )
    long = full.select(
        "_id", "_vn", F.posexplode(slices).alias("subspace", "_v")
    )
    joined = long.join(
        codes.select(
            F.col(id_col).alias("_id"), "subspace", F.col("code")
        ),
        ["_id", "subspace"],
    ).join(
        F.broadcast(
            codebook.select(
                "subspace",
                F.col("centroid_id").alias("code"),
                "cv",
                "cn",
            )
        ),
        ["subspace", "code"],
    )
    pdot = _dot(F.col("_v"), F.col("cv"), sub)
    per_vec = joined.groupBy("_id").agg(
        F.sum(pdot.cast("decimal(38,18)")).alias("_dot_sum"),
        F.sum((F.col("cn") * F.col("cn")).cast("decimal(38,18)")).alias(
            "_r2_sum"
        ),
        F.max("_vn").alias("_vn"),
    )
    return per_vec.select(
        F.col("_id").alias(id_col),
        F.round(
            F.col("_dot_sum").cast("double")
            / (F.col("_vn") * F.sqrt(F.col("_r2_sum").cast("double"))),
            6,
        ).alias("fidelity"),
    )


def negative_sampling(
    embeddings: DataFrame,
    k: int = 4,
    oversample: int = 3,
    salt: str = "neg",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Deterministic UNIFORM negative sampling for contrastive training:
    per anchor, ``k`` pseudo-random different-label vectors — the cheap
    companion to :func:`hard_negatives` (most contrastive recipes mix
    uniform negatives with a few mined hard ones).

    Randomness is the repo md5 contract: draw ``j``'s candidate id is
    ``hash32(salt:anchor:j) % n`` — a COMPUTED KEY, so candidates are
    fetched with ONE id-keyed equi-join against the corpus instead of
    any per-anchor scan; same-label and self collisions are dropped and
    the survivors keep their draw order (first ``k`` win).  An anchor
    can legitimately come back with fewer than ``k`` rows if too many
    draws collide — oversample bounds that risk and the behavior is
    bit-identical in the oracle.

    Scale shape: map-side explode of ``k * oversample`` draws per
    anchor, one 1-row count broadcast, ONE vec_id equi-join, one
    anchor-keyed window over ≤ ``k * oversample`` rows.  Never a cross
    join — at corpus scale this is the only uniform-sampler shape that
    works (per-anchor ORDER BY rand() is a full sort per anchor).
    """
    from .text import hash32

    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    n1 = embeddings.agg(F.count("*").alias("_n"))
    draws = embeddings.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_a_label"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(k * oversample)))
        ).alias("draw_idx"),
    )
    cand_id = (
        hash32(
            F.concat(
                F.lit(f"{salt}:"),
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("draw_idx").cast("string"),
            )
        )
        % F.col("_n")
    )
    cand = draws.crossJoin(F.broadcast(n1)).select(
        "anchor_id", "_a_label", "draw_idx", cand_id.alias("_cand")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("_cand"),
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
    )
    ok = cand.join(corpus, "_cand").filter(
        (F.col("neg_label") != F.col("_a_label"))
        & (F.col("neg_id") != F.col("anchor_id"))
    )
    w = Window.partitionBy("anchor_id").orderBy("draw_idx")
    return (
        ok.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "anchor_id",
            F.col("draw_idx").cast("int").alias("draw_idx"),
            "neg_id",
            "neg_label",
            F.col("neg_rank").cast("int").alias("neg_rank"),
        )
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k_candidates: int = 8,
    k_select: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, public literature) — the retrieval-diversification pass a RAG
    pipeline runs between ANN recall and context assembly: greedily
    pick ``k_select`` of the top-``k_candidates`` neighbors, each round
    choosing argmax of lambda*rel - (1-lambda)*max-sim-to-selected with
    lambda = 1/2.

    Determinism: relevance and pairwise similarity ride as
    integer-scaled rounded cosines (rel6 = round(cos * 1e6) BIGINT), and
    with lambda = 1/2 the MMR ordering equals ordering by the INTEGER
    rel6 - maxsim6 — so selection is exact integer arithmetic with a
    (score DESC, neighbor_id) tie-break, bit-identical cross-engine.
    The first pick maximizes bare relevance (maxsim coalesces to 0).

    Plan: candidates come from :func:`knn_bruteforce` (broadcast query
    side); the pairwise-sim frame is candidates x candidates PER QUERY
    (k_candidates^2 rows per query — bounded by the fence, never
    corpus-sized) behind a compute-once barrier; each greedy round is a
    per-query window LIMIT over the candidate frame.  Output
    k_select rows per query: (query_id, position, neighbor_id, rel6,
    mmr2_6 = rel6 - maxsim6).
    """
    from pyspark.sql import Window

    cands = (
        knn_bruteforce(
            embeddings, query_ids, k=k_candidates,
            vec_col=vec_col, id_col=id_col,
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cosine") * 1e6).cast("bigint").alias("rel6"),
        )
        .localCheckpoint(eager=True)
    )
    ev = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    a = (
        cands.select("query_id", F.col("neighbor_id").alias("ca"))
        .join(ev, F.col("ca") == F.col("_id"))
        .select("query_id", "ca", F.col("_v").alias("va"))
    )
    b = (
        cands.select("query_id", F.col("neighbor_id").alias("cb"))
        .join(ev, F.col("cb") == F.col("_id"))
        .select("query_id", "cb", F.col("_v").alias("vb"))
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "query_id", "ca", "cb",
            F.round(
                F.round(cosine(F.col("va"), F.col("vb")), 6) * 1e6
            ).cast("bigint").alias("sim6"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("neighbor_id")
    )
    first = (
        cands.withColumn("_score", F.col("rel6"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.lit(1).cast("int").alias("position"),
            "neighbor_id",
            "rel6",
            F.col("rel6").alias("mmr2_6"),
        )
        .localCheckpoint(eager=True)
    )
    picks = [first]
    selected = first.select("query_id", "neighbor_id")
    for r in range(2, k_select + 1):
        remaining = cands.join(
            selected, ["query_id", "neighbor_id"], "left_anti"
        )
        ms = (
            sims.join(
                selected.select(
                    "query_id", F.col("neighbor_id").alias("cb")
                ),
                ["query_id", "cb"],
            )
            .groupBy("query_id", "ca")
            .agg(F.max("sim6").cast("bigint").alias("maxsim6"))
        )
        pick = (
            remaining.join(
                ms,
                (remaining.query_id == ms.query_id)
                & (remaining.neighbor_id == ms.ca),
            )
            .select(
                remaining.query_id,
                "neighbor_id",
                "rel6",
                (F.col("rel6") - F.col("maxsim6")).alias("_score"),
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                F.lit(r).cast("int").alias("position"),
                "neighbor_id",
                "rel6",
                F.col("_score").cast("bigint").alias("mmr2_6"),
            )
            .localCheckpoint(eager=True)
        )
        picks.append(pick)
        selected = selected.union(
            pick.select("query_id", "neighbor_id")
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.union(p)
    return out


def triplet_mining(
    embeddings: DataFrame,
    anchor_mod: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-hard triplet mining (Schroff et al. 2015 FaceNet convention,
    public literature) for contrastive-training data prep: per anchor,
    the hardest positive (nearest same-label vector) and the SEMI-HARD
    negative — the most similar different-label vector that is still
    LESS similar than the positive; when none qualifies, the hardest
    negative overall (the documented fallback), flagged.

    Anchors come from the deterministic ``vec_id % anchor_mod == 0``
    fence; similarity rides integer-scaled rounded cosines (cos6) so
    the semi-hard comparison ``neg_cos6 < pos_cos6`` and every argmax
    tie-break (cos6 DESC, vec_id) are exact cross-engine.  Anchors
    whose label has no second member yield no row on either engine.

    Plan: ONE broadcast of the fenced anchor frame against the corpus
    (the knn_bruteforce shape: anchors x corpus, bounded by the fence),
    two per-anchor window argmaxes.  Output per anchor:
    (anchor_id, pos_id, pos_cos6, neg_id, neg_cos6, semi_hard).
    """
    from pyspark.sql import Window

    anchors = embeddings.filter(
        F.col(id_col) % anchor_mod == 0
    ).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("av"),
        F.col(label_col).alias("alab"),
    )
    corpus = _spread(
        embeddings.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("cv"),
            F.col(label_col).alias("clab"),
        )
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "alab",
            "cand_id",
            "clab",
            F.round(F.round(cosine(F.col("av"), F.col("cv")), 6) * 1e6)
            .cast("bigint")
            .alias("cos6"),
        )
        .localCheckpoint(eager=True)
    )
    wp = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos6"), F.asc("cand_id")
    )
    pos = (
        scored.filter(F.col("clab") == F.col("alab"))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("pos_id"),
            F.col("cos6").alias("pos_cos6"),
        )
    )
    negs = scored.filter(F.col("clab") != F.col("alab")).join(
        pos, "anchor_id"
    )
    semi = (
        negs.filter(F.col("cos6") < F.col("pos_cos6"))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("cos6").alias("neg_cos6"),
            F.lit(True).alias("semi_hard"),
        )
    )
    hardest = (
        negs.join(semi.select("anchor_id"), "anchor_id", "left_anti")
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("cos6").alias("neg_cos6"),
            F.lit(False).alias("semi_hard"),
        )
    )
    return pos.join(semi.union(hardest), "anchor_id").select(
        "anchor_id", "pos_id", "pos_cos6", "neg_id", "neg_cos6",
        "semi_hard",
    )
