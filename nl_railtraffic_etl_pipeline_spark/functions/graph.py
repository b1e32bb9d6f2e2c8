"""Iterative graph algorithms as declarative DataFrame loops.

The connected-components labeler (functions/dedup.py::dup_clusters) covers
the union-find class; this module adds the fixed-point-iteration class with
a deterministic PageRank.  Like every operator in this engine it is
oracle-checkable: all arithmetic is integer (rank mass in fixed-point
"units", truncated division), so after any number of iterations the ranks
are BIT-IDENTICAL on any engine and any partitioning — no float
accumulation, no convergence epsilon, a fixed iteration count.

Scale shape per iteration: one map-side share projection, one src-keyed
equi-join of the edge list against the shares, one dst-keyed
partial-aggregated sum, one node-keyed left join.  Nothing collects; the
edge list is reused every round (``persist_edges=True`` caches it and the
out-degrees across iterations).  Lineage grows linearly in the iteration
count — for long runs on a real cluster, checkpoint every ~10 rounds to cut
the plan; at the fixed gate depth (5) that is unnecessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale: 1.0 of rank mass == 10^12 units.
PAGERANK_UNIT = 10**12
#: Damping factor 85/100 as an exact rational.
PAGERANK_DAMPING = (85, 100)


def pagerank_units(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    persist_edges: bool = True,
) -> DataFrame:
    """PageRank over ``nodes`` / ``edges`` in exact integer units.

    ``r_0(v) = UNIT``; each round
    ``r_{k+1}(v) = (15 * UNIT) div 100 + (85 * S_v) div 100`` where
    ``S_v = sum over in-edges (u, v) of (r_k(u) div outdeg(u))``.
    Truncated integer division leaks a few units of mass per round — by
    design: determinism on every engine beats the last-ulp mass
    conservation a float formulation would also fail to deliver.  Edges
    to nodes absent from ``nodes`` lose their share (documented dangling
    behavior); nodes with no out-edges contribute nothing (their mass
    evaporates, the classic dangling-node simplification).

    Returns (node, pr_units) with ``pr_units`` a BIGINT.  Safe while
    ``85 * N * UNIT < 2^63`` — about 10^8 nodes at the default unit; drop
    ``UNIT`` to 10^9 for larger graphs (documented bound, asserted
    nowhere: the caller knows N).
    """
    num, den = PAGERANK_DAMPING
    teleport = (den - num) * PAGERANK_UNIT // den
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    outdeg = e.groupBy("_src").agg(F.count("*").alias("_d"))
    if persist_edges:
        e = e.persist()
        outdeg = outdeg.persist()
    ranks = nodes.select(
        F.col(id_col).alias("node"),
        F.lit(PAGERANK_UNIT).cast("bigint").alias("r"),
    )
    base_nodes = nodes.select(F.col(id_col).alias("node"))
    for _ in range(iterations):
        shares = ranks.join(
            outdeg, ranks["node"] == outdeg["_src"]
        ).select(F.col("_src"), F.expr("r div _d").alias("_share"))
        contrib = (
            e.join(shares, "_src")
            .groupBy("_dst")
            .agg(F.sum("_share").alias("_s"))
        )
        ranks = base_nodes.join(
            contrib, base_nodes["node"] == contrib["_dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"({num} * coalesce(_s, 0)) div {den}")
            ).cast("bigint").alias("r"),
        )
    return ranks.select("node", F.col("r").alias("pr_units"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    persist_edges: bool = True,
) -> DataFrame:
    """Minimum hop distance from ``seeds`` along directed ``edges``,
    bounded at ``max_hops`` — the frontier-expansion BFS (reference has no
    graph surface; public Pregel/GraphX semantics).

    Entirely integer arithmetic -> bit-identical on any engine and any
    partitioning.  Per round the frontier (nodes first reached at hop k-1)
    joins the edge list on the src key (one equi-shuffle), dedups to
    distinct destinations, then anti-joins the settled set so every node
    keeps its FIRST (minimum) hop — the textbook level-synchronous BFS.
    Scale shape: cost per round is O(frontier-adjacent edges), the settled
    set only grows, and the edge list is reused every round
    (``persist_edges``).  Lineage grows linearly in ``max_hops``; beyond
    ~20 rounds on a real cluster, checkpoint the settled set.

    Returns (node, hop) for every node within ``max_hops`` of a seed
    (seeds themselves at hop 0).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    if persist_edges:
        # materialize the edge projection ONCE (the dedup._materialize
        # compute-once barrier): every round references it, and without
        # the barrier the k-round plan embeds k copies of the edge
        # derivation subtree
        e = e.localCheckpoint(eager=True)
    settled = seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).cast("int").alias("hop")
    ).distinct()
    frontier = settled.select("node")
    for k in range(1, max_hops + 1):
        reached = (
            e.join(frontier, e._src == frontier.node)
            .select(F.col("_dst").alias("node"))
            .distinct()
        )
        new = reached.join(settled, "node", "left_anti").select(
            "node", F.lit(k).cast("int").alias("hop")
        )
        # materialize the new frontier: it feeds BOTH the next round's
        # join and the settled union, and the eager checkpoint keeps the
        # plan (and recomputation) bounded per round instead of growing
        # a k-deep unrolled tree — frontiers are reached-node-sized,
        # always smaller than the graph
        new = new.localCheckpoint(eager=True)
        settled = settled.unionByName(new)
        frontier = new.select("node")
    return settled


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact triangle count of the undirected simple graph under ``edges``
    (direction, duplicates, and self-loops ignored) — 1 row ``(triangles)``.

    The classic shuffle-efficient formulation (Cohen's MapReduce triangle
    enumeration / Suri & Vassilvitskii's degree orientation, public
    literature): orient every canonical edge from its LOWER endpoint to
    its HIGHER endpoint under the total order (degree, id).  Each triangle
    then has exactly one "pivot" node with out-degree 2 within it, so
    counting reduces to: wedges = oriented ⋈ oriented on the pivot, then
    wedge (v, w) is a triangle iff oriented edge (v, w) exists.

    Why the degree orientation matters at 100 TB: wedge fan-out per pivot
    is C(outdeg, 2), and orienting toward higher degree caps every
    out-degree at O(sqrt(|E|)) for any graph — a power-law hub with 10^6
    neighbors would otherwise explode into 10^12 wedges.  The plan is two
    equi-shuffle joins and one count; nothing collects.

    All-integer -> bit-identical on any engine; the oracle can count with
    the naive id-orientation (a < b < c) and MUST agree — the orientation
    changes the plan, never the answer.

    ``canon`` and ``oriented`` each feed several join branches, so both
    get the compute-once barrier (dedup._materialize): without it the
    whole edge-derivation subtree is re-embedded per consumer (the
    unbarriered plan carried 180 exchanges).  Both are edge-list-sized —
    at persistent-cluster scale a persisted table serves the same role.
    """
    from .dedup import _materialize

    canon = _materialize(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionAll(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # total-order key: (degree, id) packed into one bigint; ids here are
    # table keys (< 2^31) and degree < |V|, so the pack cannot collide.
    key = (F.col("d").cast("bigint") * F.lit(2**31) + F.col("n")).alias("k")
    keys = deg.select("n", key)
    with_keys = (
        canon.join(keys.withColumnRenamed("n", "a").withColumnRenamed("k", "ka"), "a")
        .join(keys.withColumnRenamed("n", "b").withColumnRenamed("k", "kb"), "b")
    )
    oriented = _materialize(with_keys.select(
        F.when(F.col("ka") < F.col("kb"), F.col("ka")).otherwise(F.col("kb")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("v"),
    ))
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(o2, F.col("o1.u") == F.col("o2.u")).filter(
        F.col("o1.v") < F.col("o2.v")
    ).select(F.col("o1.v").alias("u"), F.col("o2.v").alias("v"))
    tri = wedges.join(oriented, ["u", "v"], "left_semi")
    return tri.agg(F.count("*").cast("bigint").alias("triangles"))


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    seed_col: str = "node",
    persist_frontier: bool = True,
) -> DataFrame:
    """Bounded multi-source shortest paths over positive INTEGER edge
    weights — ``rounds`` synchronous Bellman-Ford relaxations (the
    weighted companion of :func:`bfs_hops`; after ``rounds`` rounds the
    result is exact for every path of <= ``rounds`` edges).

    All arithmetic is BIGINT (dist sums, MIN tie-resolution), so the
    distance map hash-matches any engine at any partitioning — the
    oracle unrolls the same rounds as chained CTEs.

    Scale shape: one src-keyed equi-join (frontier x edges) + one
    node-keyed MIN partial agg per round; the distance map is
    node-sized, edges are reused every round (localCheckpoint barrier —
    without it the k-round lineage embeds k copies of the edge
    subtree).  Per-round cost is O(settled-adjacent edges), the classic
    level-synchronous Pregel shape.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        F.col(weight_col).cast("bigint").alias("_w"),
    )
    if persist_frontier:
        e = e.localCheckpoint(eager=True)
    dist = seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).cast("bigint").alias("dist")
    ).distinct()
    for _ in range(rounds):
        relaxed = (
            e.join(dist, e["_src"] == dist["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if persist_frontier:
            dist = dist.localCheckpoint(eager=True)
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    core_only: bool = False,
) -> DataFrame:
    """Bounded k-core peeling: repeatedly drop nodes with undirected
    degree < ``k``; after ``rounds`` synchronous rounds return the
    surviving nodes with their degree in the surviving subgraph — the
    standard dense-substructure / spam-cluster detector next to
    triangle counting.

    Fully converged k-core needs peeling until fixpoint; the bounded
    version is the distributed contract (one degree recount per round,
    like the PageRank/BFS/Bellman-Ford families — at 100 TB you bound
    rounds and checkpoint).  All counts are BIGINT, edges symmetrize
    once (union + distinct, self-loops dropped), every round is two
    semi-joins against the alive set + one src-keyed degree count; ONE
    extra recount against the final alive set makes the returned degree
    the true induced-subgraph degree.

    CONTRACT NOTE: under bounded rounds a survivor's recounted degree
    may be < ``k`` (even 0) — it simply hasn't been peeled yet.  Callers
    that need "members of the k-core, degree >= k" semantics (the
    pre-recount contract) must pass ``core_only=True``, which applies a
    final ``degree >= k`` filter; the default keeps the full survivor
    set so the bounded-rounds progress is visible and auditable.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    a, b = F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    und = (
        edges.select(a, b)
        .unionByName(
            edges.select(
                F.col(dst_col).alias("_a"), F.col(src_col).alias("_b")
            )
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = und.select(F.col("_a").alias("node")).distinct()
    for _ in range(rounds):
        e = und.join(
            alive.select(F.col("node").alias("_a")), "_a", "left_semi"
        ).join(alive.select(F.col("node").alias("_b")), "_b", "left_semi")
        deg = e.groupBy(F.col("_a").alias("node")).agg(
            F.count("*").alias("degree")
        )
        alive = (
            deg.filter(F.col("degree") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
    # Recount against the FINAL alive set so the reported degree really is
    # the degree in the surviving induced subgraph (the degree computed
    # inside the last round still counts neighbors peeled during it).  A
    # survivor can legitimately report degree < k (even 0) — bounded
    # rounds stop before fixpoint, so it simply hasn't been peeled yet.
    ef = und.join(
        alive.select(F.col("node").alias("_a")), "_a", "left_semi"
    ).join(alive.select(F.col("node").alias("_b")), "_b", "left_semi")
    degf = ef.groupBy(F.col("_a").alias("node")).agg(
        F.count("*").alias("degree")
    )
    out = alive.join(degf, "node", "left").select(
        "node",
        F.coalesce(F.col("degree"), F.lit(0).cast("bigint")).alias("degree"),
    )
    if core_only:
        out = out.filter(F.col("degree") >= k)
    return out


def node_jaccard(
    edges: DataFrame,
    min_jaccard: float,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Neighbor-set Jaccard similarity between node pairs of the
    undirected simple graph under ``edges`` — candidate pairs from the
    shared-neighbor (wedge) equi-join, exact integer |intersection| /
    |union| — the link-graph co-citation companion of the text/embedding
    dedup families.

    HUB-DEGREE FENCE (``max_degree``): wedge fan-out per pivot node is
    C(deg, 2), and unlike :func:`triangle_count` there is no degree
    orientation to cap it — a power-law hub with 10^6 neighbors would
    concentrate 5*10^11 wedge pairs on ONE shuffle key.  With
    ``max_degree`` set, nodes whose undirected degree exceeds it are
    QUARANTINED — removed from the graph before pairing, exactly the
    ``df_cap`` hot-shingle fence from dedup: the semantics become
    "node Jaccard over the subgraph induced by nodes with degree <=
    max_degree", which is also the statistically honest choice (a hub
    shared by everyone carries near-zero similarity signal, the same
    argument that drops stop-shingles).  The fence costs one extra
    degree count + two semi-joins, all equi-keyed.

    Output: (u, v, common, union_size, jaccard) for pairs with
    ``jaccard >= min_jaccard``; jaccard rounded to 9 digits.

    The symmetrized edge list feeds FOUR consumers (degree count, both
    wedge sides, and under the fence two semi-joins), so it gets the
    compute-once barrier (``dedup._materialize``) — without it the whole
    edge-derivation subtree re-embeds per consumer (the unbarriered plan
    carried 150+ exchanges; triangle_count documents the same hazard).
    """
    from .dedup import _materialize

    und = _materialize(
        edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("_a"), F.col(src_col).alias("_b")
            )
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError("max_degree must be >= 1")
        keep = (
            und.groupBy(F.col("_a").alias("node"))
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_degree)
            .select("node")
        )
        und = _materialize(
            und.join(
                keep.select(F.col("node").alias("_a")), "_a", "left_semi"
            ).join(keep.select(F.col("node").alias("_b")), "_b", "left_semi")
        )
    deg = und.groupBy(F.col("_a").alias("node")).agg(
        F.count("*").alias("d")
    )
    x = und.select(F.col("_a").alias("_w"), F.col("_b").alias("u"))
    y = und.select(F.col("_a").alias("_w"), F.col("_b").alias("v"))
    common = (
        x.join(y, "_w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
    )
    j = (
        common.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("d", "_du")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("d", "_dv")
    )
    union_size = F.col("_du") + F.col("_dv") - F.col("common")
    jac = F.col("common").cast("double") / union_size.cast("double")
    return j.filter(jac >= min_jaccard).select(
        "u",
        "v",
        "common",
        union_size.alias("union_size"),
        F.round(jac, 9).alias("jaccard"),
    )


def hits_units(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    persist_edges: bool = True,
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg 1999, public literature) in
    exact UNNORMALIZED integer units, the second member of the
    fixed-point-iteration family next to :func:`pagerank_units`.

    ``h_0(v) = 1``; each round ``a_{k+1}(v) = sum over in-edges (u, v)
    of h_k(u)`` then ``h_{k+1}(v) = sum over out-edges (v, w) of
    a_{k+1}(w)``.  The textbook formulation L2-normalizes per round —
    that only rescales the vectors, and a float norm would cost
    cross-engine bit-identity, so the distributed contract here is the
    raw power iteration with a FIXED iteration count: rankings and
    ratios are identical to the normalized variant's.

    Magnitude bound (the caller's responsibility, like pagerank's):
    scores grow by at most ``max_indeg * max_outdeg`` per round, so
    ``(max_indeg * max_outdeg) ** iterations`` must stay below 2^63.

    Scale shape per round: two src/dst-keyed equi-joins of the edge
    list, each followed by one partial-aggregated sum — no collects, no
    cartesian anything; the edge projection is persisted across rounds.
    Returns one row per node: (node, auth_units, hub_units), BIGINT,
    zero-coalesced for nodes unreachable by the respective sum.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    if persist_edges:
        e = e.persist()
    h = nodes.select(
        F.col(id_col).alias("node"), F.lit(1).cast("bigint").alias("h")
    )
    a = None
    for i in range(iterations):
        a = (
            e.join(h, e["_src"] == h["node"])
            .groupBy("_dst")
            .agg(F.sum("h").cast("bigint").alias("a"))
            .select(F.col("_dst").alias("node"), "a")
        )
        if i == iterations - 1:
            # the final authority frame feeds BOTH the last hub update
            # and the output join: compute-once barrier
            a = a.localCheckpoint(eager=True)
        h = (
            e.join(a, e["_dst"] == a["node"])
            .groupBy("_src")
            .agg(F.sum("a").cast("bigint").alias("h"))
            .select(F.col("_src").alias("node"), "h")
        )
    out = (
        nodes.select(F.col(id_col).alias("node"))
        .join(a, "node", "left")
        .join(h, "node", "left")
    )
    zero = F.lit(0).cast("bigint")
    return out.select(
        "node",
        F.coalesce(F.col("a"), zero).alias("auth_units"),
        F.coalesce(F.col("h"), zero).alias("hub_units"),
    )


def _canonical_undirected(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Distinct (a < b) canonical edges of the undirected simple graph
    (direction, duplicates, self-loops dropped), materialized once —
    the shared front door of the whole-graph statistics below, each of
    which consumes it from several join branches."""
    from .dedup import _materialize

    return _materialize(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _undirected_degrees(canon: DataFrame) -> DataFrame:
    """(node, d) undirected degrees from the canonical edge list."""
    return (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient of the undirected simple graph
    (Newman 2002, public literature): the Pearson correlation of the
    degrees at the two ends of each edge, computed over BOTH
    orientations of every edge (the standard symmetric definition, so
    the x/y marginals coincide).

    All cross-moments are exact BIGINT sums over the canonical edge
    list (safe while ``sum(d^2)`` over edges < 2^63 — degrees would
    have to exceed ~10^6 on a 10^9-edge graph to threaten it); the
    closing Pearson chain runs in IEEE double in a fixed order.  NULL
    when the degree variance is zero (e.g. a perfect cycle).

    Returns ONE row: (n_edges, n_endpoints, assortativity).  Scale
    shape: one distinct, one degree count, two node-keyed equi-joins,
    one global aggregate — no collects.
    """
    canon = _canonical_undirected(edges, src_col, dst_col)
    deg = _undirected_degrees(canon)
    j = (
        canon.join(
            deg.select(F.col("node").alias("a"), F.col("d").alias("_du")),
            "a",
        ).join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("_dv")),
            "b",
        )
    )
    du, dv = F.col("_du"), F.col("_dv")
    agg = j.agg(
        F.count("*").cast("bigint").alias("n_edges"),
        F.sum(du + dv).cast("bigint").alias("_sx"),
        F.sum(du * du + dv * dv).cast("bigint").alias("_sxx"),
        F.sum(F.lit(2) * du * dv).cast("bigint").alias("_sxy"),
    )
    n = (F.col("n_edges") * 2).cast("bigint")
    nd = n.cast("double")
    sx, sxx, sxy = (
        F.col("_sx").cast("double"),
        F.col("_sxx").cast("double"),
        F.col("_sxy").cast("double"),
    )
    num = nd * sxy - sx * sx
    den = nd * sxx - sx * sx
    r = F.when(den > 0, num / den)
    return agg.select(
        "n_edges",
        n.alias("n_endpoints"),
        F.round(r, 9).alias("assortativity"),
    )


def local_clustering(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node local clustering coefficient of the undirected simple
    graph: ``lcc(v) = 2 * T(v) / (d(v) * (d(v) - 1))`` with ``T(v)`` the
    number of triangles through ``v`` — the node-resolved companion of
    :func:`triangle_count` (same Suri & Vassilvitskii degree
    orientation, public literature).

    Triangles enumerate exactly once as (pivot, v, w) key triples under
    the (degree, id) total order — wedge fan-out per pivot is capped at
    O(sqrt(|E|)) by the orientation, the property that makes the plan
    survive power-law hubs at 100 TB — then each triple credits all
    three corners: explode to 3 rows, decode the node id from the
    packed key (``key = d * 2^31 + id``, ids < 2^31 by table-key
    construction), one node-keyed count.

    Returns (node, degree, triangles, lcc) for every node with >= 1
    non-self edge; ``lcc`` NULL when degree < 2, else rounded to 9
    digits.  The oracle can enumerate with the naive id orientation
    (a < b < c) and MUST agree — orientation changes the plan, never
    the triangle set.
    """
    canon = _canonical_undirected(edges, src_col, dst_col)
    deg = _undirected_degrees(canon)
    key = (F.col("d") * F.lit(2**31) + F.col("node")).alias("k")
    keys = deg.select("node", key)
    with_keys = canon.join(
        keys.select(F.col("node").alias("a"), F.col("k").alias("ka")), "a"
    ).join(
        keys.select(F.col("node").alias("b"), F.col("k").alias("kb")), "b"
    )
    from .dedup import _materialize

    oriented = _materialize(
        with_keys.select(
            F.when(F.col("ka") < F.col("kb"), F.col("ka"))
            .otherwise(F.col("kb"))
            .alias("u"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb"))
            .otherwise(F.col("ka"))
            .alias("v"),
        )
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = (
        o1.join(o2, F.col("o1.u") == F.col("o2.u"))
        .filter(F.col("o1.v") < F.col("o2.v"))
        .select(
            F.col("o1.u").alias("p"),
            F.col("o1.v").alias("u"),
            F.col("o2.v").alias("v"),
        )
    )
    tri = wedges.join(oriented, ["u", "v"], "left_semi")
    per_node = (
        tri.select(
            F.explode(F.array(F.col("p"), F.col("u"), F.col("v"))).alias(
                "k"
            )
        )
        .select((F.col("k") % F.lit(2**31)).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        F.col("d").alias("degree"),
        F.coalesce(F.col("triangles"), F.lit(0).cast("bigint")).alias(
            "triangles"
        ),
    )
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(
            (F.col("triangles") * 2).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            9,
        ),
    )
    return out.select("node", "degree", "triangles", lcc.alias("lcc"))


def harmonic_bounded(
    nodes: DataFrame,
    edges: DataFrame,
    max_hops: int = 3,
    id_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-radius harmonic centrality: for every node in ``nodes``,
    the per-hop reachable-set sizes within ``max_hops`` directed hops
    and the exact-rational harmonic sum H(v) = sum_{u: d(v,u) <= r}
    1/d(v,u) carried as an INTEGER numerator over lcm(1..max_hops)
    (``harmonic_num`` / ``harmonic_den``) — unbounded closeness needs
    all-pairs distances; the bounded variant is the standard corpus-
    scale proxy (Boldi & Vigna 2014, public literature) and stays
    integer-exact cross-engine.

    Level-synchronous expansion like :func:`bfs_hops` but keyed per
    SOURCE: round k joins the (src, frontier-node) frame to the edge
    list (one equi-shuffle on the frontier node), dedups, and
    anti-joins the per-src settled set.  Cost per round is O(sum of
    frontier adjacencies) — with bounded out-degree the level-k frame
    is <= n * degree^k rows, linear in n for fixed radius; the settled
    set is exactly the union of the level frames.  Self-distances are
    excluded (the centrality's u != v convention).

    Returns one row per input node: (node, n1..n{max_hops} as
    hop_counts array replaced by explicit columns via the caller, here
    fixed at 3: n1, n2, n3, harmonic_num, harmonic_den).
    """
    if max_hops != 3:
        raise ValueError("harmonic_bounded is fixed at radius 3")
    e = edges.select(
        F.col(src_col).alias("_es"), F.col(dst_col).alias("_ed")
    ).localCheckpoint(eager=True)
    base = nodes.select(F.col(id_col).alias("_v"))
    # level 1: direct successors, self excluded
    l1 = (
        e.join(base, e._es == base._v)
        .select("_v", F.col("_ed").alias("_u"))
        .filter(F.col("_u") != F.col("_v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled = l1
    levels = {1: l1}
    for k in (2, 3):
        grown = (
            levels[k - 1]
            .join(e, levels[k - 1]._u == e._es)
            .select("_v", F.col("_ed").alias("_u"))
            .filter(F.col("_u") != F.col("_v"))
            .distinct()
        )
        lk = grown.join(
            settled, ["_v", "_u"], "left_anti"
        ).localCheckpoint(eager=True)
        levels[k] = lk
        settled = settled.union(lk)
    counts = [
        levels[k]
        .groupBy("_v")
        .agg(F.count("*").cast("bigint").alias(f"n{k}"))
        for k in (1, 2, 3)
    ]
    out = base
    for c in counts:
        out = out.join(c, "_v", "left")
    n1 = F.coalesce(F.col("n1"), F.lit(0)).cast("bigint")
    n2 = F.coalesce(F.col("n2"), F.lit(0)).cast("bigint")
    n3 = F.coalesce(F.col("n3"), F.lit(0)).cast("bigint")
    return out.select(
        F.col("_v").alias("node"),
        n1.alias("n1"),
        n2.alias("n2"),
        n3.alias("n3"),
        (F.lit(6) * n1 + F.lit(3) * n2 + F.lit(2) * n3)
        .cast("bigint")
        .alias("harmonic_num"),
        F.lit(6).cast("bigint").alias("harmonic_den"),
    )
