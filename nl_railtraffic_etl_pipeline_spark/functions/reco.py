"""Item-item co-occurrence similarity (market-basket collaborative
filtering) — the classic "customers who bought X also bought Y" operator.

Cosine over binary basket membership: ``sim(i, j) = co(i, j) /
sqrt(n_i * n_j)`` where ``n_i`` counts baskets containing item ``i`` and
``co`` counts baskets containing both.  Every aggregate is an exact
BIGINT; the ``n_i * n_j`` product stays integral; the closing chain is
ONE correctly-rounded ``sqrt`` and ONE IEEE division — bit-identical
cross-engine, so the result hash-matches a DuckDB oracle.

Scale shape (the part that matters at 100 TB): pair generation is a
SELF-EQUI-JOIN of the distinct basket frame on the basket key — item
pairs are only ever materialized WITHIN a basket, never across the
catalog, so the intermediate is sum-over-baskets of B_k^2 where B_k is
the basket's distinct-item count.  Whenever B is bounded by the domain
(a retail order, a TPC-H customer whose order count is fixed by the
schema, a browsing session) the pair frame is LINEAR in baskets.  The
``max_basket`` guard makes that boundedness explicit: over-cap whale
baskets (a crawler's "session" with a million items would otherwise
contribute a trillion pairs) are dropped whole BEFORE pairing, exactly
like the whale-doc quarantine in text.remove_repeated_spans.
``min_support`` prunes the pair frame right at the partial aggregate,
before the n_i join fans it back out.

Reference parity note: the reference pipeline (pandas + SQL) has no
recommendation surface; this extends the engine along the LLM/ML
data-pipeline axis (SURVEY.md §2.12) with the standard
Linden-et-al-style item-item scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["item_cosine_similarity", "association_rules"]


def item_cosine_similarity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    top_k: int = 5,
    max_basket: int | None = None,
) -> DataFrame:
    """Top-k most-similar items per item by basket-cosine.

    ``baskets`` is any (basket, item) fact — rows may repeat (multiple
    lines of the same part in one order); membership is deduplicated
    first, so co-counts are over DISTINCT (basket, item).

    Returns (item_i, item_j, co_baskets, n_i, n_j, cosine, sim_rank),
    both directions of every pair (item_i is the "for this item" axis),
    ``sim_rank`` 1..top_k per item_i ordered by (cosine DESC, co DESC,
    item_j ASC) — the double tie falls through to exact integers so the
    rank is total and engine-portable.

    Physical plan: basket-key shuffle for the distinct, the same key for
    the self-join (one side reuses the exchange), item-key partial agg
    for n_i, pair-key partial agg for co, two equi-joins to stitch
    (AQE broadcasts the n_i side when the catalog is small), one
    item_i-keyed window for the top-k.  No global sort, no cartesian.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # Compute-once barrier: the distinct basket frame feeds THREE
    # consumers (item counts + both self-join sides) — unbarriered, the
    # whole upstream basket derivation re-embeds per consumer (r7
    # PLANS.md audit: 40 exchanges; same hazard as the graph wedge joins).
    from .dedup import _materialize

    b = _materialize(
        baskets.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .filter(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
    )
    if max_basket is not None:
        # Whale-basket quarantine: drop over-cap baskets whole before the
        # quadratic pair step; the cap bounds per-basket pair work at
        # max_basket^2 by construction.
        sizes = b.groupBy("_b").agg(F.count("*").alias("_bs"))
        b = (
            b.join(sizes.filter(F.col("_bs") <= max_basket), "_b", "inner")
            .drop("_bs")
        )
    n = b.groupBy("_i").agg(F.count("*").alias("_n"))
    co = _co_counts(b, min_support)
    sim = (
        co.join(n.select(F.col("_i").alias("item_i"), F.col("_n").alias("n_i")), "item_i")
        .join(n.select(F.col("_i").alias("item_j"), F.col("_n").alias("n_j")), "item_j")
        .withColumn(
            "cosine",
            F.round(
                F.col("co_baskets").cast("double")
                / F.sqrt((F.col("n_i") * F.col("n_j")).cast("double")),
                9,
            ),
        )
    )
    w = Window.partitionBy("item_i").orderBy(
        F.desc("cosine"), F.desc("co_baskets"), F.asc("item_j")
    )
    return (
        sim.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= top_k)
        .select(
            "item_i", "item_j", "co_baskets", "n_i", "n_j", "cosine", "sim_rank"
        )
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    min_confidence: float = 0.2,
    max_basket: int | None = None,
) -> DataFrame:
    """Pairwise association rules i -> j with support, confidence, and
    lift — the market-basket readout ("customers with X buy Y 4.2x more
    often than baseline") behind every cross-sell report; the pairwise
    special case of Apriori, which at corpus scale is the level that
    matters (higher-order itemsets explode combinatorially and are
    pruned by exactly this pair pass first).

    Same basket-keyed self-equi-join pair frame as
    :func:`item_cosine_similarity` (and the same ``max_basket`` whale
    quarantine); the metrics are EXACT RATIONALS of BIGINT counts, one
    IEEE division each::

        confidence(i -> j) = co / n_i
        lift(i -> j)       = co * n_baskets / (n_i * n_j)

    Output (directional): item_i, item_j, co_baskets, n_i, n_j,
    n_baskets, confidence, lift — rules at/above both thresholds.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if not 0.0 < min_confidence <= 1.0:
        raise ValueError(
            f"min_confidence must be in (0, 1], got {min_confidence}"
        )
    # same four-consumer barrier as item_cosine_similarity (totals, item
    # counts, both self-join sides)
    from .dedup import _materialize

    b = _materialize(
        baskets.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .filter(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
    )
    if max_basket is not None:
        sizes = b.groupBy("_b").agg(F.count("*").alias("_bs"))
        b = (
            b.join(sizes.filter(F.col("_bs") <= max_basket), "_b", "inner")
            .drop("_bs")
        )
    totals = b.select("_b").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    n = b.groupBy("_i").agg(F.count("*").alias("_n"))
    co = _co_counts(b, min_support)
    conf = F.col("co_baskets").cast("double") / F.col("n_i").cast("double")
    lift = (F.col("co_baskets") * F.col("n_baskets")).cast("double") / (
        F.col("n_i") * F.col("n_j")
    ).cast("double")
    return (
        co.join(
            n.select(F.col("_i").alias("item_i"), F.col("_n").alias("n_i")),
            "item_i",
        )
        .join(
            n.select(F.col("_i").alias("item_j"), F.col("_n").alias("n_j")),
            "item_j",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn("confidence", F.round(conf, 9))
        .withColumn("lift", F.round(lift, 9))
        .filter(F.col("confidence") >= F.lit(min_confidence))
        .select(
            "item_i", "item_j", "co_baskets", "n_i", "n_j", "n_baskets",
            "confidence", "lift",
        )
    )


def _co_counts(b: DataFrame, min_support: int) -> DataFrame:
    """Directional co-basket counts from the HALF pair frame.

    Co-occurrence is symmetric, so only ``item_i < item_j`` pairs are
    generated by the basket self-join — HALF the exploded pair rows
    through the dominant shuffle+aggregate (measured ~2x on the pair
    stage) — and the mirror direction is reconstructed from the
    aggregated (catalog-pair-sized, orders of magnitude smaller) frame.
    """
    left = b.select(F.col("_b"), F.col("_i").alias("item_i"))
    right = b.select(F.col("_b"), F.col("_i").alias("item_j"))
    half = (
        left.join(right, "_b")
        .filter(F.col("item_i") < F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.count("*").alias("co_baskets"))
        .filter(F.col("co_baskets") >= F.lit(min_support))
    )
    return half.unionByName(
        half.select(
            F.col("item_j").alias("item_i"),
            F.col("item_i").alias("item_j"),
            "co_baskets",
        )
    )
