"""Bounded edit-distance (Levenshtein) join — dictionary correction for
corpus tokens.

The LLM-pipeline use case: map every distinct corpus token to the
dictionary entries within a small edit distance (typo normalization,
OCR-error folding, vocabulary grounding).  The reference has no string
similarity surface; semantics follow the public Levenshtein unit-cost
definition that both Spark (``F.levenshtein``) and DuckDB
(``levenshtein``) implement identically — integer distances, so the
filter boundary is exact cross-engine.

Scale shape: the corpus side first reduces to DISTINCT tokens with
occurrence counts (one token-keyed shuffle — the only fact-sized
exchange).  The dictionary side is vocabulary-sized by assumption; it
explodes to one row per length in ``[len-d, len+d]`` (a sound complete
blocking key: edit distance d cannot change length by more than d) and
broadcasts.  The join is then a broadcast equi-join on token length with
the Levenshtein verify as a residual — never a cartesian, and the
verify-pair count is bounded by tokens x (dictionary entries within the
length band), not tokens x dictionary.

For dictionary sides too large to broadcast, compose with the q-gram
prefix filtering already in dedup.prefix_filter_pairs (PPJoin-class) —
length banding alone does not bound candidates when both sides are
corpus-scale; that composition is the documented path, not this helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    tokens: DataFrame,
    dictionary: DataFrame,
    max_dist: int,
    token_col: str = "token",
    dict_col: str = "word",
) -> DataFrame:
    """All (token, word) pairs with ``levenshtein(token, word) <=
    max_dist``.

    ``tokens`` may carry extra columns (e.g. occurrence counts) — they
    pass through.  Returns the input token columns plus ``match`` (the
    dictionary word) and ``dist`` (the integer edit distance).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    banded = dictionary.select(
        F.col(dict_col).alias("match"),
        F.explode(
            F.sequence(
                F.greatest(
                    F.length(dict_col) - max_dist, F.lit(0)
                ),
                F.length(dict_col) + max_dist,
            )
        ).alias("_band"),
    )
    joined = tokens.join(
        F.broadcast(banded),
        F.length(F.col(token_col)) == F.col("_band"),
    )
    # compute the DP once and filter on the materialized column — Spark
    # does not common-subexpression-eliminate across Filter and Project
    return (
        joined.withColumn(
            "dist", F.levenshtein(F.col(token_col), F.col("match"))
        )
        .filter(F.col("dist") <= max_dist)
        .drop("_band")
    )
