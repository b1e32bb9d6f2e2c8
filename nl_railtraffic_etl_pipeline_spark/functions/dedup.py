"""Deduplication operators for large-scale document/embedding pipelines.

Four families, each expressed as shuffled-join plans that scale (no O(n²)
cross product except where an explicit threshold-verified candidate set has
already bounded the pairs):

- exact:     md5 fingerprint group-by.
- n-gram Jaccard: inverted-index self-join on shingles (pairs only form
  where at least one shingle is shared), exact Jaccard on the join counts.
- MinHash + LSH: md5-family minhash signatures, banded candidate
  generation, exact-Jaccard verification of candidates only.
- SimHash: 32-bit sign-aggregated fingerprint, 4-band pigeonhole candidate
  join (hamming<=3 guarantees a shared band), bit_count verification.
- embedding cosine: exact double-precision cosine over id-ordered pairs.

At 100 TB the candidate-generation joins shuffle on shingle/band keys, so
hot shingles (very common n-grams) are the skew risk — ``ngram_jaccard``
drops shingles above ``df_cap`` document frequency (standard practice; also
removes pairs that share only boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, hash32, tokens, word_shingles


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group exact duplicates by normalized-content fingerprint."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("representative_id"),
        )
    )


def _shingled(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    df_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard similarity.

    Inverted-index plan: explode shingles -> self-join on shingle (equi-join,
    hash-partitioned) -> shared counts -> join per-doc sizes -> filter.
    Per-doc sizes come straight from the shingle-array length (no second
    explode+groupBy shuffle).
    """
    arrays = df.select(
        F.col(id_col).alias("doc"),
        word_shingles(tokens(F.col(text_col)), n).alias("sh_arr"),
    )
    sh = arrays.select("doc", F.explode("sh_arr").alias("shingle"))
    if df_cap is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > df_cap)
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
        sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    else:
        sizes = arrays.select("doc", F.size("sh_arr").alias("sz"))

    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Signature: ``minhash_i(doc) = min over shingles of h32(i || ':' || s)``.
    Docs sharing an identical band (``num_hashes/bands`` consecutive
    signature values) become candidates; candidates are verified with exact
    Jaccard so the output is a deterministic (LSH-recall) subset of
    ``ngram_jaccard_pairs``.
    """
    rows_per_band = num_hashes // bands
    sh = _shingled(df, text_col, id_col, n)
    # All num_hashes minhashes in ONE aggregation pass (no seed explode:
    # that would push num_hashes x as many rows through the shuffle).
    sigs = sh.groupBy("doc").agg(
        *[
            F.min(hash32(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(
                f"mh{s}"
            )
            for s in range(num_hashes)
        ]
    )
    bands_df = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{band * rows_per_band + r}").cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.band_key")
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # Verify CANDIDATES ONLY: join each side's shingle array and compute
    # exact Jaccard via array_intersect — work proportional to the candidate
    # set, not to the full shared-shingle pair space.
    arrays = df.select(
        F.col(id_col).alias("doc"),
        word_shingles(tokens(F.col(text_col)), n).alias("sh_arr"),
    )
    aa = arrays.select(F.col("doc").alias("doc_a"), F.col("sh_arr").alias("arr_a"))
    bb = arrays.select(F.col("doc").alias("doc_b"), F.col("sh_arr").alias("arr_b"))
    shared = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = shared / (F.size("arr_a") + F.size("arr_b") - shared)
    return (
        cands.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash over distinct tokens (sign-aggregated bit votes)."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", hash32(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(32)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    sim = None
    for i in range(32):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc", sim.cast("bigint").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with simhash hamming distance <= max_hamming.

    Candidate generation by 4-band pigeonhole (hamming<=3 implies at least
    one identical 8-bit band), then exact bit_count verification — the
    banded join is the 100 TB path; no cross product is formed.
    """
    sims = simhash32(df, text_col, id_col)
    banded = sims.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(255)
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc", "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def cosine(a, b) -> F.Column:
    """Exact double-precision cosine, element-order-stable summation.

    Both operands cast elementwise to double BEFORE multiply/accumulate so
    the DuckDB oracle (same order, same casts) is bit-identical.
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    return dot / (na * nb)


def _norm(vec_double) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(vec_double, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding near-duplicates: cosine > threshold over id-ordered pairs.

    Exact all-pairs baseline (the verification-quality reference);
    ``simsearch.lsh_bucket_topk`` shows the sub-quadratic scale path.
    Norms are computed ONCE per row before the pair join (the naive form
    recomputes both norms for each of the O(n²) pairs — 3× the flops);
    the dot/(na*nb) combination order matches the oracle exactly.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    normed = df.select(
        F.col(id_col).alias("id"), vd.alias("v"), _norm(vd).alias("nrm")
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") > threshold)
    )
