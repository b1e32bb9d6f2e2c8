"""URL / domain operators for crawl-corpus curation.

The reference pipeline ingests a rail API, not the web (reference
src/ingestion/api_client.py:24-90 — fixed endpoint, no URL handling), so
this module is part of the engine's training-data extension surface: host
parsing, registered-domain extraction, per-domain corpus stats, and the
deterministic per-domain document cap that keeps a handful of mega-domains
from dominating a crawl mix (the C4/RefinedWeb "max pages per domain"
pass).

Everything is expression-only (no UDFs) and mirrors a DuckDB oracle
verbatim: host extraction is a shared regexp, the registered-domain
heuristic is a fixed public second-level-suffix list (a deliberately small,
documented stand-in for the full Public Suffix List — swap
:data:`SECOND_LEVEL_SUFFIXES` for the real PSL table and broadcast-join it
when operating on a live crawl), and cap selection orders by the engine-
portable md5 rank hash from :mod:`.sketch`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sketch import _rank_hash

#: Capture group 1 = authority (host[:port]) of an http(s) URL.  Shared
#: verbatim with the oracle; no lookaround so Java regex and RE2 agree.
HOST_CAPTURE_RE = "^https?://([^/?#]+)"
#: Trailing :port to strip from the authority.
PORT_RE = ":[0-9]+$"

#: Public second-level registry suffixes under which the registered domain
#: is three labels, not two ("example.co.uk", not "co.uk").
SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "co.jp", "com.au", "com.br", "co.in", "com.cn", "co.nz",
]


def url_host(url: Column) -> Column:
    """Lowercased host of an http(s) URL, port stripped; NULL if not a URL."""
    authority = F.regexp_extract(F.lower(url), HOST_CAPTURE_RE, 1)
    host = F.regexp_replace(authority, PORT_RE, "")
    return F.when(host == "", None).otherwise(host)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a host.

    Last two labels, or last three when the two-label tail is a known
    second-level registry suffix; single-label hosts pass through.  Uses
    ``F.get`` (0-based, NULL out of range) so no branch can raise on short
    hosts.
    """
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.get(labels, n - 2), F.get(labels, n - 1)
    )
    last3 = F.concat_ws(
        ".", F.get(labels, n - 3), F.get(labels, n - 2), F.get(labels, n - 1)
    )
    return (
        F.when((n >= 3) & last2.isin(SECOND_LEVEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain corpus profile: (domain, n_docs, n_hosts).

    Plan: map-side host/domain projection off the scan, one domain-keyed
    aggregation (partial-aggregated, so a mega-domain ships one partial row
    per map task, not its row count) with a distinct-host count (Spark
    plans it as the two-phase Expand keyed on (domain, host) — also not
    hot-partition-bound).  Rows without a parseable URL group under NULL.
    """
    host = url_host(F.col(url_col))
    return (
        df.select(host.alias("host"))
        .select("host", registered_domain(F.col("host")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def cap_per_domain(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain, chosen by the
    deterministic md5 rank hash (uniform over ids, reproducible on any
    engine/partitioning; same contract as :func:`.sketch.bottom_k_sample`).

    Adds ``host``, ``domain``, ``sample_rank`` (1-based hash rank within
    the domain).  Exact per-domain top-``cap`` in TWO window levels so a
    whale domain never sorts its full history in one task: level 1 ranks
    within (domain, hash-salt bucket) — bounded by rows/``salt_buckets`` —
    and keeps ``cap`` per bucket; level 2 ranks the surviving
    <= ``salt_buckets * cap`` rows per domain.  Any row in a domain's true
    top-``cap`` is necessarily in its bucket's top-``cap``, so the
    two-level result is exactly the single-window result.  (Spark >= 3.5
    additionally applies rank-limit pushdown — ``WindowGroupLimit`` nodes
    keep only ``cap`` rows per map partition BEFORE each exchange, visible
    in the plan — so even the shuffle input is cap-bounded per source
    partition.)
    """
    host = url_host(F.col(url_col))
    h = _rank_hash(F.col(id_col), "domcap")
    base = (
        df.withColumn("host", host)
        .withColumn("domain", registered_domain(F.col("host")))
        .withColumn("_h", h)
        .withColumn("_s", F.pmod(F.col("_h"), F.lit(salt_buckets)))
    )
    w1 = Window.partitionBy("domain", "_s").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    cand = base.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= cap
    )
    w2 = Window.partitionBy("domain").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= cap)
        .drop("_h", "_s", "_r1")
    )


#: Tracking query parameters stripped during canonicalization (public
#: convention: UTM campaign tags and common click ids).
TRACKING_PARAM_RE = "(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL for exact URL-level dedup:
    lowercase scheme+host (path case preserved), fragment dropped,
    tracking parameters stripped, empty ``?`` and trailing slash
    normalized away.

    Pure regexp chain (shared verbatim with the oracle, no lookaround):
    the same crawl-frontier normalization C4/CCNet apply before URL
    dedup.  Returns NULL for non-URLs.
    """
    scheme_host = F.regexp_extract(F.lower(url), HOST_CAPTURE_RE, 1)
    rest = F.regexp_replace(url, HOST_CAPTURE_RE, "")
    rest = F.regexp_replace(rest, "#.*$", "")
    rest = F.regexp_replace(rest, TRACKING_PARAM_RE, "")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    rest = F.regexp_replace(rest, "\\?&", "?")
    rest = F.regexp_replace(rest, "/$", "")
    return F.when(
        scheme_host == "", None
    ).otherwise(F.concat(F.lit("https://"), scheme_host, rest))


def dedup_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup groups: per canonical URL, the keeper (lowest
    id) and the copy count — the frontier-level dedup that runs BEFORE
    any content is fetched or compared.

    One canonical-URL-keyed partial-aggregated min/count; groups of one
    are kept (the full frontier survives, annotated).
    """
    cu = canonical_url(F.col(url_col))
    return (
        df.select(cu.alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def filter_blocklist(
    df: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocked_domains``
    (a one-column ``domain`` frame) — the blocklist pass of a crawl
    pipeline.

    Broadcast LEFT ANTI join: blocklists are small by nature (thousands
    to low millions of rows), so the corpus never shuffles — the filter
    runs map-side against the broadcast hash set.
    """
    dom = registered_domain(url_host(F.col(url_col)))
    return (
        df.withColumn("_dom", dom)
        .join(
            F.broadcast(blocked_domains.select(F.col("domain").alias("_dom"))),
            "_dom",
            "left_anti",
        )
        .drop("_dom")
    )
