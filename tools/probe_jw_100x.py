"""100x scale probe for the blocked Jaro-Winkler similarity family
(r10 X183): does the inverted-block candidate generator + Arrow JW
kernel scale linearly with corpus size under the block fence?

Scales the sf0.1 documents m-fold with DISJOINT shifted copies
(doc_id' = doc_id + k * OFFSET, text unchanged — one generator scan).
Copies share the SAME text population, so block keys repeat across
copies and per-block occupancy grows m-fold — the ADVERSARIAL direction
for a quadratic candidate generator.  The probe reports, per m:

- blocks kept / excluded by the ``max_block`` fence (the fence must
  engage as occupancy crosses the cap — that is the design working,
  not an artifact);
- candidate-pair count (bounded by max_block * kept-corpus, never the
  corpus square);
- wall time for the full pipeline (blocking + fence + pair join + JW
  Arrow kernel), fully materialized via the noop sink.

Usage: python tools/probe_jw_100x.py [m ...]   (default 1 10 100)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from nl_railtraffic_etl_pipeline_spark.functions.fuzzy import (  # noqa: E402
    blocked_text_pairs,
    blocked_text_pairs_sharp,
    jaro_winkler_pairs,
)
from nl_railtraffic_etl_pipeline_spark.plans.testdata import (  # noqa: E402
    load_table,
)
from nl_railtraffic_etl_pipeline_spark.session import get_spark  # noqa: E402

OFFSET = 10_000_000


SHARP = False


def main() -> None:
    global SHARP
    args = [a for a in sys.argv[1:] if a != "--sharp"]
    SHARP = "--sharp" in sys.argv[1:]
    ms = [int(a) for a in args] or [1, 10, 100]
    spark = get_spark("probe-jw-100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(4).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    for m in ms:
        docs = base.withColumn(
            "_k", F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
        ).select(
            (F.col("doc_id") + F.col("_k") * OFFSET).alias("doc_id"),
            "text",
        )
        t0 = time.time()
        if SHARP:
            pairs = blocked_text_pairs_sharp(docs, max_block=100)
            out = jaro_winkler_pairs(pairs)
            tiers = {
                r["tier"]: r["n"]
                for r in out.groupBy("tier")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            n_pairs = sum(tiers.values())
            wall = time.time() - t0
            print(
                f"m={m}: SHARP pairs={n_pairs} per-tier={tiers} "
                f"wall={wall:.2f}s"
            )
            continue
        pairs = blocked_text_pairs(docs)
        out = jaro_winkler_pairs(pairs)
        n_pairs = out.count()
        wall = time.time() - t0
        # block occupancy census (separate pass, not timed)
        t = F.trim(F.lower(F.col("text")))
        occ = (
            docs.filter(t != "")
            .select(
                F.split(t, r"\s+")[0].alias("w1"),
                F.expr(
                    "size(split(trim(lower(text)), '\\\\s+')) div 8"
                ).alias("lb"),
            )
            .groupBy("w1", "lb")
            .count()
        )
        kept = occ.filter(F.col("count") <= 100).count()
        dropped = occ.filter(F.col("count") > 100).count()
        print(
            f"m={m}: pairs={n_pairs} wall={wall:.2f}s "
            f"blocks_kept={kept} blocks_fenced={dropped}"
        )


if __name__ == "__main__":
    main()
