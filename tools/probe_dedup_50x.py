"""50x duplicate-heavy stress for the dedup workhorses (VERDICT r4 ask #5).

Union-multiplies sf0.1 ``documents`` m-fold with shifted doc_ids and
UNCHANGED text — every document appears in m exact copies, the worst-case
crawl shape the r2 probe established (SCALE.md).  Three claims under test,
one decade beyond the 10x probes:

1. RAW ``prefix_filter_pairs`` on an m-duplicated corpus is OUTPUT-bound
   quadratic in m: identical docs share every shingle, so the true pair
   set itself is Θ(m²·N) — no candidate generator can beat its own output.
   Measured at m = 1/4/10 (61M pairs at m=50 is pointless to materialize).
2. The production composition — EXACT dedup first, near-dup on
   representatives — stays ~flat in m: the only m-linear stage is the
   fingerprint aggregation.  Measured at m = 1/10/50, plus full
   ``clean_corpus`` at m = 50.
3. ``incremental_near_dup`` of a fixed 500-doc batch against an
   m-duplicated INDEX grows ~linearly in m (per-shingle index postings
   grow m-fold; batch side is fixed), never quadratically.

Also records the prefix-postings count (the quantity that bounds the
candidate join) at each m.  Usage (idle box):

    python tools/probe_dedup_50x.py [sf_dir]

One JSON line per (workload, m); paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ID_STRIDE = 10_000_000


def replicate(docs, m: int):
    out = docs
    for k in range(1, m):
        out = out.unionByName(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(k * ID_STRIDE)
            )
        )
    return out


def timed(label: str, m: int, fn) -> None:
    t0 = time.time()
    n = fn()
    print(
        json.dumps(
            {
                "workload": label,
                "m": m,
                "sec": round(time.time() - t0, 2),
                "rows": n,
            }
        ),
        flush=True,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from nl_railtraffic_etl_pipeline_spark.functions.corpus import clean_corpus
    from nl_railtraffic_etl_pipeline_spark.functions.dedup import (
        _shingle_arrays,
        exact_dup_groups,
        prefix_filter_pairs,
    )
    from nl_railtraffic_etl_pipeline_spark.functions.dedup import (
        incremental_near_dup,
    )
    from nl_railtraffic_etl_pipeline_spark.plans.testdata import load_table
    from nl_railtraffic_etl_pipeline_spark.session import get_spark

    spark = get_spark("dedup-50x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    base_n = docs.count()
    print(json.dumps({"base_docs": base_n, "sf_dir": sf_dir}), flush=True)

    # prefix postings per m: the explode the candidate join is bounded by
    for m in (1, 10, 50):
        rep = replicate(docs, m)
        arr = _shingle_arrays(rep, "text", "doc_id", 3).filter(
            F.size("sh_arr") > 0
        )
        sz = F.size("sh_arr")
        pref = (sz - F.expr("(3 * size(sh_arr) + 4) div 5") + 1).cast("long")
        n_post = arr.agg(F.sum(pref)).collect()[0][0]
        print(
            json.dumps({"workload": "prefix_postings", "m": m, "rows": n_post}),
            flush=True,
        )

    # 1. raw prefix filter: output-bound quadratic in copy count
    for m in (1, 4, 10):
        rep = replicate(docs, m)
        timed(
            "prefix_filter_raw", m, lambda r=rep: prefix_filter_pairs(r).count()
        )

    # 2a. production composition: exact-first, then prefix filter on reps
    for m in (1, 10, 50):
        rep = replicate(docs, m)

        def run(r=rep):
            reps = exact_dup_groups(r, "text", "doc_id").select(
                F.col("representative_id").alias("doc_id")
            )
            kept = r.join(reps, "doc_id", "left_semi")
            return prefix_filter_pairs(kept).count()

        timed("exact_then_prefix", m, run)

    # 2b. the full pipeline at the top multiplier
    timed("corpus_clean", 50, lambda: clean_corpus(replicate(docs, 50)).count())

    # 3. incremental near-dup: fixed 500-doc batch vs m-duplicated index
    batch = (
        docs.orderBy("doc_id")
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
    )
    for m in (1, 10, 50):
        rep = replicate(docs, m)
        timed(
            "incremental_near_dup",
            m,
            lambda r=rep: incremental_near_dup(batch, r).count(),
        )


if __name__ == "__main__":
    main()
