"""100x scale probe for the iterative graph family (VERDICT r8 ask #5).

Scales the sf0.1 doc-link edge list m-fold with DISJOINT shifted copies
(node' = node + k * OFFSET, one generator scan — not the m-way union
rescan the r5 dedup probe noted as an artifact) and times:

- ``duplicate_clusters`` — the graph_components engine (min-label
  fixpoint + adaptive pointer doubling).  Disjoint copies keep the
  component structure per copy identical, so ROUND COUNT must stay flat
  while per-round data grows m-fold: the wall-clock ratio vs m is the
  scaling signal.
- ``pagerank_units`` — the graph_pagerank / web_domain_pagerank engine
  (5 exact-integer power iterations): fixed round count by construction;
  the ratio is pure per-round scaling.
- a DEEP-chain probe: a path graph of 10,000 nodes through
  ``duplicate_clusters`` (max_iter=64 -> doubling gate 16), measuring
  the O(gate + log d) round bound at real depth — plain propagation
  would need 10,000 rounds.

Usage: python tools/probe_graph_100x.py [m ...]   (default 1 10 100)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from nl_railtraffic_etl_pipeline_spark.functions import dedup  # noqa: E402
from nl_railtraffic_etl_pipeline_spark.functions.graph import (  # noqa: E402
    pagerank_units,
)
from nl_railtraffic_etl_pipeline_spark.plans.ml_queries import (  # noqa: E402
    _pr_edges_df,
)
from nl_railtraffic_etl_pipeline_spark.plans.testdata import (  # noqa: E402
    load_table,
)
from nl_railtraffic_etl_pipeline_spark.session import get_spark  # noqa: E402

OFFSET = 10_000_000


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("probe-graph-100x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents", spread=True)
    base = _pr_edges_df(docs).persist()
    base_cc = base.filter(
        (F.col("src") % 17 < 4) & (F.col("src") != F.col("dst"))
    )
    n_edges = base.count()
    print(f"base edges sf0.1: {n_edges} (cc subgraph {base_cc.count()})")

    def scaled(e, m):
        if m == 1:
            return e
        k = F.col("_k") * OFFSET
        return (
            e.crossJoin(F.broadcast(spark.range(m).select(F.col("id").alias("_k"))))
            .select(
                (F.col("src") + k).alias("src"),
                (F.col("dst") + k).alias("dst"),
            )
        )

    for m in ms:
        e_cc = scaled(base_cc, m)
        t = time.time()
        cc = dedup.duplicate_clusters(e_cc, id_a="src", id_b="dst", max_iter=64)
        n_cc = cc.count()
        t_cc = time.time() - t

        e_pr = scaled(base, m)
        nodes = (
            e_pr.select(F.col("src").alias("id"))
            .unionByName(e_pr.select(F.col("dst").alias("id")))
            .distinct()
        )
        t = time.time()
        pr = pagerank_units(nodes, e_pr, iterations=5)
        n_pr = pr.count()
        t_pr = time.time() - t
        print(
            f"m={m}: components {t_cc:.1f}s ({n_cc} rows) | "
            f"pagerank5 {t_pr:.1f}s ({n_pr} nodes)"
        )

    # deep chain: path of 10k nodes, doubling gate = 64 // 4 = 16
    depth = 10_000
    chain = spark.range(depth).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t = time.time()
    cc = dedup.duplicate_clusters(chain, id_a="src", id_b="dst", max_iter=64)
    reps = cc.select("cluster_rep").distinct().count()
    print(
        f"deep chain d={depth}: {time.time() - t:.1f}s, "
        f"{reps} component(s) (plain propagation would need {depth} rounds)"
    )


if __name__ == "__main__":
    main()
