"""Window-skew (whale-key) probe for the behavioral operators.

Builds a synthetic event stream of N rows where ONE user owns `share` of
all events (the bot/whale regime) plus a uniform control, and times each
behavioral operator under its default plan and its whale-safe twin:

    funnel                 window chain   vs  chain="join"
    event_transitions      single window  vs  bucket_seconds segmentation
    cohort_retention       window stamp   vs  prestamp="join"

Timings are min-of-`reps` wall clock of a full count()/collect().  Output
is one JSON line per (operator, variant, distribution) — paste-ready for
SCALE.md.  Run on an idle box:

    python tools/probe_whale.py [n_rows] [whale_share] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
SHARE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
STAGES = ["view", "click", "purchase"]


def build(spark, whale: bool):
    """N_ROWS events over ~N/20 users across 60 days; whale=True reroutes
    `SHARE` of all rows to user 0."""
    from pyspark.sql import functions as F

    n_users = N_ROWS // 20
    ev = spark.range(N_ROWS).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in STAGES + ["scroll", "hover"]]),
            (F.pmod(F.hash(F.col("id")), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.hash(F.col("id") + 7), F.lit(86400 * 60))
        ).alias("ts"),
    )
    if whale:
        ev = ev.withColumn(
            "user_id",
            F.when(
                F.pmod(F.hash(F.col("event_id") + 13), F.lit(10**6))
                < int(SHARE * 10**6),
                F.lit(0),
            ).otherwise(F.col("user_id")),
        )
    return ev


def timeit(df) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    from nl_railtraffic_etl_pipeline_spark.functions.behavior import (
        cohort_retention,
        event_transitions,
        funnel,
    )
    from nl_railtraffic_etl_pipeline_spark.session import get_spark

    spark = get_spark("whale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for dist in ("uniform", "whale"):
        ev = build(spark, dist == "whale").persist()
        ev.count()  # materialize once so probes time the operator
        variants = {
            ("funnel", "window"): lambda: funnel(ev, STAGES),
            ("funnel", "join"): lambda: funnel(ev, STAGES, chain="join"),
            ("transitions", "window"): lambda: event_transitions(ev),
            ("transitions", "segmented"): lambda: event_transitions(
                ev, bucket_seconds=6 * 3600
            ),
            ("retention", "window"): lambda: cohort_retention(ev),
            ("retention", "join"): lambda: cohort_retention(
                ev, prestamp="join"
            ),
        }
        for (op, variant), thunk in variants.items():
            sec = timeit(thunk())
            row = {
                "op": op,
                "variant": variant,
                "dist": dist,
                "sec": sec,
                "rows": N_ROWS,
                "whale_share": SHARE if dist == "whale" else 0.0,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        ev.unpersist()

    print(json.dumps({"probe": "whale", "results": results}))


if __name__ == "__main__":
    main()
