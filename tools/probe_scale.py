"""10x scale-ratio probe: times registry queries at two SFs and reports
the runtime ratio against the data-size ratio.

A plan that scales is one whose runtime grows ~linearly (or better) with
input size; a super-linear ratio at 10x input flags the construct that
will fall over first at 100 TB.  Usage (idle box):

    python tools/probe_scale.py [small_sf_dir] [big_sf_dir] [query ...]

Defaults: sf0.01 -> sf0.1 over the r3/r4 gate families VERDICT r3 asked
to probe (funnel, retention, transitions, PPS, histogram, gapfill,
pivot/unpivot, CUBE, SCD-2, sliding RANGE window) plus the lake gate.
min-of-3 per query per SF; one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "events_funnel",
    "events_retention",
    "events_transitions",
    "events_sliding_value",
    "events_daily_pivot",
    "events_daily_unpivot",
    "events_cube",
    "scd2_user_state",
    "events_value_histogram",
    "events_daily_gapfill",
    "events_value_outliers",
    "events_type_quantiles",
    "sample_weighted_pps",
    "sample_bernoulli_strata",
    "text_top_bigrams",
    "pack_sequences",
    "rail_lake_roundtrip",
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_QUERIES

    import __spark_entry__ as e
    from nl_railtraffic_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def best(name: str, sf_dir: str) -> float:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_best = min(t_best, time.time() - t0)
        return round(t_best, 3)

    for name in names:
        t_small, t_big = best(name, small), best(name, big)
        print(
            json.dumps(
                {
                    "q": name,
                    "small_sec": t_small,
                    "big_sec": t_big,
                    "ratio": round(t_big / t_small, 2) if t_small else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
