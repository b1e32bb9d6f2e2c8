"""Dump ``explain('formatted')`` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage:
    python tools/dump_plans.py <tag> <suffix> [sf_dir] q1 q2 ...

Writes plans/<tag>/<query>_<suffix>.txt for each query — the before/after
plan evidence the optimization rounds commit alongside code changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    from nl_railtraffic_etl_pipeline_spark.plans.registry import QUERIES
    from nl_railtraffic_etl_pipeline_spark.session import get_spark

    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
