"""Dump ``explain('formatted')`` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage:
    python tools/dump_plans.py <tag> <suffix> [sf_dir] q1 q2 ...

Writes plans/<tag>/<query>_<suffix>.txt for each query — the before/after
plan evidence the optimization rounds commit alongside code changes.

Paths derive from this file's location (repo root = parent of tools/), and
the plan text comes from the public ``DataFrame.explain`` via stdout capture
— no private JVM bridge (ADVICE r11).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = (
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            rest,
        )

    from nl_railtraffic_etl_pipeline_spark.plans.registry import QUERIES
    from nl_railtraffic_etl_pipeline_spark.session import get_spark

    out_dir = os.path.join(_REPO_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
