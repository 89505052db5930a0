"""Capture `.explain("formatted")` of declared queries to files.

Optimization-round evidence tool: writes
``plans/r13/<query>_<suffix>.txt`` for each named query so plan-shape
claims (Exchange counts, join strategies, pushdown) are checkable
without running Spark.

Usage: python tools/plan_capture.py <suffix> [sf_dir] query...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.session import get_spark

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
)


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0]
    if len(args) > 1 and os.path.isdir(args[1]):
        sf_dir, names = args[1], args[2:]
    else:
        sf_dir, names = "/root/testdata/sf0.001", args[1:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} [{suffix}]\n\n")
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
