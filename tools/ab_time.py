"""Repetition timer for targeted queries — the optimization-round
measurement instrument (guide §1).

The host has an intermittent co-runner: single full-bench runs can be
inflated 3-5× mid-run (observed round 13: calib_mt 152 → 686 ms within
one run), so before/after deltas on one-shot walls are noise. This runs
each named query N times through the noop sink in one session and
reports MIN and MEDIAN per query — min approximates the quiet-machine
wall (contention only ever adds time), median shows stability. The
single-thread+multithread md5 calibrations bracket every rep so a
polluted rep is visible.

Usage: python tools/ab_time.py [-n REPS] [--out PATH] [sf_dir] query...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calib_mt_ms
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    out = None
    if "-n" in args:
        i = args.index("-n")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        raise SystemExit("usage: ab_time.py [-n N] [--out P] [sf_dir] query...")

    spark = get_spark("ab_time")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    queries["scan_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {n: [] for n in names}
    calibs: list[float] = []
    for r in range(reps):
        calibs.append(_calib_mt_ms())
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{name}#{r}")
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    calibs.append(_calib_mt_ms())

    result = {
        "sf_dir": sf_dir,
        "reps": reps,
        "calib_mt_ms": [round(c, 1) for c in calibs],
        "queries": {
            n: {
                "min": round(min(w), 3),
                "median": round(statistics.median(w), 3),
                "all": [round(x, 3) for x in w],
            }
            for n, w in walls.items()
        },
    }
    for n, s in result["queries"].items():
        print(f"{s['min']:8.3f}s min {s['median']:8.3f}s med  {n}", flush=True)
    print("calib_mt_ms:", result["calib_mt_ms"])
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
