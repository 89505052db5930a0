"""Per-query profiler: wall time + Spark job/stage/task counts.

Optimization-round instrument (guide §1): the bench times queries, but
WHERE the time goes at fixture scale is mostly fixed per-job overhead —
scheduling, state-store commits, checkpoint materializations. This
script runs each named query through the noop sink inside its own job
group and reports how many jobs / stages / tasks it spawned, which
localizes driver-loop overhead (connected-components rounds, streaming
micro-batches) without the Spark UI (disabled in the tuned session).

Usage: python tools/profile_queries.py [sf_dir] [query ...]
(default: every headline query)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = (args[1:] if args and os.path.isdir(args[0]) else args) or HEADLINE
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    tracker = spark.sparkContext.statusTracker()

    # warmups (same as bench.py)
    queries["scan_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out = []
    for name in names:
        group = f"prof_{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        rec = {
            "query": name,
            "wall": round(wall, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        out.append(rec)
        print(
            f"{rec['wall']:8.3f}s  jobs={rec['jobs']:3d} stages={n_stages:4d} "
            f"tasks={n_tasks:5d}  {name}",
            flush=True,
        )
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
