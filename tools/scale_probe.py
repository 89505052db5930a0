"""Empirical scale-up probe: replicate the documents fixture N× and run
the production-path queries against it.

The small-SF bench answers "is it correct and fast at sf0.1"; this tool
answers "does the plan SHAPE hold as rows grow" — the evidence behind
SCALING.md's measured scale-up tables. Replicas are half exact
duplicates, half perturbed (a replica-index token appended), producing
a deliberately dup-heavy corpus that stresses candidate generation and
cluster formation the way a crawled web corpus would.

    python tools/scale_probe.py [factor] [query ...]

Writes the replicated corpus under /tmp/spark_graft_scale_<factor>x
(reused if present) and prints one timing line per query plus one JSON
summary line. Queries default to the production dedup path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.session import get_spark

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "wordcount_e2e",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_jaccard_verified",
    "dedup_clusters",
    "text_quality",
    "lang_id",
    "pipeline_filter_quality",
]


def build_corpus(spark, factor: int) -> str:
    """Replicate documents and embeddings factor×: ids offset per
    replica; odd replicas are perturbed (suffix token / nudged first
    vector component → near-dups), even replicas are exact dups.
    Deterministic, derived solely from the fixture."""
    out_dir = f"/tmp/spark_graft_scale_{factor}x"
    # reuse only a COMPLETE corpus: a crash between the two writes must
    # not leave a half-built corpus that later runs silently adopt
    if all(
        os.path.exists(os.path.join(out_dir, t, "_SUCCESS"))
        for t in ("documents", "embeddings")
    ):
        return out_dir
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    n = docs.count()
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
            F.when(
                F.col("rep") % 2 == 1,
                F.concat(F.col("text"), F.lit(" r"), F.col("rep")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents"))
    )
    emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    m = emb.count()
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(m)).alias("vec_id"),
            F.when(
                F.col("rep") % 2 == 1,
                F.transform(
                    "embedding",
                    lambda x, i: x + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
                ),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings"))
    )
    return out_dir


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    corpus = build_corpus(spark, factor)

    # catalog.table(sf_dir, name) resolves {sf_dir}/{name}.parquet; stage a
    # directory view where documents/embeddings point at the replicated
    # corpus and every other table falls back to the base fixture.
    sf_view = f"{corpus}_view"
    os.makedirs(sf_view, exist_ok=True)
    for t in os.listdir(BASE_SF_DIR):
        link = os.path.join(sf_view, t)
        if not os.path.lexists(link):
            os.symlink(os.path.join(BASE_SF_DIR, t), link)
    for t in ("documents", "embeddings"):
        link = os.path.join(sf_view, f"{t}.parquet")
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(os.path.join(corpus, t), link)

    queries = registry.all_queries()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        queries[name](spark, sf_view).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s", flush=True)
    print(json.dumps({"factor": factor, "base": BASE_SF_DIR, "queries": timings}))


if __name__ == "__main__":
    main()
