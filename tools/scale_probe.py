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

Two dup regimes, selected by ``--variants N``:

* default (no flag): every odd replica gets a UNIQUE suffix, so
  near-dup cluster size grows LINEARLY with the factor — an
  adversarial regime in which any pairwise verifier's pair volume is
  quadratic in the factor (measured: it exceeds this node's disk at
  300×). Useful for finding the wall, not for projecting production.
* ``--variants N``: odd replicas cycle through N distinct suffixes, so
  cluster size is CONSTANT (N near-dup variants + 1 exact family) no
  matter the factor — the production crawl profile, where dup cluster
  size is set by site behavior, not corpus size. Pair volume then
  scales linearly with the corpus, which is the regime the
  exact-collapse-first composition is designed for.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import catalog, registry
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


def build_corpus(spark, factor: int, variants: int | None = None) -> str:
    """Replicate documents, embeddings, events, and orders factor×: ids offset
    per replica; odd doc/vector replicas are perturbed (suffix token /
    nudged first vector component → near-dups), even replicas are exact
    dups; event replicas take fresh user_id ranges (key-population
    growth — the stress for per-key windows/grids, not dup density).
    Deterministic, derived solely from the fixture. Each table builds
    independently behind its own _SUCCESS marker, so corpora from
    earlier probe versions top up instead of rebuilding, and a crash
    mid-build never leaves a half-corpus that later runs silently
    adopt."""
    out_dir = f"/tmp/spark_graft_scale_{factor}x" + (
        f"_v{variants}" if variants else ""
    )

    def done(t: str) -> bool:
        return os.path.exists(os.path.join(out_dir, t, "_SUCCESS"))

    reps = spark.range(factor).withColumnRenamed("id", "rep")
    if not done("documents"):
        docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
        n = docs.count()
        (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
                F.when(
                    F.col("rep") % 2 == 1,
                    F.concat(
                        F.col("text"),
                        F.lit(" r"),
                        # capped regime: N distinct odd suffixes → constant
                        # cluster size; default: unique suffix per replica
                        F.col("rep") % (2 * variants) if variants else F.col("rep"),
                    ),
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
    if not done("embeddings"):
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
                        lambda x, i: x
                        + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
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
    if not done("orders"):
        # fact-table growth against FIXED dimensions (customer/nation
        # stay fixture-sized): per-customer order volume grows with the
        # factor — the regime that stresses the star-join + rollup
        # queries (revenue_yoy_growth, abc_analysis), where the win is
        # that every aggregate partial-combines to dimension-sized rows
        orders = spark.read.parquet(os.path.join(BASE_SF_DIR, "orders.parquet"))
        no = orders.count()
        (
            orders.crossJoin(reps)
            .select(
                (F.col("o_orderkey") + F.col("rep") * F.lit(no)).alias("o_orderkey"),
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "orders"))
        )
    if not done("lineitem"):
        # basket-table growth keyed consistently with orders: l_orderkey
        # offsets by the SAME per-replica stride as o_orderkey, so each
        # replica contributes whole baskets (basket-count growth at
        # constant basket size — the production regime copurchase_pairs'
        # C(n,2)-per-basket expansion is designed for)
        no2 = spark.read.parquet(
            os.path.join(BASE_SF_DIR, "orders.parquet")
        ).count()
        li = spark.read.parquet(os.path.join(BASE_SF_DIR, "lineitem.parquet"))
        (
            li.crossJoin(reps)
            .select(
                (F.col("l_orderkey") + F.col("rep") * F.lit(no2)).alias(
                    "l_orderkey"
                ),
                "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                "l_linestatus", "l_shipdate",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "lineitem"))
        )
    if not done("events"):
        # via catalog.table: fixture events are TIMESTAMP(NANOS); the
        # replica lands as standard micros, which catalog passes through
        ev = catalog.table(spark, BASE_SF_DIR, "events")
        ne, u = ev.count(), ev.agg(F.max("user_id")).first()[0] + 1
        (
            ev.crossJoin(reps)
            .select(
                (F.col("event_id") + F.col("rep") * F.lit(ne)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("rep") * F.lit(u)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "events"))
        )
    return out_dir


def _resample_full(spark, sf_view):
    """The resample_ffill dataflow WITHOUT the oracle's bounded user
    slice — per-key window/grid behavior over the full replicated user
    population (the declared query filters user_id < 20, which would
    probe only the base fixture's users)."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.streaming import (
        resample_pipeline,
    )

    return resample_pipeline(catalog.table(spark, sf_view, "events"))


def _streaming_session_production(spark, sf_view):
    """``streaming_session_window`` under its PRODUCTION configuration —
    RocksDB state store, bounded micro-batches (maxFilesPerTrigger), a
    streaming noop sink — instead of the declared query's all-at-once
    memory-sink test harness. The harness form materializes EVERY
    emitted session in the driver's in-memory table, which is exactly
    what this probe measured OOMing at 100× (~9.5M session rows on an
    8g driver); the topology itself (user-keyed session-merge state,
    watermark eviction) is what production deploys, so that is what
    the probe times. Watermark-lateness drops across the corpus's
    unordered files are acceptable here: the probe measures state +
    emission machinery, not row parity (the declared query's oracle
    pins parity at fixture scale, where one micro-batch sees
    everything)."""
    from pyspark.sql import functions as F  # noqa: F811

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.streaming.windows import (
        events_stream,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = events_stream(
            spark,
            os.path.join(sf_view, "events.parquet"),
            options={"maxFilesPerTrigger": "8"},
        ).withWatermark("ts", "0 seconds")
        agg = src.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        ).agg(F.count("*").alias("n_events"))
        q = (
            agg.writeStream.outputMode("append")
            .format("noop")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return spark.range(1).selectExpr("id AS done")


#: Probe-only dataflows: shapes whose declared query bounds its output
#: for the oracle, run here unbounded / under production config.
PROBE_EXTRAS = {
    "resample_ffill_full": _resample_full,
    "streaming_session_window_production": _streaming_session_production,
}


def main() -> None:
    args = sys.argv[1:]
    variants = None
    if "--variants" in args:
        i = args.index("--variants")
        variants = int(args[i + 1])
        del args[i : i + 2]
    factor = int(args[0]) if args else 100
    names = args[1:] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    corpus = build_corpus(spark, factor, variants)

    # catalog.table(sf_dir, name) resolves {sf_dir}/{name}.parquet; stage a
    # directory view where the replicated tables point at the corpus and
    # every other table falls back to the base fixture.
    sf_view = f"{corpus}_view"
    os.makedirs(sf_view, exist_ok=True)
    for t in os.listdir(BASE_SF_DIR):
        link = os.path.join(sf_view, t)
        if not os.path.lexists(link):
            os.symlink(os.path.join(BASE_SF_DIR, t), link)
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        link = os.path.join(sf_view, f"{t}.parquet")
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(os.path.join(corpus, t), link)

    queries = {**registry.all_queries(), **PROBE_EXTRAS}
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        queries[name](spark, sf_view).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s", flush=True)
    print(
        json.dumps(
            {
                "factor": factor,
                "variants": variants,
                "base": BASE_SF_DIR,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
