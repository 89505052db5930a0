"""Driver-contract tests: entry smoke (t1 shape) + registry invariants."""

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["word", "cnt"]


def test_registry_alignment():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 40
    # every oracle refers to a declared query
    assert set(oracles) <= set(qs)
    # rows-only queries are the deliberate, documented exceptions
    rows_only = set(qs) - set(oracles)
    # Round 8 graduated nine deterministic algorithms to full oracles
    # (both ANN top-k probes, the bucketed embedding dedup, the SimHash
    # pair search, the cogrouped as-of join, the pandas UDAF, and the
    # whole multimodal family); round 9 graduated the two drained-static
    # streaming dedups (VERDICT r8 #4). What remains is exactly the
    # genuinely non-replayable set: sketches/approximate aggregates,
    # the MLlib hash family, iterative algorithms, live streaming
    # state (streaming_stateful's arbitrary-state operator has no
    # batch-SQL twin; each member keeps an oracle-backed foothold or
    # property/error-bound test). Round 11 graduated hll_user_reach
    # (VERDICT r10 #5): the DataSketches HLL was replaced by a
    # hand-rolled md5-register HLL whose estimator replays bit-exactly
    # in DuckDB — the sketch itself is now hash-checked. Round 12
    # graduated dedup_minhash_mllib (VERDICT r11 #4): its output
    # contract (candidates post-filtered by EXACT set distance, full
    # seed-42 recall on the swept fixtures) equals the exact-shingle
    # Jaccard truth, which DuckDB replays via the inverted-index CTE —
    # the surviving five are each irreducible (sketch estimates,
    # iterative convergence state, or live streaming state).
    assert rows_only == {
        "approx_agg",
        "kmeans_lloyd",
        "streaming_stateful",
        "pca_project",
        "bpe_merges",
    }


def test_all_queries_return_dataframes(spark, sf_dir):
    from pyspark.sql import DataFrame

    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert isinstance(df, DataFrame), name


def test_window_queries_run_in_vanilla_session():
    """The driver uses a PLAIN SparkSession, not session.get_spark() —
    run entry() plus a cross-family sample of the correctness window in
    one, from a cwd outside the repo (catches pickle-by-reference and
    tuned-config dependencies; the full 50-query vanilla sweep runs
    manually, see verify skill)."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false").getOrCreate())
        import __spark_entry__ as E
        assert E.entry(spark).count() >= 0
        qs = E.queries()
        for name in ["wordcount_e2e", "tpch_q12", "dedup_keep_best",
                     "kmeans_assign", "streaming_hopping", "pq_encode"]:
            assert qs[name](spark, "/root/testdata/sf0.001").count() >= 0, name
        print("VANILLA_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600, cwd="/tmp",
    )
    assert "VANILLA_OK" in out.stdout, out.stderr[-2000:]
