"""Edge cases: empty results, single rows, degenerate inputs — every
operator must degrade gracefully, not throw."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import table
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
    connected_components,
    shingle_rows,
)


def test_wordcount_on_empty_filter(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 0)
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.core import wordcount

    assert wordcount(docs).count() == 0


def test_shingles_on_empty_input(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 0)
    assert shingle_rows(docs).count() == 0


def test_connected_components_no_edges(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id").limit(10)
    edges = spark.createDataFrame([], "a_id long, b_id long")
    labels = connected_components(docs, edges)
    assert all(r["doc_id"] == r["cluster"] for r in labels.collect())


def test_knn_single_query(spark, sf_dir):
    """Filters that leave one query vector still produce k rows."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.functions import vectors as V

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    cos = V.cosine(F.col("qe"), F.col("c.embedding"))
    scored = (
        emb.alias("c").crossJoin(F.broadcast(q))
        .filter(F.col("c.vec_id") != F.col("q_id"))
        .select("q_id", F.col("c.vec_id").alias("n_id"), cos.alias("cos"))
        .orderBy(F.col("cos").desc())
        .limit(3)
    )
    assert scored.count() == 3


def test_mllib_lsh_runs(spark, sf_dir):
    pairs = E.queries()["dedup_minhash_mllib"](spark, sf_dir)
    rows = pairs.collect()
    assert len(rows) > 0  # fixtures contain near-dups; empty = regression
    assert all(r["a_id"] < r["b_id"] for r in rows)


def test_salted_join_rejects_outer(spark, sf_dir):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.operators.joins import (
        salted_join,
    )

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(o, c, "o_custkey", "c_custkey", how="full")


def test_mapreduce_recovers_from_stale_staging(spark, sf_dir, tmp_path):
    """A leftover staging dir from an interrupted run must not break the
    next run (saveAsTextFile refuses existing paths)."""
    import os

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.operators.mapreduce import (
        JobConfig,
        run_job,
    )

    inp = tmp_path / "in.txt"
    inp.write_text("a b c \nd e f \n")
    out_dir = tmp_path / "out"
    stale = out_dir / "_j_parts" / "_temporary"
    stale.mkdir(parents=True)
    cfg = JobConfig("j", 2, 0, str(inp), 1, None, str(out_dir))
    run_job(spark, cfg)
    assert os.path.exists(out_dir / "j-1.out")
    assert not os.path.exists(out_dir / "_j_parts")
