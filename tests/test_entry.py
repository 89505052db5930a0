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
    assert rows_only == {
        "ann_lsh_topk",
        "ann_ivf_topk",
        "approx_agg",
        "asof_cogroup_pandas",
        "streaming_dedup",
        "dedup_minhash_mllib",
        "dedup_simhash_pairs",
        "kmeans_lloyd",
        "hll_user_reach",
        "dedup_embedding_cosine_bucketed",
        "multimodal_embed_ann",
        "multimodal_features",
        "multimodal_framesample",
        "pandas_udaf_mean",
        "streaming_incremental_dedup",
        "streaming_stateful",
        "pca_project",
        "bpe_merges",
    }


def test_all_queries_return_dataframes(spark, sf_dir):
    from pyspark.sql import DataFrame

    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert isinstance(df, DataFrame), name
