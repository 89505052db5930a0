"""Unit tests of the text-analysis column expressions on inline data."""

import pytest
from pyspark.sql import functions as F

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.functions import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and it is a fine day for the cat"),
        (2, "der hund ist nicht ein katze und der tag ist gut"),
        (3, "xyzzy qwerty plugh"),
        (4, "  The   cat sat  on the mat and it is a fine day for the cat  "),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def one(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_token_count(spark, docs):
    out = one(docs.select("id", X.token_count("text").alias("n")), "n")
    assert out[1] == 15
    assert out[3] == 3
    assert out[5] == 0


def test_lang_id(spark, docs):
    out = one(docs.select("id", X.lang_id("text").alias("l")), "l")
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark, docs):
    out = one(docs.select("id", X.fingerprint("text").alias("fp")), "fp")
    assert out[1] == out[4]  # same words modulo case/whitespace
    assert out[1] != out[2]


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["id", "text"])
    [row] = df.select(X.word_shingles("text", 3).alias("sh")).collect()
    assert row["sh"] == ["a b c", "b c d"]
    # shorter than k → empty, not null
    [row2] = (
        spark.createDataFrame([(1, "a b")], ["id", "text"])
        .select(X.word_shingles("text", 3).alias("sh"))
        .collect()
    )
    assert row2["sh"] == []


def test_quality_score_bounds(spark, docs):
    out = one(docs.select("id", X.quality_score("text").alias("q")), "q")
    for v in out.values():
        assert 0.0 <= v <= 1.0
    assert out[1] > out[3]  # prose beats keyboard mash


def test_bpe_ish_counts_punctuation(spark):
    df = spark.createDataFrame([(1, "hello, world! x2")], ["id", "text"])
    [row] = df.select(X.bpe_ish_token_count("text").alias("n")).collect()
    # hello , world ! x 2 → 6
    assert row["n"] == 6


def test_bloom_decontaminate_matches_exact_and_prunes(spark, sf_dir):
    """The bloom path must equal the exact path bit-for-bit (false
    positives die in the verify join) while the prefilter does real
    work: surviving candidate grams are a small fraction of train
    grams on the fixture."""
    import __spark_entry__ as E

    exact = E.queries()["decontaminate_ngram"](spark, sf_dir).collect()
    bloom = E.queries()["decontaminate_bloom"](spark, sf_dir).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, bloom))
