"""Planted-fixture tests for the retrieval/data-selection family
(plans/retrieval.py): hand-computed Python replicas of the exact
arithmetic both the Spark plan and the DuckDB oracle implement."""

import hashlib
import math

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.retrieval import (
    _BM25_TERMS,
    _DSIR_BUCKETS,
    _DSIR_TARGET,
    bm25_topk,
    dsir_importance,
)


def _write_docs(spark, tmp_path_factory, rows, name):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp(name))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _bm25_expected(texts: dict[int, str]) -> dict[int, float]:
    toks = {i: t.split() for i, t in texts.items() if t.split()}
    n_docs = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    out = {}
    for i, ws in toks.items():
        score = 0.0
        for t in _BM25_TERMS:
            tf = ws.count(t)
            df = sum(1 for w2 in toks.values() if t in w2)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(ws) / avgdl)))
        if any(t in ws for t in _BM25_TERMS):
            out[i] = round(score, 6)
    return out


def test_bm25_hand_computed(spark, tmp_path_factory):
    texts = {
        0: "spark spark spark shuffle",
        1: "spark query engine",
        2: "nothing relevant here at all",
        3: "data data join query spark lots of words here to dilute length",
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    d = _write_docs(spark, tmp_path_factory, rows, "bm25")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(spark, d).collect()}
    assert got == _bm25_expected(texts)  # doc 2 excluded: no query term


def test_bm25_ranks_higher_tf_higher(spark, tmp_path_factory):
    # same length docs, increasing tf of one term -> strictly higher score
    rows = [
        (0, "spark pad1 pad2 pad3", "en", "s", 1),
        (1, "spark spark pad2 pad3", "en", "s", 1),
        (2, "spark spark spark pad3", "en", "s", 1),
    ]
    d = _write_docs(spark, tmp_path_factory, rows, "bm25rank")
    out = bm25_topk(spark, d).collect()
    assert [r["doc_id"] for r in out] == [2, 1, 0]


def _dsir_expected(rows) -> dict[int, tuple[int, float]]:
    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS

    grams = {}
    for doc_id, text, _lang, source, _n in rows:
        ws = text.split()
        if len(ws) >= 2:
            grams[(doc_id, source)] = [
                f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
            ]
    raw, tgt = {}, {}
    for (_i, source), gs in grams.items():
        for g in gs:
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if source == _DSIR_TARGET:
                tgt[b] = tgt.get(b, 0) + 1
    raw_tot, tgt_tot = sum(raw.values()), sum(tgt.values())
    logw = {
        b: math.log((tgt.get(b, 0) + 1.0) / (tgt_tot + float(_DSIR_BUCKETS)))
        - math.log((raw[b] + 1.0) / (raw_tot + float(_DSIR_BUCKETS)))
        for b in raw
    }
    return {
        i: (len(gs), round(sum(logw[bucket(g)] for g in gs), 6))
        for (i, _s), gs in grams.items()
    }


def test_dsir_hand_computed(spark, tmp_path_factory):
    rows = [
        (0, "good stuff good stuff good stuff", "en", _DSIR_TARGET, 1),
        (1, "good stuff mixed bag here", "en", "src1", 1),
        (2, "bad junk bad junk bad junk", "en", "src1", 1),
        (3, "good stuff good stuff", "en", "src1", 1),
        (4, "solo", "en", "src1", 1),  # <2 tokens: no bigrams, excluded
    ]
    d = _write_docs(spark, tmp_path_factory, rows, "dsir")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_logw"])
        for r in dsir_importance(spark, d).collect()
    }
    assert got == _dsir_expected(rows)
    # target-like doc outranks target-unlike doc (per gram)
    assert got[3][1] / got[3][0] > got[2][1] / got[2][0]


def test_dsir_two_corpus_passes_only(spark, sf_dir):
    """The executed plan derives the gram stream exactly twice (LM build +
    scoring) — a third derivation means the totals branch regressed."""
    df = dsir_importance(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 4  # 2 passes (AQE prints each twice)


def test_ndcg_is_one_when_bm25_ranking_is_ideal(spark, tmp_path_factory):
    """Docs where BM25 order equals relevance order → NDCG@10 == 1."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.retrieval import ndcg_at_10

    rows = [
        (0, "spark query join data", "en", "s", 22),   # rel 4, highest score
        (1, "spark query join x x x", "en", "s", 22),  # rel 3
        (2, "spark query x x x x x x", "en", "s", 24), # rel 2
        (3, "spark x x x x x x x x x", "en", "s", 24), # rel 1
        (4, "nothing relevant here at all", "en", "s", 28),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("ndcg"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    r = ndcg_at_10(spark, d).first()
    assert r["ndcg"] == 1.0 and r["dcg"] == r["idcg"] > 0


def test_ndcg_fixture_bounds(spark, sf_dir):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.retrieval import ndcg_at_10

    r = ndcg_at_10(spark, sf_dir).first()
    assert 0.0 < r["ndcg"] <= 1.0
