"""Dedup-operator behavior on planted near/exact duplicates."""

import pytest
from pyspark.sql import functions as F

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.functions import text as X

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """documents-shaped table with one exact dup + one near dup planted."""
    rows = [
        (0, BASE, "en", "src", len(BASE)),
        (1, BASE, "en", "src", len(BASE)),  # exact dup of 0
        (2, BASE.replace("today", "tonight"), "en", "src", len(BASE)),  # near dup
        (3, "completely different text about spark query planning engines", "en", "src", 60),
        (4, "short", "en", "src", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("planted"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_exact_dedup_finds_planted_dup(spark, planted):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import dedup_exact

    out = dedup_exact(spark, planted).collect()
    by_keep = {r["keep_id"]: r["dup_cnt"] for r in out}
    assert by_keep[0] == 2  # docs 0 and 1 collapse
    assert len(out) == 4  # 5 docs → 4 clusters


def test_minhash_lsh_finds_near_dup(spark, planted):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        dedup_minhash_lsh,
    )

    pairs = {(r["a_id"], r["b_id"]) for r in dedup_minhash_lsh(spark, planted).collect()}
    assert (0, 1) in pairs  # exact dup: identical signatures
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares most shingles
    assert not any(3 in p or 4 in p for p in pairs)  # unrelated docs stay out


def test_ngram_jaccard_scores_near_dup_high(spark, planted):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        dedup_ngram_jaccard,
    )

    rows = {(r["a_id"], r["b_id"]): r["jaccard"] for r in dedup_ngram_jaccard(spark, planted).collect()}
    assert rows[(0, 1)] == 1.0
    assert rows[(0, 2)] > 0.5
    assert not any(3 in k for k in rows)


def test_simhash_near_dup_small_hamming(spark, planted):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import dedup_simhash

    sigs = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, planted).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert sigs[0] == sigs[1]
    assert ham(sigs[0], sigs[2]) <= 6  # near dup: few bits flip
    assert ham(sigs[0], sigs[3]) >= 8  # unrelated: many bits differ


def test_star_edges_equal_clique_components(spark, sf_dir):
    """lsh_candidate_pairs(edges_only=True) emits a star per bucket —
    m−1 edges instead of m(m−1)/2 — which must yield exactly the same
    connected components as the full clique expansion."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import table
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    sigs = minhash_signatures(table(spark, sf_dir, "documents"))
    clique = lsh_candidate_pairs(sigs)
    star = lsh_candidate_pairs(sigs, edges_only=True)
    assert star.count() <= clique.count()
    got_star = {
        (r.doc_id, r.cluster) for r in connected_components(docs, star).collect()
    }
    got_clique = {
        (r.doc_id, r.cluster) for r in connected_components(docs, clique).collect()
    }
    assert got_star == got_clique


def test_bucketed_embedding_pairs_subset_of_exact(spark, sf_dir):
    """The LSH-banded variant may only ever emit pairs the exact
    all-pairs query also finds (same 0.4 threshold, same kernel) —
    banding prunes candidates, never adds them."""
    import __spark_entry__ as E

    exact = {
        (r.a_id, r.b_id)
        for r in E.queries()["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    bucketed = {
        (r.a_id, r.b_id)
        for r in E.queries()["dedup_embedding_cosine_bucketed"](spark, sf_dir).collect()
    }
    assert bucketed, "banding should surface at least some boundary pairs"
    assert bucketed <= exact


def test_bucketed_embedding_recall_on_planted_near_dups(spark):
    """The regime the operator is FOR: planted near-identical vectors
    (cos ≥ 0.98). Banding theory gives per-pair recall
    1-(1-p^8)^4 ≈ 0.97 at cos 0.99 — assert ≥ 0.9 over 20 planted
    pairs. Background vectors are random (near-orthogonal in d=64), so
    false candidates are also checked to stay out."""
    import numpy as np

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        embedding_cosine_bucketed_pairs,
    )

    rng = np.random.RandomState(7)
    rows = []
    planted = []
    for i in range(20):  # pairs (2i, 2i+1): near-identical
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        noise = rng.randn(64) * 0.02
        w = v + noise
        w /= np.linalg.norm(w)
        assert float(v @ w) >= 0.98
        rows.append((2 * i, v.tolist()))
        rows.append((2 * i + 1, w.tolist()))
        planted.append((2 * i, 2 * i + 1))
    for j in range(40, 140):  # background: random directions
        u = rng.randn(64)
        rows.append((j, (u / np.linalg.norm(u)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.a_id, r.b_id)
        for r in embedding_cosine_bucketed_pairs(emb, threshold=0.9).collect()
    }
    hit = sum(1 for p in planted if p in got)
    assert hit / len(planted) >= 0.9
    # nothing but planted pairs at a 0.9 threshold
    assert got <= set(planted)


def test_containment_finds_planted_excerpt(spark, tmp_path_factory):
    """A short doc whose shingles are a strict subset of a long doc's
    must surface with containment 1.0; unrelated docs must not pair."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        dedup_containment,
    )

    long_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    excerpt = "gamma delta epsilon zeta eta"  # interior slice → all its
    # trigram shingles appear verbatim inside long_text
    rows = [
        (0, long_text, "en", "src", len(long_text)),
        (1, excerpt, "en", "src", len(excerpt)),
        (2, "unrelated words entirely disjoint vocabulary here", "en", "src", 49),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("contain"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {(r["a_id"], r["b_id"]): r["containment"] for r in dedup_containment(spark, d).collect()}
    assert out.get((0, 1)) == 1.0
    assert all(2 not in pair for pair in out)


def test_keep_best_prefers_longest_then_lowest_id(spark, tmp_path_factory):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        dedup_keep_best,
    )

    rows = [
        (0, "short", "en", "srcA", 5),
        (1, "a much longer document body", "en", "srcA", 27),   # wins srcA/en
        (2, "tie text one", "fr", "srcA", 12),
        (3, "tie text two", "fr", "srcA", 12),                   # tie → doc 2 wins
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("keepbest"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {(r["source"], r["lang"]): r["doc_id"] for r in dedup_keep_best(spark, d).collect()}
    assert out[("srcA", "en")] == 1
    assert out[("srcA", "fr")] == 2


def test_substring_dup_rate_planted(spark, tmp_path_factory):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        substring_dup_rate,
    )

    shared = "one two three four five six seven eight"  # exactly one 8-gram
    rows = [
        (0, shared + " tail words here", "en", "srcA", 10),
        (1, "prefix words " + shared, "en", "srcA", 10),      # shares the 8-gram
        (2, "totally different words with no overlap at all", "en", "srcB", 10),
        (3, "eight seven six five four three two one", "en", "srcB", 10),  # reversed: no shared gram
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("subdup"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = substring_dup_rate(spark, d).first()
    assert r["n_docs"] == 4
    assert r["docs_with_dup"] == 2
    assert r["dup_grams"] == 1
    assert r["dup_rate"] == 0.5


def test_semdedup_removes_within_cluster_only(spark, tmp_path_factory):
    """Two identical-direction pairs land in different kmeans cells;
    each pair loses its higher id. A cross-cluster near-dup pair must
    NOT produce a removal (the SemDeDup trade the paper accepts)."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        dedup_semdedup,
    )

    dim = 16

    def vec(main_axis, scale, pin_axis=None):
        v = [0.0] * dim
        v[main_axis] = scale
        if pin_axis is not None:
            v[pin_axis] = 0.1
        return v

    # 8 singletons on axes 0-7 become the 8 fixed centroids
    rows = [(i, vec(i, 1.0), i % 4) for i in range(8)]
    # planted near-dup pair on axis 9, pinned to cluster 3 (cosine to
    # the centroid vector itself is 0.02 — below threshold)
    rows += [(100, vec(9, 5.0, 3), 0), (101, vec(9, 5.05, 3), 0)]
    # cross-cluster twin: same axis-9 direction (cosine ~0.999 to the
    # pair) but pinned to cluster 5 — must NOT be removed
    rows += [(300, vec(9, 5.0, 5), 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path_factory.mktemp("semdedup"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    removed = {r["removed_id"] for r in dedup_semdedup(spark, d).collect()}
    assert removed == {101}


def test_cross_snapshot_fuzzy_matches_lsh_pair_semantics(spark, sf_dir):
    """Every (new_doc, dup_of) row must correspond to an odd/even
    near-dup pair the batch LSH discovers, and dup_of must be the
    MINIMUM even-id band-collision partner of that doc."""
    import __spark_entry__ as E

    fuzzy = {
        r["doc_id"]: r["dup_of"]
        for r in E.queries()["dedup_cross_snapshot_fuzzy"](spark, sf_dir).collect()
    }
    pairs = {
        (r["a_id"], r["b_id"])
        for r in E.queries()["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    # odd->even partners implied by the batch pair set
    partners: dict[int, set[int]] = {}
    for a, b in pairs:
        for new, old in ((a, b), (b, a)):
            if new % 2 == 1 and old % 2 == 0:
                partners.setdefault(new, set()).add(old)
    assert fuzzy == {n: min(olds) for n, olds in partners.items()}


def test_cluster_oracles_gate_degenerate_buckets(spark, tmp_path_factory):
    """Round-11 code-review find: dedup_clusters' (and the new
    split_cluster_safe's) oracle pairs CTE was UNGATED while the engine
    applies lsh_candidate_pairs' (>1, ≤_MAX_BUCKET) degenerate-bucket
    cap — a latent divergence no fixture tripped because none carries a
    >10k-member band bucket. This plants one (_MAX_BUCKET + 1 identical
    boilerplate docs) plus a normal near-dup pair and asserts ENGINE
    and ORACLE agree: boilerplate docs stay singleton clusters, the
    near-dup pair still clusters."""
    import duckdb

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        _MAX_BUCKET,
        dedup_clusters,
    )

    boiler = "lorem ipsum dolor sit amet boilerplate navigation footer links"
    n_boiler = _MAX_BUCKET + 1
    base = spark.range(n_boiler).select(
        (F.col("id") + 100).alias("doc_id"),
        F.lit(boiler).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(len(boiler)).cast("long").alias("n_chars"),
    )
    pair = spark.createDataFrame(
        [
            (0, BASE, "en", "src", len(BASE)),
            (1, BASE.replace("today", "tonight"), "en", "src", len(BASE)),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = str(tmp_path_factory.mktemp("overcap"))
    base.unionByName(pair).coalesce(2).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )

    labels = {r["doc_id"]: r["cluster"] for r in dedup_clusters(spark, d).collect()}
    # near-dup pair clusters; every boilerplate doc is its own cluster
    assert labels[1] == labels[0] == 0
    assert all(labels[i] == i for i in range(100, 110))
    assert len(set(labels.values())) == n_boiler + 1

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{d}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(registry.oracle_for("dedup_clusters")).df()
    olabels = dict(zip(oracle["doc_id"], oracle["cluster"]))
    assert olabels == labels
