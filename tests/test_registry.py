"""Pins the driver-facing query ordering contract.

The driver's correctness gate checks only the first 50 entries of
``__spark_entry__.queries()``; round 1 lost every LLM-pipeline query to
the core/TPC-H long tail.  These tests pin (a) the curated window is
exactly the first 50 names, (b) every north-star family has rows inside
it, and (c) docs' declared query counts match reality.
"""

from __future__ import annotations

import re
from pathlib import Path

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry

REPO = Path(__file__).resolve().parent.parent


def test_window_is_first_50():
    names = list(registry.all_queries())
    assert len(registry.DRIVER_WINDOW) == 50
    assert names[:50] == list(registry.DRIVER_WINDOW)
    # no dangling names: every window entry is a registered query
    assert set(registry.DRIVER_WINDOW) <= set(names)


def test_window_covers_north_star_families():
    window = set(registry.DRIVER_WINDOW)
    # VERDICT r1 "done =" list — all must hold driver slots
    must = {
        "dedup_exact", "dedup_minhash_sig", "dedup_minhash_lsh",
        "dedup_clusters", "dedup_lsh_jaccard_verified", "text_quality",
        "lang_id", "tfidf_top_terms", "decontaminate_ngram",
        "cosine_knn_exact", "label_centroids", "event_window",
        "event_session", "multimodal_meta",
        # §2.1 core coverage
        "wordcount_e2e", "scan_count", "tokenize_wordcount", "project_lit",
        "partition_expr", "sort_asc", "sort_desc", "agg_count",
        # round-1 regression proof
        "tpch_q12",
    }
    assert must <= window, f"missing from driver window: {must - window}"


def test_window_mostly_oracle_backed():
    oracles = registry.all_oracles()
    rows_only = [n for n in registry.DRIVER_WINDOW if n not in oracles]
    # rows-only slots are spent ONLY on genuinely non-SQL-expressible ops
    assert set(rows_only) <= {
        "ann_lsh_topk", "ann_ivf_topk",
        "multimodal_features", "multimodal_embed_ann", "streaming_stateful",
        "dedup_embedding_cosine_bucketed",
    }, f"unexpected rows-only in window: {rows_only}"


def test_doc_counts_match_registry():
    """SURVEY §8 / README coverage claims must equal len(queries())."""
    n_q = len(registry.all_queries())
    n_o = len(registry.all_oracles())
    for doc in ("SURVEY.md", "README.md"):
        text = (REPO / doc).read_text()
        m = re.search(r"(\d+) declared queries,\s+(\d+) with\s+(?:DuckDB\s+)?oracles", text)
        assert m, f"{doc}: no declared-query count sentence found"
        assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
            f"{doc} claims {m.group(0)!r}; registry has {n_q}/{n_o}"
        )
