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


def test_window_covers_rotation_targets():
    window = set(registry.DRIVER_WINDOW)
    # Round-3 rotation (VERDICT r2 "Next round" §1): the always-on
    # regression core plus every query never driver-checked in r1/r2.
    core = {
        "wordcount_e2e", "scan_count", "tokenize_wordcount", "project_lit",
        "partition_expr", "sort_asc", "sort_desc", "agg_count",
        # round-1 regression proof
        "tpch_q12",
    }
    never_checked = {
        "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q15", "tpch_q16",
        "tpch_q20", "tpch_q21", "tpch_q22",
        "exact_distinct_agg", "stats_agg", "scalar_json",
        "join_skew_salted", "shingle_fingerprints", "ngram_freq",
        "text_normalize", "corpus_report", "quality_deciles",
        "decontaminate_bloom", "pandas_udaf_mean", "dedup_simhash_pairs",
        "dedup_minhash_mllib", "dedup_keep_best", "dedup_containment",
        "embedding_stats", "kmeans_assign", "kmeans_lloyd",
        "multimodal_framesample", "asof_cogroup_pandas", "streaming_dedup",
        "streaming_incremental_dedup", "event_hopping_window",
        "streaming_hopping",
    }
    must = core | never_checked
    assert must <= window, f"missing from driver window: {must - window}"


def test_window_mostly_oracle_backed():
    oracles = registry.all_oracles()
    rows_only = [n for n in registry.DRIVER_WINDOW if n not in oracles]
    # rows-only slots are spent ONLY on genuinely non-SQL-expressible ops
    assert set(rows_only) <= {
        "pandas_udaf_mean", "dedup_simhash_pairs", "dedup_minhash_mllib",
        "kmeans_lloyd", "multimodal_framesample", "asof_cogroup_pandas",
        "streaming_dedup", "streaming_incremental_dedup",
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


def test_round4_pool_is_exactly_the_never_checked_set():
    """The documented rotation pool must equal the recomputed set of
    queries with no driver CORRECTNESS row in any prior round and no
    current window slot — so the pool cannot silently rot as queries
    are added."""
    import json

    r1 = set(json.load(open(REPO / "CORRECTNESS_r01.json")))
    r2 = set(json.load(open(REPO / "CORRECTNESS_r02.json")))
    never = set(registry.all_queries()) - r1 - r2 - set(registry.DRIVER_WINDOW)
    assert set(registry.ROUND4_ROTATION_POOL) == never
