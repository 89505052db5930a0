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
    # Round-4 rotation (VERDICT r3 "Next round" #1): the always-on
    # regression core, the priority families that have zero driver rows
    # ever, and the r3 fix-proof queries.
    core = {
        "wordcount_e2e", "scan_count", "tokenize_wordcount", "project_lit",
        "partition_expr", "sort_asc", "sort_desc", "agg_count",
        # round-1 regression proof
        "tpch_q12",
    }
    priority = {
        # maintenance / CDC
        "snapshot_diff", "merge_upsert", "scd2_history",
        # graph
        "pagerank_events", "triangle_count", "reachability_bfs",
        # streaming joins + bounded-state dedup (VERDICT r3 #5)
        "streaming_stream_join", "streaming_static_join", "streaming_topk",
        "streaming_dedup_watermarked",
        # Spark-4 surface
        "variant_shred", "python_datasource_scan", "collated_distinct",
        "xml_ingest",
        # r3 fix proofs
        "lsh_quality_eval", "url_canonicalize", "heavy_hitters",
        "sliding_distinct_users", "compaction_bins",
        # explicitly deferred from r3
        "anomaly_zscore",
    }
    must = core | priority
    assert must <= window, f"missing from driver window: {must - window}"
    # every non-core slot comes from the never-checked pool — no slot is
    # wasted re-checking an already-green query
    rotation = window - core
    assert len(rotation) == 41
    import json

    checked = set()
    for rnd in ("r01", "r02", "r03"):
        checked |= set(json.load(open(REPO / f"CORRECTNESS_{rnd}.json")))
    assert not (rotation & checked), rotation & checked


def test_window_mostly_oracle_backed():
    oracles = registry.all_oracles()
    rows_only = [n for n in registry.DRIVER_WINDOW if n not in oracles]
    # round 4: every window slot is oracle-backed (the pool's three
    # rows-only queries — bpe_merges, hll_user_reach, pca_project —
    # rotate in round 5)
    assert rows_only == [], f"unexpected rows-only in window: {rows_only}"


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


def test_round5_pool_is_exactly_the_never_checked_set():
    """The documented rotation pool must equal the recomputed set of
    queries with no driver CORRECTNESS row in any prior round and no
    current window slot — so the pool cannot silently rot as queries
    are added."""
    import json

    checked = set()
    for rnd in ("r01", "r02", "r03"):
        checked |= set(json.load(open(REPO / f"CORRECTNESS_{rnd}.json")))
    never = set(registry.all_queries()) - checked - set(registry.DRIVER_WINDOW)
    assert set(registry.ROUND5_ROTATION_POOL) == never


def test_bench_core_is_pinned():
    """bench.py's printed line carries ONLY the 30-query cross-round
    core — the driver's ~2 KB tail capture depends on the line staying
    small, and cross-round comparability depends on the set staying
    FIXED. Never reorder or grow this list; new queries join HEADLINE
    below index 30."""
    import bench

    assert bench.BENCH_CORE == bench.HEADLINE[:30]
    assert bench.BENCH_CORE[:5] == [
        "wordcount_e2e", "agg_count", "tpch_q1", "join_equi", "join_multiway",
    ]
    assert len(bench.BENCH_CORE) == 30
    # every core query must still be declared
    assert set(bench.BENCH_CORE) <= set(registry.all_queries())
    # the compact line must stay well under the driver's tail capture
    import json

    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 999.999,
            "unit": "sec",
            "queries": {n: 99.999 for n in bench.BENCH_CORE},
            "core_total": 999.999,
            "n_queries": len(bench.HEADLINE),
            "full_map": "bench_full.json",
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1500
