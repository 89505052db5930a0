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


def _checked(*rounds: str) -> set[str]:
    import json

    out: set[str] = set()
    for rnd in rounds:
        out |= set(json.load(open(REPO / f"CORRECTNESS_{rnd}.json")))
    return out


ALL_ROUNDS = ("r01", "r02", "r03", "r04", "r05")
ROUND6_NEW = {"quality_deciles_approx", "session_paths_topk_salted"}


def test_window_covers_rotation_targets():
    """Round-6 rotation (VERDICT r5 "Next round" #3): the never-checked
    backlog is empty after r5, so the 41 rotating slots hold the 2
    queries new in round 6 plus 39 re-proofs of the OLDEST green rows
    (queries whose only driver proof is CORRECTNESS_r01)."""
    window = set(registry.DRIVER_WINDOW)
    core = set(registry.CORE_WINDOW)
    assert core <= window
    rotation = window - core
    assert len(rotation) == 41
    # the two round-6 additions have never been driver-checked
    assert ROUND6_NEW <= rotation
    assert not (ROUND6_NEW & _checked(*ALL_ROUNDS))
    # every other slot re-proves an r1-era row: in r01, absent since
    reproof = rotation - ROUND6_NEW
    assert reproof <= _checked("r01")
    assert not (reproof & _checked("r02", "r03", "r04", "r05"))


def test_window_mostly_oracle_backed():
    oracles = registry.all_oracles()
    rows_only = [n for n in registry.DRIVER_WINDOW if n not in oracles]
    # round 6: every window slot is oracle-backed EXCEPT approx_agg,
    # an r1-era re-proof that is rows-only BY DESIGN (approximate
    # aggregates have no exact cross-engine oracle; see
    # tests/test_entry.py's pinned rows-only set)
    assert rows_only == ["approx_agg"], f"unexpected rows-only in window: {rows_only}"


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


def test_round5_rotation_cleared_the_backlog():
    """History pin (round 5): the round-5 window was exactly the 9-core
    + the 41 then-never-checked queries, and the driver checked all 50
    — so CORRECTNESS_r05 must equal core ∪ pool, and the pool must be
    disjoint from everything checked in r01–r04. Expressed against the
    recorded CORRECTNESS files, not the live window, so it stays true
    as later rounds rotate."""
    pool = set(registry.ROUND5_ROTATION_POOL)
    assert _checked("r05") == set(registry.CORE_WINDOW) | pool
    assert not (pool & _checked("r01", "r02", "r03", "r04"))


def test_round6_pool_composition():
    """The round-6 pool is pinned to its documented recipe: the
    never-checked-after-r5 set (exactly the two round-6 additions) plus
    39 r1-era re-proofs, with `limit_offset` the single documented
    leftover — so the pool cannot silently rot as queries are added."""
    pool = set(registry.ROUND6_ROTATION_POOL)
    never = set(registry.all_queries()) - _checked(*ALL_ROUNDS)
    assert never == ROUND6_NEW, f"never-checked set drifted: {never ^ ROUND6_NEW}"
    r1_era = _checked("r01") - _checked("r02", "r03", "r04", "r05") - set(registry.CORE_WINDOW)
    assert pool == ROUND6_NEW | (r1_era - {"limit_offset"})
    assert "limit_offset" in r1_era  # the one deferred re-proof


def test_round7_pool_is_registered_and_freshness_ordered():
    """The PRE-STAGED round-7 pool must contain only names that exist
    (the ADVICE-r5 anti-phantom pin) and follow its documented recipe:
    `limit_offset` (the r1-era leftover) + 40 of the 41 r2-era rows,
    with `chunk_overlap` the documented leftover. Recomputed from the
    recorded CORRECTNESS files so it cannot rot."""
    pool = set(registry.ROUND7_ROTATION_POOL)
    assert pool <= set(registry.all_queries()), pool - set(registry.all_queries())
    r2_era = _checked("r02") - _checked("r03", "r04", "r05") - set(registry.CORE_WINDOW)
    assert pool == {"limit_offset"} | (r2_era - {"chunk_overlap"})
    assert "chunk_overlap" in r2_era
    # pre-staged ≠ active: the live window is still the round-6 plan
    assert registry.DRIVER_WINDOW == registry.ROUND6_WINDOW_PLAN


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
