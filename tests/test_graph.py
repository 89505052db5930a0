"""Graph kernels on a planted 3-cycle (see plans/graph.py edge rule:
src = user_id, dst = (event_id * 7919) % (max_user + 1); with users
{0,1,2}, 7919 % 3 == 2, so dst = 2*event_id mod 3)."""

import datetime

import pytest

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.graph import (
    _edges,
    pagerank_events,
    triangle_count,
)


@pytest.fixture(scope="module")
def cycle_dir(spark, tmp_path_factory):
    t = datetime.datetime(2026, 1, 1)
    rows = [
        (2, t, 0, "click", 1.0, "{}"),  # 0 → (2*2)%3 = 1
        (1, t, 1, "click", 1.0, "{}"),  # 1 → (2*1)%3 = 2
        (3, t, 2, "click", 1.0, "{}"),  # 2 → (2*3)%3 = 0
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path_factory.mktemp("cycle"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_edge_derivation_builds_the_cycle(spark, cycle_dir):
    edges = {(r["src"], r["dst"]) for r in _edges(spark, cycle_dir).collect()}
    assert edges == {(0, 1), (1, 2), (2, 0)}


def test_pagerank_uniform_on_cycle(spark, cycle_dir):
    """A directed cycle is rank-invariant: every node keeps 1/3."""
    out = {r["user_id"]: r["rank"] for r in pagerank_events(spark, cycle_dir).collect()}
    assert out == {0: 0.333333, 1: 0.333333, 2: 0.333333}


def test_triangle_count_on_cycle(spark, cycle_dir):
    """The undirected 3-cycle is exactly one triangle."""
    assert triangle_count(spark, cycle_dir).first()["triangles"] == 1


def test_reachability_bfs_min_hops_on_cycle(spark, cycle_dir):
    """From seed 0 on the 3-cycle: 1 is 1 hop, 2 is 2, back to 0 in 3."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.graph import (
        reachability_bfs,
    )

    out = {r["user_id"]: r["hops"] for r in reachability_bfs(spark, cycle_dir).collect()}
    assert out == {0: 3, 1: 1, 2: 2}
