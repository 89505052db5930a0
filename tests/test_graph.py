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


def test_copurchase_counts_support_and_caps_whale_basket(spark, tmp_path_factory):
    """Planted baskets: parts (1,2) co-occur in two orders, (1,3) in
    one; a duplicate line item must not inflate support; a 33-part
    whale basket is excluded entirely by the _BASKET_CAP contract."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.graph import (
        copurchase_pairs,
    )

    rows = []

    def li(order, part, line):
        rows.append((order, part, 1, line, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     datetime.datetime(2026, 1, 1)))

    li(100, 1, 1); li(100, 2, 2); li(100, 2, 3)  # dup membership
    li(200, 1, 1); li(200, 2, 2); li(200, 3, 3)
    for i, p in enumerate(range(1000, 1033)):  # whale: 33 distinct parts
        li(300, p, i + 1)
    df = spark.createDataFrame(
        rows,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    d = str(tmp_path_factory.mktemp("baskets"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = {(r["part_a"], r["part_b"]): r["support"]
           for r in copurchase_pairs(spark, d).collect()}
    assert out == {(1, 2): 2, (1, 3): 1, (2, 3): 1}  # whale contributed 0
