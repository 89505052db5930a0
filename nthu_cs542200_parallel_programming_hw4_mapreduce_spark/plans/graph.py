"""Graph analytics over an interaction graph derived from ``events``.

The engine's iterative-algorithm family (cf. ``kmeans_lloyd``,
``dedup_clusters``' connected components) extended to the two classic
distributed graph kernels: PageRank and triangle counting.

The fixture has no explicit edge table, so one is DERIVED
deterministically from events — src = user_id, dst = (event_id * 7919)
mod (max_user + 1) — with identical arithmetic in the DuckDB oracle, so
both engines build the same graph (the ``snapshot_diff`` v2-derivation
trick). The reference (hw4.cc) has no graph surface; its shuffle
(hw4.cc:200-263) is the ancestor of the per-iteration contribution
exchange here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_PR_ITERS = 3
_PR_DAMP = 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic directed edge list (src, dst), self-loops dropped,
    distinct. event_id is cast to long BEFORE the multiply — at corpus
    scale event_id * 7919 overflows int32."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    mx = ev.agg(F.max("user_id").alias("m"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .select(
            F.col("user_id").alias("src"),
            (F.col("event_id").cast("long") * 7919 % (F.col("m") + 1)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


_EDGES_SQL = """
    ev AS (SELECT user_id, event_id FROM events),
    mx AS (SELECT MAX(user_id) AS m FROM ev),
    edges AS (
      SELECT DISTINCT user_id AS src,
             (CAST(event_id AS BIGINT) * 7919) % (m + 1) AS dst
      FROM ev, mx
      WHERE user_id <> (CAST(event_id AS BIGINT) * 7919) % (m + 1)
    )
"""


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank in ANSI SQL."""
    sql = f"""
    WITH {_EDGES_SQL},
    nodes AS (SELECT DISTINCT src AS v FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT v, 1.0 / n AS r FROM nodes CROSS JOIN nn)
    """
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
    c{i} AS (SELECT e.dst AS v, SUM(p.r / deg.d) AS c
             FROM edges e JOIN {prev} p ON e.src = p.v
             JOIN deg ON e.src = deg.src GROUP BY e.dst),
    r{i} AS (SELECT nodes.v, {1 - _PR_DAMP} / n + {_PR_DAMP} * COALESCE(c{i}.c, 0) AS r
             FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.v = c{i}.v)
        """
        prev = f"r{i}"
    return sql + f"""
    SELECT v AS user_id, round(r, 6) AS rank FROM {prev} ORDER BY user_id
    """


@query("pagerank_events", oracle=_pagerank_oracle())
def pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 fixed iterations) over the derived follow
    graph. Dangling-node mass is dropped, the common simplified form —
    ranks are comparable, not a strict probability distribution.

    Scale shape, the classic distributed PageRank discipline:

    * out-degrees are joined into the edge list ONCE, outside the loop —
      per-iteration work is exactly one (edges ⋈ ranks) join on src plus
      one partial-aggregating groupBy(dst); both shuffles key on node id,
      so a production run co-partitions edges by src and reuses that
      partitioning every round (here AQE handles it).
    * ranks/deg are node-sized, edges edge-sized: the join broadcasts
      the rank side while nodes fit (billions of edges, millions of
      nodes) and degrades to shuffled-hash beyond.
    * each iteration ends in ``localCheckpoint`` (the ``dedup_clusters``
      rule): without it round k's plan embeds rounds 1..k-1 and Catalyst
      re-analysis dominates past ~5 rounds.
    * rank arithmetic is spelled ``(1-d)/N + d * Σ`` in BOTH engines and
      rounded to 6 dp — sum order across partitions is free, the
      1e-16-scale reassociation drift is far below the rounding grain.
    """
    edges = _edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded: one long per distinct node, counted not collected
    if n == 0:  # degenerate: no edges (empty event log) → empty ranking
        return spark.createDataFrame([], "user_id long, rank double")
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # degree rides the edge list once; iterations never recompute it
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)

    ranks = nodes.select("v", (F.lit(1.0) / n).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.v)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("d")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes.v == contrib.dst, "left")
            .select(
                "v",
                (
                    F.lit(1 - _PR_DAMP) / n
                    + F.lit(_PR_DAMP) * F.coalesce("c", F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("v").alias("user_id"), F.round("r", 6).alias("rank")
    )


@query(
    "triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
    )
    SELECT COUNT(*) AS triangles
    FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3
      ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count over the undirected derived graph, with the
    DEGREE-ORDERED edge orientation production triangle counters use.

    Every undirected edge is oriented from its lower-(degree, id)
    endpoint, giving an acyclic orientation in which each triangle has
    exactly one vertex with two out-edges — so triangles = wedges
    (u→v, u→w) whose closing edge (v→w) exists. The orientation is the
    whole scale story: max out-degree under it is O(√m), which caps the
    wedge join at O(m^1.5) total volume, versus Σdeg² (quadratic in hub
    degree) for the naive id-ordered form — measured 81 s → expected
    ~O(m^1.5)-bound at the 100× probe (10M events), where the id-ordered
    wedge join blew up on hash-hub fan-in. All four joins (two rank
    attachments, the wedge join on u, the closing probe on (v, w)) are
    node-/edge-keyed equi-joins: co-partitionable, sort-merge-able,
    skew-handled by AQE.

    The oracle keeps the simple a<b<c three-way self-join — any correct
    formulation yields the same count, and DuckDB only runs it at
    oracle SF.
    """
    edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # several consumers — compute the scan once
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("dg"))
    )
    # total orientation rank: degree-major, id-minor (ids < 2^32 here;
    # a production run would use a dense rank instead of bit-packing)
    rank = deg.select("v", (F.col("dg") * F.lit(1 << 32) + F.col("v")).alias("rk"))
    ranked = (
        und.join(rank.withColumnsRenamed({"v": "a", "rk": "ra"}), "a")
        .join(rank.withColumnsRenamed({"v": "b", "rk": "rb"}), "b")
    )
    o = ranked.select(
        F.when(F.col("ra") < F.col("rb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ra") < F.col("rb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.greatest("ra", "rb").alias("rv"),
    ).localCheckpoint(eager=True)
    e1 = o.select("u", F.col("v").alias("v1"), F.col("rv").alias("rv1"))
    e2 = o.select("u", F.col("v").alias("v2"), F.col("rv").alias("rv2"))
    wedges = e1.join(e2, "u").filter(F.col("rv1") < F.col("rv2"))
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    return (
        wedges.join(closing, ["v1", "v2"], "left_semi")
        .agg(F.count("*").alias("triangles"))
    )


_REACH_SEED = 0
_REACH_MAX_HOPS = 3


@query(
    "reachability_bfs",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL.strip().rstrip(')')}
    ),
    walk(v, hop) AS (
      SELECT dst, 1 FROM edges WHERE src = {_REACH_SEED}
      UNION ALL
      SELECT e.dst, w.hop + 1 FROM walk w JOIN edges e ON e.src = w.v
      WHERE w.hop < {_REACH_MAX_HOPS}
    )
    SELECT v AS user_id, MIN(hop) AS hops
    FROM walk GROUP BY v ORDER BY user_id
    """,
)
def reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth reachability from a seed node (min-hop BFS to 3
    hops) — via Spark 4's native ``WITH RECURSIVE``, exercising the SQL
    surface DuckDB shares, over the same derived edge graph as
    ``pagerank_events``.

    Spark plans the recursion as an iterative union-loop of equi-joins
    (each level joins the frontier to the edge list on src — the same
    per-round shape as the hand-rolled PageRank loop, but entirely
    inside the SQL engine). The hop bound caps path enumeration; the
    closing GROUP BY collapses the path multiset to min-hops. For
    unbounded-depth closures at 100 TB the hand-rolled loop with
    per-round ``localCheckpoint`` and frontier dedup
    (``dedup_clusters``' connected components) remains the production
    path — path-multiset recursion grows multiplicatively with hop
    count; this operator documents the bounded-depth SQL form.
    """
    # localCheckpoint (round-13): the recursion's union-loop re-executes
    # the anchor AND each iteration against the view — without pinning,
    # the scan → crossJoin(max) → distinct edge derivation runs once per
    # hop level (3× here). Checkpointing materializes it once; the
    # recursive join then probes stored blocks (same rows, same oracle).
    _edges(spark, sf_dir).localCheckpoint(eager=True).createOrReplaceTempView(
        "edges_view"
    )
    return spark.sql(
        f"""
        WITH RECURSIVE walk(v, hop) AS (
          SELECT dst, 1 FROM edges_view WHERE src = {_REACH_SEED}
          UNION ALL
          SELECT e.dst, w.hop + 1 FROM walk w JOIN edges_view e ON e.src = w.v
          WHERE w.hop < {_REACH_MAX_HOPS}
        )
        SELECT v AS user_id, MIN(hop) AS hops
        FROM walk GROUP BY v ORDER BY user_id
        """
    )


_BASKET_CAP = 32
_COPURCHASE_TOPK = 20


@query(
    "copurchase_pairs",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), sz AS (
      SELECT o FROM b GROUP BY o HAVING COUNT(*) <= {_BASKET_CAP}
    ), bb AS (
      SELECT b.o, b.p FROM b JOIN sz USING (o)
    )
    SELECT x.p AS part_a, y.p AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM bb x JOIN bb y ON x.o = y.o AND x.p < y.p
    GROUP BY x.p, y.p
    ORDER BY support DESC, part_a, part_b LIMIT {_COPURCHASE_TOPK}
    """,
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the top co-purchased part pairs by
    order co-occurrence support — the frequent-itemset kernel behind
    "bought together" recommendations and, in a training-data pipeline,
    co-occurrence edge extraction for entity graphs.

    The classic scale trap here is the basket whale: pair expansion is
    C(n,2) per basket, so ONE degenerate million-item basket emits
    5·10^11 pairs. The plan collapses each order to its DISTINCT part
    SET — duplicate line items must not inflate support — and drops
    baskets over {_BASKET_CAP} distinct parts BEFORE any pair is
    formed (the LSH ``_MAX_BUCKET`` degenerate-bucket discipline
    applied to baskets; the cap is mirrored verbatim in the oracle,
    so exclusion is a checked contract).

    Pair generation is JOIN-FREE and the dedup is BASKET-LOCAL
    (round 11 — VERDICT r10 #3, two iterations): the original
    membership⋈membership self-join sorted the corpus-sized side
    TWICE, and the first rewrite still ran a GLOBAL (order, part)
    DISTINCT whose 600M-row hash-agg stage is exactly what kept
    OOM-ing the 1000× probe's shared 8 g JVM (0.25 GB per task slot —
    SCALING.md "1000× round 10/11"). Both are gone: ONE groupBy on the
    order key collects each basket's distinct sorted part array
    (``collect_set`` dedupes INSIDE the basket — a global pair-keyed
    exchange proves nothing the per-order set doesn't), the
    ≤{_BASKET_CAP} gate applies to the collected size, and the C(n,2)
    expansion is the shared ``expand_pairs`` generator (chained
    streaming explodes + a < b filter — the dedup module's measured
    rule: the higher-order transform form is interpreted outside
    codegen and materializes the whole pair array per row, so the one
    pair expander lives in one place). Whale posture: buffers hold
    part IDS only
    (8 bytes/member — the accepted id-collection posture shared with
    ``lsh_candidate_pairs``; a 10⁶-part whale basket costs 8 MB
    before the gate drops it, and the gate still precedes the
    QUADRATIC expansion, which is the real hazard), and the object-agg
    falls back to sort-based spilling per group. An a-priori
    frequent-item prefilter was considered and rejected: pair support
    ≤ min item frequency, so pruning items below the 20th pair's
    support is answer-preserving, but on any corpus whose item
    frequencies sit well above pair supports (this fixture: freqs
    ~30-50, 20th support 2-3) it prunes nothing and costs an extra
    corpus aggregate. Pairs partial-agg into (part, part) support
    counts, then a TakeOrdered top-{_COPURCHASE_TOPK} with a full
    deterministic tiebreak (support DESC, part_a, part_b), never a
    global sort."""
    from .dedup import expand_pairs

    li = table(spark, sf_dir, "lineitem")
    # repartition BEFORE the groupBy: a map-side partial collect_set is
    # pure cost here — order keys are spread across scan splits, so the
    # combine reduces almost nothing while every scan task builds a
    # ~|orders-per-split|-key object-agg map (the component that hit
    # UNABLE_TO_ACQUIRE_MEMORY at the 1000× probe's 600M-row scale).
    # With an explicit o-exchange first, the scan stage carries ZERO
    # aggregation state (it only writes narrow (o, p) shuffle rows) and
    # the collect happens once, post-shuffle, on o-clustered data — the
    # classic skip-partial-agg-when-reduction≈1 call, made explicitly
    # because Catalyst has no cardinality evidence to make it itself.
    baskets = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .repartition(F.col("o"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
        .filter(F.size("ps") <= _BASKET_CAP)
    )
    pairs = expand_pairs(baskets, "ps").select(
        F.col("a_id").alias("part_a"), F.col("b_id").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(_COPURCHASE_TOPK)
    )
