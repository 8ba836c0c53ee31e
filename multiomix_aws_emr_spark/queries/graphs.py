"""Graph analytics as relational plans over the co-purchase graph.

The reference has no graph operators; a corpus-scale engine needs them
(dedup components already ship in operators/components.py — these queries
add the ANALYTICS tier: edge derivation, degree profiling, triangle
counting, PageRank). Everything is expressed as joins + aggregates so
Catalyst plans it like any other query — the edge list is derived
relationally, thresholded sparse, and small enough to broadcast in the
multi-way joins (at 100 TB the same plans become shuffle joins on the
(src, dst) keys; nothing here is driver-side).

Edge definition: two parts are connected when they co-occur in >= 2
orders (the >= 2 threshold keeps the graph sparse — one shared basket is
noise; the all-pairs-per-basket fanout is bounded by basket size, and
the threshold drops ~97% of candidate edges at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import load

_EDGE_CTE = """
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p1 < p2, n_orders) distinct-order co-purchase counts via the
    BASKET formulation: collect_set per order (dedups membership — a part
    on two lineitems of one order is one basket membership — in the same
    exchange), then two narrow explodes generate ordered pairs, then one
    hash aggregate counts co-occurring orders. One exchange on the order
    key + one on the pair key; the previous dedup + self-equi-join shape
    spent a third full-width exchange re-shuffling the fact rows between
    its dedup and join keys (measured 1.2s -> 0.95s at sf0.1). Per-order
    fanout is quadratic in basket size but baskets are small and bounded
    — the blocking-key pattern every pairwise op in this engine uses, and
    collect_set state is basket-bounded too.

    Since r15 the edge list is built at most once per session and
    persisted (plans/sketchcache.copurchase_edges): the three graph
    queries consume the SAME materialized edge table instead of
    re-running the basket build per query — and per broadcast hop of
    the triangle self-join."""
    from multiomix_aws_emr_spark.plans.sketchcache import copurchase_edges

    return copurchase_edges(spark, sf_dir)


@query(
    "graph_copurchase_pairs",
    oracle=(
        f"WITH {_EDGE_CTE} "
        "SELECT p1, p2, n_orders FROM edges "
        "ORDER BY n_orders DESC, p1, p2 LIMIT 10"
    ),
)
def graph_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the 10 strongest co-purchase edges.
    TakeOrderedAndProject on the aggregated pair counts — no global
    sort materializes."""
    return (
        _copurchase_edges(spark, sf_dir)
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(10)
    )


@query(
    "graph_degree_distribution",
    oracle=(
        f"WITH {_EDGE_CTE}, "
        "strong AS (SELECT p1, p2 FROM edges WHERE n_orders >= 2), "
        "deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM ("
        "  SELECT p1 AS node FROM strong UNION ALL SELECT p2 FROM strong"
        ") GROUP BY node) "
        "SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes "
        "FROM deg GROUP BY degree"
    ),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the thresholded graph: undirected degree =
    appearances on either side of the (p1 < p2) edge list — one unionAll
    + two hash aggregates."""
    from multiomix_aws_emr_spark.plans.sketchcache import (
        copurchase_strong_edges,
    )

    strong = copurchase_strong_edges(spark, sf_dir)
    nodes = strong.select(F.col("p1").alias("node")).unionAll(
        strong.select(F.col("p2").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


@query(
    "graph_triangle_count",
    oracle=(
        f"WITH {_EDGE_CTE}, "
        "strong AS (SELECT p1, p2 FROM edges WHERE n_orders >= 2) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
        "FROM strong e1 JOIN strong e2 ON e1.p2 = e2.p1 "
        "JOIN strong e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2"
    ),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the thresholded co-purchase graph: the
    canonical (p1 < p2 < p3) orientation makes each triangle appear
    exactly once in the 3-way edge self-join. The thresholded edge list
    is ~4k rows — Spark broadcasts it on both join hops; at real scale
    the same plan degrades gracefully to shuffle joins keyed on the join
    columns (the standard distributed triangle-count shape)."""
    from multiomix_aws_emr_spark.plans.sketchcache import (
        copurchase_strong_edges,
    )

    strong = copurchase_strong_edges(spark, sf_dir)
    e1, e2, e3 = strong.alias("e1"), strong.alias("e2"), strong.alias("e3")
    tri = e1.join(e2, F.col("e1.p2") == F.col("e2.p1")).join(
        e3,
        (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")),
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


# --------------------------------------------------------------------------
# PageRank (weighted, fixed iterations) on the nation trade graph
# --------------------------------------------------------------------------

_TRADE_CTE = """
trade AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
outw AS (SELECT src, SUM(w) AS tot FROM trade GROUP BY src),
norm AS (
  SELECT t.src, t.dst, t.w / o.tot AS p
  FROM trade t JOIN outw o ON t.src = o.src
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nation)
"""

_PR_ITER = """
pr{next} AS (
  SELECT nt.n_nationkey AS node,
         0.15 / (SELECT n FROM nn)
           + 0.85 * COALESCE(c.contrib, 0.0) AS pr
  FROM nation nt LEFT JOIN (
    SELECT e.dst, SUM(p.pr * e.p) AS contrib
    FROM norm e JOIN pr{cur} p ON p.node = e.src GROUP BY e.dst
  ) c ON c.dst = nt.n_nationkey
)
"""


def _pagerank_oracle(iters: int) -> str:
    ctes = [
        "pr0 AS (SELECT n_nationkey AS node, "
        "1.0 / (SELECT n FROM nn) AS pr FROM nation)"
    ]
    for i in range(iters):
        ctes.append(_PR_ITER.format(cur=i, next=i + 1))
    return (
        f"WITH {_TRADE_CTE}, " + ", ".join(ctes) + f" "
        f"SELECT node, ROUND(pr, 6) AS pagerank FROM pr{iters}"
    )


@query("graph_pagerank", oracle=_pagerank_oracle(3))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 fixed iterations) over the
    inter-nation trade graph: edge (supplier nation -> customer nation)
    weighted by shipped line items, transition probabilities normalized
    per source. The iterative pattern: the transition matrix is derived
    ONCE (4-way join + two aggregates), then each iteration is one
    join + aggregate against the previous rank vector — the same plan
    Catalyst would get from a production vertex-centric loop, with
    localCheckpoint-per-round the known scale lever (see
    operators/components.py). The oracle unrolls the identical three
    iterations as CTEs; fixed iteration count + per-source normalization
    make the result engine-exact (no convergence tolerance).

    Dangling-node mass (nations with no exports) is dropped rather than
    redistributed — deliberately, in both engines."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey")

    trade = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    outw = trade.groupBy("src").agg(F.sum("w").alias("tot"))
    norm = trade.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("tot")).alias("p")
    )
    # 25 nodes, <=625 edges: truncate the growing lineage exactly like
    # the components loop (cheap here, load-bearing at scale); honors
    # SPARK_GRAFT_RELIABLE_CHECKPOINT for preemptible fleets
    from multiomix_aws_emr_spark.operators.checkpointing import truncate_lineage

    norm = truncate_lineage(norm)

    n_nations = nation.count()  # bounded: one scalar
    pr = nation.select(
        F.col("n_nationkey").alias("node"),
        F.lit(1.0 / n_nations).alias("pr"),
    )
    # NOTE (r15 measured negative): hinting F.broadcast(pr) /
    # F.broadcast(contrib) to replace the iterations' tiny SortMergeJoins
    # was ~0.3 s SLOWER at sf0.1 (interleaved min 1.99 vs 1.70 s) — each
    # hint adds a sequential BroadcastExchange build while AQE already
    # coalesces the tiny SMJ exchanges to one partition. Kept SMJ.
    for _ in range(3):
        contrib = (
            norm.join(pr, norm.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("contrib"))
        )
        pr = nation.join(
            contrib, nation.n_nationkey == contrib.dst, "left"
        ).select(
            F.col("n_nationkey").alias("node"),
            (
                F.lit(0.15 / n_nations)
                + 0.85 * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))
