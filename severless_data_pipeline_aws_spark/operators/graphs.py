"""Iterative graph traversal as repeated DataFrame joins.

The second iterative algorithm family after label-propagation
connected components (`dedup.py::dedup_connected_components`): BFS
shortest hop distance, the Pregel pattern expressed as a bounded loop
of shuffle joins. Each round is frontier ⋈ edges → anti-join visited —
one shuffle per hop, with the frontier persisted so lineage doesn't
re-expand. At 100 TB the same loop runs unchanged on a cluster: the
edge list is hash-partitioned on src once and every round reuses that
partitioning; the visited set stays bucketed by node.

Reference parity: the reference has no graph operators — this extends
the engine for supply-chain-reach / contamination-radius questions a
training-data pipeline asks of its document-source graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register

_MAX_HOPS = 3


@register(
    "graph_bfs_part_supplier_hops",
    oracle=f"""
        WITH RECURSIVE
        pairs AS (
            SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS a,
                            's:' || CAST(l_suppkey AS VARCHAR) AS b
            FROM lineitem
        ),
        sym AS (
            SELECT a AS src, b AS dst FROM pairs
            UNION ALL
            SELECT b AS src, a AS dst FROM pairs
        ),
        walk(node, hop) AS (
            SELECT 'p:' || CAST((SELECT MIN(l_partkey) FROM lineitem)
                                AS VARCHAR), 0
            UNION
            SELECT sym.dst, walk.hop + 1
            FROM walk JOIN sym ON sym.src = walk.node
            WHERE walk.hop < {_MAX_HOPS}
        )
        SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
        FROM walk GROUP BY node
    """,
    doc=(
        "BFS hop distance (<=3) from the lowest part key over the "
        "bipartite part-supplier co-occurrence graph of lineitem. "
        "Spark side is the Pregel shape — per round: frontier ⋈ "
        "symmetric edge list, distinct, anti-join against the visited "
        "set, union — so min-distance holds by construction (a node "
        "is claimed the first round it appears and excluded after). "
        "Frontier and visited are persisted each round to cut lineage "
        "re-execution. The oracle is the same traversal as a DuckDB "
        "recursive CTE whose UNION dedups (node, hop) pairs, keeping "
        "the recursion polynomial instead of path-enumerating."
    ),
    tags=("graph", "join", "iterative"),
)
def graph_bfs_part_supplier_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem
    # the seed is a query parameter (one scalar), not a data-path collect
    seed_key = li.agg(F.min("l_partkey")).first()[0]

    pairs = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("a"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("b"),
    ).distinct()
    # materialize the edge index ONCE — every BFS round joins against the
    # same cached, pre-shuffled edge list instead of re-running the
    # distinct over the fact table per round (lineage re-execution is the
    # classic iterative-algorithm trap; on a cluster this is the
    # hash-partitioned edge RDD every Pregel round reuses)
    sym = (
        pairs.selectExpr("a AS src", "b AS dst")
        .union(pairs.selectExpr("b AS src", "a AS dst"))
        .repartition("src")  # cache carries the join-key partitioning:
        .persist()           # no round re-shuffles the edge side
    )

    visited = spark.createDataFrame(
        [(f"p:{seed_key}", 0)], "node string, hop bigint"
    )
    frontier = visited
    persisted = []
    for hop in range(1, _MAX_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop).cast("bigint"))
        )
        nxt = nxt.persist()
        persisted.append(nxt)
        visited = visited.union(nxt)
        frontier = nxt
    return visited
