"""Graph analytics over the near-dup similarity graph: PageRank.

Second iterative-algorithm family next to ``dedup_clusters``'
connected components (same Pregel-style shape: bounded driver loop,
one shuffle per round, no driver-side data). Nodes are the documents
that appear in any MinHash-LSH near-dup pair; edges are the pairs,
undirected. PageRank scores then rank each duplicate-cluster's
members by connectivity — a principled "which copy is canonical"
signal for dedup survivor selection, vs. the arbitrary min-id rule.

Cross-engine exactness for an iterative float algorithm:
- the per-node neighbor sum rides DECIMAL(38,30) (order-independent
  exact addition) and is cast back to double once per round — the
  same trick the aggregate family uses, applied per iteration;
- the oracle unrolls the identical rounds as chained CTEs (standard
  SQL forbids aggregation inside a recursive CTE member), so both
  engines run literally the same 5 damped-sum updates.

Scale: each round is one shuffle keyed by node id (edges × ranks
equi-join + groupBy). Round count is fixed and small; at 100 TB the
edge table is the persisted LSH output and each round is a co-located
join when both sides are bucketed by node.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pro_etl_spark.ops.dedup import _LSH_PAIRS_CTE, dedup_minhash_lsh
from pro_etl_spark.registry import register

DAMPING = 0.85
ROUNDS = 5
_DEC30 = "decimal(38,30)"


def _oracle_sql() -> str:
    """Unroll ROUNDS PageRank updates as chained CTEs on top of the
    LSH pair CTE (shared with the dedup family)."""
    sql = _LSH_PAIRS_CTE + f"""
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ), deg AS (
      SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ), nn AS (
      SELECT COUNT(*) AS n FROM nodes
    ), r0 AS (
      SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes
    )"""
    prev = "r0"
    for i in range(1, ROUNDS + 1):
        sql += f""", r{i} AS (
      SELECT n.node,
             (1 - {DAMPING}) / (SELECT n FROM nn)
             + {DAMPING} * CAST(SUM(CAST(p.r / deg.d AS DECIMAL(38,30)))
                                AS DOUBLE) AS r
      FROM nodes n
      JOIN edges e ON e.dst = n.node
      JOIN {prev} p ON p.node = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY n.node
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT node AS doc_id, ROUND(r, 6) AS pagerank FROM {prev}
    """
    return sql


@register("graph_pagerank", oracle=_oracle_sql())
def graph_pagerank(spark: SparkSession, d: str) -> DataFrame:
    """PageRank (damping 0.85, 5 rounds) over the undirected LSH
    near-dup graph. Every node of an undirected graph has out-degree
    ≥ 1, so there is no dangling-mass term; each round is
    contributions (rank/degree) shuffled to the neighbor and summed
    through DECIMAL for order independence."""
    pairs = dedup_minhash_lsh(spark, d).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    ew = edges.join(deg, "src")
    for _ in range(ROUNDS):
        contrib = ew.join(r, ew.src == r.node).select(
            F.col("dst"), (F.col("r") / F.col("d")).alias("c")
        )
        sums = contrib.groupBy("dst").agg(
            F.sum(F.col("c").cast(_DEC30)).cast("double").alias("s")
        )
        r = (
            nodes.join(sums, nodes.node == sums.dst)
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    (1 - DAMPING) / F.col("n") + DAMPING * F.col("s")
                ).alias("r"),
            )
        )
    return r.select(F.col("node").alias("doc_id"), F.round("r", 6).alias("pagerank"))
