"""SQL-API surface: queries expressed as ``spark.sql`` over temp views
instead of the DataFrame builder.

The engine's contract is "DataFrame OR SQL" (SURVEY §2 preamble /
README): everything else in the repo exercises the DataFrame side;
these two TPC-H-shaped queries prove the SQL side end-to-end — view
registration, ANSI join/agg/limit SQL, and Catalyst planning identical
to the DataFrame plans (broadcast small dims, partial+final agg,
TakeOrderedAndProject for the LIMIT).

One string per query serves BOTH engines verbatim: the Spark query IS
the oracle, so the check also proves the SQL dialect stays in the
portable ANSI subset (DECIMAL-routed float sums included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pro_etl_spark.io import load
from pro_etl_spark.registry import register

_VIEW_TABLES = (
    "customer", "orders", "lineitem", "supplier", "nation", "region", "part"
)


def _views(spark: SparkSession, d: str) -> None:
    """(Re)register the star schema as temp views for this sf_dir."""
    for t in _VIEW_TABLES:
        load(spark, d, t).createOrReplaceTempView(t)


#: TPC-H Q3 shape (shipping priority): revenue per urgent order for one
#: market segment, top 10. Same text runs on Spark and DuckDB.
SQL_SHIPPING_PRIORITY = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

#: TPC-H Q5 shape (local supplier volume): revenue by nation where the
#: supplier and customer share a nation, one region, a date window.
SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""


@register("sql_shipping_priority", oracle=SQL_SHIPPING_PRIORITY)
def sql_shipping_priority(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q3 shape via the SQL API (spark.sql over temp views); the
    deterministic LIMIT rides the revenue-then-key tiebreak and
    compiles to TakeOrderedAndProject, not a global sort."""
    _views(spark, d)
    return spark.sql(SQL_SHIPPING_PRIORITY)


@register("sql_local_supplier_volume", oracle=SQL_LOCAL_SUPPLIER_VOLUME)
def sql_local_supplier_volume(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q5 shape via the SQL API: five joins (three broadcast-able
    dims), DECIMAL-routed revenue, one shuffle agg on the nation key."""
    _views(spark, d)
    return spark.sql(SQL_LOCAL_SUPPLIER_VOLUME)


#: TPC-H Q17 shape (small-quantity-order revenue): a CORRELATED scalar
#: subquery — each lineitem compared against its own part's average
#: quantity. The average is spelled SUM(DECIMAL)/COUNT so both engines
#: compute the identical double (a bare AVG(double) is summation-order-
#: dependent and would be partition-count-sensitive in Spark).
SQL_SMALL_QTY_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 5
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("sql_small_qty_revenue", oracle=SQL_SMALL_QTY_REVENUE)
def sql_small_qty_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery. Catalyst
    decorrelates it into an aggregate-then-join (one per-part average
    table joined back to the facts) — the rewrite you'd hand-write at
    100 TB, obtained from the declarative form for free. The SQL string
    runs verbatim on DuckDB too, proving the decorrelated plan computes
    exactly the correlated semantics."""
    _views(spark, d)
    return spark.sql(SQL_SMALL_QTY_REVENUE)
