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
    "customer", "orders", "lineitem", "supplier", "nation", "region", "part",
    "events",
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


#: TPC-H Q10 shape (returned-item reporting): which customers returned
#: the most revenue in a quarter — 3 fact/dim joins, grouped agg,
#: deterministic top-20.
SQL_RETURNED_ITEMS = """
SELECT c_custkey, c_name, n_name AS nation,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue,
       MAX(c_acctbal) AS acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("sql_returned_items", oracle=SQL_RETURNED_ITEMS)
def sql_returned_items(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q10 shape via the SQL API: lineitem filters on the return
    flag before the join (pushed to the scan), nation broadcasts, and
    the LIMIT compiles to TakeOrderedAndProject — no global sort of the
    grouped result."""
    _views(spark, d)
    return spark.sql(SQL_RETURNED_ITEMS)


#: TPC-H Q18 shape (large-volume customers): HAVING over a fact-side
#: pre-aggregate, then joined up to the order/customer dims.
SQL_LARGE_VOLUME_CUSTOMERS = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("sql_large_volume_customers", oracle=SQL_LARGE_VOLUME_CUSTOMERS)
def sql_large_volume_customers(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING aggregate runs on the fact table
    FIRST (partial+final on l_orderkey), shrinking it to the rare
    large-volume orders before any dimension join — the
    aggregate-before-join ordering that matters at 100 TB, obtained
    declaratively."""
    _views(spark, d)
    return spark.sql(SQL_LARGE_VOLUME_CUSTOMERS)


#: TPC-H Q14 shape (promo revenue share): conditional aggregation over
#: one joined scan — a single pass computes both numerator and
#: denominator.
SQL_PROMO_REVENUE = """
SELECT ROUND(
         100.0
         * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(27,6))
                         ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE),
       6) AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("sql_promo_revenue", oracle=SQL_PROMO_REVENUE)
def sql_promo_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of revenue as conditional
    aggregation — numerator and denominator in ONE scan/join pass
    (never two queries diffed), date filter pushed to the lineitem
    scan, part side broadcast-able."""
    _views(spark, d)
    return spark.sql(SQL_PROMO_REVENUE)


#: TPC-H Q19 shape (disjunctive bracketed predicates): three OR'd
#: brand/size/quantity brackets that must still prune at the scans.
SQL_BRACKETED_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


@register("sql_bracketed_revenue", oracle=SQL_BRACKETED_REVENUE)
def sql_bracketed_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive predicates spanning both join
    sides. Catalyst factors the per-side conjuncts out of the OR
    (l_quantity bounds to the lineitem scan, brand/size bounds to the
    part scan) so both scans prune before the join — the rewrite that
    keeps an OR-of-ANDs from forcing full scans."""
    _views(spark, d)
    return spark.sql(SQL_BRACKETED_REVENUE)


#: TPC-H Q4 shape (order-priority checking): EXISTS correlated
#: semi-join against the fact table.
SQL_PRIORITY_CHECK = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


@register("sql_priority_check", oracle=SQL_PRIORITY_CHECK)
def sql_priority_check(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS planned as a LEFT SEMI join
    (each order tested once, no fan-out duplication from multi-line
    orders), then a small grouped count."""
    _views(spark, d)
    return spark.sql(SQL_PRIORITY_CHECK)


#: TPC-H Q22 shape (lapsed rich customers): scalar subquery threshold
#: + NOT EXISTS anti-join (against RECENT orders — every customer in
#: the testdata has some order, so "no orders since 1999" is the
#: populated analogue of Q22's "no orders at all").
SQL_INACTIVE_RICH = """
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                               AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


@register("sql_inactive_rich", oracle=SQL_INACTIVE_RICH)
def sql_inactive_rich(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q22 shape: an uncorrelated scalar subquery (computed once,
    broadcast as a literal) gates the scan, then NOT EXISTS plans as a
    LEFT ANTI join — never a NOT IN null-trap rewrite. The average is
    spelled SUM(DECIMAL)/COUNT so both engines compute the identical
    double."""
    _views(spark, d)
    return spark.sql(SQL_INACTIVE_RICH)


#: LATERAL correlated subquery with ORDER BY + LIMIT: top-1 order per
#: customer. Catalyst decorrelates the per-row subquery into one
#: hash-join + per-key ranking plan — never an N-queries loop.
SQL_LATERAL_TOP1 = """
SELECT c_custkey, l.o_orderkey, l.o_totalprice
FROM customer, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
) l
"""


@register("sql_lateral_top1", oracle=SQL_LATERAL_TOP1)
def sql_lateral_top1(spark: SparkSession, d: str) -> DataFrame:
    """LATERAL subquery surface: each customer's single biggest order,
    written as a correlated per-row query with its own ORDER BY/LIMIT.
    Deterministic tiebreak (totalprice DESC, then key) makes the
    decorrelated plan value-exact against DuckDB's LATERAL execution
    of the identical string."""
    _views(spark, d)
    return spark.sql(SQL_LATERAL_TOP1)


#: Recursive CTE: a month spine generated by recursion (the SQL-native
#: date dimension), left-joined to order counts so empty months surface
#: as zero — the time-series densification pattern.
SQL_RECURSIVE_MONTHS = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT m AS month, count(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
"""


@register("sql_recursive_months", oracle=SQL_RECURSIVE_MONTHS)
def sql_recursive_months(spark: SparkSession, d: str) -> DataFrame:
    """Recursive CTE surface (Spark 4 WITH RECURSIVE): generate the
    month spine by recursion and left-join order counts onto it, so
    months with no orders appear as zeros. The recursion is bounded
    (80 rows) and driver-light; the DataFrame twin is
    ``window_gap_fill``'s sequence() spine — same densification, two
    dialects. One string runs on both engines verbatim."""
    _views(spark, d)
    return spark.sql(SQL_RECURSIVE_MONTHS)


#: ANSI aggregate FILTER clause: per-measure predicates inside ONE
#: grouped aggregate — the standard spelling of conditional aggregation
#: (the CASE WHEN rewrite is what Catalyst compiles it to).
SQL_FILTER_CLAUSE = """
SELECT o_orderstatus AS status,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_large,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
         AS urgent_revenue
FROM orders
GROUP BY o_orderstatus
"""


@register("sql_filter_clause", oracle=SQL_FILTER_CLAUSE)
def sql_filter_clause(spark: SparkSession, d: str) -> DataFrame:
    """ANSI FILTER-clause aggregation: several differently-predicated
    measures computed in one pass over one grouped aggregate — no
    self-joins of filtered subqueries, no repeated scans. One string
    runs verbatim on both engines (NULL-emitting empty groups
    included: SUM FILTER over an empty set is NULL, not 0, in both)."""
    _views(spark, d)
    return spark.sql(SQL_FILTER_CLAUSE)


#: ANSI ordered-set aggregates: WITHIN GROUP percentile syntax, both
#: the discrete (an actual data value) and continuous (interpolated)
#: forms, one string on both engines.
SQL_PERCENTILE_WITHIN_GROUP = """
SELECT l_returnflag,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
         AS p50_disc,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 6)
         AS p50_cont,
       PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY l_extendedprice)
         AS p95_disc
FROM lineitem GROUP BY l_returnflag
"""


@register("sql_percentile_within_group", oracle=SQL_PERCENTILE_WITHIN_GROUP)
def sql_percentile_within_group(spark: SparkSession, d: str) -> DataFrame:
    """ANSI ordered-set aggregate surface: PERCENTILE_DISC (returns an
    actual data value — what latency SLO reporting needs) next to
    PERCENTILE_CONT (interpolated) via WITHIN GROUP syntax. Exact
    per-group sort; the approx_percentile sketch family is the
    documented swap for heavy-hitter groups at 100 TB."""
    _views(spark, d)
    return spark.sql(SQL_PERCENTILE_WITHIN_GROUP)


#: TPC-H Q8-adjacent market-share: ANSI WINDOW FUNCTIONS OVER GROUPED
#: AGGREGATES — SUM(SUM(..)) OVER and RANK() OVER evaluated after the
#: GROUP BY, the SQL surface the DataFrame window family doesn't
#: exercise. One string, both engines; revenue sums DECIMAL-routed so
#: the share division and the rank ordering see identical values.
SQL_MARKET_SHARE = """
SELECT r_name AS region, n_name AS nation,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue,
       ROUND(
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
              AS DOUBLE)
         / CAST(SUM(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(27,6))))
                  OVER (PARTITION BY r_name) AS DOUBLE),
         6) AS region_share,
       CAST(RANK() OVER (PARTITION BY r_name
                         ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount)
                                           AS DECIMAL(27,6))) DESC)
            AS BIGINT) AS region_rank
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("sql_market_share", oracle=SQL_MARKET_SHARE)
def sql_market_share(spark: SparkSession, d: str) -> DataFrame:
    """Nation revenue share + rank within its region: window functions
    OVER grouped aggregates in pure ANSI SQL. Catalyst plans the five
    joins with broadcast dims, the aggregate partial+final, and ONE
    extra exchange on r_name for both windows (they share the
    partition spec); the fact table is scanned and shuffled once."""
    _views(spark, d)
    return spark.sql(SQL_MARKET_SHARE)


#: TPC-H Q15 shape (top supplier): quarter revenue per supplier, then
#: the supplier(s) achieving the MAX — the "aggregate of an aggregate"
#: pattern (scalar subquery over a CTE both engines share). The
#: revenue stays DECIMAL through the MAX-equality comparison (exact —
#: a double round-trip could false-miss the max) and is cast to DOUBLE
#: only in the final projection.
SQL_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN (
  SELECT supplier_no, total_revenue,
         MAX(total_revenue) OVER () AS max_rev
  FROM revenue
) r ON s_suppkey = supplier_no
WHERE total_revenue = max_rev
ORDER BY s_suppkey
"""


@register("sql_top_supplier", oracle=SQL_TOP_SUPPLIER)
def sql_top_supplier(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier), written with the window-MAX
    rewrite instead of the textbook scalar subquery: Catalyst inlines
    CTEs, so ``WHERE total_revenue = (SELECT MAX(...) FROM revenue)``
    would scan and re-aggregate lineitem TWICE — at 100 TB a second
    full fact pass for one scalar. ``MAX(total_revenue) OVER ()`` on
    the already-aggregated rollup computes the same scalar with one
    single-partition pass over the supplier-count-sized table, keeping
    the plan at ONE date-pruned fact scan + one suppkey shuffle. The
    revenue stays DECIMAL through the MAX-equality comparison (exact —
    a double round-trip could false-miss the max) and is cast to
    DOUBLE only in the final projection."""
    _views(spark, d)
    return spark.sql(SQL_TOP_SUPPLIER)


#: TPC-H Q21 shape (waiting orders), adapted to this dataset's columns:
#: count, per supplier, the finished multi-supplier orders where THIS
#: supplier's line came back returned ('R') and no co-supplier's did —
#: the classic EXISTS + NOT-EXISTS double correlation on the same fact
#: table.
SQL_WAITING_ORDERS = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("sql_waiting_orders", oracle=SQL_WAITING_ORDERS)
def sql_waiting_orders(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest decorrelation pattern in the suite
    — two correlated subqueries against the SAME fact table with
    opposite polarities. Catalyst plans EXISTS as LEFT SEMI and NOT
    EXISTS as LEFT ANTI, both keyed on l_orderkey, so all three
    lineitem passes co-partition on the order key (one shuffle
    partitioning reused; at 100 TB, bucketed-by-orderkey layout makes
    them co-located scans). The status filter prunes orders before its
    join; the final top-20 is TakeOrderedAndProject."""
    _views(spark, d)
    return spark.sql(SQL_WAITING_ORDERS)


#: TPC-H Q13 shape (customer distribution): orders-per-customer
#: histogram INCLUDING zero-order customers — the left-outer-join +
#: double-aggregation pattern (count per key, then count of counts).
SQL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("sql_customer_distribution", oracle=SQL_CUSTOMER_DISTRIBUTION)
def sql_customer_distribution(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q13 shape: the join predicate lives in the ON clause (an
    OUTER-join filter — moving it to WHERE would silently drop the
    zero-order customers the query exists to count), COUNT(o_orderkey)
    counts only matched rows by null-skipping, and the second aggregate
    runs over the customer-sized intermediate, not the fact table. Two
    key shuffles total (custkey join+count, then count-of-counts over
    ~50 distinct values); at 100 TB the first is the only real
    exchange, and it co-locates when both tables bucket by custkey."""
    _views(spark, d)
    return spark.sql(SQL_CUSTOMER_DISTRIBUTION)


#: TPC-H Q7 shape (volume shipping): bilateral trade volume between
#: two nations by ship year. The OR-of-ANDs nation pair predicate is
#: factored into per-side IN lists (same discipline as
#: sql_bracketed_revenue) so both dimension scans prune BEFORE the
#: joins instead of evaluating the OR post-join only.
SQL_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("sql_volume_shipping", oracle=SQL_VOLUME_SHIPPING)
def sql_volume_shipping(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q7 shape: five joins where every dimension (supplier,
    customer, both nation copies) broadcasts and the fact table is the
    only shuffled relation; the redundant per-side IN predicates let
    each nation scan prune to 1 row at planning time, which then
    runtime-prunes the supplier/customer sides through the broadcast
    hash joins. Ship-year extraction is integer calendar math in
    codegen; revenue rides DECIMAL per the house rule."""
    _views(spark, d)
    return spark.sql(SQL_VOLUME_SHIPPING)


#: TPC-H Q1 shape (pricing summary report): the canonical wide
#: aggregate — 8 measures over a date-pruned scan. Every float measure
#: rides DECIMAL partials; the extended charge expression keeps ≤ 6
#: decimal digits, so the double product is within a quarter-ulp of
#: the true decimal and the DECIMAL(33,9) cast recovers it exactly on
#: both engines. The two wide sums render through VARCHAR before the
#: final DOUBLE cast (r12): their int128-backed decimals pass 2^53 at
#: sf0.1 and DuckDB's direct decimal->double cast is 1 ulp off there,
#: while exact-digits -> strtod is correctly rounded in BOTH engines
#: (Spark's string and direct paths agree, so its values are
#: unchanged).
SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(27,6))) AS STRING) AS DOUBLE)
         AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          AS DECIMAL(33,9))) AS STRING) AS DOUBLE)
         AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_pricing_summary", oracle=SQL_PRICING_SUMMARY)
def sql_pricing_summary(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical scan-dominated wide aggregate
    (the query every columnar engine benchmarks first): one date-pruned
    lineitem pass, eight measures map-side combined around a single
    4-group shuffle. Averages are spelled SUM(DECIMAL)/COUNT rather
    than AVG() so the value is independent of partition count (Spark's
    AVG over doubles is summation-order-dependent)."""
    _views(spark, d)
    return spark.sql(SQL_PRICING_SUMMARY)


#: TPC-H Q6 shape (forecast revenue): pure filter+aggregate — the
#: predicate-pushdown showcase (every predicate reaches the scan; no
#: join, no shuffle beyond the single-row final agg).
SQL_REVENUE_FORECAST = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("sql_revenue_forecast", oracle=SQL_REVENUE_FORECAST)
def sql_revenue_forecast(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q6 shape: all four predicates push to the parquet scan
    (date range, discount band, quantity cap — the plan shows them in
    PushedFilters), so at 100 TB the scan reads a fraction of one
    column-pruned table and the only exchange is the single-row final
    aggregate."""
    _views(spark, d)
    return spark.sql(SQL_REVENUE_FORECAST)


#: The dataset ships no ``partsupp`` table, so the remaining TPC-H
#: shapes that need one (Q2/Q9/Q11/Q16/Q20) derive a part-supplier
#: relationship from lineitem history: supply cost is the cheapest
#: unit price a supplier ever charged for the part. One CTE text shared
#: by Q2 and Q9 keeps both engines' derivations identical; at 100 TB
#: the CTE is one map-side-combinable groupBy on (part, supp) — the
#: same shuffle the real partsupp scan would replace.
_PARTSUPP_CTE = """
WITH partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
)
"""

#: TPC-H Q2 shape (minimum-cost supplier): a correlated scalar subquery
#: whose MIN re-traverses a 4-way join — the classic decorrelation
#: stress test. Double division is IEEE-identical in both engines, and
#: MIN selects (never recombines) a value, so the equality predicate is
#: bit-exact without DECIMAL routing.
SQL_MIN_COST_SUPPLIER = _PARTSUPP_CTE + """
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 5 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 20
"""


#: Spark-side twin of SQL_MIN_COST_SUPPLIER with the part filter
#: pushed below the partsupp rollup (r12, same argument as
#: SQL_PRODUCT_PROFIT_SPARK): both the outer query and the
#: decorrelated per-part MIN consume partsupp ONLY at partkeys
#: passing the p_size/p_type filter (~1.7% of parts), and the
#: prefiltered rollup keeps every (partkey, suppkey) row of those
#: partkeys, so all consumed ps_supplycost values are identical. The
#: rollup's shuffle of raw lineitem drops ~60×.
SQL_MIN_COST_SUPPLIER_SPARK = """
WITH fp AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_size <= 5 AND p_type = 'LARGE'
),
fli AS (
  SELECT l_partkey, l_suppkey, l_extendedprice, l_quantity
  FROM lineitem JOIN fp ON p_partkey = l_partkey
),
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM fli WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name
FROM fp
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 20
"""


@register("sql_min_cost_supplier", oracle=SQL_MIN_COST_SUPPLIER)
def sql_min_cost_supplier(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q2 shape over the lineitem-derived partsupp. Catalyst
    decorrelates the per-part MIN into an aggregate joined back on
    p_partkey; at 100 TB both sides of that join are the (part, supp)
    rollup, never raw lineitem, and every dimension is broadcast.
    r12: the rollup itself is derived from lineitem prefiltered to
    the ~1.7% of partkeys the query can consume
    (SQL_MIN_COST_SUPPLIER_SPARK), instead of aggregating the whole
    fact table first."""
    _views(spark, d)
    return spark.sql(SQL_MIN_COST_SUPPLIER_SPARK)


#: TPC-H Q9 shape (product-type profit by nation and year): profit =
#: revenue minus derived supply cost, grouped by the SUPPLIER's nation
#: and the order year.
#:
#: Cross-engine determinism (round-7 red row, CORRECTNESS_r07): the
#: old ``CAST(double AS DECIMAL(27,6))`` diverged on ONE sf0.01 row
#: whose per-row profit term renders as the half-way tie 3518.9405625
#: — Spark's double->DECIMAL cast goes through the shortest decimal
#: repr and rounds HALF_UP, DuckDB rounds the binary value half-even,
#: so one (nation, year) group differed by 1e-6. The fix avoids
#: double->fractional-DECIMAL casts entirely: the per-row term is an
#: IEEE double (bit-identical in both engines since every input column
#: and operation order is identical), scaled to micro-dollars and
#: truncated with FLOOR — floor of identical doubles is identical, no
#: rounding mode involved — then summed exactly in DECIMAL(27,0)
#: (order-independent integer arithmetic). Per-row magnitude ~1e11
#: micro-dollars is exact in double (< 2^53) and the group sum is
#: exact decimal at any scale factor.
SQL_PRODUCT_PROFIT = _PARTSUPP_CTE + """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                            - ps_supplycost * l_quantity) * 1000000.0)
                     AS DECIMAL(27,0)))
            AS DOUBLE) / 1000000.0 AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""


#: Spark-side twin of SQL_PRODUCT_PROFIT with the red-parts filter
#: PUSHED BELOW the partsupp rollup: p_name is a function of
#: p_partkey (unique key), so restricting lineitem to red partkeys
#: BEFORE the (partkey, suppkey) MIN changes no surviving
#: ps_supplycost value — MIN over the rows of a key is untouched by
#: dropping other keys — and the fact side consumed the rollup only
#: at red partkeys anyway. The rollup's corpus-sized shuffle drops by
#: the filter's selectivity (~13% of parts are red at every SF); the
#: join tree and every arithmetic expression are verbatim from the
#: oracle text, so the per-row IEEE profit terms are bit-identical.
SQL_PRODUCT_PROFIT_SPARK = """
WITH red_li AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
         l_extendedprice, l_discount
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
),
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM red_li WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
)
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                            - ps_supplycost * l_quantity) * 1000000.0)
                     AS DECIMAL(27,0)))
            AS DOUBLE) / 1000000.0 AS profit
FROM red_li
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""


@register("sql_product_profit", oracle=SQL_PRODUCT_PROFIT)
def sql_product_profit(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q9 shape: the p_name filter prunes lineitem through the
    part join before the wide 5-way join fans out AND before the
    partsupp rollup (see SQL_PRODUCT_PROFIT_SPARK — r12: the rollup
    previously aggregated ALL of lineitem to derive supply costs the
    query then discarded for ~87% of parts). Group keys (nation,
    year) are low-cardinality — partial aggregation collapses the map
    side to ~nations×years rows per task before the one final
    shuffle."""
    _views(spark, d)
    return spark.sql(SQL_PRODUCT_PROFIT_SPARK)


#: TPC-H Q11 shape (important stock): per-part value from one nation's
#: suppliers, kept only when above a fraction of the TOTAL value — an
#: uncorrelated scalar subquery over the SAME CTE the outer query
#: scans. Both the per-part and the total sums are DECIMAL-routed so
#: the threshold comparison is exact in both engines.
SQL_IMPORTANT_STOCK = """
WITH supp_value AS (
  SELECT l_partkey AS partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
           AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT partkey, part_value
FROM supp_value
WHERE part_value > (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(27,6))) AS DOUBLE) * 0.001
  FROM supp_value
)
ORDER BY part_value DESC, partkey
"""


@register("sql_important_stock", oracle=SQL_IMPORTANT_STOCK)
def sql_important_stock(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q11 shape: the CTE is computed once and read twice (outer
    scan + single-row total); the threshold arrives as a broadcast
    single-row subquery result, so the filter is map-side. The nation
    filter reaches the supplier dim scan and the join is broadcast —
    lineitem is the only large input and it shuffles exactly once."""
    _views(spark, d)
    return spark.sql(SQL_IMPORTANT_STOCK)


#: TPC-H Q12 shape (shipmode / order-priority): the dataset has no
#: l_shipmode or commit/receipt dates, so the mode key is l_returnflag
#: and "late" is shipped >30 days after the order date — preserving the
#: shape's point: conditional counts split by priority class inside one
#: grouped scan, with interval arithmetic in the join-filter.
SQL_SHIPMODE_PRIORITY = """
SELECT l_returnflag AS ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL '30' DAY
  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY ship_mode
"""


@register("sql_shipmode_priority", oracle=SQL_SHIPMODE_PRIORITY)
def sql_shipmode_priority(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q12 shape: one fact-fact join on the order key, late-ship
    interval predicate evaluated row-side (no UDF), and the two
    conditional counts fold into a single grouped aggregate — outer
    CASTs keep DuckDB's HUGEINT sums int64 through the pandas path."""
    _views(spark, d)
    return spark.sql(SQL_SHIPMODE_PRIORITY)


#: TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
#: counts per (brand, type, size) bucket, excluding one brand, one
#: type, and a NOT IN "complaints" supplier list (negative-balance
#: proxy — the dataset has no s_comment).
SQL_PARTS_SUPPLIER = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


@register("sql_parts_supplier", oracle=SQL_PARTS_SUPPLIER)
def sql_parts_supplier(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q16 shape: the NOT IN subquery plans as a broadcast
    null-aware anti-join (the complaint list is tiny); part predicates
    prune before the fact join; COUNT(DISTINCT) expands then collapses
    on the (brand, type, size, suppkey) grain — two shuffles total."""
    _views(spark, d)
    return spark.sql(SQL_PARTS_SUPPLIER)


#: TPC-H Q20 shape (potential part promotion): nested IN subqueries —
#: suppliers who, in one shipping year, moved more than a share of a
#: promoted part's lifetime volume. The original compares ps_availqty
#: to half the year's shipments; with no inventory column the threshold
#: is a share of the part's total shipped quantity, preserving the
#: correlated-threshold structure (per-group HAVING vs a joined total).
SQL_PROMOTION_SUPPLIERS = """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
), part_total AS (
  SELECT l_partkey AS pt_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS total_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN red_parts ON p_partkey = l_partkey
    JOIN part_total ON pt_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           > 0.04 * MIN(total_qty)
  )
ORDER BY s_name
"""


@register("sql_promotion_suppliers", oracle=SQL_PROMOTION_SUPPLIERS)
def sql_promotion_suppliers(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q20 shape: the inner grouped-HAVING subquery reduces
    lineitem to qualifying supplier keys before the IN semi-join probes
    the (tiny) supplier dim; part_total joins on the part key at the
    same grain as the group-by, so the threshold never re-scans
    lineitem per group. red_parts broadcasts into the fact scan."""
    _views(spark, d)
    return spark.sql(SQL_PROMOTION_SUPPLIERS)


#: GROUP BY ALL / ORDER BY ALL (modern ANSI-adjacent shorthand both
#: engines ship): every non-aggregate select item becomes a grouping
#: key and the whole select list becomes the sort key — the exact text
#: runs verbatim on Spark and DuckDB, proving the shorthand stays in
#: the shared dialect. Measures are DECIMAL-routed as everywhere else.
SQL_GROUP_ORDER_ALL = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_group_order_all", oracle=SQL_GROUP_ORDER_ALL)
def sql_group_order_all(spark: SparkSession, d: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL: the resolver expands both from the
    select list, so the plan is the ordinary partial+final hash agg
    plus one global sort — identical to spelling the keys out. The
    ORDER BY ALL covers every output column, so the result order (and
    the value hash) is fully deterministic on both engines."""
    _views(spark, d)
    return spark.sql(SQL_GROUP_ORDER_ALL)


#: top orders by price WITH TIES: ANSI `FETCH FIRST n ROWS WITH TIES`
#: keeps every row tying with the last in-quota sort key, so the
#: result is a deterministic SET even when the cutoff lands mid-tie
#: (a bare LIMIT would pick an arbitrary tie member). Neither engine
#: parses the ANSI clause (checked: DuckDB 1.x rejects it too), so
#: both sides use the standard-equivalent RANK() filter — rank()
#: assigns equal ranks to tied keys and skips ahead, which is
#: precisely WITH TIES; DuckDB spells the filter as QUALIFY.
_WITH_TIES_N = 15

SQL_WITH_TIES_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) / 1000, 0) AS BIGINT)
         AS price_k
FROM orders
QUALIFY RANK() OVER (ORDER BY price_k DESC) <= {_WITH_TIES_N}
"""

SQL_WITH_TIES_SPARK = f"""
SELECT o_orderkey, o_custkey, price_k
FROM (
  SELECT o_orderkey, o_custkey,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) / 1000, 0) AS BIGINT)
           AS price_k,
         RANK() OVER (ORDER BY
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) / 1000, 0) AS BIGINT)
           DESC) AS rk
  FROM orders
)
WHERE rk <= {_WITH_TIES_N}
"""


@register("sql_with_ties", oracle=SQL_WITH_TIES_ORACLE)
def sql_with_ties(spark: SparkSession, d: str) -> DataFrame:
    """WITH TIES semantics: the sort key is coarsened to price-in-
    thousands so genuine ties exist and the cutoff lands inside a tie
    group. Both engines express it as a RANK() filter (same result set
    as the ANSI clause by construction); at scale the window is a
    single global sort — same cost class as the ANSI clause, and the
    scan still prunes to the projected three columns."""
    _views(spark, d)
    return spark.sql(SQL_WITH_TIES_SPARK)


#: ANSI GROUPING SETS with GROUPING() disambiguation: per-(region,
#: nation) customer rollup plus region subtotals plus the grand total
#: in ONE pass, gid = 2·GROUPING(region) + GROUPING(nation) telling a
#: report's renderer which stratum each row is (the bit NULLs alone
#: cannot carry once real NULL keys exist). Same text on both engines.
SQL_GROUPING_SETS = """
SELECT r_name AS region, n_name AS nation,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
"""


@register("sql_grouping_sets", oracle=SQL_GROUPING_SETS)
def sql_grouping_sets(spark: SparkSession, d: str) -> DataFrame:
    """ANSI GROUPING SETS + GROUPING() — the explicit-strata
    generalization of ``agg_rollup`` (which covers the ROLLUP
    shorthand): three chosen aggregation levels in one grouped pass,
    with the GROUPING() bits packed into a grouping id so downstream
    consumers can route detail vs subtotal vs grand-total rows
    without sniffing NULLs. Spark expands the sets via a single
    Expand + hash aggregate — one shuffle regardless of how many
    strata are requested, the whole point of the construct at scale
    vs UNION ALL of three separate aggregations (three scans, three
    shuffles). Sums ride DECIMAL for order-independent exactness."""
    _views(spark, d)
    return spark.sql(SQL_GROUPING_SETS)


#: TPC-H Q8 proper (national market share): the nation dim joined
#: TWICE under different roles (supplier's nation n1 for the share
#: split, customer's nation n2 → region for the market filter) — the
#: same-dim-two-roles pattern sql_market_share's single-role rollup
#: doesn't exercise. Share = conditional revenue / total revenue per
#: order year; both sums DECIMAL-routed so the division sees identical
#: values in both engines.
SQL_NATIONAL_MARKET_SHARE = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_2'
                     THEN volume ELSE CAST(0 AS DECIMAL(27,6)) END)
            AS DOUBLE) AS nation_volume,
       CAST(SUM(volume) AS DOUBLE) AS total_volume,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2'
                           THEN volume ELSE CAST(0 AS DECIMAL(27,6)) END)
                  AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS volume,
         n1.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@register("sql_national_market_share", oracle=SQL_NATIONAL_MARKET_SHARE)
def sql_national_market_share(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q8 proper (national market share): what fraction of
    ASIA's STANDARD-part order volume was supplied from NATION_2,
    per order year. The distinctive surface is the nation dimension
    participating TWICE in one query under different join roles
    (supplier nationality vs customer market) — Catalyst aliases the
    scan, broadcasts both roles plus part/supplier/customer/region,
    and the fact table is scanned and shuffled once for the grouped
    aggregate. The share is a conditional-sum / sum division, both
    DECIMAL until the final cast (reference surface: the reconciliation
    ratio of /root/reference/migrate.py:298-306 generalized to a
    market-share report)."""
    _views(spark, d)
    return spark.sql(SQL_NATIONAL_MARKET_SHARE)


#: ANSI-adjacent PIVOT clause (Spark SQL surface; DataFrame pivot is
#: covered by pivot_event_counts): wide per-cohort counts in ONE
#: grouped pass. The oracle is the portable CASE-sum rewrite —
#: identical cells, engine-neutral.
SQL_PIVOT_SYNTAX = """
SELECT event_type,
       COALESCE(c0, 0) AS cohort_0, COALESCE(c1, 0) AS cohort_1,
       COALESCE(c2, 0) AS cohort_2, COALESCE(c3, 0) AS cohort_3
FROM (SELECT event_type, user_id % 4 AS cohort FROM events)
PIVOT (COUNT(*) FOR cohort IN (0 c0, 1 c1, 2 c2, 3 c3))
"""


@register(
    "sql_pivot_syntax",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN user_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_0,
           CAST(SUM(CASE WHEN user_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_1,
           CAST(SUM(CASE WHEN user_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_2,
           CAST(SUM(CASE WHEN user_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_3
    FROM events GROUP BY event_type
    """,
)
def sql_pivot_syntax(spark: SparkSession, d: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (the query-language surface;
    ``pivot_event_counts`` covers the DataFrame API twin): per-type
    event counts spread wide across four user cohorts. Catalyst
    compiles PIVOT to ONE hash aggregate whose values are pivot-filtered
    partials — one shuffle however many pivot columns, vs N scans of
    the UNION-per-column rewrite; absent cells surface as NULL and are
    COALESCEd to 0 to match the CASE-sum oracle exactly.

    Scale: identical to any grouped count — map-side combine then one
    exchange on event_type."""
    _views(spark, d)
    return spark.sql(SQL_PIVOT_SYNTAX)


#: SQL UNPIVOT clause (Spark 3.4+ query-language surface; the
#: DataFrame melt is unpivot_measures): wide order measures → long
#: (metric, value) rows + per-metric rollup in one statement. The
#: oracle is the portable UNION ALL desugaring.
SQL_UNPIVOT_SYNTAX = """
SELECT o_orderstatus AS status, metric,
       CAST(SUM(CAST(val AS DECIMAL(27,6))) AS DOUBLE) AS total
FROM (
  SELECT o_orderstatus, metric, val
  FROM orders
  UNPIVOT (val FOR metric IN (o_totalprice AS price,
                              o_custkey AS custkey_sum))
)
GROUP BY o_orderstatus, metric
"""


@register(
    "sql_unpivot_syntax",
    oracle="""
    SELECT o_orderstatus AS status, metric,
           CAST(SUM(CAST(val AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM (
      SELECT o_orderstatus, 'price' AS metric,
             CAST(o_totalprice AS DOUBLE) AS val FROM orders
      UNION ALL
      SELECT o_orderstatus, 'custkey_sum',
             CAST(o_custkey AS DOUBLE) FROM orders
    )
    GROUP BY o_orderstatus, metric
    """,
)
def sql_unpivot_syntax(spark: SparkSession, d: str) -> DataFrame:
    """The SQL ``UNPIVOT`` clause — the query-language twin of
    ``unpivot_measures``' DataFrame melt, paired against the UNION ALL
    desugaring it replaces. Spark expands UNPIVOT in-task (narrow
    Expand, one scan) where the UNION ALL rewrite scans the table once
    PER MEASURE — at 100 TB that difference is the whole point of
    having the clause. Values are widened to DOUBLE before the melt
    (UNPIVOT requires a common type) and sums ride DECIMAL."""
    _views(spark, d)
    return spark.sql(SQL_UNPIVOT_SYNTAX)


#: VALUES inline table: the literal dimension everyone embeds in
#: reports (priority -> SLA days) joined against a real table — same
#: text both engines.
SQL_VALUES_INLINE = """
SELECT sla.sla_days,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
         AS total_price
FROM orders
JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 5),
             ('4-NOT SPECIFIED', 7), ('5-LOW', 10))
     AS sla(priority, sla_days)
  ON o_orderpriority = sla.priority
GROUP BY sla.sla_days
"""


@register("sql_values_inline_table", oracle=SQL_VALUES_INLINE)
def sql_values_inline_table(spark: SparkSession, d: str) -> DataFrame:
    """ANSI ``VALUES`` inline table — the literal lookup dimension
    (priority → SLA days) embedded directly in the statement and
    joined against a fact table: how reports attach small reference
    data without shipping a physical dim table. Catalyst folds the
    VALUES into a LocalRelation and broadcasts it — zero scan cost,
    one fact-side aggregate; the same five-row literal would be a
    config-table parquet in a lesser pipeline. Identical text runs on
    both engines."""
    _views(spark, d)
    return spark.sql(SQL_VALUES_INLINE)


#: NATURAL JOIN / USING surface: the column-name-driven join forms —
#: USING merges the key into ONE output column (no a.key/b.key
#: ambiguity), NATURAL joins on every shared name (here exactly one,
#: by construction of the renamed subqueries). Same text both engines.
SQL_JOIN_USING = """
WITH o AS (SELECT o_custkey AS custkey, o_totalprice FROM orders),
c AS (SELECT c_custkey AS custkey, c_mktsegment FROM customer)
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
         AS total_price
FROM o JOIN c USING (custkey)
GROUP BY c_mktsegment
"""


@register("sql_join_using", oracle=SQL_JOIN_USING)
def sql_join_using(spark: SparkSession, d: str) -> DataFrame:
    """The ANSI ``USING`` join clause — the name-driven equi-join form
    that merges the join key into a single unqualified output column
    (the a.key-vs-b.key ambiguity every ON-form join drags around
    simply doesn't exist). The CTE renames pin the shared-name set to
    exactly the intended key, which is also why bare NATURAL JOIN is
    left undemonstrated-by-policy: it joins on EVERY shared name, so a
    later added column silently changes join semantics — USING states
    the key, NATURAL infers it. Catalyst plans it identically to the
    ON form (broadcast dim + grouped aggregate, one shuffle)."""
    _views(spark, d)
    return spark.sql(SQL_JOIN_USING)


#: OFFSET pagination — kept SMALL and documented as the anti-pattern
#: it becomes at depth: page k costs O(k·page) work in every engine.
SQL_PAGINATION_OFFSET = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate, o_orderkey
LIMIT 20 OFFSET 40
"""


@register("sql_pagination_offset", oracle=SQL_PAGINATION_OFFSET)
def sql_pagination_offset(spark: SparkSession, d: str) -> DataFrame:
    """ANSI LIMIT/OFFSET pagination (page 3 of 20 under a
    deterministic total order) — registered TOGETHER with its
    production replacement ``scan_pagination_keyset`` because the two
    differ exactly where scale bites: OFFSET must compute and discard
    every earlier row (page 10⁶ costs 2·10⁷ rows of sort work, per
    page, in any engine), while keyset pagination seeks. Spark plans
    the pair as a global TakeOrderedAndProject of offset+limit rows —
    fine at page 3, the trap at page million."""
    _views(spark, d)
    return spark.sql(SQL_PAGINATION_OFFSET)


#: keyset (seek) pagination: the cursor IS the last key of the
#: previous page — a row-value comparison against a scalar subquery,
#: so the whole page is ONE lazy plan (no driver round-trip to fetch
#: the cursor). struct(...) ordering in Spark is lexicographic by
#: field position — exactly the (o_orderdate, o_orderkey) row-value
#: comparison the standard writes. Fewer than 60 rows: the scalar
#: subquery is NULL, struct > NULL is NULL, the filter drops every
#: row — the correct "past the last page" empty result.
SQL_PAGINATION_KEYSET = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
WHERE struct(o_orderdate, o_orderkey) > (
  SELECT struct(o_orderdate, o_orderkey) FROM orders
  ORDER BY o_orderdate, o_orderkey LIMIT 1 OFFSET 59
)
ORDER BY o_orderdate, o_orderkey
LIMIT 20
"""


@register(
    "scan_pagination_keyset",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 60
    """,
)
def scan_pagination_keyset(spark: SparkSession, d: str) -> DataFrame:
    """KEYSET (seek) pagination — the scale-correct cursor: resume
    AFTER the last (o_orderdate, o_orderkey) of the previous page with
    a row-value comparison, so the predicate pushes into the scan and
    page N costs the same as page 1 (OFFSET's discarded prefix never
    materializes — on a sorted/Z-ordered layout the comparison prunes
    whole files). The oracle states the equivalent OFFSET page,
    proving seek == skip exactly under the deterministic order; here
    the cursor row is derived in-query (a struct scalar subquery at
    OFFSET 59) so the operator stays self-contained AND the whole page
    is one lazy plan — no driver round-trip fetches the cursor at
    plan-construction time (the round-9 laziness contract
    tests/test_lazy_construction.py pins for every operator)."""
    _views(spark, d)
    return spark.sql(SQL_PAGINATION_KEYSET)


#: correlated scalar subquery in the SELECT list (projection-position
#: decorrelation — Q17 exercises the WHERE position): per order, the
#: line count and max line price fetched "per row" declaratively.
SQL_SCALAR_SUBQUERY_SELECT = """
SELECT o_orderkey, o_totalprice,
       CAST((SELECT COUNT(*) FROM lineitem
             WHERE l_orderkey = o_orderkey) AS BIGINT) AS n_lines,
       (SELECT MAX(l_extendedprice) FROM lineitem
        WHERE l_orderkey = o_orderkey) AS max_line_price
FROM orders
"""


@register("sql_scalar_subquery_select", oracle=SQL_SCALAR_SUBQUERY_SELECT)
def sql_scalar_subquery_select(spark: SparkSession, d: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT LIST — the
    projection-position twin of Q17's WHERE-position subquery, and the
    form ORM-generated reports emit constantly. Catalyst decorrelates
    BOTH subqueries into ONE aggregate-then-left-join (they share the
    correlation key), so the declarative per-row lookup compiles to a
    single pass over lineitem — versus the naive N+1 evaluation the
    syntax appears to describe; orders without lines get NULLs (left
    join), exactly the standard's semantics."""
    _views(spark, d)
    return spark.sql(SQL_SCALAR_SUBQUERY_SELECT)


@register(
    "sql_star_except",
    oracle="""
    SELECT * EXCLUDE (props, value)
    FROM events
    WHERE event_type = 'purchase' AND value >= 400
    """,
)
def sql_star_except(spark: SparkSession, d: str) -> DataFrame:
    """``SELECT * EXCEPT (...)`` — the modern wide-table projection
    surface (Spark 3.4+/BigQuery spelling; DuckDB spells it EXCLUDE):
    keep every column EXCEPT the named ones, so a 500-column feature
    table can drop its payload blobs without enumerating the 497
    survivors — and, unlike a hand-listed SELECT, the projection stays
    correct when new columns land upstream (schema-evolution-proof by
    construction). Catalyst resolves the EXCEPT at analysis time into
    a plain column-pruned projection: the excluded columns never leave
    the parquet scan's ReadSchema."""
    _views(spark, d)
    return spark.sql(
        """
        SELECT * EXCEPT (props, value)
        FROM events
        WHERE event_type = 'purchase' AND value >= 400
        """
    )


SQL_NAMED_WINDOW = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
            AS DOUBLE) AS prev_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
            AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("sql_named_window", oracle=SQL_NAMED_WINDOW)
def sql_named_window(spark: SparkSession, d: str) -> DataFrame:
    """The ANSI WINDOW clause — declare the partitioning/ordering ONCE
    and share it by name across ranking, offset, and framed-aggregate
    functions (here row_number, lag, and a running DECIMAL sum all
    ride `w`; the sum's default RANGE-to-current-row frame equals the
    row frame because the order key is unique per partition). Beyond
    the deduplication of intent, the shared name is a physical
    guarantee: all three functions provably land in ONE Window
    operator over ONE exchange+sort — with inline copies, a typo'd
    ORDER BY silently forks a second sort. Running sums accumulate in
    DECIMAL so partition order can't leak into the last ulp."""
    _views(spark, d)
    return spark.sql(SQL_NAMED_WINDOW)


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 50000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, d: str) -> DataFrame:
    """PARAMETERIZED SQL — named parameter markers bound via
    ``spark.sql(query, args={...})`` plus the ``IDENTIFIER()`` clause
    for the table name: the injection-safe surface every SQL-emitting
    service should use instead of f-string splicing (parameters are
    bound as typed literals by the analyzer — a quote in the value
    cannot change the query's shape, and IDENTIFIER() confines the
    dynamic name to identifier position). Catalyst folds the bound
    literals exactly like inline ones, so pushdown/pruning are
    unaffected — the oracle states the equivalent inlined query and
    the hash match proves it."""
    _views(spark, d)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM IDENTIFIER(:tbl)
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders", "status": "F", "min_price": 50000.0},
    )


#: RELATIONAL DIVISION ("customers who ordered EVERY priority") via the
#: scalable idiom — per-key distinct cardinality equals the universe
#: cardinality, with the universe as an uncorrelated scalar subquery in
#: HAVING. The textbook double-NOT-EXISTS spelling needs a two-level
#: outer reference Spark's correlated-subquery planner rejects; this
#: form is one grouped pass + a broadcast scalar, which is also the
#: shape you'd WANT at scale (the nested-exists plan is a per-customer
#: probe loop).
SQL_RELATIONAL_DIVISION = """
SELECT o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
FROM orders
GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) =
       (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
"""


@register("sql_relational_division", oracle=SQL_RELATIONAL_DIVISION)
def sql_relational_division(spark: SparkSession, d: str) -> DataFrame:
    """RELATIONAL DIVISION — the "for all" query (customers whose
    order history covers EVERY priority in the universe), the one
    relational-algebra operator SQL never got a keyword for. Planned
    as the cardinality idiom: per-customer COUNT(DISTINCT priority)
    compared against the universe count delivered by an uncorrelated
    scalar subquery in HAVING — one grouped pass over the fact table
    plus a broadcast scalar, instead of the textbook nested
    NOT-EXISTS-per-customer probe loop (which Spark's correlated
    planner rejects at two levels anyway, and which would be a
    per-key dependent join at scale). Same text runs on both
    engines."""
    _views(spark, d)
    return spark.sql(SQL_RELATIONAL_DIVISION)
