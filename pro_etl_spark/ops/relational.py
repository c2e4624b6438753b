"""Relational operators: projections/filters (SURVEY §2.2 P1–P6),
joins (§2.3 J1–J7), aggregations (§2.4 A1–A5), windows (§2.5 W1–W3),
sorts/top-k (§2.6 O1), set operations (§2.7 U1–U3).

Reference grounding: the reference's single join is an O(M·N)
nested-loop XPath point lookup (migrate.py:108-115); here every join is
a declarative equi/range/as-of join so Catalyst picks broadcast-hash /
sort-merge and AQE handles skew. Float-summing aggregates go through
DECIMAL so results are order-independent (bit-identical across Spark
partition orders and the DuckDB oracle).

Scale notes (100 TB posture):
- dimension side of every star join is broadcast (`F.broadcast`) —
  zero shuffle of the fact table for enrichment joins
- grouped aggregates rely on Spark's partial (map-side) aggregation;
  no `collect`-and-loop anywhere
- window functions partition by high-cardinality keys (custkey,
  user_id) so state per partition stays bounded
- top-k uses orderBy+limit which Catalyst plans as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  never a full sort)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.registry import register

DEC = "decimal(18,2)"
DEC6 = "decimal(27,6)"


def _dsum(c, alias):
    """Order-independent sum of a currency-like double: exact DECIMAL
    accumulation, surfaced as DOUBLE (bit-identical in any engine)."""
    return F.sum(F.col(c).cast(DEC)).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# P — projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "project_distinct",
    oracle="SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS cust_key FROM customer",
)
def project_distinct(spark: SparkSession, d: str) -> DataFrame:
    """P1: single-column project + cast + distinct (reference builds its
    join key set this way: ``set(csv['current_customer_id'].astype(str))``,
    migrate.py:82)."""
    return (
        load(spark, d, "customer")
        .select(F.col("c_custkey").cast("string").alias("cust_key"))
        .distinct()
    )


@register(
    "filter_eq",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def filter_eq(spark: SparkSession, d: str) -> DataFrame:
    """P2: equality predicate on a key column (migrate.py:115,122).
    Pushed to the parquet scan (PushedFilters in explain)."""
    return (
        load(spark, d, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "first_match_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, o_totalprice AS first_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def first_match_per_key(spark: SparkSession, d: str) -> DataFrame:
    """P3: deterministic first-match row per key. The reference's
    ``csv.loc[mask].iloc[0]`` (migrate.py:123) picks the first matching
    row; expressed as row_number()==1 with a total order (tiebreak on
    o_orderkey) so the pick is deterministic under any partitioning."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, d, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_totalprice").alias("first_totalprice"),
        )
    )


@register(
    "filter_null_check",
    oracle="""
    SELECT event_id, COALESCE(props, '{}') AS props_filled,
           CAST(props IS NULL AS VARCHAR) AS was_null
    FROM events WHERE value IS NOT NULL
    """,
)
def filter_null_check(spark: SparkSession, d: str) -> DataFrame:
    """P4: null predicates + coalesce default. Fixes the reference's
    dead ``v is None`` check (migrate.py:136-138, SURVEY §2.11.1) with
    real ``isNull``/``coalesce`` semantics."""
    return (
        load(spark, d, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            F.coalesce(F.col("props"), F.lit("{}")).alias("props_filled"),
            F.col("props").isNull().cast("string").alias("was_null"),
        )
    )


@register(
    "filter_rlike",
    oracle=r"""
    SELECT o_orderkey, o_orderpriority
    FROM orders WHERE regexp_matches(o_orderpriority, '^[1-2]-')
    """,
)
def filter_rlike(spark: SparkSession, d: str) -> DataFrame:
    """P5: regex domain validation (migrate.py:146-150 validates
    delivery_day against ``-[1-9]D``); here the same rlike machinery on
    the priority domain."""
    return (
        load(spark, d, "orders")
        .where(F.col("o_orderpriority").rlike(r"^[1-2]-"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "case_when_status",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' AND o_totalprice > 200000 THEN 'OK-large'
                WHEN o_orderstatus = 'F' THEN 'OK'
                WHEN o_orderstatus = 'P' THEN 'Pending'
                ELSE 'Not OK' END AS status
    FROM orders
    """,
)
def case_when_status(spark: SparkSession, d: str) -> DataFrame:
    """P6: chained conditional classification — the reference's
    OK / Not OK + reason derivation (migrate.py:259-266)."""
    o = load(spark, d, "orders")
    return o.select(
        "o_orderkey",
        F.when((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000), "OK-large")
        .when(F.col("o_orderstatus") == "F", "OK")
        .when(F.col("o_orderstatus") == "P", "Pending")
        .otherwise("Not OK")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# J — joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_inner",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast_inner(spark: SparkSession, d: str) -> DataFrame:
    """J1: key-lookup equi-join. The reference does M XPath point
    lookups (migrate.py:108-115, O(M·N)); here one broadcast hash join —
    the dim tables ship to every executor, the fact side never shuffles.
    """
    c = load(spark, d, "customer")
    n = F.broadcast(load(spark, d, "nation"))
    r = F.broadcast(load(spark, d, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_semi(spark: SparkSession, d: str) -> DataFrame:
    """J2: semi-join side — customers that matched (the reference's
    ``if customer is not None`` branch, migrate.py:116-118)."""
    c = load(spark, d, "customer")
    o = load(spark, d, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, d: str) -> DataFrame:
    """J3: anti-join side — unmatched rows, the reference's
    'Not found in source XML' log path (migrate.py:263-266)."""
    c = load(spark, d, "customer")
    o = load(spark, d, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "dedup_first_wins",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_first_wins(spark: SparkSession, d: str) -> DataFrame:
    """J4: the reference's implicit first-row-wins dedup on duplicate
    join keys (emergent from migrate.py:108,115,153) made explicit and
    deterministic: keep the earliest row per key under a total order.
    (dropDuplicates would be nondeterministic under parallelism.)"""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, d, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, agg.n_orders, agg.total_spend
    FROM customer c
    FULL OUTER JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey
    ) agg ON c.c_custkey = agg.o_custkey
    """,
)
def join_outer(spark: SparkSession, d: str) -> DataFrame:
    """J5: full outer equi-join (generalization of J1 per SURVEY §2.3);
    null-extended on both unmatched sides."""
    c = load(spark, d, "customer")
    agg = (
        load(spark, d, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice", "total_spend"))
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "n_orders", "total_spend"
    )


@register(
    "join_sortmerge",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_sortmerge(spark: SparkSession, d: str) -> DataFrame:
    """J5b: large-large equi-join planned as sort-merge (merge hint;
    at 100 TB both sides exceed broadcast thresholds, and
    orderkey-bucketed storage would make this shuffle-free)."""
    li = load(spark, d, "lineitem")
    o = load(spark, d, "orders").hint("merge")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"), F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "join_range",
    oracle="""
    WITH buckets AS (
      SELECT * FROM (VALUES ('small', 1, 15), ('medium', 16, 35), ('large', 36, 50))
        AS t(bucket, lo, hi)
    )
    SELECT b.bucket, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part p JOIN buckets b ON p.p_size BETWEEN b.lo AND b.hi
    GROUP BY b.bucket
    """,
)
def join_range(spark: SparkSession, d: str) -> DataFrame:
    """J6: theta/range join — non-equi BETWEEN predicate. The bucket
    side is a tiny literal dim, so Spark plans a broadcast nested-loop
    join: each fact partition scans 3 bucket rows, no shuffle."""
    p = load(spark, d, "part")
    buckets = F.broadcast(
        spark.createDataFrame(
            [("small", 1, 15), ("medium", 16, 35), ("large", 36, 50)],
            "bucket string, lo int, hi int",
        )
    )
    return (
        p.join(buckets, p.p_size.between(F.col("lo"), F.col("hi")))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_parts"), _dsum("p_retailprice", "total_price"))
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           (SELECT MAX(c.ts) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts)
             AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, d: str) -> DataFrame:
    """J7: as-of join — for each purchase, the nearest prior click by
    the same user. Implemented with the union+window pattern (SURVEY
    §2.3 J7): tag both streams, sort once per user, carry the last click
    timestamp forward with ``last(..., ignorenulls=True)``. One shuffle
    on user_id, linear state — scales where a naive range join would
    explode quadratically."""
    return _asof_carried(spark, d).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
    )


def _asof_carried(spark: SparkSession, d: str) -> DataFrame:
    """Union+window core of the as-of family: purchases with the
    nearest prior click ts carried forward (one shuffle on user_id)."""
    ev = load(spark, d, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("is_p")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_p")
    )
    # order clicks before purchases at identical ts (click at ts counts as
    # "<= ts" per the oracle's c.ts <= p.ts)
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("is_p") == 1)


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           (SELECT MAX(c.ts) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id
               AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 12 HOUR)
             AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, d: str) -> DataFrame:
    """J7b: as-of join with a staleness bound (pandas
    ``merge_asof(tolerance=...)`` semantics): a prior click only counts
    if it happened within 12 hours of the purchase. Same one-shuffle
    union+window core as ``join_asof`` — the bound is a post-filter on
    the carried value (exact interval arithmetic on microsecond
    timestamps, identical in both engines), so the tolerance costs
    nothing extra at any scale."""
    within = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 12 HOURS")
    return _asof_carried(spark, d).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(within, F.col("last_click_ts")).alias("last_click_ts"),
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           (SELECT MIN(c.ts) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts >= p.ts)
             AS next_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_forward(spark: SparkSession, d: str) -> DataFrame:
    """J7c: FORWARD as-of join (pandas ``merge_asof(direction=
    'forward')``): for each purchase, the nearest FOLLOWING click by
    the same user — the "next action after conversion" lookup. Same
    one-shuffle union+window design as ``join_asof``, mirrored: the
    frame looks from the current row to the partition end and
    ``first(..., ignorenulls=True)`` picks the earliest click at or
    after the purchase (clicks order AFTER purchases at identical ts
    so ts-equality counts, matching the oracle's c.ts >= p.ts)."""
    ev = load(spark, d, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("is_c"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_c")
    )
    u = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_c")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.withColumn(
        "next_click_ts",
        F.first(
            F.when(F.col("is_c") == 1, F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return carried.where(F.col("is_c") == 0).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "next_click_ts",
    )


# ---------------------------------------------------------------------------
# A — aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
    FROM orders
    """,
)
def agg_count_distinct(spark: SparkSession, d: str) -> DataFrame:
    """A1: distinct key count (the reference's ``len(set(keys))``,
    migrate.py:82-85). Exact distinct (two-phase hash); at 100 TB prefer
    approx_count_distinct (HLL, no shuffle of distinct values)."""
    return load(spark, d, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_count",
    oracle="""
    SELECT COUNT(*) AS n_matched FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def agg_count(spark: SparkSession, d: str) -> DataFrame:
    """A2: matched-row count — the reference's found/total
    reconciliation counter (migrate.py:100,118,272) as count-after-semi-join."""
    c = load(spark, d, "customer")
    o = load(spark, d, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count("*").alias("n_matched"))
    )


@register(
    "agg_groupby_count",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS reason, COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_groupby_count(spark: SparkSession, d: str) -> DataFrame:
    """A3: group-by rollup of the status log (migrate.py:259-266
    semantics: how many rows per status/reason)."""
    return (
        load(spark, d, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("reason"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_multi_measure",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
             AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
             AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_multi_measure(spark: SparkSession, d: str) -> DataFrame:
    """A4: multi-measure hash aggregation (TPC-H Q1 shape). Spark plans
    partial (map-side) + final aggregation automatically; DECIMAL
    accumulation makes the sums order-independent."""
    li = load(spark, d, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity", "sum_qty"),
        _dsum("l_extendedprice", "sum_base_price"),
        F.sum(disc).cast("double").alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*"), 6
        ).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, d: str) -> DataFrame:
    """A5: hierarchical rollup (region → nation → grand total).
    Catalyst expands to grouping sets in a single Expand+aggregate —
    one pass over the fact side."""
    c = load(spark, d, "customer")
    n = F.broadcast(load(spark, d, "nation"))
    r = F.broadcast(load(spark, d, "region"))
    joined = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
    )
    return joined.rollup("region", "nation").agg(
        F.count("*").alias("n_customers"), _dsum("c_acctbal", "total_balance")
    )


# ---------------------------------------------------------------------------
# W — window functions
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 10
    """,
)
def window_rank(spark: SparkSession, d: str) -> DataFrame:
    """W1: ranking trio over a partitioned, totally-ordered window
    (deterministic tiebreak on c_custkey) — top 10 per segment."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        load(spark, d, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 10)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, d: str) -> DataFrame:
    """W2: lag/lead analytics per user event stream (values pass
    through exactly — no float arithmetic)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, d, "events").select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, d: str) -> DataFrame:
    """W3: running total with an explicit ROWS frame. DECIMAL
    accumulation keeps every prefix exact (DuckDB's segment-tree window
    aggregation would otherwise produce float drift vs Spark)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, d, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# O — sorts / top-k
# ---------------------------------------------------------------------------


@register(
    "topk_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orderby_limit(spark: SparkSession, d: str) -> DataFrame:
    """O1: top-k (the reference's mtime-sort-take-5, migrate.py:39-42,
    generalized). Catalyst plans TakeOrderedAndProject: per-partition
    heaps of k rows merged on the driver — no global sort even at 100 TB."""
    return (
        load(spark, d, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# U — set operations
# ---------------------------------------------------------------------------


@register(
    "set_union",
    oracle="""
    SELECT c_custkey AS cust_key, 'auto' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey AS cust_key, 'high_bal' AS src FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union(spark: SparkSession, d: str) -> DataFrame:
    """U1: union-append accumulation (the reference appends output rows
    one by one, migrate.py:257,269-270; set-based it is one unionByName)."""
    c = load(spark, d, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("cust_key"), F.lit("auto").alias("src")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("cust_key"), F.lit("high_bal").alias("src")
    )
    return a.unionByName(b)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, d: str) -> DataFrame:
    """U2/U3: table-scale EXCEPT (set-difference; the reference's
    'insert only if absent' membership test, migrate.py:230-231, at
    table scale)."""
    c = load(spark, d, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, d, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # subtract == SQL EXCEPT (distinct set difference)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, d: str) -> DataFrame:
    """U3: table-scale INTERSECT."""
    c = load(spark, d, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, d, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "join_fuzzy",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS dirty_key,
             substr(c_name, 1, length(c_name) - 1) || 'X' AS dirty_name
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT d.dirty_key, c.c_custkey AS clean_key,
           CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS dist
    FROM dirty d JOIN customer c
      ON substr(d.dirty_name, 1, 16) = substr(c.c_name, 1, 16)
    WHERE levenshtein(d.dirty_name, c.c_name) <= 1
    """,
)
def join_fuzzy(spark: SparkSession, d: str) -> DataFrame:
    """J8 *(gen)*: blocked fuzzy join — reconcile corrupted keys
    against the clean dimension without an all-pairs product. The
    dirty side is a deterministic corruption of a seventh of the
    customer names (last character replaced); candidates come from an
    EQUI-join on a shared prefix block, then edit distance verifies —
    the same block → verify shape as the LSH dedup family, applied to
    record linkage. Block key choice is the scale lever: the prefix
    must be long enough that blocks stay bounded (here first-16 chars
    → ~100-row blocks) and short enough to survive the corruption."""
    c = load(spark, d, "customer")
    dirty = c.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.concat(
            F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
        ).alias("dirty_name"),
    )
    dist = F.levenshtein(F.col("dirty_name"), F.col("c_name"))
    return (
        dirty.join(
            c,
            F.expr("substr(dirty_name, 1, 16)") == F.expr("substr(c_name, 1, 16)"),
        )
        .where(dist <= 1)
        .select(
            "dirty_key",
            F.col("c_custkey").alias("clean_key"),
            dist.cast("long").alias("dist"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT c_custkey, NULLIF(c_nationkey % 7, 3) AS grp FROM customer
    ),
    s AS (
      SELECT s_suppkey, NULLIF(s_nationkey % 7, 3) AS grp FROM supplier
    )
    -- grp graded as DOUBLE on both sides: the null group survives the
    -- null-safe join, and a nullable integer oracle column materializes
    -- as float64 through the driver's pandas path
    SELECT CAST(c.grp AS DOUBLE) AS grp, COUNT(*) AS n_pairs
    FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
    GROUP BY 1
    """,
)
def join_null_safe(spark: SparkSession, d: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): plain
    ``=`` silently DROPS every row whose key is null — the classic
    reconciliation bug when "unknown" is itself a matchable category
    (here a seventh of the synthetic group keys are nulled). Spark
    plans ``<=>`` as a real hash join on the null-safe key exactly
    like ``=`` (one co-partitioned shuffle, null keys hash to one
    bucket — a known hot-bucket risk at scale: cap or pre-split the
    null class when it dominates), NOT a nested loop."""
    c = load(spark, d, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("grp")
    )
    s = load(spark, d, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 7, F.lit(3)).alias("grp")
    )
    return (
        c.join(s, c["grp"].eqNullSafe(s["grp"]))
        .groupBy(c["grp"].cast("double").alias("grp"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_asof_nearest",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           CASE
             WHEN prev_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prev_ts
             WHEN epoch_us(p.ts) - epoch_us(prev_ts)
                  <= epoch_us(next_ts) - epoch_us(p.ts) THEN prev_ts
             ELSE next_ts
           END AS nearest_click_ts
    FROM (
      SELECT p.event_id, p.user_id, p.ts,
             (SELECT MAX(c.ts) FROM events c
               WHERE c.event_type = 'click' AND c.user_id = p.user_id
                 AND c.ts <= p.ts) AS prev_ts,
             (SELECT MIN(c.ts) FROM events c
               WHERE c.event_type = 'click' AND c.user_id = p.user_id
                 AND c.ts > p.ts) AS next_ts
      FROM events p WHERE p.event_type = 'purchase'
    ) p
    """,
)
def join_asof_nearest(spark: SparkSession, d: str) -> DataFrame:
    """As-of join, direction='nearest' (the third pandas merge_asof
    direction, completing backward / forward): each purchase pairs
    with the temporally CLOSEST click by the same user, ties resolved
    backward (the standard merge_asof rule). Same union+window design
    as its two siblings — tag both streams, one shuffle on user_id,
    carry the last prior click forward AND the next later click
    backward in the same sorted pass, then one exact integer-micros
    comparison picks the closer side. Still one shuffle and linear
    state; the naive form is two correlated subqueries (the oracle
    runs exactly that). Clicks AT the purchase timestamp count as
    prior (<=), mirroring join_asof."""
    ev = load(spark, d, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("purchase_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_p"),
        "event_id",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("is_p"),
        "event_id",
    )
    # sort purchases AFTER a same-ts click (backward side must see it:
    # <= semantics), which also puts the forward scan's same-ts click
    # BEFORE the purchase — exactly the (<=, >) split the oracle spells
    both = clicks.unionByName(purchases)
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.currentRow + 1, Window.unboundedFollowing)
    )
    prev_c = F.last("click_ts", ignorenulls=True).over(w_back)
    next_c = F.first("click_ts", ignorenulls=True).over(w_fwd)
    d_prev = F.unix_micros(F.col("ts")) - F.unix_micros(prev_c)
    d_next = F.unix_micros(next_c) - F.unix_micros(F.col("ts"))
    nearest = (
        F.when(prev_c.isNull(), next_c)
        .when(next_c.isNull(), prev_c)
        .when(d_prev <= d_next, prev_c)
        .otherwise(next_c)
    )
    return (
        both.withColumn("nearest_click_ts", nearest)
        .where(F.col("is_p") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "nearest_click_ts",
        )
    )
