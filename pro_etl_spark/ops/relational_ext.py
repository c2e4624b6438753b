"""Extended relational operators: cube / grouping sets, multi-distinct
aggregation, exact percentiles, pivot, analytic window functions
(ntile / percent_rank / cume_dist), and range-frame windows.

Capability generalizations of SURVEY §2.4 A5 and §2.5 W1–W3 beyond the
first wave in ``relational.py`` — each exercises a distinct physical
plan shape worth owning at 100 TB:

- cube/rollup/grouping-sets → one Expand + single hash aggregate (not
  2^n scans)
- multiple DISTINCT aggregates → Expand-based rewrite, one shuffle
- pivot with an explicit value list → conditional aggregation, no
  second pass to discover values (at scale, *always* pass the list:
  otherwise Spark runs a distinct job first)
- range frames → bounded window state keyed by a numeric order column
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.ops.hashing import DUCK_HASH60, hash60
from pro_etl_spark.ops.relational import DEC, DEC6, _dsum
from pro_etl_spark.registry import register

DECV = "decimal(18,6)"


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS grouping_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, d: str) -> DataFrame:
    """A5: CUBE over (returnflag, linestatus) — all 2² grouping
    combinations in ONE Expand + hash aggregate (the plan to insist on
    at scale: 4 aggregates for one scan/shuffle, not 4 scans)."""
    li = load(spark, d, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("grouping_id"),
            F.count("*").alias("n"),
            _dsum("l_quantity", "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "grouping_id", "n", "sum_qty")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, d: str) -> DataFrame:
    """A5: explicit GROUPING SETS through the SQL surface (two
    independent rollup dimensions, one scan). Uses spark.sql on a temp
    view — the engine's SQL entry point, same Catalyst plan as the
    DataFrame form."""
    load(spark, d, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_multi_distinct(spark: SparkSession, d: str) -> DataFrame:
    """Multiple DISTINCT aggregates over different columns in one query
    — Catalyst's Expand rewrite (one row replicated per distinct set),
    a single shuffle instead of one job per distinct."""
    o = load(spark, d, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.count("*").alias("n"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5)  AS p50,
           quantile_cont(l_quantity, 0.75) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, d: str) -> DataFrame:
    """Exact percentiles (linear interpolation — same definition as
    DuckDB's quantile_cont; l_quantity is integral-valued so the
    interpolated midpoints are exact binary fractions, bit-stable
    across engines). At 100 TB exact percentile means a sort per group
    — prefer approx_percentile (t-digest) there; this is the exactness
    baseline the sketch is judged against."""
    li = load(spark, d, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )


@register(
    "pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, d: str) -> DataFrame:
    """Pivot with an explicit value list (never omit it at scale —
    without the list Spark first runs a distinct job to discover the
    columns). Compiles to conditional aggregation: one scan, one
    shuffle."""
    o = load(spark, d, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_orderpriority) AS approx_priorities,
           COUNT(DISTINCT o_orderpriority) AS exact_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, d: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch next to the exact count —
    the 100 TB default for COUNT(DISTINCT): mergeable partial sketches,
    one pass, no Expand. Run in the sketch's EXACT regime so the
    driver can value-check it: Spark's HyperLogLogPlusPlus is
    DENSE-only (no sparse mode) — at tiny cardinalities the estimator
    applies the linear-counting correction over the dense registers,
    which returns the exact count as long as the 5 fixed hash values
    of o_orderpriority land in 5 distinct registers. That is pinned
    for THIS column by test_approx_distinct_exact_regime_matches, not
    a structural guarantee for arbitrary low-cardinality columns
    (~0.2% of value sets would collide a register at this rsd). The
    high-cardinality
    estimation regime (o_custkey, where the sketch genuinely
    estimates) is bounded at 3× rsd in tests/test_sketches.py."""
    o = load(spark, d, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_orderpriority", rsd=0.02)
        .cast("long")
        .alias("approx_priorities"),
        F.countDistinct("o_orderpriority").alias("exact_priorities"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS approx_p50,
           quantile_disc(l_extendedprice, 0.95) AS approx_p95,
           quantile_disc(l_extendedprice, 0.5) AS exact_p50,
           quantile_disc(l_extendedprice, 0.95) AS exact_p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, d: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna quantile sketch) — the
    scale path percentile — run in its EXACT regime so the driver can
    value-check it (the same pairing recipe as agg_approx_topk and
    agg_approx_distinct): with accuracy ≥ the group's row count the
    GK summary retains every observation and the sketch answer IS the
    discrete percentile, matching DuckDB's quantile_disc exactly.
    ``exact_p50/p95`` certify that via percentile_disc (the exact
    rank-selection aggregate — value selection, no interpolation
    arithmetic to drift cross-engine). At 100 TB the same call with a
    bounded accuracy answers in one narrow pass + tiny merge where the
    exact percentile would sort each group; the error-bounded
    estimation regime is covered in tests/test_sketches.py.

    SCALE PIN: the oracle pairing holds only while accuracy=1,000,000
    >= every group's row count (largest l_returnflag group is ~300k at
    sf0.1, ~3M at sf1). Grading above sf~3 would silently flip the GK
    sketch into estimation mode and hash-mismatch quantile_disc —
    test_sketches.py::test_approx_percentile_accuracy_covers_sf
    asserts max group size < accuracy so an sf bump fails loudly."""
    li = load(spark, d, "lineitem")
    # Scalar output columns (not array<double>): the driver's pandas
    # canonicalizer sorts cells and cannot factorize ndarray values.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, 0.5, 1000000)"
            ).alias("approx_p50"),
            F.expr(
                "approx_percentile(l_extendedprice, 0.95, 1000000)"
            ).alias("approx_p95"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("exact_p50"),
            F.expr(
                "percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("exact_p95"),
        )
    )


SALT_BUCKETS = 8


@register(
    "join_skew_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, l.l_linenumber, o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, d: str) -> DataFrame:
    """Skew-mitigated join via salting: the (potentially hot-keyed) fact
    side gets a random-ish salt in [0, 8); the dimension side is
    replicated once per salt value (`explode(sequence)`), and the join
    key becomes (key, salt) — a hot key's rows spread over 8 reducers
    instead of one. The oracle is the UNSALTED join: salting must be
    result-invariant, which is exactly what the value hash proves.

    (AQE's skewJoin handles this automatically for sort-merge joins;
    manual salting remains the tool for skewed *aggregations* and for
    engines/paths AQE doesn't cover. Salt derives from a stable key
    hash, not rand(), so retried tasks stay deterministic.)"""
    li = load(spark, d, "lineitem").withColumn(
        "salt", (F.crc32(F.col("l_linenumber").cast("string")) % SALT_BUCKETS).cast("int")
    )
    o = (
        load(spark, d, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
    )
    j = li.join(o, (li["l_orderkey"] == o["o_orderkey"]) & (li["salt"] == o["salt"]))
    return j.groupBy("l_orderkey", "l_linenumber", "o_orderpriority").agg(
        _dsum("l_extendedprice", "revenue")
    )


@register(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def join_bucketed(spark: SparkSession, d: str) -> DataFrame:
    """Co-located join via bucketing: both tables written bucketed on
    the join key (`bucketBy(8, key)` + sortBy) into managed tables, so
    the join plan has NO shuffle exchange — each bucket pair joins
    in place. The write is a one-time cost amortized over every later
    join/aggregation on that key; at 100 TB bucket layout IS the
    partitioning strategy. Oracle: the same join on the raw parquet
    (bucketing must be result-invariant)."""
    import tempfile

    from pro_etl_spark.ops.sources import dataset_suffix

    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    suffix = dataset_suffix(d)
    on, ln = f"bkt.orders_b{suffix}", f"bkt.lineitem_b{suffix}"
    base = f"{tempfile.gettempdir()}/pro_etl_spark/bucketed_{suffix}"
    if not spark.catalog.tableExists(on):
        (
            load(spark, d, "orders")
            .select("o_orderkey", "o_totalprice")
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .option("path", f"{base}/orders")
            .mode("overwrite").saveAsTable(on)
        )
    if not spark.catalog.tableExists(ln):
        (
            load(spark, d, "lineitem")
            .select("l_orderkey")
            .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .option("path", f"{base}/lineitem")
            .mode("overwrite").saveAsTable(ln)
        )
    o = spark.table(on)
    li = spark.table(ln)
    # hint("merge"): force the sort-merge path so the plan demonstrates
    # the bucket property (at tiny SF Catalyst would otherwise pick a
    # broadcast join); with both sides bucketed+sorted on the key the
    # SMJ has zero Exchange and zero Sort nodes.
    return (
        o.join(li.hint("merge"), o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("*").alias("n_items"))
    )


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile(spark: SparkSession, d: str) -> DataFrame:
    """W1 extras: ntile / percent_rank / cume_dist per customer
    (deterministic total order via the unique orderkey tiebreak).
    percent_rank and cume_dist are exact rationals of row counts —
    bit-identical across engines."""
    o = load(spark, d, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, day_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY day_n
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_30d
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_n
          FROM orders)
    """,
)
def window_range_frame(spark: SparkSession, d: str) -> DataFrame:
    """W3: RANGE frame — trailing-30-day spend per customer, keyed on a
    numeric day column (Spark's rangeBetween requires a numeric order
    key). Bounded frame ⇒ bounded per-partition window state."""
    o = load(spark, d, "orders").withColumn(
        "day_n", (F.unix_timestamp("o_orderdate") / 86400).cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_n")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day_n",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("spend_30d"),
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_returnflag, measure,
           CAST(SUM(CAST(val AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    ) GROUP BY 1, 2
    """,
)
def unpivot_measures(spark: SparkSession, d: str) -> DataFrame:
    """Unpivot (melt): wide measure columns → long (measure, value)
    rows, then a per-measure rollup — the inverse of ``pivot_status``
    and the standard reshape before generic per-metric processing.
    Spark's native ``unpivot`` expands in-task (narrow — the 3× row
    fan-out never hits the shuffle as raw rows because the agg's
    map-side combine collapses them first); the only shuffle is the
    final 3×|flags| group key. The SQL twin is the UNION ALL spelling —
    what the optimizer desugars unpivot into."""
    li = load(spark, d, "lineitem")
    melted = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.sum(F.col("val").cast(DEC6)).cast("double").alias("total")
    )


#: the "already materialized" cutoff: orders strictly before this are
#: yesterday's aggregate; on/after is today's delta batch
INCR_CUTOFF = "1997-01-01"


@register(
    "agg_incremental",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_incremental(spark: SparkSession, d: str) -> DataFrame:
    """Incremental aggregate maintenance — the materialized-view
    refresh pattern: yesterday's persisted per-group partials (count +
    DECIMAL sum) merged with the partials of today's delta batch by
    re-aggregating the UNION of the two partial tables. COUNT and SUM
    are mergeable, so the refresh touches only |groups| + |delta| rows
    — never the full history, which is THE difference between an O(1
    day) and an O(all time) nightly job at 100 TB. The oracle is the
    full recompute over everything: merged partials must equal it
    exactly (DECIMAL partials make the sum order/batching-independent —
    double partials would NOT re-merge bit-exactly)."""
    o = load(spark, d, "orders")
    cutoff = F.lit(INCR_CUTOFF).cast("date")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_partial"),
        )

    yesterday = partials(o.where(F.col("o_orderdate") < cutoff))
    delta = partials(o.where(F.col("o_orderdate") >= cutoff))
    return (
        yesterday.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.sum("rev_partial").cast("double").alias("revenue"),
        )
    )


ZSCORE_CUT = 3.0


@register(
    "agg_zscore_outliers",
    oracle="""
    WITH counts AS (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt * cnt) AS sq FROM counts
    )
    SELECT o_custkey, CAST(cnt AS BIGINT) AS cnt,
           (cnt - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
             AS z
    FROM counts, stats
    WHERE abs((cnt - CAST(s AS DOUBLE) / n)
              / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)))
          > 3.0
    """,
)
def agg_zscore_outliers(spark: SparkSession, d: str) -> DataFrame:
    """Z-score anomaly detection over a BEHAVIORAL feature: customers
    whose order frequency sits >3σ from the population (the
    volume-anomaly gate of a monitoring pipeline; raw uniform columns
    like o_totalprice have max |z| = √3 by construction — frequency
    counts are where real tails live). Moments come from exact integer
    Σcnt / Σcnt² partials ((Σx² − (Σx)²/n)/(n−1)), never stddev_samp():
    the builtin accumulates doubles in partition order and two engines
    (or two partitionings) disagree in the last ulps, while integer
    partials are exact and everything after is deterministic IEEE
    arithmetic. Two map-side-combinable aggs (per-key count, then
    global moments); the one-row stats table broadcasts into a
    literal-like join — no second shuffle of the counts."""
    o = load(spark, d, "orders")
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("sq").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("cnt") - mean) / F.sqrt(var)
    return (
        counts.crossJoin(F.broadcast(stats))
        .where(F.abs(z) > ZSCORE_CUT)
        .select("o_custkey", F.col("cnt").cast("long").alias("cnt"), z.alias("z"))
    )


@register(
    "window_share_of_total",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                               OVER (PARTITION BY o_orderpriority) AS DOUBLE)
             AS share
    FROM orders
    """,
)
def window_share_of_total(spark: SparkSession, d: str) -> DataFrame:
    """Share-of-total: each order's fraction of its priority class's
    revenue — an unordered full-partition window (no sort in the frame,
    so the physical plan is shuffle + per-partition single-pass, not a
    sort). The denominator sum is DECIMAL-routed for order
    independence; the division is then bit-deterministic."""
    o = load(spark, d, "orders")
    w = Window.partitionBy("o_orderpriority")
    denom = F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        (F.col("o_totalprice") / denom).alias("share"),
    )


@register(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_percent_rank(spark: SparkSession, d: str) -> DataFrame:
    """W1-family: relative-position analytics — percent_rank
    ((rank-1)/(n-1)) and cume_dist (#peers ≤ current / n) per nation by
    account balance. The ORDER BY carries a key tiebreak so ranks are
    total and both engines' doubles come from the same small-integer
    division (bit-identical). One shuffle on the partition key; the
    same plan as any ranked window at 100 TB."""
    c = load(spark, d, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER w AS last_key,
           -- DOUBLE on both sides: NULL for single-order customers,
           -- and a nullable integer oracle column materializes as
           -- float64 through the driver's pandas path
           CAST(NTH_VALUE(o_orderkey, 2) OVER w AS DOUBLE) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, d: str) -> DataFrame:
    """W-family: edge-of-partition navigation — each order alongside
    its customer's first, last, and second order key in date order.
    The frame is explicitly UNBOUNDED..UNBOUNDED: the default frame
    stops at CURRENT ROW, which silently turns last_value into "current
    value" — the classic window-function bug, pinned here on both
    engines. nth_value(_, 2) is null for single-order customers (no
    ANSI error)."""
    o = load(spark, d, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2)
        .over(w)
        .cast("double")
        .alias("second_key"),
    )


@register(
    "agg_collect_set_sorted",
    oracle="""
    SELECT c_nationkey,
           string_agg(seg, ',' ORDER BY seg) AS segments,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer)
    GROUP BY c_nationkey
    """,
)
def agg_collect_set_sorted(spark: SparkSession, d: str) -> DataFrame:
    """A-family: deterministic array aggregation — the distinct market
    segments per nation as a canonically sorted, comma-joined string.
    collect_set's intra-group order is partition-dependent; array_sort
    makes the aggregate order-independent, which is what makes a
    collected array comparable across runs (and engines) at all. The
    string join keeps the driver-facing schema scalar."""
    c = load(spark, d, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.array_sort(F.collect_set("c_mktsegment")).alias("segs"))
        .select(
            "c_nationkey",
            F.array_join("segs", ",").alias("segments"),
            F.size("segs").cast("long").alias("n_segments"),
        )
    )


@register(
    "agg_approx_topk",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, item) AS BIGINT) AS rank,
           item, cnt
    FROM (
      SELECT o_orderpriority AS item, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderpriority
    )
    ORDER BY rank
    """,
)
def agg_approx_topk(spark: SparkSession, d: str) -> DataFrame:
    """A-family sketch: approx_top_k heavy hitters (Spark 4's
    ApproxTopK aggregate — one pass, mergeable sketch, no full groupBy
    materialization). Run in its EXACT regime: maxItemsTracked (10^5)
    exceeds the column's distinct cardinality, so every count is exact
    and the driver can value-check the sketch against the plain
    aggregate. At 100 TB the same call with a bounded tracker answers
    "top 100 domains" over billions of keys in one narrow pass + one
    tiny merge, where the exact groupBy would shuffle the world.
    Sketch emission order on count ties is implementation-defined, so
    ranks are re-derived with a deterministic (cnt DESC, item) sort
    rather than trusted from the sketch."""
    o = load(spark, d, "orders")
    topk = o.agg(
        F.expr("approx_top_k(o_orderpriority, 5, 100000)").alias("tk")
    ).select(F.explode("tk").alias("e"))
    flat = topk.select(
        F.col("e.item").alias("item"), F.col("e.count").cast("long").alias("cnt")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("item"))
    return flat.select(
        F.row_number().over(w).cast("long").alias("rank"), "item", "cnt"
    ).orderBy("rank")


@register(
    "join_cross",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(n.n_regionkey = r.r_regionkey AS VARCHAR) AS is_home
    FROM nation n CROSS JOIN region r
    """,
)
def join_cross(spark: SparkSession, d: str) -> DataFrame:
    """J-family completion: explicit Cartesian product — every
    (nation, region) combination tagged with whether it is the home
    pairing. ``crossJoin`` is deliberate API friction: Spark refuses an
    implicit cartesian plan precisely because an accidental one is the
    single fastest way to turn 100 TB into 10 PB of shuffle. The
    legitimate uses are dimension×dimension grids like this one —
    both sides tiny, one side broadcast, output |A|×|B| rows by
    construction (BroadcastNestedLoopJoin, no shuffle at all)."""
    n = load(spark, d, "nation")
    r = load(spark, d, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_name",
        "r_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).cast("string").alias("is_home"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bitmap_distinct(spark: SparkSession, d: str) -> DataFrame:
    """EXACT distinct counting via bitmap indexes (Spark 3.5+ bitmap
    family — the ClickHouse/Doris technique): bucket each key into a
    32768-bit bitmap segment (``bitmap_bucket_number`` /
    ``bitmap_bit_position``), OR the bitmaps per (group, bucket) with
    ``bitmap_construct_agg``, then SUM the per-bucket popcounts.
    Unlike COUNT(DISTINCT) there is no Expand rewrite and no
    shuffle of raw keys — the shuffle payload is one ≤4 KB bitmap per
    (group, bucket), mergeable by OR, which also makes it an
    incremental-refresh-friendly partial (the agg_incremental
    property, but for distinct counts). Unlike HLL
    (agg_approx_distinct) the answer is exact."""
    o = load(spark, d, "orders")
    per_bucket = o.groupBy(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm")
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_custs")
    )


@register(
    "join_bloom_runtime",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def join_bloom_runtime(spark: SparkSession, d: str) -> DataFrame:
    """Runtime bloom-filter–pruned shuffle join: the selective dim-side
    predicate is turned into a bloom filter that Catalyst injects into
    the FACT side's scan (InjectRuntimeFilter), so most fact rows are
    dropped before the shuffle — row-level runtime pruning, the sibling
    of dynamic partition pruning for unpartitioned keys.

    The op pins the confs that make the rewrite observable at test
    scale: broadcasting is disabled for THIS plan only (a broadcast
    join wouldn't need a bloom filter; ``registry.RUNTIME_CONFS``
    restores the default threshold before every other query), and the
    application-side size threshold drops to 0 because the testdata
    fact side is MBs — at 100 TB the default thresholds trigger this
    organically and no conf pinning is needed.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load(spark, d, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load(spark, d, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "agg_distinct_overlap",
    oracle="""
    SELECT
      (SELECT COUNT(DISTINCT user_id) FROM events
       WHERE event_type = 'click') AS n_click,
      (SELECT COUNT(DISTINCT user_id) FROM events
       WHERE event_type = 'purchase') AS n_purchase,
      (SELECT COUNT(DISTINCT user_id) FROM events
       WHERE event_type IN ('click', 'purchase')) AS n_union,
      (SELECT COUNT(*) FROM
        (SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'))
        AS n_both
    """,
)
def agg_distinct_overlap(spark: SparkSession, d: str) -> DataFrame:
    """Exact distinct-set algebra without any distinct-join: the
    clickers∩purchasers audience size from bitmap aggregates via
    inclusion-exclusion (|A∩B| = |A| + |B| − |A∪B|). Each term is a
    bitmap_count over OR-mergeable per-bucket bitmaps, so ONE pass over
    the events produces all four numbers — no INTERSECT materialization,
    no Expand replication, no self-join. The oracle spells the same
    quantities the classic way (scalar subqueries + INTERSECT).

    Scale: per (bucket, type) bitmaps shuffle as ≤4 KB segments and
    merge associatively — the same partial-merge shape sketches use,
    but exact; the cross-type combination happens on the bucket-sized
    aggregate, never on raw events."""
    ev = load(spark, d, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    per_bucket = ev.groupBy(
        F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(
        F.expr(
            "bitmap_construct_agg(CASE WHEN event_type = 'click'"
            " THEN bitmap_bit_position(user_id) END)"
        ).alias("bm_click"),
        F.expr(
            "bitmap_construct_agg(CASE WHEN event_type = 'purchase'"
            " THEN bitmap_bit_position(user_id) END)"
        ).alias("bm_purchase"),
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position(user_id))"
        ).alias("bm_union"),
    )
    totals = per_bucket.agg(
        F.sum(F.expr("bitmap_count(bm_click)")).alias("n_click"),
        F.sum(F.expr("bitmap_count(bm_purchase)")).alias("n_purchase"),
        F.sum(F.expr("bitmap_count(bm_union)")).alias("n_union"),
    )
    return totals.select(
        "n_click",
        "n_purchase",
        "n_union",
        (F.col("n_click") + F.col("n_purchase") - F.col("n_union")).alias(
            "n_both"
        ),
    )


#: fixed pivot-key list — pivoting with an EXPLICIT value list keeps
#: the plan a single aggregate pass; omitting it makes Spark run a
#: separate distinct-values job and collect the keys onto the driver
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_MEASURES = ",\n           ".join(
    f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}_n,\n"
    f"           CAST(SUM(CAST(value AS DECIMAL(18,6)))"
    f" FILTER (WHERE event_type = '{t}') AS DOUBLE) AS {t}_v"
    for t in _EVENT_TYPES
)


@register(
    "pivot_event_counts",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS day,
           {_PIVOT_MEASURES}
    FROM events GROUP BY CAST(ts AS DATE)
    """,
)
def pivot_event_counts(spark: SparkSession, d: str) -> DataFrame:
    """Wide reshape via ``groupBy().pivot()`` — the long→wide twin of
    ``unpivot_measures``: per day, one (count, DECIMAL-routed value
    sum) column pair per event type. The pivot carries an EXPLICIT
    values list, so Catalyst plans ONE aggregate pass (PivotFirst
    partials, map-side combinable) — without the list Spark first runs
    a distinct-values job and collects the pivot keys driver-side, the
    classic accidental two-pass pivot.

    Semantics pinned cross-engine: an absent (day, type) cell is count
    0 (Spark's pivot yields NULL there — coalesced to match SQL's
    ``COUNT(*) FILTER``) but sum NULL on both sides (empty SUM is NULL
    in both engines). Scale: one shuffle on the group key; the pivot
    width is schema-bounded (types × measures), never data-bounded."""
    ev = load(spark, d, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    piv = ev.groupBy("day").pivot("event_type", _EVENT_TYPES).agg(
        # count(lit(1)), not count("*"): star expansion is rejected
        # inside a Pivot aggregate
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC6)).cast("double").alias("v"),
    )
    cols = [F.col("day")]
    for t in _EVENT_TYPES:
        cols.append(
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n")
        )
        cols.append(F.col(f"{t}_v"))
    return piv.select(*cols)


#: interval-overlap join: each purchase/error event opens a 5-minute
#: activity window; bucket width equals the interval length so every
#: interval lands in at most 2 buckets (the bucket-explosion bound).
#: All arithmetic is integer epoch MICROseconds (unix_micros /
#: epoch_us) — Spark's timestamp→long cast truncates while DuckDB's
#: double→bigint cast rounds, so second-granularity epochs would
#: diverge on sub-second timestamps; micros are exact on both.
OVERLAP_DUR_US = 300 * 1_000_000


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
      SELECT event_id AS a_id,
             epoch_us(ts) AS a_start,
             epoch_us(ts) + {OVERLAP_DUR_US} AS a_end
      FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT event_id AS b_id,
             epoch_us(ts) AS b_start,
             epoch_us(ts) + {OVERLAP_DUR_US} AS b_end
      FROM events WHERE event_type = 'error'
    )
    SELECT a.a_id, COUNT(*) AS n_overlaps,
           MAX(LEAST(a_end, b_end) - GREATEST(a_start, b_start))
             AS max_overlap_us
    FROM a JOIN b ON a_start < b_end AND b_start < a_end
    GROUP BY a.a_id
    """,
)
def join_interval_overlap(spark: SparkSession, d: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key — for each purchase's
    5-minute window, every error window it intersects in time. The
    textbook formulation is a pure theta join (``a_start < b_end AND
    b_start < a_end``) which Spark can only execute as a nested-loop
    cartesian — the oracle runs that directly, but at 100 TB it is a
    scale-killer. This operator instead uses the BUCKETED REWRITE (the
    standard range-join optimization Spark lacks natively): each
    interval explodes to the fixed-width time buckets it touches (<= 2,
    because bucket width = interval length), the join becomes an
    EQUI-join on bucket id (one co-partitioned shuffle each side),
    bucket-boundary double-matches collapse via a pair-keyed
    aggregate, and the exact overlap predicate filters residually.
    Cost: <= 2x row expansion + one hash join, vs |A|*|B| pairs.
    Overlap arithmetic is integer epoch micros — exact on both
    engines."""
    ev = load(spark, d, "events")

    def side(tag: str, kind: str) -> DataFrame:
        s = F.unix_micros(F.col("ts"))
        return ev.where(F.col("event_type") == kind).select(
            F.col("event_id").alias(f"{tag}_id"),
            s.alias(f"{tag}_start"),
            (s + OVERLAP_DUR_US).alias(f"{tag}_end"),
        )

    a, b = side("a", "purchase"), side("b", "error")
    buck = lambda c: F.floor(F.col(c) / F.lit(OVERLAP_DUR_US))  # noqa: E731
    # end is exclusive: bucket of (end - 1) bounds the touched range
    ab = a.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                buck("a_start"),
                F.floor((F.col("a_end") - 1) / F.lit(OVERLAP_DUR_US)),
            )
        ),
    )
    bb = b.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                buck("b_start"),
                F.floor((F.col("b_end") - 1) / F.lit(OVERLAP_DUR_US)),
            )
        ),
    )
    pairs = (
        ab.join(bb, "bucket")
        .where(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        # a pair overlapping across a bucket boundary matches twice —
        # collapse before counting (cheap: keyed by the pair itself)
        .groupBy("a_id", "b_id")
        .agg(
            F.first(
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).alias("ov")
        )
    )
    return pairs.groupBy("a_id").agg(
        F.count("*").alias("n_overlaps"),
        F.max("ov").alias("max_overlap_us"),
    )


SAMPLE_PER_GROUP_K = 5


@register(
    "sample_per_group",
    oracle=f"""
    SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                         o_orderkey)
               AS rn
      FROM orders
    ) WHERE rn <= {SAMPLE_PER_GROUP_K}
    """,
)
def sample_per_group(spark: SparkSession, d: str) -> DataFrame:
    """Deterministic uniform sample of K rows per group — the
    reservoir-sample replacement for distributed engines: ranking by a
    cryptographic hash of the key IS a uniform random order, but one
    that is reproducible across runs, engines, and partition layouts
    (``rand()`` is none of those — per-partition seeded, re-evaluated
    on retry). One window shuffle keyed by the group; per-row state is
    the hash. At 100 TB the same plan samples debug slices,
    training-eval carve-outs, and per-source inspection rows without a
    second pass; the ``split_train_test`` / ``sample_stratified``
    family uses the same salted-hash principle for rate-based
    sampling, this one for exact-K."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        load(spark, d, "orders")
        .select("o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SAMPLE_PER_GROUP_K)
        .drop("rn")
    )


#: replication factor for skew salting — at 100 TB pick ~(skewed-key
#: rows / target-partition rows); 8 keeps the local plan readable
SALT_N = 8


@register(
    "agg_salted_twophase",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_twophase(spark: SparkSession, d: str) -> DataFrame:
    """Two-phase salted aggregation — the hand-rolled fix for a
    skewed GROUP BY key (a handful of event types receiving most of
    the traffic): phase 1 aggregates on (key, salt) where salt is a
    DETERMINISTIC spread of the row identity (event_id % N — rand()
    would break retry/speculative-execution idempotence), so the hot
    key's rows land on N reducers instead of one; phase 2 re-aggregates
    the N partial rows per key. COUNT re-aggregates as SUM, the
    DECIMAL value sum is associative by construction, so the result is
    value-identical to the plain one-shuffle GROUP BY the oracle runs.
    Spark's own partial aggregation solves this for built-in aggs (map-
    side combine already spreads the key); the two-phase shape is the
    template for when it can't — collect_list payloads, exact
    percentile state, or any buffer that grows with the group."""
    ev = load(spark, d, "events").withColumn(
        "salt", (F.col("event_id") % SALT_N).cast("int")
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count("*").alias("n_partial"),
        F.sum(F.col("value").cast(DEC)).alias("v_partial"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_partial").cast("long").alias("n_events"),
        F.sum("v_partial").cast("double").alias("total_value"),
    )


@register(
    "join_salted",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def join_salted(spark: SparkSession, d: str) -> DataFrame:
    """Skew-salted shuffle join — the fix when ONE join key floods a
    reducer and the small side is too big to broadcast: the fact side
    gets a deterministic salt (event_id % N), the dimension side is
    replicated N ways via an in-row sequence+explode, and the join key
    becomes (key, salt) — the hot key's rows now spread over N
    partitions. Values are identical to the plain equi-join (each fact
    row meets exactly the one dim replica carrying its salt), which is
    precisely what the oracle checks. SHUFFLE_HASH hint keeps the demo
    honest (AQE would otherwise broadcast the small replicated dim —
    at real scale, the scenario's premise is that it can't); AQE's own
    skew-join handles sort-merge skew automatically, this shape is for
    hash joins and for engines/pipelines where the salt must be
    explicit."""
    ev = load(spark, d, "events").select(
        "event_id", "user_id", "event_type",
        (F.col("event_id") % SALT_N).cast("int").alias("salt"),
    )
    dim = (
        load(spark, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        ev.hint("shuffle_hash")
        .join(dim, (ev.user_id == dim.c_custkey) & (ev.salt == dim.salt))
        .select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")
    )


#: epoch anchor (2024-01-01 UTC, seconds) — centering the regression
#: abscissa keeps the normal-equation magnitudes in clean double range
_TS_ANCHOR = 1_704_067_200


@register(
    "agg_moments",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cv
      FROM events
    ), s AS (
      -- VARCHAR-mediated decimal->double (r12): DuckDB's direct
      -- CAST(DECIMAL AS DOUBLE) is up to 1 ulp off past 2^53 (s4 is
      -- ~3e19 here; measured ...072e19 vs the correctly-rounded
      -- ...076e19 Spark/strtod produce); the exact decimal string
      -- through strtod is correctly rounded and engine-portable.
      SELECT event_type,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(cv AS DECIMAL(38,0))) AS VARCHAR)
                  AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(cv * cv AS DECIMAL(38,0))) AS VARCHAR)
                  AS DOUBLE) AS s2,
             CAST(CAST(SUM(CAST(cv * cv * cv AS DECIMAL(38,0)))
                       AS VARCHAR) AS DOUBLE) AS s3,
             CAST(CAST(SUM(CAST(cv * cv AS DECIMAL(19,0))
                           * CAST(cv * cv AS DECIMAL(19,0)))
                       AS VARCHAR) AS DOUBLE) AS s4
      FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           s1 / n / 100 AS mean,
           (s2 / n - (s1 / n) * (s1 / n)) / 10000 AS variance,
           (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * ((s1 / n) * (s1 / n) * (s1 / n)))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * sqrt(s2 / n - (s1 / n) * (s1 / n))) AS skewness,
           (s4 / n - 4 * (s1 / n) * (s3 / n)
                   + 6 * ((s1 / n) * (s1 / n)) * (s2 / n)
                   - 3 * ((s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) - 3 AS kurtosis
    FROM s ORDER BY event_type
    """,
)
def agg_moments(spark: SparkSession, d: str) -> DataFrame:
    """Exact higher statistical moments (mean / variance / skewness /
    excess kurtosis) from integer power sums — the profiling
    statistics behind drift detection and outlier-band tuning. Spark's
    built-in ``skewness()``/``kurtosis()`` accumulate doubles in
    partition order (answers drift with parallelism — unacceptable for
    a regression-tested pipeline). Exactness route: the 2-decimal
    ``value`` lifts to integer CENTS via ``floor(v*100 + 0.5)`` (floor
    operates on the exact binary double in BOTH engines, unlike a
    double→DECIMAL cast, which Spark quantizes via the shortest-repr
    string and DuckDB via the exact binary — they disagree at
    half-boundaries for ≥7-decimal products like v⁴), every power sum
    is then exact integer/DECIMAL addition (c⁴ exceeds int64 at
    c > 55 108, so the 4th power multiplies as DECIMAL(19,0)²), and
    the closing mean/variance rescale by 100/10 000. Skewness and
    kurtosis are scale-invariant — computed directly in cent units.
    One map-side-combinable aggregate, 4 extra sums wide — same
    single-shuffle cost as the plain mean."""
    ev = load(spark, d, "events")
    cv = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    agg = ev.select("event_type", cv.alias("cv")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cv").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum((F.col("cv") * F.col("cv")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2"),
        F.sum((F.col("cv") * F.col("cv") * F.col("cv")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s3"),
        F.sum(
            (F.col("cv") * F.col("cv")).cast("decimal(19,0)")
            * (F.col("cv") * F.col("cv")).cast("decimal(19,0)")
        )
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    m = F.col("s1") / n
    m2 = F.col("s2") / n - m * m
    skew = (F.col("s3") / n - F.lit(3) * m * (F.col("s2") / n) + F.lit(2) * (m * m * m)) / (
        m2 * F.sqrt(m2)
    )
    kurt = (
        F.col("s4") / n
        - F.lit(4) * m * (F.col("s3") / n)
        + F.lit(6) * (m * m) * (F.col("s2") / n)
        - F.lit(3) * (m * m * m * m)
    ) / (m2 * m2) - F.lit(3)
    return (
        agg.select(
            "event_type",
            "n",
            (m / F.lit(100)).alias("mean"),
            (m2 / F.lit(10000)).alias("variance"),
            skew.alias("skewness"),
            kurt.alias("kurtosis"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_linear_fit",
    oracle=f"""
    WITH s AS (
      -- VARCHAR-mediated sum->double (r12): these sums pass 2^53 at
      -- sf0.1 and DuckDB's direct HUGEINT/DECIMAL->DOUBLE casts are
      -- up to 1 ulp off there; exact digits through strtod match
      -- Spark's correctly-rounded conversions
      SELECT event_type,
             COUNT(*) AS n,
             CAST(CAST(SUM(epoch_us(ts) // 1000000 - {_TS_ANCHOR})
                       AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS VARCHAR)
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM((epoch_us(ts) // 1000000 - {_TS_ANCHOR})
                           * (epoch_us(ts) // 1000000 - {_TS_ANCHOR}))
                       AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST((epoch_us(ts) // 1000000 - {_TS_ANCHOR})
                                * value AS DECIMAL(38,6))) AS VARCHAR)
                  AS DOUBLE) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             AS intercept
    FROM s ORDER BY event_type
    """,
)
def agg_linear_fit(spark: SparkSession, d: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (value ~ time) from exact
    normal-equation sums — trend detection over event streams. Spark
    ships ``regr_slope``/``regr_intercept``, but their double
    accumulation is partition-order-dependent; here Σx/Σx² are exact
    BIGINT sums over anchored integer seconds, Σy/Σxy are DECIMAL-
    routed, and the closed-form solution is the identical IEEE
    expression on both engines. Single map-side-combinable shuffle."""
    ev = load(spark, d, "events")
    x = (F.unix_micros("ts") / F.lit(1_000_000)).cast("long") - F.lit(_TS_ANCHOR)
    v = F.col("value")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(v.cast("decimal(30,6)")).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum((x * v).cast("decimal(38,6)")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        agg.select(
            "event_type",
            "n",
            slope.alias("slope"),
            ((sy - slope * sx) / n).alias("intercept"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_gini",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           COUNT(*) AS n_types,
           1 - CAST(SUM(cnt * cnt) AS DOUBLE)
               / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
             AS gini_impurity
    FROM c GROUP BY user_id
    """,
)
def agg_gini(spark: SparkSession, d: str) -> DataFrame:
    """Per-user behavioral diversity as Gini impurity (1 − Σpᵢ²) over
    the event-type distribution — the entropy-style concentration
    metric that stays EXACT cross-engine because it never takes a log:
    both the counts and the sum of squared counts are integers, and
    the single closing division is one IEEE op. Two stacked map-side-
    combinable aggregates on (user, type) then (user): the second
    exchange moves only the per-(user, type) rollup (≤ |users| ×
    |types| rows, corpus-size-independent), so the corpus itself
    shuffles once."""
    c = load(spark, d, "events").groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    n = F.sum("cnt").cast("long")
    return c.groupBy("user_id").agg(
        n.alias("n_events"),
        F.count("*").alias("n_types"),
        (
            F.lit(1)
            - F.sum(F.col("cnt") * F.col("cnt")).cast("double")
            / (n.cast("double") * n.cast("double"))
        ).alias("gini_impurity"),
    )


@register(
    "agg_argminmax",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, value, ts,
             printf('%020d-%020d', epoch_us(ts), event_id) AS tiebreak
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_errors,
           BOOL_AND(value >= 0)      AS all_nonneg,
           BOOL_OR(event_type = 'purchase') AS any_purchase,
           ARG_MAX(event_type, tiebreak) AS last_type,
           ARG_MIN(event_type, tiebreak) AS first_type
    FROM e GROUP BY user_id
    """,
)
def agg_argminmax(spark: SparkSession, d: str) -> DataFrame:
    """Ordered-argument / conditional aggregates in ONE grouped pass:
    count_if, bool_and / bool_or, and max_by / min_by (DuckDB:
    FILTER + ARG_MAX/ARG_MIN). All five are map-side combinable, so
    the corpus shuffles once carrying 5 small partial states per
    (partition, user) — no window, no second scan, no join.

    max_by/min_by ties are undefined in both engines, so the ordering
    key is made UNIQUE by construction: a zero-padded (epoch_us,
    event_id) string — lexicographic order == (ts, event_id) order —
    which makes "first/last event type per user" deterministic
    cross-engine (the same encode-to-one-sortable-key trick as
    events_ohlc; a struct key would not hash identically through the
    grading canonicalizer's pandas path)."""
    e = load(spark, d, "events").select(
        "user_id",
        "event_type",
        "value",
        F.format_string(
            "%020d-%020d", F.unix_micros("ts"), F.col("event_id")
        ).alias("tiebreak"),
    )
    return e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("event_type") == "purchase").alias("any_purchase"),
        F.max_by("event_type", "tiebreak").alias("last_type"),
        F.min_by("event_type", "tiebreak").alias("first_type"),
    )


@register(
    "set_except_all",
    oracle="""
    SELECT 'except_all' AS op, nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY 1, 2
    UNION ALL
    SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY 1, 2
    """,
)
def set_except_all(spark: SparkSession, d: str) -> DataFrame:
    """U2/U3 bag-semantics twins: EXCEPT ALL keeps max(0, n_left −
    n_right) copies per value, INTERSECT ALL keeps min(n_left,
    n_right) — the multiset algebra reconciliation jobs actually need
    (a row missing TWICE is two discrepancies, which the DISTINCT
    variants silently collapse). Spark plans both natively
    (``exceptAll``/``intersectAll`` → a generated-column rewrite:
    tag ±1, sum per value, replicate) — no self-join; one shuffle per
    side keyed by value, identical to the DISTINCT variants' cost.
    The output collapses the replicated rows back to (value, count) so
    the oracle compares multiset cardinalities exactly."""
    c = load(spark, d, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, d, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ex = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    ix = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    return ex.unionAll(ix)


@register(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id, value,
           median(value) OVER (
             PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS rolling_median
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, d: str) -> DataFrame:
    """EXACT rolling median over the trailing 5 events per user — the
    robust smoother (spike suppression) whose windowed form Spark has
    no native aggregate for. Rewrite: collect the bounded frame into
    an array, sort it, index the middle (odd count) or average the two
    middles (even count — DuckDB's median interpolates identically,
    one IEEE add + halve). The frame is ROWS-bounded at 5, so per-row
    state is constant: one user-keyed shuffle + sort, the same cost
    class as any ordered window — this rewrite is only sane for SMALL
    frames (state is O(frame), not O(1); an unbounded exact median
    needs a different algorithm entirely, which the docstring is
    explicit about rather than silently shipping O(n²))."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    k = F.size(frame)
    lo = F.element_at(frame, ((k + 1) / 2).cast("int"))
    hi = F.element_at(frame, (k / 2 + 1).cast("int"))
    return load(spark, d, "events").select(
        "event_id",
        "user_id",
        "value",
        ((lo + hi) / F.lit(2.0)).alias("rolling_median"),
    )


#: lgK for ``agg_hll_merge``: DataSketches HLL is EXACT while the
#: sketch is still in its sparse (coupon) regime. Measured exactness
#: boundaries: lgK=12 first deviates at 1500 distinct (sf0.1 users:
#: 1488/1494 vs 1500); lgK=14 is exact at 1500 but deviates ~2.4k
#: (2399 -> 2388 on sf0.01 order dates); lgK=16 is exact through
#: 2399. Sized at 16 — sketch is still only 64 KB dense — so the key
#: carries a FULL value oracle (estimate == exact COUNT(DISTINCT))
#: with >60% cardinality headroom over the largest test-SF month
#: (1500 users); beyond the regime accuracy degrades per the
#: published 1.04/sqrt(2^lgK) bound, and the equality test in
#: tests/test_sketches.py fails loudly if a data change ever exits
#: the regime.
HLL_LGK = 16


@register(
    "agg_hll_merge",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
             COUNT(DISTINCT user_id) AS x
      FROM events GROUP BY 1
    )
    SELECT month,
           CAST(x AS BIGINT) AS est_merged,
           CAST(x AS BIGINT) AS est_direct,
           CAST(x AS BIGINT) AS exact_users
    FROM m
    """,
)
def agg_hll_merge(spark: SparkSession, d: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL,
    Spark 4 native): per-day user sketches built once, then UNIONED
    into month estimates — the incremental-maintenance contract that
    exact COUNT(DISTINCT) cannot offer at 100 TB (yesterday's sketch
    is never recomputed; today's partition adds one sketch and one
    merge). Emits per-month: the merged-sketch estimate, the
    single-pass direct estimate, and the exact distinct count. The
    merge property (merged == direct, bit-identical — DataSketches
    HLL union of same-lgK sketches is deterministic) is asserted in
    tests/test_sketches.py. Value-verified since round 11: lgK is
    sized (``HLL_LGK``) so the sketch sits in its exact sparse regime
    at every test SF, making estimate == exact a full SQL oracle —
    the exact-regime guard itself is a test, so a data change that
    exits the regime fails loudly rather than silently approximating
    against an exact oracle."""
    ev = load(spark, d, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("month", F.col("ts")).alias("month"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id", HLL_LGK).alias("sk")
    )
    merged = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = ev.groupBy("month").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", HLL_LGK)
        ).alias("est_direct"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return merged.join(direct, "month").select(
        "month", "est_merged", "est_direct", "exact_users"
    )


@register(
    "window_hampel",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS frame
      FROM events
    ), med AS (
      SELECT *,
             (list_sort(frame)[CAST((len(frame) + 1) // 2 AS INTEGER)]
              + list_sort(frame)[CAST(len(frame) // 2 + 1 AS INTEGER)]) / 2.0
               AS m
      FROM f
    ), mad AS (
      SELECT event_id, user_id, value, m,
             (list_sort(list_transform(frame, x -> abs(x - m)))
                [CAST((len(frame) + 1) // 2 AS INTEGER)]
              + list_sort(list_transform(frame, x -> abs(x - m)))
                [CAST(len(frame) // 2 + 1 AS INTEGER)]) / 2.0 AS mad
      FROM med
    )
    SELECT event_id, user_id, value, m AS rolling_median, mad,
           abs(value - m) > 3.0 * mad AS is_outlier
    FROM mad
    """,
)
def window_hampel(spark: SparkSession, d: str) -> DataFrame:
    """Hampel filter — the robust despiker: flag a sample when it sits
    more than 3 rolling-MADs from the rolling median of its trailing
    7-row frame. Extends the ``window_rolling_median`` rewrite one
    level: the SAME collected bounded frame yields the median AND the
    MAD (median of |x − median|) entirely in-row, so robustness costs
    no extra window pass — one user-keyed shuffle, constant per-row
    state. Both medians use identical lo/hi-average indexing on both
    engines, and the comparison chain is pure IEEE — bit-exact flags.
    Same explicit fence as the rolling median: bounded SMALL frames
    only."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    k = F.size(frame)
    med = (
        F.element_at(frame, ((k + 1) / 2).cast("int"))
        + F.element_at(frame, (k / 2 + 1).cast("int"))
    ) / F.lit(2.0)
    base = load(spark, d, "events").select(
        "event_id", "user_id", "ts", "value"
    ).withColumn("frame", F.collect_list("value").over(w))
    fs = F.array_sort(F.col("frame"))
    kk = F.size("frame")
    m = (
        F.element_at(fs, ((kk + 1) / 2).cast("int"))
        + F.element_at(fs, (kk / 2 + 1).cast("int"))
    ) / F.lit(2.0)
    base = base.withColumn("m", m)
    dev = F.array_sort(
        F.transform(F.col("frame"), lambda x: F.abs(x - F.col("m")))
    )
    mad = (
        F.element_at(dev, ((kk + 1) / 2).cast("int"))
        + F.element_at(dev, (kk / 2 + 1).cast("int"))
    ) / F.lit(2.0)
    return base.withColumn("mad", mad).select(
        "event_id",
        "user_id",
        "value",
        F.col("m").alias("rolling_median"),
        "mad",
        (F.abs(F.col("value") - F.col("m")) > F.lit(3.0) * F.col("mad")).alias(
            "is_outlier"
        ),
    )


SKEW_TOP_KEYS = 10


@register(
    "skew_key_profile",
    oracle=f"""
    WITH k AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n_rows,
             CAST(COUNT(*) AS DOUBLE) AS n_keys,
             CAST(MAX(cnt) AS DOUBLE) AS max_cnt
      FROM k
    )
    SELECT rank, key, cnt,
           ROUND(cnt / n_rows, 6) AS share,
           ROUND(max_cnt * n_keys / n_rows, 6) AS skew_factor
    FROM (
      SELECT key, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key)
                            AS BIGINT) AS rank
      FROM k
    ) r CROSS JOIN tot
    WHERE rank <= {SKEW_TOP_KEYS}
    ORDER BY rank
    """,
)
def skew_key_profile(spark: SparkSession, d: str) -> DataFrame:
    """Join-key skew diagnostics — the census a 100 TB pipeline runs
    BEFORE choosing a join strategy: the top heavy-hitter keys with
    their row share, plus the overall skew factor (hottest key's count
    over the perfectly-uniform expectation n_rows/n_keys). A skew
    factor near 1 means hash partitioning balances; ≫1 means the hot
    keys need salting (``join_salted``) or AQE skew splitting. Feeds
    the same decision the engine's salted operators implement.

    Scale: ONE map-side-combinable aggregate over the fact keyed by
    the join key (the key-grain table is orders-of-magnitude smaller
    than the fact), a 3-number global summary that broadcasts, and a
    top-k that rides TakeOrderedAndProject — no global sort of the
    key census."""
    o = load(spark, d, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    tot = k.agg(
        F.sum("cnt").cast("double").alias("n_rows"),
        F.count("*").cast("double").alias("n_keys"),
        F.max("cnt").cast("double").alias("max_cnt"),
    )
    top = (
        k.orderBy(F.desc("cnt"), "key")
        .limit(SKEW_TOP_KEYS)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "key")),
        )
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(
                F.col("max_cnt") * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("skew_factor"),
        )
        .orderBy("rank")
    )


#: spatial-grid join: radius (and cell size) on the derived integer
#: coordinate plane — R a power of two so cell ids are exact in both
#: engines' float-free integer arithmetic
SPATIAL_R = 256
SPATIAL_GRID = 10_000


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS custkey,
             (c_custkey * 7919) % {SPATIAL_GRID} AS x,
             (c_custkey * 104729) % {SPATIAL_GRID} AS y
      FROM customer
    ), s AS (
      SELECT s_suppkey AS suppkey,
             (s_suppkey * 7919) % {SPATIAL_GRID} AS x,
             (s_suppkey * 104729) % {SPATIAL_GRID} AS y
      FROM supplier
    )
    SELECT c.custkey, s.suppkey,
           (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
    FROM c JOIN s
      ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
         <= {SPATIAL_R} * {SPATIAL_R}
    """,
)
def join_spatial_grid(spark: SparkSession, d: str) -> DataFrame:
    """Grid-blocked spatial radius join — "which suppliers lie within
    R of each customer" on an integer coordinate plane (coordinates
    derived deterministically from the keys so the operator is
    value-checkable; in production they are real projected x/y). The
    classic scale shape for a spatial join without a spatial index:

    - each point maps to ONE grid cell of side R (cell = ⌊x/R⌋,⌊y/R⌋);
    - the smaller (supplier) side is replicated to its cell plus the 8
      neighbors (a bounded ×9 explode — any point within R of a
      customer must fall in one of those cells);
    - candidates come from an EQUI-join on the cell id (hash shuffle /
      broadcast, never an all-pairs theta join);
    - the exact integer squared-distance predicate filters candidates.

    The oracle states the PREDICATE (plain theta join — DuckDB is free
    to nested-loop 60k×400 rows); the Spark side is the blocked
    rewrite, so the value check certifies the rewrite produces exactly
    the predicate's pairs. Distance arithmetic is all-integer: no
    sqrt, no floats, bit-identical cross-engine."""
    cell = lambda v: F.floor(v / F.lit(SPATIAL_R)).cast("long")
    c = load(spark, d, "customer").select(
        F.col("c_custkey").alias("custkey"),
        ((F.col("c_custkey") * 7919) % SPATIAL_GRID).alias("x"),
        ((F.col("c_custkey") * 104729) % SPATIAL_GRID).alias("y"),
    )
    s = load(spark, d, "supplier").select(
        F.col("s_suppkey").alias("suppkey"),
        ((F.col("s_suppkey") * 7919) % SPATIAL_GRID).alias("sx"),
        ((F.col("s_suppkey") * 104729) % SPATIAL_GRID).alias("sy"),
    )
    neighbors = F.expr(
        "flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    s9 = s.select(
        "suppkey", "sx", "sy", F.explode(neighbors).alias("n")
    ).select(
        "suppkey",
        "sx",
        "sy",
        (cell(F.col("sx")) + F.col("n.dx")).alias("cx"),
        (cell(F.col("sy")) + F.col("n.dy")).alias("cy"),
    )
    cand = c.withColumn("cx", cell(F.col("x"))).withColumn(
        "cy", cell(F.col("y"))
    ).join(F.broadcast(s9), ["cx", "cy"])
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    return cand.where(d2 <= SPATIAL_R * SPATIAL_R).select(
        "custkey", "suppkey", d2.cast("long").alias("dist2")
    )


SPATIAL_KNN_K = 3


@register(
    "join_spatial_knn",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS custkey,
             (c_custkey * 7919) % {SPATIAL_GRID} AS x,
             (c_custkey * 104729) % {SPATIAL_GRID} AS y
      FROM customer
    ), s AS (
      SELECT s_suppkey AS suppkey,
             (s_suppkey * 7919) % {SPATIAL_GRID} AS x,
             (s_suppkey * 104729) % {SPATIAL_GRID} AS y
      FROM supplier
    ), cand AS (
      SELECT c.custkey, s.suppkey,
             (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
      FROM c JOIN s
        ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
           <= {SPATIAL_R} * {SPATIAL_R}
    )
    SELECT custkey, suppkey, dist2, CAST(rn AS INT) AS knn_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey
                                   ORDER BY dist2, suppkey) AS rn
      FROM cand
    ) WHERE rn <= {SPATIAL_KNN_K}
    """,
)
def join_spatial_knn(spark: SparkSession, d: str) -> DataFrame:
    """Bounded-radius k-nearest-neighbor spatial join — the K closest
    suppliers within R of each customer, the geo analogue of
    ``ann_cosine_topk``'s embedding top-k and the second member of
    the spatial family next to ``join_spatial_grid``'s radius join.
    Candidates come from the identical one-cell-plus-8-neighbors grid
    equi-join (bounded x9 replication of the small side, never an
    all-pairs theta join); ranking is a per-customer window over the
    RADIUS-FILTERED candidates only (a handful of rows each), with the
    all-integer (dist2, suppkey) order making rank — and the K-th-place
    boundary — deterministic cross-engine. row_number <= K compiles to
    WindowGroupLimit, so each group prunes to K rows BEFORE the final
    sort; customers with no supplier within R drop out (the contract:
    kNN-within-radius, the production shape — unbounded kNN needs ring
    expansion, which IVF multi-probe demonstrates for embeddings)."""
    cand = join_spatial_grid(spark, d)
    w = Window.partitionBy("custkey").orderBy("dist2", "suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SPATIAL_KNN_K)
        .select(
            "custkey",
            "suppkey",
            "dist2",
            F.col("rn").cast("int").alias("knn_rank"),
        )
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT r_name AS region,
           COUNT(*) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg(spark: SparkSession, d: str) -> DataFrame:
    """Ordered string aggregation — ANSI LISTAGG ... WITHIN GROUP
    (Spark 4's new ``listagg``; DuckDB's ``string_agg ... ORDER BY``):
    the report-friendly sibling of ``agg_collect_set_sorted``'s array
    form, and deterministic ONLY because the order clause is explicit
    (an unordered listagg hashes differently run to run — the trap
    this operator's test posture forbids). Per-group sort of a
    dim-sized member list; at scale the same statement over a
    high-cardinality key sorts within each hash partition only."""
    n = load(spark, d, "nation")
    r = load(spark, d, "region")
    return (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").cast("long").alias("n_nations"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations_csv"),
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS wt,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS totw
      FROM lineitem
    )
    SELECT l_returnflag AS grp,
           CAST(MAX(totw) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 2 * cumw >= totw THEN v END) AS weighted_median
    FROM w GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, d: str) -> DataFrame:
    """Exact weighted median per group — the robust middle of a
    quantity-weighted price distribution (each row counts for its
    integer weight, the definition inventory/price analytics use when
    a 1000-unit line must outweigh a 1-unit line): the smallest value
    whose running weight reaches half the group total (lower weighted
    median, a DISCRETE observed value — no interpolation, so both
    engines agree bit-for-bit). Weights accumulate as BIGINTs under an
    explicit (value, key) tiebreak; equal-value runs cannot change the
    selected value, only which physical row crosses the threshold.

    Scale: one window pass keyed by the group column (running weight +
    group total share the partitioning), then a group-sized aggregate —
    the fact table shuffles once, same posture as ``window_rolling_24h``."""
    li = load(spark, d, "lineitem")
    wt = F.col("l_quantity").cast("long")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum(wt).over(cum).alias("cumw"),
        F.sum(wt).over(tot).alias("totw"),
    )
    return w.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.max("totw").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cumw") >= F.col("totw"), F.col("v"))
        ).alias("weighted_median"),
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_shuffle_hash_hint(spark: SparkSession, d: str) -> DataFrame:
    """The SHUFFLE_HASH join strategy, forced by hint — the third
    physical equi-join next to ``join_broadcast_inner`` (no shuffle,
    build side must fit per executor) and ``join_sortmerge`` (two
    sorts, spillable): shuffle both sides, build a hash map from the
    smaller, NO sort on either side. At 100 TB it wins over SMJ when
    one side is far smaller than the other but too big to broadcast —
    you pay the shuffle anyway and skip both sorts; the trade is that
    the build side's per-partition slice must fit in memory (no
    graceful sort-spill), which is why it is hint-gated rather than
    default. tests/test_plans.py pins ShuffledHashJoin in the physical
    plan so a silent fallback to SMJ fails loudly."""
    li = load(spark, d, "lineitem")
    o = load(spark, d, "orders").hint("SHUFFLE_HASH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey FROM supplier
    )
    """,
)
def set_intersect_all(spark: SparkSession, d: str) -> DataFrame:
    """INTERSECT ALL — bag-semantics intersection (each value keeps
    min(multiplicity_left, multiplicity_right) copies), completing the
    ANSI set-operator family next to ``set_intersect`` (distinct) and
    ``set_except_all``: the multiset overlap a reconciliation needs
    when duplicate rows are themselves the signal (how many customer
    slots per nation ALSO have a supplier slot, pairing one-for-one).
    Spark plans ``intersectAll`` as one aggregate computing both
    per-key counts + a generate replaying min(l, r) copies — one
    shuffle, never a join.

    Scale: both sides shuffle once on the compare key; multiplicity
    replay is in-row generation, no pair expansion."""
    c = load(spark, d, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, d, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "agg_boolean_family",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 400) AS any_large,
           CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_100,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_boolean_family(spark: SparkSession, d: str) -> DataFrame:
    """ANSI boolean aggregates — ``every``/``any`` (SQL:1999
    EVERY/ANY, a.k.a. bool_and/bool_or) and ``count_if`` — the
    assertion layer of a data-quality scan ("are ALL values positive,
    did ANY breach the threshold, how many exceeded the SLA") without
    the CASE-sum circumlocution. Each compiles to a map-side-combinable
    partial (AND/OR/count are all associative+commutative), so the
    whole family finishes in one grouped exchange.

    Scale: one shuffle on the group key; booleans merge as single
    bits — the cheapest aggregates in the engine."""
    e = load(spark, d, "events")
    return e.groupBy("event_type").agg(
        F.every(F.col("value") > 0).alias("all_positive"),
        F.some(F.col("value") > 400).alias("any_large"),
        F.count_if(F.col("value") > 100).cast("long").alias("n_over_100"),
        F.count("*").cast("long").alias("n"),
    )


@register(
    "agg_conditional_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT CASE WHEN value > 250 THEN user_id END)
             AS n_heavy_users,
           ROUND(CAST(COUNT(DISTINCT CASE WHEN value > 250
                                          THEN user_id END) AS DOUBLE)
                 / COUNT(DISTINCT user_id), 6) AS heavy_share
    FROM events GROUP BY event_type
    """,
)
def agg_conditional_distinct(spark: SparkSession, d: str) -> DataFrame:
    """Conditional COUNT(DISTINCT) — distinct users overall vs
    distinct users satisfying a predicate, in ONE grouped pass (the
    reporting idiom behind every "active vs engaged" ratio): the CASE
    inside the DISTINCT maps non-qualifying rows to NULL, which
    COUNT(DISTINCT) ignores, so no second scan and no self-join.
    Spark plans multiple DISTINCT aggregates over the same child with
    one Expand (each row replicated per distinct-group) — one shuffle
    total; the oracle is the identical ANSI text.

    Scale: Expand doubles the shuffled rows (2 distinct specs) but
    keys stay (event_type, user_id)-grained — far cheaper than two
    scans at 100 TB."""
    e = load(spark, d, "events")
    heavy = F.count_distinct(
        F.when(F.col("value") > 250, F.col("user_id"))
    )
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        heavy.alias("n_heavy_users"),
        F.round(
            heavy.cast("double") / F.count_distinct("user_id"), 6
        ).alias("heavy_share"),
    )


@register(
    "agg_distinct_arithmetic",
    oracle="""
    SELECT l_returnflag AS grp,
           CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
             AS sum_distinct_qty,
           ROUND(AVG(DISTINCT CAST(l_quantity AS BIGINT)), 6)
             AS avg_distinct_qty,
           COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS n_distinct_qty,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_all
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_arithmetic(spark: SparkSession, d: str) -> DataFrame:
    """DISTINCT-qualified arithmetic aggregates (SUM/AVG/COUNT
    DISTINCT side by side with the plain SUM) — the ANSI surface
    behind "sum each distinct fee once" billing logic, and a planner
    exercise: Spark evaluates mixed distinct/non-distinct aggregates
    over one child with a single Expand (each row replicated per
    distinct group), not one scan per aggregate. Quantities are
    integer-valued, so SUM/COUNT are exact and AVG is one terminal
    division.

    Scale: the Expand doubles shuffled rows but keys stay
    (flag, qty)-grained — one exchange however many DISTINCT specs."""
    li = load(spark, d, "lineitem")
    q = F.col("l_quantity").cast("long")
    return li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.sum_distinct(q).cast("long").alias("sum_distinct_qty"),
        F.round(F.sum_distinct(q) / F.count_distinct(q), 6).alias(
            "avg_distinct_qty"
        ),
        F.count_distinct(q).alias("n_distinct_qty"),
        F.sum(q).cast("long").alias("sum_all"),
    )


@register(
    "agg_bitmap_rollup",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_months
      FROM orders GROUP BY o_orderstatus
    ), d AS (
      SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs
      FROM orders GROUP BY o_orderstatus
    )
    SELECT m.o_orderstatus, CAST(n_months AS BIGINT) AS n_months,
           CAST(n_custs AS BIGINT) AS n_custs
    FROM m JOIN d ON m.o_orderstatus = d.o_orderstatus
    """,
)
def agg_bitmap_rollup(spark: SparkSession, d: str) -> DataFrame:
    """MERGEABLE exact-distinct rollup — the property that makes
    bitmap distinct (``agg_bitmap_distinct``) a warehouse primitive
    rather than a parlor trick: per-(status, month, bucket) bitmaps
    are built ONCE at the fine grain, then the coarser status-level
    distinct comes from OR-merging those same bitmaps
    (``bitmap_or_agg``) — never re-touching the fact table. The
    oracle states the straight COUNT(DISTINCT) at the coarse grain,
    so a hash match PROVES merge(OR) loses nothing — the exact-
    distinct analogue of agg_incremental's re-aggregation contract,
    and the plan shape a 100 TB daily-refresh pipeline needs (daily
    bitmap partials persisted, every rollup level reads partials).

    Scale: one fact-table pass to fine-grain bitmaps (shuffle payload
    = <=4 KB bitmap per group-bucket, not raw keys); the rollup
    shuffles only bitmaps; popcounts finish per group."""
    o = load(spark, d, "orders")
    fine = o.groupBy(
        "o_orderstatus",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
            "bm"
        )
    )
    merged = fine.groupBy("o_orderstatus", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm"),
        F.countDistinct("month").alias("n_months_bucket"),
    )
    months = fine.groupBy("o_orderstatus").agg(
        F.countDistinct("month").alias("n_months")
    )
    custs = merged.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_custs")
    )
    return months.join(custs, "o_orderstatus").select(
        "o_orderstatus",
        F.col("n_months").cast("long").alias("n_months"),
        "n_custs",
    )


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value,
           first_value(CASE WHEN event_type = 'purchase' THEN value END
                       IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
             AS first_purchase_value
    FROM events
    """,
)
def window_ignore_nulls(spark: SparkSession, d: str) -> DataFrame:
    """IGNORE NULLS window navigation — the forward-fill primitive
    stated declaratively: sparse per-user purchase values (NULL on
    every other event) carried forward with last_value(... IGNORE
    NULLS) over a running frame, plus the partition-wide first
    purchase via first_value over an unbounded frame. This is THE
    standard last-observation-carried-forward idiom (ticks, sensor
    state, dimension attributes sparse in a fact stream) — without
    IGNORE NULLS it takes a self-join or a two-pass gap-fill
    (``window_gap_fill`` builds exactly this from parts; here it is
    one operator). NULL rows stay NULL until a user's first purchase
    — semantics, not data loss.

    Scale: both windows share one user-keyed exchange+sort;
    WholeStageCodegen keeps the frame evaluation JVM-side."""
    val = F.when(F.col("event_type") == "purchase", F.col("value"))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load(spark, d, "events").select(
        "event_id",
        "user_id",
        F.last(val, ignorenulls=True)
        .over(w_run)
        .alias("last_purchase_value"),
        F.first(val, ignorenulls=True)
        .over(w_all)
        .alias("first_purchase_value"),
    )


#: binned big-x-big range join: bin width (and window) in seconds
RANGE_BIN_SEC = 300


@register(
    "join_range_binned",
    oracle=f"""
    WITH p AS (
      SELECT ts FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT event_id, event_type, ts FROM events
    ), joined AS (
      SELECT e.event_id, e.event_type, COUNT(p.ts) AS nearby
      FROM e LEFT JOIN p
        ON p.ts > e.ts - INTERVAL '{RANGE_BIN_SEC} seconds'
       AND p.ts < e.ts
      GROUP BY e.event_id, e.event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(nearby) AS BIGINT) AS total_nearby,
           ROUND(CAST(SUM(nearby) AS DOUBLE) / COUNT(*), 6)
             AS mean_nearby
    FROM joined GROUP BY event_type
    """,
)
def join_range_binned(spark: SparkSession, d: str) -> DataFrame:
    """BIG-x-BIG range join via TIME BINNING — the batch pattern for
    a non-equi time-proximity join when NEITHER side broadcasts (the
    1-D analogue of ``join_spatial_grid``, and the batch twin of the
    stream-stream interval join): count, for every event, the
    purchases (any user) in the preceding {RANGE_BIN_SEC}s. A naive
    theta join is a cartesian shuffle; instead both sides key on
    floor(epoch/{RANGE_BIN_SEC}) bins — the probe side duplicates
    into its own and the PREVIOUS bin (a preceding-window match can
    only live in those two) — making the join a plain EQUI-join on the bin
    key, with the exact interval predicate refining inside each bin
    pair. Equi-shuffle + bounded in-bin refinement replaces the
    cartesian: fan-out is 2x the probe side, and bin width tunes the
    shuffle-vs-refinement trade.

    The oracle states the naive range join declaratively — a hash
    match proves the binned rewrite is semantics-preserving
    (left-join zero counts included via the bin containing the event
    itself).

    Scale: two narrow projections, one equi-shuffle on the bin key,
    per-bin refinement bounded by bin population (skewed hot bins
    split by widening to (bin, salt) exactly like ``join_salted``);
    the census is a |types|-row rollup."""
    ev = load(spark, d, "events")
    bin_col = F.floor(F.col("ts").cast("long") / RANGE_BIN_SEC)
    probes = ev.select(
        "event_id",
        "event_type",
        F.col("ts").alias("e_ts"),
        F.explode(
            F.array(bin_col.cast("long"), (bin_col - 1).cast("long"))
        ).alias("bin"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), bin_col.cast("long").alias("bin")
    )
    hits = (
        probes.join(purchases, "bin")
        .where(
            (F.col("p_ts") > F.col("e_ts") - F.expr(f"INTERVAL {RANGE_BIN_SEC} SECONDS"))
            & (F.col("p_ts") < F.col("e_ts"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("nearby"))
    )
    joined = (
        ev.select("event_id", "event_type")
        .join(hits, "event_id", "left")
        .select(
            "event_type", F.coalesce("nearby", F.lit(0)).alias("nearby")
        )
    )
    return joined.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("nearby").cast("long").alias("total_nearby"),
        F.round(
            F.sum("nearby").cast("double") / F.count("*"), 6
        ).alias("mean_nearby"),
    )


@register(
    "agg_herfindahl",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS n
      FROM events GROUP BY event_type, user_id
    ), m AS (
      SELECT event_type,
             CAST(SUM(n) AS DOUBLE) AS total,
             CAST(SUM(n * n) AS DOUBLE) AS f2,
             COUNT(*) AS n_users
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_users AS BIGINT) AS n_users,
           ROUND(f2 / (total * total), 6) AS hhi,
           ROUND((total * total) / f2, 6) AS effective_users
    FROM m
    """,
)
def agg_herfindahl(spark: SparkSession, d: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per feed — HHI =
    Sigma share_u^2 over each user's share of the feed's events, and its
    reciprocal, the EFFECTIVE number of contributors (the
    inverse-Simpson diversity): 150 nominal users but
    effective_users = 12 means a dozen accounts dominate the feed —
    the concentration lens ``agg_gini`` (inequality) and
    ``skew_key_profile`` (join planning) each approximate from their
    own angle, and the number that decides whether per-user salting
    is needed. Computed from exact integer moments (Sigma c, Sigma c^2), one
    double division at the end.

    Scale: two cascaded groupBys — (type, user) then type; both
    map-side combinable, no window, no distinct expansion."""
    c = (
        load(spark, d, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
    )
    m = c.groupBy("event_type").agg(
        F.sum("n").cast("double").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("f2"),
        F.count("*").alias("n_users"),
    )
    return m.select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("f2") / (F.col("total") * F.col("total")), 6).alias(
            "hhi"
        ),
        F.round(
            (F.col("total") * F.col("total")) / F.col("f2"), 6
        ).alias("effective_users"),
    )


#: trimmed mean: fraction dropped from EACH tail
TRIM_FRAC = 0.05


@register(
    "agg_trimmed_mean",
    oracle=f"""
    WITH ranked AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*)
             AS trimmed_mean
    FROM ranked
    WHERE rn > CAST(ceil({TRIM_FRAC} * n) AS BIGINT)
      AND rn <= n - CAST(ceil({TRIM_FRAC} * n) AS BIGINT)
    GROUP BY l_returnflag
    """,
)
def agg_trimmed_mean(spark: SparkSession, d: str) -> DataFrame:
    """TRIMMED MEAN — the robust location estimate between the mean
    (outlier-hostage) and the median (throws away 98% of the data):
    drop the lowest and highest {TRIM_FRAC:.0%} by rank (deterministic
    total order: value, then the unique line key breaks ties so both
    engines trim the IDENTICAL rows), average the rest through a
    DECIMAL sum. The estimator dashboards should use for revenue-per-
    order style metrics where one whale or one refund otherwise moves
    the headline.

    Scale: one rank window per group key (hash-partitioned by
    l_returnflag — no global sort), one aggregate over the kept
    band."""
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = load(spark, d, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    cut = F.ceil(TRIM_FRAC * F.col("n"))
    return (
        ranked.where((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
        .groupBy("l_returnflag")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_kept"),
            (F.sum("v").cast("double") / F.count("*")).alias(
                "trimmed_mean"
            ),
        )
    )


#: consistent-hash ring: nodes, virtual nodes per node, ring modulus
CH_NODES = ["node_a", "node_b", "node_c"]
CH_NEW_NODE = "node_d"
CH_VNODES = 8
CH_RING = 1_000_003


def _ring_sql(nodes: list) -> str:
    """DuckDB VALUES list of (node, ring position) vnode entries."""
    rows = ", ".join(
        f"('{n}', {DUCK_HASH60.format(x=repr(f'{n}#vn{v}'))} % {CH_RING})"
        for n in nodes
        for v in range(CH_VNODES)
    )
    return f"(VALUES {rows}) AS ring(node, pos)"


@register(
    "shard_consistent_hash",
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey AS k,
             {DUCK_HASH60.format(x="CAST(o_orderkey AS VARCHAR)")}
               % {CH_RING} AS kpos
      FROM orders
    ), a3 AS (
      SELECT k, kpos,
             COALESCE(
               MIN(CASE WHEN pos >= kpos THEN pos END),
               MIN(pos)) AS owner_pos
      FROM keys CROSS JOIN {_ring_sql(CH_NODES)}
      GROUP BY k, kpos
    ), own3 AS (
      -- MIN(node) GROUP BY k: if two vnodes ever hash to the same
      -- ring position the join would emit one row per colliding
      -- vnode; the Spark side deterministically takes the (pos, node)
      -- struct minimum, i.e. the lexicographically smallest node at
      -- the owning position — mirror that tie-break here
      SELECT k, MIN(node) AS owner3
      FROM a3 JOIN {_ring_sql(CH_NODES)}
        ON pos = owner_pos
      GROUP BY k
    ), a4 AS (
      SELECT k, kpos,
             COALESCE(
               MIN(CASE WHEN pos >= kpos THEN pos END),
               MIN(pos)) AS owner_pos
      FROM keys CROSS JOIN {_ring_sql(CH_NODES + [CH_NEW_NODE])}
      GROUP BY k, kpos
    ), own4 AS (
      SELECT k, MIN(node) AS owner4
      FROM a4 JOIN {_ring_sql(CH_NODES + [CH_NEW_NODE])}
        ON pos = owner_pos
      GROUP BY k
    )
    SELECT owner4 AS node,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(CASE WHEN owner3 <> owner4 THEN 1 END) AS BIGINT)
             AS n_moved_in,
           ROUND(CAST(COUNT(CASE WHEN owner3 <> owner4 THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS moved_share
    FROM own3 JOIN own4 USING (k)
    GROUP BY owner4
    """,
)
def shard_consistent_hash(spark: SparkSession, d: str) -> DataFrame:
    """CONSISTENT-HASH ring assignment + the minimal-movement audit —
    the data-placement discipline under every distributed KV/cache
    tier (and the right mental model for shard-stable incremental
    pipelines): {CH_VNODES} virtual nodes per physical node hash onto
    a {CH_RING}-point ring; a key belongs to the first vnode clockwise
    from its own hash. The op assigns every order key under the
    3-node ring AND under the ring with `{CH_NEW_NODE}` added, then
    reports per-node key counts and how many keys MOVED — the
    consistent-hashing guarantee says ~1/4 relocate (vs ~3/4 under
    mod-N rehash), and the audit makes that number exact. All
    positions are md5-derived integers (hash60 % ring), so both
    engines compute the identical ring.

    Scale: the ring is O(nodes x vnodes) and BROADCAST; assignment is
    one pass over the keys (argmin over 24/32 broadcast rows in-row);
    the movement join is keyed by the key itself."""
    def ring_df(nodes):
        rows = [
            (n, f"{n}#vn{v}") for n in nodes for v in range(CH_VNODES)
        ]
        df = spark.createDataFrame(rows, "node string, vn string")
        return df.select(
            "node", (hash60(F.col("vn")) % CH_RING).alias("pos")
        )

    def assign(keys, ring):
        carr = ring.agg(
            F.array_sort(F.collect_list(F.struct("pos", "node"))).alias(
                "ring"
            )
        )
        # first vnode clockwise: min pos >= kpos, else wrap to ring min
        clockwise = F.filter(
            F.col("ring"), lambda s: s.pos >= F.col("kpos")
        )
        owner = F.when(
            F.size(clockwise) > 0, F.element_at(clockwise, 1).node
        ).otherwise(F.element_at(F.col("ring"), 1).node)
        return keys.crossJoin(F.broadcast(carr)).select(
            "k", owner.alias("owner")
        )

    keys = load(spark, d, "orders").select(
        F.col("o_orderkey").alias("k"),
        (hash60(F.col("o_orderkey").cast("string")) % CH_RING).alias(
            "kpos"
        ),
    )
    own3 = assign(keys, ring_df(CH_NODES)).withColumnRenamed(
        "owner", "owner3"
    )
    own4 = assign(keys, ring_df(CH_NODES + [CH_NEW_NODE])).withColumnRenamed(
        "owner", "owner4"
    )
    j = own3.join(own4, "k")
    return j.groupBy(F.col("owner4").alias("node")).agg(
        F.count("*").cast("long").alias("n_keys"),
        F.count_if(F.col("owner3") != F.col("owner4"))
        .cast("long")
        .alias("n_moved_in"),
        F.round(
            F.count_if(F.col("owner3") != F.col("owner4")).cast("double")
            / F.count("*"),
            6,
        ).alias("moved_share"),
    )


#: measure columns for the one-pass correlation matrix, with the
#: per-column DECIMAL scale that keeps every pairwise product inside
#: int64 unscaled range in DuckDB (width-18 decimals multiply in
#: int64: a scale-6 price squares past 2^63 — measured overflow)
_CORR_COLS = [
    ("l_quantity", "decimal(18,2)"),
    ("l_extendedprice", "decimal(18,2)"),
    ("l_discount", "decimal(18,6)"),
    ("l_tax", "decimal(18,6)"),
]


def _corr_matrix_oracle() -> str:
    cols = _CORR_COLS
    sums = []
    for c, t in cols:
        sums.append(
            f"CAST(CAST(SUM(CAST({c} AS {t})) AS VARCHAR)"
            f" AS DOUBLE) AS s_{c}"
        )
        sums.append(
            f"CAST(CAST(SUM(CAST({c} AS {t})"
            f" * CAST({c} AS {t})) AS VARCHAR)"
            f" AS DOUBLE) AS ss_{c}"
        )
    for i, (a, ta) in enumerate(cols):
        for b, tb in cols[i + 1:]:
            sums.append(
                f"CAST(CAST(SUM(CAST({a} AS {ta})"
                f" * CAST({b} AS {tb})) AS VARCHAR)"
                f" AS DOUBLE) AS sp_{a}_{b}"
            )
    pair_rows = []
    for i, (a, _) in enumerate(cols):
        for b, _ in cols[i + 1:]:
            pair_rows.append(f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           ROUND((n * sp_{a}_{b} - s_{a} * s_{b})
                 / (sqrt(n * ss_{a} - s_{a} * s_{a})
                    * sqrt(n * ss_{b} - s_{b} * s_{b})), 6) AS corr
    FROM m""")
    return (
        "WITH m AS (SELECT COUNT(*) AS n, "
        + ", ".join(sums)
        + " FROM lineitem)"
        + "\nUNION ALL".join(pair_rows)
    )


@register("agg_corr_matrix", oracle=_corr_matrix_oracle())
def agg_corr_matrix(spark: SparkSession, d: str) -> DataFrame:
    """ONE-PASS pairwise CORRELATION MATRIX — all C(4,2)=6
    correlations between the lineitem measures from a SINGLE
    aggregate (4 sums + 4 sum-of-squares + 6 cross-products as exact
    DECIMAL moment partials), then the closed forms evaluate per
    pair: the feature-engineering screen ("which measures are
    redundant?") done the way a 100 TB table demands — one scan, not
    C(k,2) scans, and mergeable partials so shards/days roll up.
    Emitted long (col_a, col_b, corr) via an in-plan stack — the
    matrix's upper triangle.

    Scale: ONE fact pass, one 1-row moment state, the pair expansion
    is over that single row."""
    li = load(spark, d, "lineitem")
    cols = _CORR_COLS
    types = dict(cols)
    aggs = [F.count("*").alias("n")]
    for c, t in cols:
        dec = F.col(c).cast(t)
        aggs.append(F.sum(dec).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(dec * dec).cast("double").alias(f"ss_{c}"))
    for i, (a, ta) in enumerate(cols):
        for b, tb in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(a).cast(ta) * F.col(b).cast(tb))
                .cast("double")
                .alias(f"sp_{a}_{b}")
            )
    m = li.agg(*aggs)
    n = F.col("n")
    pairs = []
    for i, (a, _) in enumerate(cols):
        for b, _ in cols[i + 1:]:
            corr = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")) / (
                F.sqrt(n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * F.sqrt(n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(corr, 6).alias("corr"),
                )
            )
    return m.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.corr"
    )


@register(
    "set_union_by_name",
    oracle="""
    SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS amount,
           o_orderpriority AS priority, NULL AS ship_mode
    FROM orders WHERE o_orderkey % 41 = 0
    UNION ALL BY NAME
    SELECT l_orderkey AS k,
           CAST(l_extendedprice AS DOUBLE) AS amount,
           NULL AS priority, l_linestatus AS ship_mode
    FROM lineitem WHERE l_orderkey % 53 = 0
    """,
)
def set_union_by_name(spark: SparkSession, d: str) -> DataFrame:
    """UNION BY NAME with missing-column tolerance — the
    schema-evolution union: two feeds sharing a core schema but each
    carrying columns the other lacks combine by COLUMN NAME (never
    by position — positional UNION silently pairs mismatched columns
    the moment one side reorders), absent columns null-filling.
    This is how multi-source ingestion actually unions daily drops
    whose schemas drift at different speeds;
    ``unionByName(allowMissingColumns=True)`` is the DataFrame
    spelling, DuckDB's UNION ALL BY NAME the SQL twin.

    Scale: a zero-shuffle concatenation — each side keeps its own
    partitioning; the name resolution is analysis-time only."""
    a = (
        load(spark, d, "orders")
        .where(F.col("o_orderkey") % 41 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("amount"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    b = (
        load(spark, d, "lineitem")
        .where(F.col("l_orderkey") % 53 == 0)
        .select(
            F.col("l_orderkey").alias("k"),
            F.col("l_extendedprice").cast("double").alias("amount"),
            F.col("l_linestatus").alias("ship_mode"),
        )
    )
    return a.unionByName(b, allowMissingColumns=True)


# --- balanced range-partition split points -----------------------------

RANGE_SPLITS = 8  # target shard count for the writer layout


@register(
    "shard_range_splits",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey,
             NTILE({RANGE_SPLITS}) OVER (ORDER BY o_orderkey) AS shard
      FROM orders
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS lower_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS upper_key
    FROM t GROUP BY shard
    """,
)
def shard_range_splits(spark: SparkSession, d: str) -> DataFrame:
    """BALANCED RANGE-SPLIT computation — the split points a writer
    needs to lay a table out as {RANGE_SPLITS} equal-row key ranges
    (the planning step behind range-bucketed tables, HFile/SST region
    splits, and `repartitionByRange` with explicit boundaries): each
    shard's row count and inclusive [lower, upper] key bounds, exact,
    not sampled. Sampling-based splitters (what Spark's
    RangePartitioner does internally) drift on skewed keys; this is
    the exact-NTILE version a layout audit can assert against.

    Distributed exactness: the global NTILE comes from
    ``_global_ntile`` (range-shuffle → per-partition row_number →
    literal offsets; no single-partition sort anywhere), bit-identical
    to the oracle's NTILE({RANGE_SPLITS}) OVER (ORDER BY key) because
    o_orderkey is unique — a total order.

    Scale: one range exchange over the key column plus an
    O(#partitions) driver collect of partition counts — the same
    envelope as rfm_segmentation's distributed ranking."""
    from pro_etl_spark.ops.analytics import _global_ntile

    orders = load(spark, d, "orders").select("o_orderkey")
    tiled = _global_ntile(
        orders, RANGE_SPLITS, [F.col("o_orderkey")], key="o_orderkey"
    )
    return tiled.groupBy(F.col("_ntile").alias("shard")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("lower_key"),
        F.max("o_orderkey").cast("long").alias("upper_key"),
    )


# --- count-min sketch ---------------------------------------------------

CMS_DEPTH = 4   # independent hash rows
CMS_WIDTH = 64  # buckets per row — tiny on purpose so collisions are
                # visible and the overcount column actually exercises
                # the min-over-rows estimator at test scale


@register(
    "agg_count_min_sketch",
    oracle=f"""
    WITH cells AS (
      SELECT r.range AS cms_row,
             {DUCK_HASH60.format(
                 x="(event_type || ':cms:' || CAST(r.range AS VARCHAR))")}
               % {CMS_WIDTH} AS b,
             COUNT(*) AS c
      FROM events, range({CMS_DEPTH}) r
      GROUP BY 1, 2
    ), types AS (
      SELECT event_type, COUNT(*) AS true_cnt FROM events GROUP BY 1
    )
    SELECT t.event_type,
           CAST(t.true_cnt AS BIGINT) AS true_cnt,
           CAST(MIN(c.c) AS BIGINT) AS cms_estimate,
           CAST(MIN(c.c) - t.true_cnt AS BIGINT) AS overcount
    FROM types t
    JOIN cells c
      ON c.b = {DUCK_HASH60.format(
          x="(t.event_type || ':cms:' || CAST(c.cms_row AS VARCHAR))")}
             % {CMS_WIDTH}
    GROUP BY t.event_type, t.true_cnt
    """,
)
def agg_count_min_sketch(spark: SparkSession, d: str) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation — the streaming-sketch
    family's fourth member (HLL: distinct, bitmap: exact distinct,
    Bloom: membership; CMS: FREQUENCY): {CMS_DEPTH} hash rows ×
    {CMS_WIDTH} buckets of exact integer counts, point estimate =
    min over rows of the key's bucket count, never an undercount.
    The op builds the sketch AND audits it against the true counts
    (the `overcount` column is the collision error a production
    width/depth choice is sized by).

    The sketch build is ONE map-side-combinable groupBy of
    {CMS_DEPTH}×{CMS_WIDTH} cells — mergeable across partitions,
    shards, and days by cell-wise addition, which is the whole point
    of a CMS at 100 TB (the cells table IS the mergeable state).
    Hashes are the portable md5-60bit recipe, so the sketch is
    bit-identical in both engines.

    Scale: fact pass → 256-row cell table (broadcast); the estimate
    join touches only the distinct-key table."""
    ev = load(spark, d, "events")
    rows = ev.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias(
            "cms_row"
        ),
    )
    bucket = (
        hash60(
            F.concat(
                F.col("event_type"),
                F.lit(":cms:"),
                F.col("cms_row").cast("string"),
            )
        )
        % CMS_WIDTH
    )
    cells = rows.groupBy("cms_row", bucket.alias("b")).agg(
        F.count("*").alias("c")
    )
    types = ev.groupBy("event_type").agg(F.count("*").alias("true_cnt"))
    tb = (
        hash60(
            F.concat(
                F.col("event_type"),
                F.lit(":cms:"),
                F.col("cms_row").cast("string"),
            )
        )
        % CMS_WIDTH
    )
    est = types.join(
        F.broadcast(cells), tb == F.col("b")
    )
    return est.groupBy("event_type", "true_cnt").agg(
        F.min("c").cast("long").alias("cms_estimate"),
        (F.min("c") - F.col("true_cnt")).cast("long").alias("overcount"),
    ).select(
        "event_type",
        F.col("true_cnt").cast("long").alias("true_cnt"),
        "cms_estimate",
        "overcount",
    )


# --- rolling z-score ----------------------------------------------------

ZSCORE_LOOKBACK = 6  # trailing frame: 6 preceding rows, current excluded


@register(
    "window_rolling_zscore",
    oracle=f"""
    WITH fr AS (
      SELECT event_id, user_id, value,
             COUNT(*) OVER w AS n,
             SUM(CAST(value AS DECIMAL(18,6))) OVER w AS sx,
             SUM(CAST(value AS DECIMAL(18,6))
                 * CAST(value AS DECIMAL(18,6))) OVER w AS sxx
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING
                            AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(n AS BIGINT) AS n_window,
           CASE WHEN n >= 2
                 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN ROUND(
                  (value - CAST(sx AS DOUBLE) / n)
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         / (CAST(n AS DOUBLE) * (n - 1))), 6)
           END AS zscore
    FROM fr
    """,
)
def window_rolling_zscore(spark: SparkSession, d: str) -> DataFrame:
    """ROLLING Z-SCORE — each event's value standardized against the
    user's own trailing {ZSCORE_LOOKBACK}-row window (current row
    EXCLUDED, so the point never dilutes its own baseline): the
    mean-based complement to ``window_hampel``'s median filter and
    the windowed version of ``agg_zscore_outliers``' global score —
    the per-point anomaly feature fraud models consume. NULL until
    two baseline points exist or when the window is constant.

    Exactness: Σx and Σx² ride DECIMAL inside the frame (exact,
    order-independent); the sample-variance closed form
    (n·Σx² − (Σx)²)/(n(n−1)) is evaluated once in double; sqrt is
    IEEE correctly-rounded hence portable (agg_corr discipline).

    Scale: one user-keyed shuffle, bounded 7-row frame state."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    vdec = F.col("value").cast("decimal(18,6)")
    fr = load(spark, d, "events").select(
        "event_id",
        "user_id",
        "value",
        F.count("*").over(w).alias("n"),
        F.sum(vdec).over(w).alias("sx"),
        F.sum(vdec * vdec).over(w).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    disc = n * sxx - sx * sx
    z = F.round(
        (F.col("value") - sx / F.col("n"))
        / F.sqrt(disc / (n * (F.col("n") - 1))),
        6,
    )
    return fr.select(
        "event_id",
        "user_id",
        F.col("n").cast("long").alias("n_window"),
        F.when((F.col("n") >= 2) & (disc > 0), z).alias("zscore"),
    )


@register(
    "agg_variance_merge",
    oracle="""
    WITH v AS (
      SELECT event_id % 8 AS shard,
             CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), s0 AS (
      SELECT shard, COUNT(*) AS n,
             SUM(CAST(v AS DECIMAL(38,0))) AS s1,
             SUM(CAST(v AS DECIMAL(38,0)) * v) AS s2
      FROM v GROUP BY shard
    ), s AS (
      -- scaffold ALL 8 shards: an absent (empty) shard is the
      -- Chan-merge identity (n=0, Σv=0, Σv²=0), so the f0..f7 ladder
      -- below never loses its row when a shard has no events — the
      -- empty/small-corpus divergence class test_global_agg_empty_parity
      -- pins for the other global aggregates
      SELECT g.shard, COALESCE(s0.n, 0) AS n,
             COALESCE(s0.s1, CAST(0 AS DECIMAL(38,0))) AS s1,
             COALESCE(s0.s2, CAST(0 AS DECIMAL(38,0))) AS s2
      FROM (SELECT unnest(range(0, 8)) AS shard) g
      LEFT JOIN s0 ON s0.shard = g.shard
    ), m AS (
      SELECT shard, n,
             CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(s1 AS DOUBLE) / n END AS mean,
             CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n)
                  END AS m2
      FROM s
    ), tot AS (
      SELECT SUM(n) AS tn,
             CAST(SUM(s1) AS DOUBLE) AS ts1,
             CAST(SUM(s2) AS DOUBLE) AS ts2
      FROM s
    ), f0 AS (
      -- the init-merge step, spelled with the SAME formula so the
      -- FP ops match Spark's fold seed exactly (mean*n/n is not a
      -- guaranteed identity in IEEE arithmetic). GREATEST(n, 1)
      -- totalizes the division: when the merged count is 0 the
      -- numerator is already exactly 0, so /1 keeps the identity —
      -- and when it is ≥1 the divisor is bit-identical to before
      SELECT 0 + m.n AS n,
             CAST(0 AS DOUBLE) + (m.mean - 0) * m.n
               / GREATEST(0 + m.n, 1) AS mean,
             CAST(0 AS DOUBLE) + m.m2 + (m.mean - 0) * (m.mean - 0)
               * 0 * m.n / GREATEST(0 + m.n, 1) AS m2
      FROM m WHERE shard = 0
    )
    , f1 AS (
      SELECT f0.n + m.n AS n,
             f0.mean + (m.mean - f0.mean) * m.n
               / GREATEST(f0.n + m.n, 1) AS mean,
             f0.m2 + m.m2 + (m.mean - f0.mean)
               * (m.mean - f0.mean) * f0.n * m.n
               / GREATEST(f0.n + m.n, 1) AS m2
      FROM f0, m WHERE m.shard = 1
    )
    , f2 AS (
      SELECT f1.n + m.n AS n,
             f1.mean + (m.mean - f1.mean) * m.n
               / GREATEST(f1.n + m.n, 1) AS mean,
             f1.m2 + m.m2 + (m.mean - f1.mean)
               * (m.mean - f1.mean) * f1.n * m.n
               / GREATEST(f1.n + m.n, 1) AS m2
      FROM f1, m WHERE m.shard = 2
    )
    , f3 AS (
      SELECT f2.n + m.n AS n,
             f2.mean + (m.mean - f2.mean) * m.n
               / GREATEST(f2.n + m.n, 1) AS mean,
             f2.m2 + m.m2 + (m.mean - f2.mean)
               * (m.mean - f2.mean) * f2.n * m.n
               / GREATEST(f2.n + m.n, 1) AS m2
      FROM f2, m WHERE m.shard = 3
    )
    , f4 AS (
      SELECT f3.n + m.n AS n,
             f3.mean + (m.mean - f3.mean) * m.n
               / GREATEST(f3.n + m.n, 1) AS mean,
             f3.m2 + m.m2 + (m.mean - f3.mean)
               * (m.mean - f3.mean) * f3.n * m.n
               / GREATEST(f3.n + m.n, 1) AS m2
      FROM f3, m WHERE m.shard = 4
    )
    , f5 AS (
      SELECT f4.n + m.n AS n,
             f4.mean + (m.mean - f4.mean) * m.n
               / GREATEST(f4.n + m.n, 1) AS mean,
             f4.m2 + m.m2 + (m.mean - f4.mean)
               * (m.mean - f4.mean) * f4.n * m.n
               / GREATEST(f4.n + m.n, 1) AS m2
      FROM f4, m WHERE m.shard = 5
    )
    , f6 AS (
      SELECT f5.n + m.n AS n,
             f5.mean + (m.mean - f5.mean) * m.n
               / GREATEST(f5.n + m.n, 1) AS mean,
             f5.m2 + m.m2 + (m.mean - f5.mean)
               * (m.mean - f5.mean) * f5.n * m.n
               / GREATEST(f5.n + m.n, 1) AS m2
      FROM f5, m WHERE m.shard = 6
    )
    , f7 AS (
      SELECT f6.n + m.n AS n,
             f6.mean + (m.mean - f6.mean) * m.n
               / GREATEST(f6.n + m.n, 1) AS mean,
             f6.m2 + m.m2 + (m.mean - f6.mean)
               * (m.mean - f6.mean) * f6.n * m.n
               / GREATEST(f6.n + m.n, 1) AS m2
      FROM f6, m WHERE m.shard = 7
    )
    SELECT CAST(f7.n AS BIGINT) AS n,
           ROUND(f7.mean / 1000000.0, 6) AS mean_merged,
           CASE WHEN f7.n < 2 THEN CAST(0 AS DOUBLE)
                ELSE ROUND(f7.m2 / (f7.n - 1) / 1000000000000.0, 6)
                END AS var_merged,
           CASE WHEN tn < 2 THEN CAST(0 AS DOUBLE)
                ELSE ROUND((ts2 - ts1 * (ts1 / tn)) / (tn - 1)
                           / 1000000000000.0, 6)
                END AS var_direct,
           CASE WHEN f7.n < 2 OR tn < 2 THEN CAST(0 AS DOUBLE)
                ELSE ROUND(ABS(f7.m2 / (f7.n - 1) / 1000000000000.0
                               - (ts2 - ts1 * (ts1 / tn)) / (tn - 1)
                                 / 1000000000000.0), 6)
                END AS abs_diff
    FROM f7 CROSS JOIN tot
    """,
)
def agg_variance_merge(spark: SparkSession, d: str) -> DataFrame:
    """PARALLEL-VARIANCE MERGE (Chan et al.) — the mergeable-aggregate
    algebra every distributed engine runs under the hood, surfaced and
    AUDITED: compute per-shard (n, mean, M2), fold the shards pairwise
    with the Chan update (mean ← meanA + δ·nB/n, M2 ← M2A + M2B +
    δ²·nA·nB/n), and compare against the direct sum-of-squares
    variance. The abs_diff column is the numerical-stability audit —
    the reason engines merge M2 instead of summing x² at scale. This
    is the algebra that makes ``agg_moments``/``agg_incremental``
    shard-safe; here it is exercised end to end with a deterministic
    8-shard split.

    Exactness: per-shard n/Σv/Σv² are exact integer (DECIMAL) sums of
    micro-quantized values; every derived double comes from the same
    exact integers through the same textual IEEE expression; the fold
    runs in shard order (sorted struct array), so both engines execute
    the identical 8-step merge.

    Scale: one map-side-combinable shard census (8 rows), then an
    in-row fold over the sorted 8-struct array — the merge itself is
    corpus-size-independent, which is the entire point.

    Empty-shard parity: all 8 shards are SCAFFOLDED (an absent shard
    joins in as the Chan identity n=0, Σv=0, Σv²=0) and every fold
    division is totalized with GREATEST(n, 1) — when the merged count
    is 0 the numerator is exactly 0 so /1 preserves the identity, and
    when it is ≥1 the divisor is bit-identical to the unguarded form.
    Without the scaffold the oracle's f0..f7 CTE ladder loses its row
    the moment any event_id%8 shard is empty while the Spark fold
    skips absent shards — a cross-engine split on empty/small corpora
    (the test_global_agg_empty_parity class)."""
    ev = load(spark, d, "events")
    v = ev.select(
        (F.col("event_id") % 8).alias("shard"),
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    s0 = v.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v")).alias("s2"),
    )
    grid = spark.range(8).select(F.col("id").alias("shard"))
    s = grid.join(s0, "shard", "left").select(
        "shard",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        F.coalesce(F.col("s1"), F.lit(0).cast("decimal(38,0)")).alias("s1"),
        F.coalesce(F.col("s2"), F.lit(0).cast("decimal(38,0)")).alias("s2"),
    )
    zero_d = F.lit(0).cast("double")
    m = s.select(
        "shard",
        "n",
        "s1",
        "s2",
        F.when(F.col("n") == 0, zero_d)
        .otherwise(F.col("s1").cast("double") / F.col("n"))
        .alias("mean"),
        F.when(F.col("n") == 0, zero_d)
        .otherwise(
            F.col("s2").cast("double")
            - F.col("s1").cast("double")
            * (F.col("s1").cast("double") / F.col("n"))
        )
        .alias("m2"),
    )
    packed = m.agg(
        F.array_sort(
            F.collect_list(F.struct("shard", "n", "mean", "m2"))
        ).alias("l"),
        F.sum("n").alias("tn"),
        F.sum("s1").cast("double").alias("ts1"),
        F.sum("s2").cast("double").alias("ts2"),
    )
    init = F.struct(
        F.lit(-1).cast("long").alias("shard"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("mean"),
        F.lit(0.0).alias("m2"),
    )
    acc = F.aggregate(
        F.col("l"),
        init,
        lambda a, b: F.struct(
            b["shard"].alias("shard"),
            (a["n"] + b["n"]).alias("n"),
            (
                a["mean"]
                + (b["mean"] - a["mean"]) * b["n"]
                / F.greatest(a["n"] + b["n"], F.lit(1).cast("long"))
            ).alias("mean"),
            (
                a["m2"]
                + b["m2"]
                + (b["mean"] - a["mean"])
                * (b["mean"] - a["mean"])
                * a["n"]
                * b["n"]
                / F.greatest(a["n"] + b["n"], F.lit(1).cast("long"))
            ).alias("m2"),
        ),
    )
    folded = packed.select("tn", "ts1", "ts2", acc.alias("acc"))
    var_merged = F.when(F.col("acc.n") < 2, zero_d).otherwise(
        F.round(
            F.col("acc.m2") / (F.col("acc.n") - 1) / 1000000000000.0, 6
        )
    )
    var_direct = F.when(F.col("tn") < 2, zero_d).otherwise(
        F.round(
            (F.col("ts2") - F.col("ts1") * (F.col("ts1") / F.col("tn")))
            / (F.col("tn") - 1)
            / 1000000000000.0,
            6,
        )
    )
    abs_diff = F.when(
        (F.col("acc.n") < 2) | (F.col("tn") < 2), zero_d
    ).otherwise(
        F.round(
            F.abs(
                F.col("acc.m2") / (F.col("acc.n") - 1) / 1000000000000.0
                - (F.col("ts2") - F.col("ts1") * (F.col("ts1") / F.col("tn")))
                / (F.col("tn") - 1)
                / 1000000000000.0
            ),
            6,
        )
    )
    return folded.select(
        F.col("acc.n").cast("long").alias("n"),
        F.round(F.col("acc.mean") / 1000000.0, 6).alias("mean_merged"),
        var_merged.alias("var_merged"),
        var_direct.alias("var_direct"),
        abs_diff.alias("abs_diff"),
    )
