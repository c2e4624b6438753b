"""Product-analytics operators over the event stream: ordered funnel
conversion and time-range rolling aggregates.

Both are staples of clickstream warehouses that the §2 window family
doesn't cover directly: the funnel needs ORDER-aware step matching
(a click only counts after the user's first view), the rolling
aggregate needs a TIME-range frame rather than a row frame.

Scale posture: every stage is keyed by user_id — the funnel's three
conditional aggregations and the rolling window all reuse one
partitioning of the events table, and each step's output is one row
per user (tiny), so the chained semi-joins broadcast naturally under
AQE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.ops.hashing import DUCK_HASH60, hash60
from pro_etl_spark.registry import register

DECV = "decimal(18,6)"


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.vt
      WHERE e.event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.ct
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT * FROM (
      SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_no,
             COUNT(*) AS n_users FROM v
      UNION ALL
      SELECT 'click', 2, COUNT(*) FROM c
      UNION ALL
      SELECT 'purchase', 3, COUNT(*) FROM p
    )
    """,
)
def funnel_conversion(spark: SparkSession, d: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a step only counts when
    it happens at-or-after the user's entry into the previous step
    (first qualifying timestamp carried forward), so out-of-order
    events never inflate conversion. Three conditional MIN aggregations
    chained by user-keyed joins — each intermediate is one row per
    user, broadcast-sized at any corpus scale."""
    ev = load(spark, d, "events")

    def first_after(step: str, prev: DataFrame, prev_ts: str, out: str) -> DataFrame:
        e = ev.where(F.col("event_type") == step)
        return (
            e.join(prev, "user_id")
            .where(F.col("ts") >= F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = first_after("click", v, "vt", "ct")
    p = first_after("purchase", c, "ct", "pt")

    def count_row(df: DataFrame, step: str, no: int) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(no).cast("long").alias("step_no"),
            F.count("*").alias("n_users"),
        )

    return (
        count_row(v, "view", 1)
        .unionByName(count_row(c, "click", 2))
        .unionByName(count_row(p, "purchase", 3))
    )


@register(
    "window_rolling_24h",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS value_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 24 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_24h(spark: SparkSession, d: str) -> DataFrame:
    """Time-range rolling aggregate: per user, the count and DECIMAL-
    exact value sum of all events in the trailing 24 hours. Spark's
    rangeBetween is numeric, so the order key is exact epoch
    MICROSECONDS (never truncated seconds) and the frame is
    [-24h_in_µs, 0] — identical to the oracle's INTERVAL range frame on
    microsecond timestamps. One shuffle on user_id, state bounded by
    the 24 h horizon — the batch twin of a watermarked sliding window."""
    day_us = 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-day_us, 0)
    )
    return load(spark, d, "events").select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_24h"),
        F.sum(F.col("value").cast(DECV)).over(w).cast("double").alias("value_24h"),
    )


HIST_BIN_WIDTH = 50_000


@register(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT)
             * {HIST_BIN_WIDTH} AS bin_lo,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, d: str) -> DataFrame:
    """Value histogram (fixed-width binning) — the profiling pass a
    pipeline runs before choosing filters/partitioning. floor-division
    binning is a pure projection, so the whole histogram is one
    map-side-combined aggregation; identical double division on both
    engines makes the bin assignment bit-stable."""
    o = load(spark, d, "orders")
    bin_ = F.floor(F.col("o_totalprice") / HIST_BIN_WIDTH).cast("long")
    return o.groupBy(
        bin_.alias("bin"), (bin_ * HIST_BIN_WIDTH).alias("bin_lo")
    ).agg(F.count("*").alias("n"))


@register(
    "agg_histogram_equidepth",
    oracle="""
    WITH b AS (
      SELECT quantile_disc(l_extendedprice, 0.25) AS b1,
             quantile_disc(l_extendedprice, 0.50) AS b2,
             quantile_disc(l_extendedprice, 0.75) AS b3
      FROM lineitem
    )
    SELECT CASE WHEN l_extendedprice <= b.b1 THEN 1
                WHEN l_extendedprice <= b.b2 THEN 2
                WHEN l_extendedprice <= b.b3 THEN 3
                ELSE 4 END AS bucket,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS lo,
           MAX(l_extendedprice) AS hi
    FROM lineitem, b
    GROUP BY 1
    """,
)
def agg_histogram_equidepth(spark: SparkSession, d: str) -> DataFrame:
    """Equi-DEPTH histogram (quartile buckets) — the companion to
    ``agg_histogram``'s equi-width binning and what an optimizer's
    column statistics actually store: boundaries are the exact
    discrete quartiles (``percentile_disc`` — value selection, no
    interpolation arithmetic to drift cross-engine), bucket assignment
    is a CASE over the broadcast 1-row boundary set, and the counts
    are one map-side-combined grouped pass. Bucket populations are
    near-equal by construction; ties at a boundary all fall left
    (<=), which keeps the bucketing deterministic without needing a
    row tiebreak. Two passes over the fact, zero fact-side shuffles
    beyond the final 4-group aggregate."""
    li = load(spark, d, "lineitem")
    b = li.agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("b1"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("b2"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("b3"),
    )
    v = F.col("l_extendedprice")
    bucket = (
        F.when(v <= F.col("b1"), 1)
        .when(v <= F.col("b2"), 2)
        .when(v <= F.col("b3"), 3)
        .otherwise(4)
    )
    return (
        li.crossJoin(F.broadcast(b))
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
        )
    )


@register(
    "fn_winsorize",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.05) AS lo,
             quantile_cont(l_quantity, 0.95) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           l.l_quantity,
           GREATEST(LEAST(l.l_quantity, b.hi), b.lo) AS quantity_w
    FROM lineitem l JOIN b USING (l_returnflag)
    """,
)
def fn_winsorize(spark: SparkSession, d: str) -> DataFrame:
    """Winsorization: clip each value to its group's [p5, p95] — the
    outlier-taming transform feature pipelines apply before scaling.
    Group bounds are one tiny aggregate (3 rows) broadcast back onto
    the fact table, so the clip pass stays shuffle-free on the fact
    side. Exactness note: quantiles interpolate over integral-valued
    l_quantity, so the bounds are exact binary fractions and the
    comparisons are bit-stable cross-engine (same caveat as
    ``agg_percentile``)."""
    li = load(spark, d, "lineitem")
    b = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.05)").alias("lo"),
        F.expr("percentile(l_quantity, 0.95)").alias("hi"),
    )
    return li.join(F.broadcast(b), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.greatest(F.least(F.col("l_quantity"), F.col("hi")), F.col("lo")).alias(
            "quantity_w"
        ),
    )


@register(
    "run_observed_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
    FROM events
    """,
)
def run_observed_metrics(spark: SparkSession, d: str) -> DataFrame:
    """Pipeline observability via ``Dataset.observe`` — data-quality
    metrics (row count, value total, error count) collected as a
    side-channel of a job that is already running, with ZERO extra
    passes: the accumulators ride the noop-sink write of the main
    DataFrame, where a naive metrics step would re-scan the table (at
    100 TB, a second multi-hour job). The oracle recomputes the same
    metrics as a standalone aggregate, proving the piggybacked
    accumulators are exact — DECIMAL-routed so even the float total
    merges order-independently across tasks."""
    from pyspark.sql import Observation

    obs = Observation("pipeline_metrics")
    ev = load(spark, d, "events")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast(DECV)).cast("double").alias("total_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_value"], m["n_errors"])],
        schema="n_rows bigint, total_value double, n_errors bigint",
    )


@register(
    "rollup_two_level",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def rollup_two_level(spark: SparkSession, d: str) -> DataFrame:
    """Hierarchical rollup reuse (the continuous-aggregate /
    hypertable-rollup pattern): the DAILY aggregate is computed from
    the HOURLY aggregate's partials, never from the raw events. At
    100 TB the hourly table is ~3-4 orders of magnitude smaller than
    the event stream, so every coarser granularity (day, week, month)
    costs |hourly| instead of |raw| — the reason warehouses persist the
    finest rollup and derive the rest. COUNT and DECIMAL-SUM partials
    are exactly mergeable, so the oracle's direct day-from-raw
    recompute must match bit-for-bit — proving the reuse loses
    nothing."""
    ev = load(spark, d, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DECV)).alias("v_partial"),
    )
    return (
        hourly.groupBy(
            F.col("hour").cast("date").alias("day"), F.col("event_type")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("v_partial").cast("double").alias("total_value"),
        )
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, d: str) -> DataFrame:
    """Exact weighted average — Σ(w·x)/Σw with BOTH sums routed
    through DECIMAL, then ONE double division at the end: the
    order-independent spelling of a ratio aggregate (a double-
    accumulated numerator would drift with partition order; a
    per-group ratio-of-exact-sums cannot). One map-side-combinable
    agg, same cost shape as a plain sum."""
    li = load(spark, d, "lineitem")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(dp * dq).cast("double") / F.sum(dq).cast("double")
        ).alias("wavg_price")
    )


@register(
    "window_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1 FROM events
    ),
    spine AS (
      SELECT t.event_type, s.h AS hour
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
                  FROM bounds) s
    )
    SELECT s.hour, s.event_type,
           COALESCE(h.n_events, 0) AS n_events,
           CAST(h.n_events IS NULL AS VARCHAR) AS was_gap
    FROM spine s LEFT JOIN hourly h
      ON s.hour = h.hour AND s.event_type = h.event_type
    """,
)
def window_gap_fill(spark: SparkSession, d: str) -> DataFrame:
    """Time-series gap filling (the date-spine pattern): a dense
    (hour × event_type) spine generated from the data's own bounds,
    left-joined against the sparse hourly aggregate so silent hours
    become explicit zero rows — the prerequisite for any rolling /
    anomaly metric downstream (a gap that stays missing silently skews
    every moving average over it). The spine is |hours|×|types| —
    thousands of rows per year regardless of corpus size — so it
    BROADCASTS into the join against the (already tiny) hourly
    aggregate; the raw events are touched exactly once, by the hourly
    rollup itself."""
    ev = load(spark, d, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("hour"), F.col("event_type")).agg(
        F.count("*").alias("n_events")
    )
    bounds = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    s, h = spine.alias("s"), hourly.alias("h")
    return (
        F.broadcast(s)
        .join(
            h,
            (F.col("s.hour") == F.col("h.hour"))
            & (F.col("s.event_type") == F.col("h.event_type")),
            "left",
        )
        .select(
            F.col("s.hour").alias("hour"),
            F.col("s.event_type").alias("event_type"),
            F.coalesce(F.col("h.n_events"), F.lit(0)).alias("n_events"),
            F.col("h.n_events").isNull().cast("string").alias("was_gap"),
        )
    )


@register(
    "window_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1 FROM events
    ),
    spine AS (
      SELECT t.event_type, s.h AS hour
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
                  FROM bounds) s
    ),
    filled AS (
      SELECT s.hour, s.event_type, h.n_events
      FROM spine s LEFT JOIN hourly h
        ON s.hour = h.hour AND s.event_type = h.event_type
    ),
    anchored AS (
      SELECT hour, event_type, n_events,
        last_value(n_events IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
        last_value(CASE WHEN n_events IS NOT NULL THEN hour END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_hour,
        first_value(n_events IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
        first_value(CASE WHEN n_events IS NOT NULL THEN hour END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_hour
      FROM filled
    )
    SELECT hour, event_type,
      CASE
        WHEN n_events IS NOT NULL THEN CAST(n_events AS DOUBLE)
        WHEN prev_val IS NULL THEN CAST(next_val AS DOUBLE)
        WHEN next_val IS NULL THEN CAST(prev_val AS DOUBLE)
        ELSE CAST(prev_val AS DOUBLE)
             + CAST(next_val - prev_val AS DOUBLE)
               * (CAST(epoch(hour) - epoch(prev_hour) AS DOUBLE)
                  / CAST(epoch(next_hour) - epoch(prev_hour) AS DOUBLE))
      END AS value_interp,
      CAST(n_events IS NULL AS VARCHAR) AS was_interpolated
    FROM anchored
    """,
)
def window_interpolate(spark: SparkSession, d: str) -> DataFrame:
    """Time-series linear interpolation over the gap-filled spine:
    missing hours get ``prev + (next-prev) * elapsed/gap`` between
    their nearest real observations (series edges fall back to the one
    available anchor). The anchor scan is the IGNORE NULLS idiom —
    ``last_value`` looking back, ``first_value`` looking forward — two
    frames over one partition sort, so the whole operator is a single
    shuffle on the series key regardless of gap length; no self-join,
    no per-gap iteration. The arithmetic is the same literal expression
    tree on both engines (exact-int anchors widened to double once), so
    the interpolated doubles are bit-identical."""
    ev = load(spark, d, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("hour"), F.col("event_type")).agg(
        F.count("*").alias("n_events")
    )
    bounds = ev.agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    s, h = spine.alias("s"), hourly.alias("h")
    filled = F.broadcast(s).join(
        h,
        (F.col("s.hour") == F.col("h.hour"))
        & (F.col("s.event_type") == F.col("h.event_type")),
        "left",
    ).select(
        F.col("s.hour").alias("hour"),
        F.col("s.event_type").alias("event_type"),
        F.col("h.n_events").alias("n_events"),
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_hour = F.when(F.col("n_events").isNotNull(), F.col("hour"))
    a = filled.select(
        "hour",
        "event_type",
        "n_events",
        F.last("n_events", ignorenulls=True).over(back).alias("prev_val"),
        F.last(known_hour, ignorenulls=True).over(back).alias("prev_hour"),
        F.first("n_events", ignorenulls=True).over(fwd).alias("next_val"),
        F.first(known_hour, ignorenulls=True).over(fwd).alias("next_hour"),
    )
    elapsed = (
        F.unix_timestamp("hour") - F.unix_timestamp("prev_hour")
    ).cast("double")
    gap = (
        F.unix_timestamp("next_hour") - F.unix_timestamp("prev_hour")
    ).cast("double")
    interp = (
        F.when(F.col("n_events").isNotNull(), F.col("n_events").cast("double"))
        .when(F.col("prev_val").isNull(), F.col("next_val").cast("double"))
        .when(F.col("next_val").isNull(), F.col("prev_val").cast("double"))
        .otherwise(
            F.col("prev_val").cast("double")
            + (F.col("next_val") - F.col("prev_val")).cast("double")
            * (elapsed / gap)
        )
    )
    return a.select(
        "hour",
        "event_type",
        interp.alias("value_interp"),
        F.col("n_events").isNull().cast("string").alias("was_interpolated"),
    )


@register(
    "agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(cnt AS BIGINT) AS n
    FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, d: str) -> DataFrame:
    """Exact per-group mode (most frequent value) with a deterministic
    tiebreak — count-group-by-both then a top-1 window over the
    GROUP-SIZED intermediate (|statuses × priorities| rows, not the
    fact table): the two-level shape that keeps exact mode cheap at
    any scale. Spark's own ``mode()`` aggregate is tiebreak-
    nondeterministic, so this spelling is also the reproducible one."""
    from pyspark.sql import Window

    counts = (
        load(spark, d, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").cast("long").alias("n"),
        )
    )


@register(
    "agg_corr",
    oracle="""
    WITH p AS (
      -- decimal partials are routed DECIMAL -> VARCHAR -> DOUBLE:
      -- DuckDB's direct DECIMAL->DOUBLE cast scales in double space
      -- and mis-rounds the last ulp once the unscaled value exceeds
      -- 2^53, while its string->double parse (like Spark's
      -- BigDecimal->double) is correctly rounded to nearest
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM p
    """,
)
def agg_corr(spark: SparkSession, d: str) -> DataFrame:
    """Pearson correlation from EXACT integer-moment partials: n, Σx,
    Σy, Σxy, Σx², Σy² accumulated in DECIMAL (order-independent), then
    ONE double evaluation of the closed form. Never the built-in
    ``corr()`` in a cross-engine or retry-sensitive pipeline: its
    streaming co-moment update is partition-order-dependent in the
    last ulps, so two runs of the same job can disagree. The partials
    are also mergeable — the same six numbers roll up across shards,
    days, or incremental refreshes (the agg_incremental pattern) with
    zero drift."""
    li = load(spark, d, "lineitem")
    dx = F.col("l_quantity").cast("decimal(18,2)")
    dy = F.col("l_extendedprice").cast("decimal(18,2)")
    p = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return p.select("l_returnflag", n.cast("long").alias("n"), corr.alias("corr_qty_price"))


#: columns profiled by ``profile_columns`` — mixed types to prove the
#: cast discipline (string / int64 / timestamp / double-via-DECIMAL)
_PROFILE_COLS = (
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_custkey", "o_custkey"),
    ("o_orderdate", "o_orderdate"),
    ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
)


@register(
    "profile_columns",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS col,
           COUNT(*) AS n_rows,
           COUNT({expr}) AS n_nonnull,
           COUNT(DISTINCT {expr}) AS n_distinct,
           CAST(MIN({expr}) AS VARCHAR) AS min_val,
           CAST(MAX({expr}) AS VARCHAR) AS max_val
    FROM orders
    """
        for name, expr in _PROFILE_COLS
    ),
)
def profile_columns(
    spark: SparkSession, d: str, approx: bool = False
) -> DataFrame:
    """Table profiler (ANALYZE-style data-quality summary): one row per
    profiled column with row/non-null/distinct counts and min/max, all
    from a SINGLE scan — the per-column measures are computed in one
    wide aggregate and pivoted long with ``stack``, never N passes.
    Doubles route through DECIMAL(18,2) so the stringified min/max
    renders identically in both engines.

    Scale: multiple exact COUNT(DISTINCT)s in one aggregate plan via
    Expand (scan replicated ×5 in the shuffle) — the exact-profile
    shape for daily-partition audits. ``approx=True`` is the 100 TB
    full-table variant: distinct counts come from DataSketches HLL
    (``hll_sketch_estimate(hll_sketch_agg(col, lgK=14))``) and the
    Expand disappears — one unreplicated pass, same output schema.
    Accuracy, measured: DataSketches is value-EQUAL to the exact
    profile at sf0.001 (every column ≤ 1500 distinct — pinned by
    tests/test_sketches.py), where ``approx_count_distinct``'s HLL++
    is already off-by-one at 150 distinct; above ~2k distinct the
    coupon estimator starts deviating (sf0.01: o_orderdate 2399 →
    2385, o_totalprice 14999 → 14934 — 0.4-0.6% low, inside the
    published bound), which is the normal sketch trade the variant
    exists to make. The registered key stays the exact variant.
    """
    o = load(spark, d, "orders").withColumn(
        "o_totalprice_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    spark_cols = {
        "o_orderstatus": "o_orderstatus",
        "o_orderpriority": "o_orderpriority",
        "o_custkey": "o_custkey",
        "o_orderdate": "o_orderdate",
        "o_totalprice": "o_totalprice_dec",
    }

    def nd(c: str):
        if approx:
            # the sketch takes int/bigint/string/binary only; cast
            # timestamps/decimals to their canonical string — an
            # injective mapping, so distinct counts are unchanged
            return F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(c).cast("string"), 14)
            )
        return F.countDistinct(c)

    aggs = [F.count("*").alias("n_rows")]
    for name, c in spark_cols.items():
        aggs += [
            F.count(c).alias(f"nn_{name}"),
            nd(c).alias(f"nd_{name}"),
            F.min(c).cast("string").alias(f"mn_{name}"),
            F.max(c).cast("string").alias(f"mx_{name}"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', nn_{name}, nd_{name}, mn_{name}, mx_{name}"
        for name in spark_cols
    )
    return wide.selectExpr(
        f"stack({len(spark_cols)}, {stack_args})"
        " AS (col, n_nonnull, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")


@register(
    "anomaly_mad",
    oracle="""
    WITH m AS (
      SELECT event_type, value,
             median(value) OVER (PARTITION BY event_type) AS med
      FROM events
    ), a AS (
      SELECT event_type, value, med, abs(value - med) AS adev,
             median(abs(value - med)) OVER (PARTITION BY event_type) AS mad
      FROM m
    )
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(MAX(med), 6) AS med,
           ROUND(MAX(mad), 6) AS mad,
           COUNT(*) FILTER (WHERE adev > 3 * mad) AS n_outliers
    FROM a GROUP BY event_type
    """,
)
def anomaly_mad(spark: SparkSession, d: str) -> DataFrame:
    """Robust outlier gate: median absolute deviation (MAD) per event
    type, flagging |value − median| > 3·MAD. The robust twin of
    ``agg_zscore_outliers`` — medians don't move when the outliers
    themselves get bigger, so the gate can't be dragged by what it's
    trying to catch.

    Scale: ONE shuffle on event_type; both median windows and the
    final aggregate reuse the same partitioning (zero extra
    exchanges). Exact percentiles sort within each partition — fine
    while any one group fits an executor (events-per-type here); for
    heavy-hitter groups at 100 TB swap ``approx_percentile``.
    """
    w = Window.partitionBy("event_type")
    med = F.expr("percentile(value, 0.5)").over(w)
    withmed = load(spark, d, "events").select(
        "event_type", "value", med.alias("med")
    )
    adev = F.abs(F.col("value") - F.col("med"))
    a = withmed.select(
        "event_type",
        "med",
        adev.alias("adev"),
        F.expr("percentile(abs(value - med), 0.5)").over(w).alias("mad"),
    )
    return a.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.max("med"), 6).alias("med"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.sum((F.col("adev") > 3 * F.col("mad")).cast("long")).alias(
            "n_outliers"
        ),
    )


# --- last-touch attribution ------------------------------------------

#: attribution lookback: a purchase credits the user's most recent
#: click at most this many minutes before it
ATTR_WINDOW_MIN = 30


@register(
    "funnel_attribution",
    oracle=f"""
    WITH ordered AS (
      SELECT event_id, user_id, ts, event_type, value,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS click_ts
      FROM events
    )
    SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts,
           -- DOUBLE on both sides: these columns are NULL when the
           -- trail is cold, and a nullable integer oracle column
           -- materializes as float64 through the driver's pandas path
           CAST(CASE WHEN click_ts >= ts - INTERVAL '{ATTR_WINDOW_MIN} minutes'
                     THEN click_id END AS DOUBLE) AS attributed_click_id,
           CAST(CASE WHEN click_ts >= ts - INTERVAL '{ATTR_WINDOW_MIN} minutes'
                     THEN floor(date_diff('second', click_ts, ts) / 60.0)
                END AS DOUBLE) AS minutes_since_click,
           CAST(value AS DOUBLE) AS revenue
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def funnel_attribution(spark: SparkSession, d: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the same user's
    most recent click within ATTR_WINDOW_MIN minutes (NULL attribution
    when the trail is cold) — the marketing-warehouse join that is
    really an as-of join inside one stream.

    Scale: ONE shuffle on user_id; both carry-forward columns share
    the identical window spec (same partition, order, frame), so they
    evaluate in a single Window operator pass — no self-join of events
    against events, which is how warehouses usually (quadratically)
    write this."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_click = F.col("event_type") == "click"
    ordered = load(spark, d, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("click_id"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts"),
    )
    fresh = F.col("click_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ATTR_WINDOW_MIN} MINUTES"
    )
    return ordered.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(fresh, F.col("click_id"))
        .cast("double")
        .alias("attributed_click_id"),
        F.when(
            fresh,
            F.floor(
                (
                    F.unix_timestamp("ts") - F.unix_timestamp("click_ts")
                ) / 60.0
            ),
        )
        .cast("double")
        .alias("minutes_since_click"),
        F.col("value").cast("double").alias("revenue"),
    )


# --- retention cohorts -----------------------------------------------


@register(
    "retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT e.user_id, c.cohort_day,
             date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM active GROUP BY cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, d: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first
    active day; each (cohort_day, day_offset) cell counts distinct
    users from that cohort active day_offset days later — the
    triangle behind every retention curve.

    Scale: cohort assignment is one map-combinable min() keyed by
    user_id; the activity join is keyed by the SAME user_id (the
    cohort table is per-user-tiny and AQE broadcast-eligible; on a
    shuffle plan it reuses the events partitioning), and the per-user
    distinct day set dedups before the final small cell aggregate —
    the 100 TB events table is shuffled once by user, never by cell."""
    ev = load(spark, d, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", F.col("day_offset").cast("long").alias("day_offset")).agg(
        F.count("*").cast("long").alias("n_active_users")
    )


# --- exponential smoothing -------------------------------------------

#: EWMA decay α = 1/2 and frame depth. α = 2^-1 makes every weight an
#: exact power of two, so weighting is exact SCALING in IEEE doubles
#: and the fixed-order fold below is bit-identical cross-engine — the
#: reason this α (not 0.3) anchors the value oracle. Other αs swap in
#: with the oracle demoted to a tolerance check.
EWMA_DEPTH = 16


@register(
    "window_ewma",
    oracle=f"""
    WITH framed AS (
      SELECT event_id, user_id, ts, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {EWMA_DEPTH - 1} PRECEDING
                                        AND CURRENT ROW) AS vals
      FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(len(vals) AS BIGINT) AS n_in_frame,
           ROUND(
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(list_reverse(vals),
                   (v, k) -> v * power(2.0, -(k - 1)))),
               (acc, x) -> acc + x)
             / (2.0 - power(2.0, -(len(vals) - 1))), 6) AS ewma
    FROM framed
    """,
)
def window_ewma(spark: SparkSession, d: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) over each
    user's event-value series, depth-limited to EWMA_DEPTH rows — the
    time-series smoothing pass a metrics pipeline runs before anomaly
    thresholds. Weights are normalized over the visible frame so the
    series starts unbiased (short frames average over what exists).

    Determinism: newest-first weights 2^-1, 2^-2, … are exact in IEEE
    doubles, the fold runs in one fixed (frame) order on both engines,
    and the normalizer 2 - 2^-(n-1) is exact — so the oracle is
    value-exact, not a tolerance check.

    Scale: ONE shuffle on user_id; the frame is bounded (EWMA_DEPTH
    rows), so state per row is constant — the distributed rewrite of a
    stateful scan that would otherwise serialize the stream."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_DEPTH - 1), Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    framed = load(spark, d, "events").select(
        "event_id", "user_id", "ts", vals.alias("vals")
    )
    n = F.size("vals")
    weighted = F.aggregate(
        F.zip_with(
            F.reverse(F.col("vals")),
            F.sequence(F.lit(0), n - 1),
            lambda v, k: v * F.pow(F.lit(2.0), -k.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.lit(2.0) - F.pow(F.lit(2.0), -(n - 1).cast("double"))
    return framed.select(
        "event_id",
        "user_id",
        "ts",
        n.cast("long").alias("n_in_frame"),
        F.round(weighted / norm, 6).alias("ewma"),
    )


# --- declarative data-quality expectations ---------------------------

#: (rule name, SQL predicate over orders) — a row VIOLATES the rule
#: when the predicate is false/null. The thresholds are deliberately
#: tight enough that real violations exist in the test corpus, so the
#: audit exercises non-zero paths.
_DQ_RULES = (
    ("custkey_not_null", "o_custkey IS NOT NULL"),
    ("totalprice_range", "o_totalprice BETWEEN 0 AND 400000"),
    ("status_domain", "o_orderstatus IN ('O', 'F')"),
    ("orderdate_bounds", "o_orderdate < TIMESTAMP '2001-01-01 00:00:00'"),
)


@register(
    "dq_expectations",
    oracle="""
    SELECT * FROM (
    """
    + "\nUNION ALL\n".join(
        f"""
      SELECT '{name}' AS rule,
             COUNT(*) AS n_checked,
             COUNT(*) FILTER (WHERE NOT coalesce({pred}, false))
               AS n_violations,
             COUNT(*) FILTER (WHERE NOT coalesce({pred}, false)) = 0
               AS passed
      FROM orders
    """
        for name, pred in _DQ_RULES
    )
    + """
    UNION ALL
      SELECT 'orderkey_unique' AS rule,
             COUNT(*) AS n_checked,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations,
             COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
      FROM orders
    UNION ALL
      SELECT 'custkey_references_customer' AS rule,
             COUNT(*) AS n_checked,
             COUNT(*) FILTER (WHERE c_custkey IS NULL) AS n_violations,
             COUNT(*) FILTER (WHERE c_custkey IS NULL) = 0 AS passed
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    )
    """,
)
def dq_expectations(spark: SparkSession, d: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ /
    Great-Expectations contract shape): predicate rules, a uniqueness
    rule, and a referential-integrity rule, each reported as
    (rule, n_checked, n_violations, passed). This is the gate a
    production pipeline evaluates before publishing a partition; the
    observe()-based ``run_observed_metrics`` is the streaming
    side-channel twin of the same idea.

    Scale: all predicate rules + uniqueness evaluate in ONE pass over
    the fact table (conditional aggregates in a single global
    aggregate, map-side combinable; the exact COUNT DISTINCT is the
    only Expand — swap approx_count_distinct at 100 TB). The FK rule
    broadcasts the dimension's key column; the fact never shuffles.
    The long rule-per-row shape comes from ``stack`` over the single
    wide aggregate row (in-task reshape, no extra scan); at 100 TB
    you'd run the audit on the day's partition, not the full
    history."""
    o = load(spark, d, "orders")
    aggs = [F.count("*").alias("n_checked")]
    names = []
    for name, pred in _DQ_RULES:
        names.append(name)
        aggs.append(
            F.sum(
                (~F.coalesce(F.expr(pred), F.lit(False))).cast("long")
            ).alias(f"v_{name}")
        )
    names.append("orderkey_unique")
    aggs.append(
        (F.count("*") - F.countDistinct("o_orderkey")).alias(
            "v_orderkey_unique"
        )
    )
    one = o.agg(*aggs)
    stack = (
        f"stack({len(names)}, "
        + ", ".join(f"'{n}', v_{n}" for n in names)
        + ") AS (rule, n_violations)"
    )
    long = one.selectExpr("n_checked", stack).select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
    cust = F.broadcast(load(spark, d, "customer").select("c_custkey"))
    fk_viol = F.sum(F.col("c_custkey").isNull().cast("long"))
    fk = o.join(cust, o.o_custkey == cust.c_custkey, "left").agg(
        F.lit("custkey_references_customer").alias("rule"),
        F.count("*").alias("n_checked"),
        fk_viol.alias("n_violations"),
        (fk_viol == 0).alias("passed"),
    )
    return long.unionByName(fk)


@register(
    "window_cumulative_distinct",
    oracle="""
    SELECT event_id, user_id, ts,
           -- outer BIGINT cast: DuckDB's windowed SUM yields HUGEINT,
           -- which pandas materializes as float64 and then renders
           -- differently from Spark's int64 (NULL-free, so BIGINT
           -- survives the pandas path intact)
           CAST(SUM(is_first)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
             AS n_types_so_far
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM events
    )
    """,
)
def window_cumulative_distinct(spark: SparkSession, d: str) -> DataFrame:
    """Running COUNT(DISTINCT) — how many distinct event types each
    user has touched as of every event. SQL cannot express
    ``COUNT(DISTINCT) OVER (ORDER BY ...)`` directly (and a naive
    implementation would keep a per-row set — unbounded state); the
    standard O(1)-state rewrite is used instead: flag each (user,
    type)'s FIRST occurrence with row_number, then a plain running sum
    of the flags. Two window passes on different keys = two shuffles
    of the event stream — the minimum for this semantics; both are
    hash-partitioned (no global sort), and per-row state is one bit.
    The breadth-vs-time curve this produces is the engagement-
    diversity signal cohort analytics read."""
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = load(spark, d, "events").select("event_id", "user_id", "ts", "event_type")
    return (
        ev.withColumn(
            "is_first",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .withColumn("n_types_so_far", F.sum("is_first").over(w_run))
        .select("event_id", "user_id", "ts", "n_types_so_far")
    )


@register(
    "events_ohlc",
    oracle="""
    WITH e AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts) AS win_start,
             value,
             printf('%020d-%020d', epoch_us(ts), event_id) AS tiebreak
      FROM events
    )
    SELECT event_type, win_start,
           CAST(ARG_MIN(value, tiebreak) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE)               AS high,
           CAST(MIN(value) AS DOUBLE)               AS low,
           CAST(ARG_MAX(value, tiebreak) AS DOUBLE) AS close,
           CAST(COUNT(*) AS BIGINT)                 AS n_ticks,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM e GROUP BY event_type, win_start
    """,
)
def events_ohlc(spark: SparkSession, d: str) -> DataFrame:
    """Time-series resampling to OHLC candles: 15-minute bars per
    event type with open (first tick), high, low, close (last tick),
    tick count, and DECIMAL-exact volume. The financial downsampling
    shape — min_by/max_by over a unique (ts, event_id) ordering key
    collapses "first/last in window" into the SAME single grouped
    pass as min/max/sum, so a century of ticks resamples with exactly
    one shuffle keyed by (series, bucket) and map-side partials do
    almost all the work. No window function, no sort, no self-join —
    the plan a 100 TB tick store needs. Ordering keys are zero-padded
    strings so first/last is deterministic cross-engine even with
    duplicate timestamps."""
    e = load(spark, d, "events").select(
        "event_type",
        F.window("ts", "15 minutes").start.alias("win_start"),
        "value",
        F.format_string(
            "%020d-%020d", F.unix_micros("ts"), F.col("event_id")
        ).alias("tiebreak"),
    )
    return e.groupBy("event_type", "win_start").agg(
        F.min_by("value", "tiebreak").cast("double").alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.max_by("value", "tiebreak").cast("double").alias("close"),
        F.count("*").alias("n_ticks"),
        F.sum(F.col("value").cast(DECV)).cast("double").alias("volume"),
    )


#: CUSUM slack and alarm threshold, in value-micros: k absorbs noise
#: below half a unit; h fires after ~5 units of sustained upward drift
CUSUM_K = 500_000
CUSUM_H = 5_000_000


@register(
    "anomaly_cusum",
    oracle=f"""
    WITH m AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS micros
      FROM events
    ), mu AS (
      SELECT event_type,
             CAST(FLOOR(CAST(SUM(micros) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS mu
      FROM m GROUP BY event_type
    ), pre AS (
      SELECT m.event_id, m.event_type, m.ts,
             SUM(m.micros - mu.mu - {CUSUM_K})
               OVER (PARTITION BY m.event_type ORDER BY m.ts, m.event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM m JOIN mu USING (event_type)
    )
    SELECT event_id, event_type,
           CAST(p - LEAST(0, MIN(p) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                AS BIGINT) AS s_plus,
           (p - LEAST(0, MIN(p) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
             > {CUSUM_H} AS alarm
    FROM pre
    """,
)
def anomaly_cusum(spark: SparkSession, d: str) -> DataFrame:
    """One-sided CUSUM change-point detection per series — the
    sequential drift detector (data-quality regressions, metric creep)
    that EWMA/z-score miss because they forget. The textbook recursion
    S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − μ − k) is NOT a window aggregate (not
    associative), but it has an exact closed form: with prefix sums
    Pᵢ of the deviations, S⁺ᵢ = Pᵢ − min(0, min_{{j≤i}} Pⱼ) — a running
    sum THEN a running min, two stacked windows sharing ONE series
    shuffle. All arithmetic is integer micros (μ floored per series),
    so the oracle matches bit-for-bit; alarms fire where S⁺ exceeds h.

    Scale: per-series state is two window accumulators; the reference
    mean joins back as a broadcast (|series| rows). The same rewrite
    runs streaming with the accumulators in the state store."""
    m = load(spark, d, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("micros"),
    )
    mu = m.groupBy("event_type").agg(
        F.floor(F.sum("micros").cast("double") / F.count("*"))
        .cast("long")
        .alias("mu")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = m.join(F.broadcast(mu), "event_type").withColumn(
        "p", F.sum(F.col("micros") - F.col("mu") - F.lit(CUSUM_K)).over(w)
    )
    s_plus = F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    return pre.select(
        "event_id",
        "event_type",
        s_plus.cast("long").alias("s_plus"),
        (s_plus > F.lit(CUSUM_H)).alias("alarm"),
    )


@register(
    "ab_ttest",
    oracle="""
    WITH m AS (
      SELECT event_type, user_id % 2 AS variant,
             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS micros
      FROM events
    ), g AS (
      SELECT event_type, variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(micros) AS DOUBLE) AS sm,
             CAST(SUM(CAST(micros * micros AS DECIMAL(38,0))) AS DOUBLE)
               AS sm2
      FROM m GROUP BY 1, 2
    ), w AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             a.sm / a.n AS mean_a, b.sm / b.n AS mean_b,
             (a.sm2 - a.sm * a.sm / a.n) / (a.n - 1) / a.n AS se2_a,
             (b.sm2 - b.sm * b.sm / b.n) / (b.n - 1) / b.n AS se2_b
      FROM g a JOIN g b ON a.event_type = b.event_type
       AND a.variant = 0 AND b.variant = 1
    )
    SELECT event_type, n_a, n_b, mean_a, mean_b,
           (mean_a - mean_b) / sqrt(se2_a + se2_b) AS t_stat,
           (se2_a + se2_b) * (se2_a + se2_b)
             / (se2_a * se2_a / (n_a - 1) + se2_b * se2_b / (n_b - 1))
             AS welch_df
    FROM w
    """,
)
def ab_ttest(spark: SparkSession, d: str) -> DataFrame:
    """Welch's two-sample t-test per metric series — the A/B-test
    readout (variant = a deterministic user-id split), computed from
    EXACT integer-micros moment sums: Σx as int64, Σx² DECIMAL-routed,
    then one fixed IEEE expression chain for means, standard errors,
    the t statistic, and the Welch–Satterthwaite degrees of freedom —
    identical on both engines because the inputs to every float op are
    exact integers and the op order is pinned (never variance_samp():
    its partial-merge order varies by partitioning).

    Scale: ONE grouped pass over the events (map-side-combinable
    sums), then a |series|-sized self-join of the 2-row-per-series
    stats — the fact table shuffles once, the statistics never do."""
    m = load(spark, d, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("variant"),
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("micros"),
    )
    g = m.groupBy("event_type", "variant").agg(
        F.count("*").alias("n"),
        F.sum("micros").cast("double").alias("sm"),
        F.sum((F.col("micros") * F.col("micros")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sm2"),
    )
    a = g.where(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"), F.col("sm").alias("sm_a"),
        F.col("sm2").alias("sm2_a"),
    )
    b = g.where(F.col("variant") == 1).select(
        F.col("event_type").alias("et_b"),
        F.col("n").alias("n_b"), F.col("sm").alias("sm_b"),
        F.col("sm2").alias("sm2_b"),
    )
    j = a.join(b, F.col("event_type") == F.col("et_b"))
    mean_a = F.col("sm_a") / F.col("n_a")
    mean_b = F.col("sm_b") / F.col("n_b")
    se2_a = (
        (F.col("sm2_a") - F.col("sm_a") * F.col("sm_a") / F.col("n_a"))
        / (F.col("n_a") - 1) / F.col("n_a")
    )
    se2_b = (
        (F.col("sm2_b") - F.col("sm_b") * F.col("sm_b") / F.col("n_b"))
        / (F.col("n_b") - 1) / F.col("n_b")
    )
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        ((mean_a - mean_b) / F.sqrt(se2_a + se2_b)).alias("t_stat"),
        (
            (se2_a + se2_b) * (se2_a + se2_b)
            / (
                se2_a * se2_a / (F.col("n_a") - 1)
                + se2_b * se2_b / (F.col("n_b") - 1)
            )
        ).alias("welch_df"),
    )


@register(
    "window_drawdown",
    oracle="""
    WITH m AS (
      SELECT event_id, event_type, ts,
             SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM events
    ), dd AS (
      SELECT event_type, cum,
             MAX(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM m
    )
    SELECT event_type,
           CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_micros,
           CAST(MAX(peak) AS BIGINT) AS peak_micros
    FROM dd GROUP BY event_type
    """,
)
def window_drawdown(spark: SparkSession, d: str) -> DataFrame:
    """Maximum drawdown per series — the risk metric over the
    cumulative-value curve: running peak minus current level, maxed.
    Same exact-rewrite discipline as ``anomaly_cusum`` (its mirror
    image: CUSUM is prefix-sum minus running MIN): one running sum,
    one running max over the SAME (series, time) partitioning — one
    shuffle total — then a final grouped max. Integer micros end to
    end, so the oracle is bit-exact; at scale per-row state is two
    window accumulators and the output is |series| rows."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = load(spark, d, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("micros"),
    ).withColumn("cum", F.sum("micros").over(w))
    dd = m.withColumn("peak", F.max("cum").over(w))
    return dd.groupBy("event_type").agg(
        F.max(F.col("peak") - F.col("cum")).cast("long").alias(
            "max_drawdown_micros"
        ),
        F.max("peak").cast("long").alias("peak_micros"),
    )


#: market-basket: min pair support kept (bounds the affinity table)
BASKET_MIN_SUPPORT = 3


@register(
    "basket_affinity",
    oracle=f"""
    WITH basket AS (
      SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
      FROM lineitem GROUP BY l_orderkey
    ), n AS (SELECT COUNT(*) AS n_orders FROM basket),
    pairs AS (
      SELECT unnest(flatten(list_transform(
               range(1, len(parts) + 1),
               i -> list_transform(
                      list_slice(parts, i + 1, len(parts)),
                      y -> [parts[i], y])))) AS p
      FROM basket
    ), cnt AS (
      SELECT p[1] AS part_a, p[2] AS part_b, COUNT(*) AS support
      FROM pairs GROUP BY 1, 2
    ), item AS (
      SELECT l_partkey AS part, COUNT(DISTINCT l_orderkey) AS item_n
      FROM lineitem GROUP BY 1
    )
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           CAST(support AS DOUBLE) * n.n_orders / (a.item_n * b.item_n)
             AS lift
    FROM cnt, n
    JOIN item a ON a.part = part_a
    JOIN item b ON b.part = part_b
    WHERE support >= {BASKET_MIN_SUPPORT}
    """,
)
def basket_affinity(spark: SparkSession, d: str) -> DataFrame:
    """Market-basket affinity (association-rules core): co-purchased
    part pairs with support and lift — the recommender/assortment
    signal, mined the scale-safe way: each order's DISTINCT sorted
    part list is collected per order (baskets are small — bounded by
    order size, never corpus-sized), the (a<b) pairs expand IN-ROW
    (same flatten/slice trick as ``text_cooccurrence`` — never a
    lineitem self-join, which would be the classic quadratic mistake
    here), and lift = support·N/(nₐ·n_b) stays a rational of integer
    counts — exact cross-engine. Shuffles: one per-order collect, one
    pair count, broadcast item counts."""
    li = load(spark, d, "lineitem")
    basket = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias(
            "parts"
        )
    )
    n = basket.agg(F.count("*").alias("n_orders"))
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("parts"), i + 2, F.greatest(F.size("parts"), F.lit(1))
                ),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    cnt = (
        basket.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    item = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count_distinct("l_orderkey").alias("item_n")
    )
    a = item.select(F.col("part").alias("part_a"), F.col("item_n").alias("n_a"))
    b = item.select(F.col("part").alias("part_b"), F.col("item_n").alias("n_b"))
    return (
        cnt.join(F.broadcast(a), "part_a")
        .join(F.broadcast(b), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            (
                F.col("support").cast("double") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def _global_ntile(df, n: int, ordering, key: str = "custkey"):
    """Distributed exact NTILE(n) OVER (ORDER BY <ordering>) — returns
    (key, _ntile) bit-identical to the single-partition window version
    without ever materializing a single-partition sort.

    Recipe: range-shuffle on the ordering (non-overlapping, ordered
    partitions), per-partition ``row_number`` (parallel windows), then
    per-partition row counts collected to the driver — O(#shuffle
    partitions) rows, model-state scale — turned into literal offsets
    so global rank = offset + local rank. The NTILE bucket is then a
    closed-form function of (rank, N) with N known at the driver:
    the first N%n buckets hold ceil(N/n) rows, the rest floor(N/n).
    The ordering must be a total order (callers append the unique key
    as tiebreak) or ranks are partition-luck.

    The post-exchange frame is pinned with an EAGER localCheckpoint:
    the counts collect and the downstream ranking plan otherwise run
    the repartitionByRange exchange TWICE, and RangePartitioner's
    reservoir-sample seed depends on the RDD id — at scale (where
    sampling actually subsamples) the two executions can pick
    different range boundaries and the literal offsets silently
    desync from the real partitioning. Checkpointing materializes the
    exchange once so both consumers read the same partitions."""
    rng = (
        df.repartitionByRange(*ordering)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = Window.partitionBy("_pid").orderBy(*ordering)
    local = rng.withColumn("_rn", F.row_number().over(w_in))
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in rng.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    total = sum(c for _, c in counts)
    if total == 0:
        return df.select(key).withColumn("_ntile", F.lit(None).cast("long"))
    offset = F.lit(0).cast("long")
    acc = 0
    for pid, cnt in counts:
        offset = F.when(F.col("_pid") == pid, F.lit(acc)).otherwise(offset)
        acc += cnt
    rank = (offset + F.col("_rn")).cast("long")
    q, r = divmod(total, n)
    if q == 0:
        tile = rank  # fewer rows than buckets: each row its own bucket
    else:
        tile = F.when(
            rank <= r * (q + 1),
            F.floor((rank - 1) / (q + 1)) + 1,
        ).otherwise(F.lit(r) + F.floor((rank - 1 - r * (q + 1)) / q) + 1)
    return local.select(key, tile.cast("long").alias("_ntile"))


@register(
    "rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(o_orderdate), mx.max_d) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders, mx GROUP BY o_custkey, mx.max_d
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary,
           CAST(r_s AS BIGINT) AS r_score,
           CAST(f_s AS BIGINT) AS f_score,
           CAST(m_s AS BIGINT) AS m_score,
           CAST(r_s AS VARCHAR) || CAST(f_s AS VARCHAR)
             || CAST(m_s AS VARCHAR) AS segment
    FROM (
      SELECT *,
             NTILE(5) OVER (ORDER BY recency_days, custkey) AS r_s,
             NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS f_s,
             NTILE(5) OVER (ORDER BY monetary DESC, custkey) AS m_s
      FROM rfm
    )
    """,
)
def rfm_segmentation(spark: SparkSession, d: str) -> DataFrame:
    """RFM customer segmentation — the classic CRM scoring: days since
    last order (recency), order count (frequency), DECIMAL-exact spend
    (monetary), each quintiled by NTILE into a 1–5 score, concatenated
    into the '555'-style segment label. NTILE is deterministic here
    because every ordering carries the custkey tiebreak (a total
    order) — without it the quintile boundaries are partition-luck and
    the cross-engine hash would flap.

    Scale: one grouped pass over orders (map-side combinable), then
    three rankings of the CUSTOMER-grain table — orders of magnitude
    smaller than the fact; the max-date scalar broadcasts. Each
    ranking is the DISTRIBUTED exact NTILE (``_global_ntile``): a
    range shuffle + per-partition row numbers + O(#partitions)
    driver-side offsets — bit-identical to the oracle's
    single-partition NTILE window without ever materializing a
    single-partition sort, so the plan survives a customer dimension
    that itself needs a cluster."""
    o = load(spark, d, "orders")
    mx = o.agg(F.max("o_orderdate").alias("max_d"))
    rfm = (
        o.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("max_d"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    # localCheckpoint, not cache: this frame is read 4x (3 ntile
    # rankings + the final join) and the _global_ntile pins make the
    # query construction-eager regardless (lazy_audit ALLOWED), so a
    # cache barrier would buy no laziness here — the checkpointed row
    # RDD is the established form for eager-pinned frames (round-9
    # A/B at sf0.1 showed the two barriers within session noise).
    rfm = rfm.localCheckpoint(eager=False)
    r_s = _global_ntile(rfm, 5, [F.col("recency_days"), F.col("custkey")])
    f_s = _global_ntile(rfm, 5, [F.desc("frequency"), F.col("custkey")])
    m_s = _global_ntile(rfm, 5, [F.desc("monetary"), F.col("custkey")])
    return (
        rfm.join(r_s.withColumnRenamed("_ntile", "r_score"), "custkey")
        .join(f_s.withColumnRenamed("_ntile", "f_score"), "custkey")
        .join(m_s.withColumnRenamed("_ntile", "m_score"), "custkey")
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
        )
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


#: peak prominence threshold, in value-micros
PEAK_PROM = 2_000_000


@register(
    "events_peaks",
    oracle=f"""
    WITH m AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS micros
      FROM events
    ), lagged AS (
      SELECT *,
             LAG(micros)  OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS prev,
             LEAD(micros) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS next
      FROM m
    )
    SELECT event_id, event_type, micros,
           prev, next,
           micros - GREATEST(prev, next) AS prominence_micros
    FROM lagged
    WHERE prev IS NOT NULL AND next IS NOT NULL
      AND micros > prev AND micros > next
      AND micros - GREATEST(prev, next) > {PEAK_PROM}
    """,
)
def events_peaks(spark: SparkSession, d: str) -> DataFrame:
    """Local-maximum (peak) detection per series: a sample strictly
    above both neighbors with prominence above a threshold — the
    spike-census primitive behind alerting and peak-hour reports,
    expressed as one lag+lead window (interior points only; integer
    micros keep the comparison and the prominence bit-exact). One
    series-keyed shuffle; at 100 TB each series' window is
    partition-local and the output is the (sparse) peak set."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    m = load(spark, d, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("micros"),
    )
    lagged = m.withColumn("prev", F.lag("micros").over(w)).withColumn(
        "next", F.lead("micros").over(w)
    )
    prom = F.col("micros") - F.greatest(F.col("prev"), F.col("next"))
    return (
        lagged.where(
            F.col("prev").isNotNull()
            & F.col("next").isNotNull()
            & (F.col("micros") > F.col("prev"))
            & (F.col("micros") > F.col("next"))
            & (prom > PEAK_PROM)
        )
        .select(
            "event_id",
            "event_type",
            "micros",
            "prev",
            "next",
            prom.alias("prominence_micros"),
        )
    )


@register(
    "survival_km",
    oracle="""
    WITH span AS (
      SELECT user_id,
             date_diff('day',
                       CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS life,
             CAST(MAX(ts) AS DATE)
               = (SELECT CAST(MAX(ts) AS DATE) FROM events) AS censored
      FROM events GROUP BY user_id
    ), timed AS (
      SELECT user_id, censored,
             CASE WHEN censored THEN life ELSE life + 1 END AS t_obs
      FROM span
    ), days AS (
      SELECT t_obs AS t,
             COUNT(*) FILTER (WHERE NOT censored) AS d,
             COUNT(*) AS leaving
      FROM timed GROUP BY t_obs
    ), risk AS (
      SELECT t, d,
             (SELECT COUNT(*) FROM timed) 
               - COALESCE(SUM(leaving) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM days
    ), ev AS (
      SELECT t, d, n_risk,
             1.0 - CAST(d AS DOUBLE) / n_risk AS factor
      FROM risk WHERE d > 0
    ), packed AS (
      SELECT list(t ORDER BY t) AS ts_l, list(factor ORDER BY t) AS fs,
             list(d ORDER BY t) AS ds, list(n_risk ORDER BY t) AS ns
      FROM ev
    )
    SELECT CAST(ts_l[i] AS BIGINT) AS t,
           CAST(ds[i] AS BIGINT) AS n_deaths,
           CAST(ns[i] AS BIGINT) AS n_risk,
           list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                    list_slice(fs, 1, i)),
                       (acc, v) -> acc * v) AS survival
    FROM packed, LATERAL (SELECT unnest(range(1, len(fs) + 1)) AS i)
    """,
)
def survival_km(spark: SparkSession, d: str) -> DataFrame:
    """Kaplan-Meier survival (retention) curve over user lifetimes:
    churn = no activity after day L (death at offset L+1), users still
    active on the corpus's last day are CENSORED — the estimator that
    handles censoring correctly, vs the naive retention matrix
    (``retention_cohorts``) that undercounts open-ended users. S(t) =
    Π(1 − dᵢ/nᵢ) is a sequential product of per-day factors — not a
    window aggregate — so both engines fold the SAME day-ordered
    factor list left-to-right in-row (the curve is |distinct event
    days| long, an output-sized array): bit-exact, no exp/log detour.

    Scale: one grouped pass over events (per-user min/max), one tiny
    per-day aggregate + running sum; the fold runs on the final
    curve-sized row, never on the corpus."""
    ev = load(spark, d, "events")
    max_day = ev.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    span = (
        ev.groupBy("user_id")
        .agg(
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            ).alias("life"),
            F.max(F.col("ts").cast("date")).alias("last_day"),
        )
        .crossJoin(F.broadcast(max_day))
        .select(
            "user_id",
            "life",
            (F.col("last_day") == F.col("mx")).alias("censored"),
        )
    )
    timed = span.select(
        "censored",
        F.when(F.col("censored"), F.col("life"))
        .otherwise(F.col("life") + 1)
        .alias("t_obs"),
    )
    n_total = timed.agg(F.count("*").alias("n_total"))
    days = timed.groupBy(F.col("t_obs").alias("t")).agg(
        F.count_if(~F.col("censored")).alias("d"),
        F.count("*").alias("leaving"),
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = (
        days.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(wcum), F.lit(0)),
        )
        .where(F.col("d") > 0)
        .select(
            "t",
            "d",
            "n_risk",
            (F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")).alias(
                "factor"
            ),
        )
    )
    packed = risk.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "n_risk", "factor"))
        ).alias("curve")
    )
    surv = F.transform(
        F.col("curve"),
        lambda s, i: F.struct(
            s.t.alias("t"),
            s.d.alias("n_deaths"),
            s.n_risk.alias("n_risk"),
            F.aggregate(
                F.slice(F.col("curve"), 1, i + 1),
                F.lit(1.0),
                lambda acc, x: acc * x.factor,
            ).alias("survival"),
        ),
    )
    return (
        packed.select(F.explode(surv).alias("p"))
        .select(
            F.col("p.t").cast("long").alias("t"),
            F.col("p.n_deaths").cast("long").alias("n_deaths"),
            F.col("p.n_risk").cast("long").alias("n_risk"),
            F.col("p.survival").alias("survival"),
        )
    )


@register(
    "markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), c AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (
      SELECT cur, SUM(n) AS n_cur FROM c GROUP BY cur
    )
    SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n,
           CAST(c.n AS DOUBLE) / tot.n_cur AS p
    FROM c JOIN tot USING (cur)
    """,
)
def markov_transitions(spark: SparkSession, d: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    journeys: P(next event type | current) from lead-paired counts —
    the user-flow model behind next-action prediction and funnel
    design. Deterministic sequencing via the (ts, event_id) order;
    probabilities are rationals of integer counts (one division) —
    exact cross-engine. One user-keyed shuffle for the sequencing
    window, one tiny (|types|²) count — the corpus never moves again;
    the transition matrix is output-sized at any scale."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, d, "events").select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    c = (
        seq.where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return c.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        "n",
        (F.col("n").cast("double") / F.col("n_cur")).alias("p"),
    )


@register(
    "pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS revenue
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT custkey, CAST(revenue AS DOUBLE) AS revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS run,
             SUM(revenue) OVER () AS total
      FROM rev
    )
    SELECT custkey, revenue,
           CAST(run AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CASE WHEN CAST(run AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
                  THEN 'A'
                WHEN CAST(run AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95
                  THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def pareto_abc(spark: SparkSession, d: str) -> DataFrame:
    """Pareto/ABC classification: customers ranked by revenue, running
    share of total, bucketed A (first 80% of revenue) / B (next 15%) /
    C (tail) — the inventory/CRM prioritization classic. The running
    and total sums stay DECIMAL until the single closing share
    division (order-independent exact), and the rank order carries the
    custkey tiebreak, so bucket boundaries are deterministic
    cross-engine. Ranks the customer-grain rollup (like
    ``rfm_segmentation``), so the total-order window is
    dimension-sized; the orders fact pays one grouped pass."""
    rev = (
        load(spark, d, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    wrun = Window.orderBy(F.desc("revenue"), "custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "custkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(wrun).alias("run"),
        F.sum("revenue").over(wall).alias("total"),
    )
    share = F.col("run").cast("double") / F.col("total").cast("double")
    return ranked.select(
        "custkey",
        "revenue",
        share.alias("cum_share"),
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "events_autocorr",
    oracle="""
    WITH m AS (
      SELECT event_type, ts, event_id,
             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS x
      FROM events
    ), paired AS (
      SELECT event_type, x,
             LEAD(x) OVER (PARTITION BY event_type
                           ORDER BY ts, event_id) AS y
      FROM m
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM paired WHERE y IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS lag1_autocorr
    FROM s
    """,
)
def events_autocorr(spark: SparkSession, d: str) -> DataFrame:
    """Lag-1 serial autocorrelation per series — the
    stickiness/seasonality detector (is the next value predicted by
    the last?) that complements the cross-column Pearson
    (``agg_corr``) with a TEMPORAL one. Consecutive pairs come from
    one lead window (deterministic (ts, id) order); the five moment
    sums ride int64/DECIMAL (order-free exact) and the closing Pearson
    chain is pinned IEEE — never corr(), whose partial-merge order
    varies by partitioning. One series shuffle, constant state."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    m = load(spark, d, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("x"),
    )
    paired = m.withColumn("y", F.lead("x").over(w)).where(
        F.col("y").isNotNull()
    )
    s = paired.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select("event_type", "n", (num / den).alias("lag1_autocorr"))


#: Benford first-digit probabilities log10(1 + 1/d), precomputed as
#: literals so neither engine evaluates a log (10-decimal grid — the
#: comparison's resolution, not its precision)
BENFORD_P = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366,
    4: 0.0969100130, 5: 0.0791812460, 6: 0.0669467896,
    7: 0.0579919470, 8: 0.0511525224, 9: 0.0457574906,
}


@register(
    "events_benford",
    oracle=f"""
    WITH digit AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(value * 1000000.0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM events WHERE value > 0
    ), c AS (
      SELECT d, COUNT(*) AS n FROM digit GROUP BY d
    ), tot AS (SELECT SUM(n) AS nt FROM c),
    exp_p AS (
      {" UNION ALL ".join(f"SELECT {d} AS d, CAST({p!r} AS DOUBLE) AS benford_p" for d, p in BENFORD_P.items())}
    )
    SELECT e.d AS first_digit,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(c.n, 0) AS DOUBLE) / tot.nt AS observed_p,
           e.benford_p,
           abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / tot.nt - e.benford_p)
             AS abs_dev
    FROM exp_p e LEFT JOIN c ON c.d = e.d CROSS JOIN tot
    """,
)
def events_benford(spark: SparkSession, d: str) -> DataFrame:
    """Benford's-law first-digit audit — the forensic data-quality
    screen (fabricated or unit-mangled numeric columns drift from the
    log-distribution of natural ones): observed first-significant-
    digit shares vs the Benford expectation, per digit. The expected
    probabilities are PRECOMPUTED literals (log10(1+1/d) on a 10⁻¹⁰
    grid), so no engine evaluates a transcendental; observed shares
    are rationals of counts and the deviation is one abs-subtract —
    exact cross-engine. One narrow digit-extraction pass + a 9-row
    aggregate; the expectation table is a literal VALUES join."""
    digit = (
        load(spark, d, "events")
        .where(F.col("value") > 0)
        .select(
            F.substring(
                F.floor(F.col("value") * F.lit(1_000_000.0))
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("d")
        )
    )
    c = digit.groupBy("d").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("nt"))
    exp_rows = [(dd, pp) for dd, pp in BENFORD_P.items()]
    exp_p = spark.createDataFrame(exp_rows, "d long, benford_p double")
    n = F.coalesce(F.col("n"), F.lit(0))
    obs = n.cast("double") / F.col("nt")
    return (
        exp_p.join(c, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            n.cast("long").alias("n"),
            obs.alias("observed_p"),
            "benford_p",
            F.abs(obs - F.col("benford_p")).alias("abs_dev"),
        )
    )


@register(
    "user_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), flagged AS (
      SELECT user_id, day,
             CASE WHEN date_diff('day',
                     LAG(day) OVER (PARTITION BY user_id ORDER BY day),
                     day) = 1
                  THEN 0 ELSE 1 END AS brk
      FROM days
    ), islands AS (
      SELECT user_id, day,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS streak_id
      FROM flagged
    ), lens AS (
      SELECT user_id, streak_id, COUNT(*) AS len,
             MIN(day) AS streak_start
      FROM islands GROUP BY user_id, streak_id
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           MIN(streak_start) AS first_active_day
    FROM lens GROUP BY user_id
    """,
)
def user_streaks(spark: SparkSession, d: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    engagement metric behind habit/retention features, as the calendar
    variant of gaps-and-islands: distinct active days, a break flag
    when the day gap ≠ 1, a running-sum island id, then per-island
    lengths rolled up to the per-user maximum. Everything is integer
    date arithmetic — exact cross-engine — and every stage reuses the
    ONE user-keyed partitioning (the sessionize/SCD2 shared-shuffle
    discipline) over a distinct-days table that is already orders of
    magnitude smaller than the events."""
    days = (
        load(spark, d, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = days.withColumn(
        "brk",
        F.when(F.datediff("day", F.lag("day").over(w)) == 1, 0).otherwise(1),
    )
    islands = flagged.withColumn("streak_id", F.sum("brk").over(run))
    lens = islands.groupBy("user_id", "streak_id").agg(
        F.count("*").alias("len"), F.min("day").alias("streak_start")
    )
    return lens.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak_days"),
        F.count("*").alias("n_streaks"),
        F.min("streak_start").alias("first_active_day"),
    )


# --- two-sample / independence statistical tests ---------------------


def _global_running_sums(df, order_cols, sum_cols, with_totals=False):
    """Distributed exact running sums over a total order — the same
    recipe as ``_global_ntile``: range-shuffle on the ordering,
    per-partition window sums (parallel), per-partition TOTALS
    collected to the driver (O(#shuffle partitions) rows — model
    state) and folded into literal offsets added to each partition's
    local running sum. No single-partition sort anywhere; bit-exact
    equal to the global-window version for integer columns.

    ``with_totals=True`` additionally returns the GRAND totals of
    ``sum_cols`` as a tuple of Python ints — the offset fold's final
    accumulator, already on the driver for free. Callers that need
    Σcol (the KS/Mann-Whitney n1/n2) read it from here instead of
    re-aggregating the input: the r12 plan read showed events_ks_test
    paying the events scan + support groupBy TWICE more just to
    rebuild those two scalars
    (plans/r12/events_ks_test_before.txt nodes 6-13 ≅ 19-26).

    As in ``_global_ntile``, the post-exchange frame is pinned with an
    eager localCheckpoint so the totals collect and the downstream
    window plan read the SAME materialized range partitioning —
    without it the exchange executes twice and RangePartitioner's
    RDD-id-seeded reservoir sampling can choose different boundaries
    at scale, silently desyncing the offsets."""
    rng = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rng.select(
        "*", *[F.sum(c).over(w_in).alias(f"_run_{c}") for c in sum_cols]
    )
    totals = sorted(
        (r["_pid"], tuple(r[f"t_{c}"] for c in sum_cols))
        for r in rng.groupBy("_pid")
        .agg(*[F.sum(c).alias(f"t_{c}") for c in sum_cols])
        .collect()
    )
    offsets = {}
    acc = [0] * len(sum_cols)
    for pid, ts in totals:
        offsets[pid] = tuple(acc)
        acc = [a + (t or 0) for a, t in zip(acc, ts)]
    out = local
    for idx, c in enumerate(sum_cols):
        off = F.lit(0).cast("long")
        for pid, offs in offsets.items():
            off = F.when(F.col("_pid") == pid, F.lit(offs[idx])).otherwise(off)
        out = out.withColumn(f"run_{c}", (off + F.col(f"_run_{c}")).cast("long"))
    out = out.drop("_pid", *[f"_run_{c}" for c in sum_cols])
    if with_totals:
        return out, tuple(int(a) for a in acc)
    return out


def _grouped_running_sums(df, group_cols, order_cols, sum_cols):
    """Per-GROUP distributed running sums — ``_global_running_sums``
    generalized to a partitioned order, for when the window's
    PARTITION BY key is LOW-cardinality (a handful of sources) so a
    plain ``Window.partitionBy(group)`` would funnel each whole group
    through one task at 100 TB. Range-shuffle on (group, ordering) —
    each group spans a contiguous run of range partitions — then
    per-(partition, group) local window sums run in parallel, and the
    per-cell totals (O(#partitions + #groups) rows by contiguity —
    model state) fold into per-cell offsets shipped back as a
    broadcast join. Bit-exact equal to the single-task grouped window
    for integer columns; the same eager-localCheckpoint pin prevents
    the range exchange from executing twice with different sampled
    boundaries."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    rng = (
        df.repartitionByRange(*[F.col(c) for c in [*group_cols, *order_cols]])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rng.select(
        "*", *[F.sum(c).over(w_in).alias(f"_run_{c}") for c in sum_cols]
    )
    cells = (
        rng.groupBy("_pid", *group_cols)
        .agg(*[F.sum(c).alias(f"t_{c}") for c in sum_cols])
        .collect()
    )
    acc_by_group: dict = {}
    rows = []
    for r in sorted(
        cells, key=lambda r: (tuple(r[g] for g in group_cols), r["_pid"])
    ):
        key = tuple(r[g] for g in group_cols)
        acc = acc_by_group.setdefault(key, [0] * len(sum_cols))
        rows.append((r["_pid"], *key, *acc))
        for i, c in enumerate(sum_cols):
            acc[i] += r[f"t_{c}"] or 0
    schema = T.StructType(
        [T.StructField("_pid", T.IntegerType())]
        + [T.StructField(g, df.schema[g].dataType) for g in group_cols]
        + [T.StructField(f"_off_{c}", T.LongType()) for c in sum_cols]
    )
    off = spark.createDataFrame(rows, schema)
    out = local.join(F.broadcast(off), ["_pid", *group_cols])
    for c in sum_cols:
        out = out.withColumn(
            f"run_{c}", (F.col(f"_off_{c}") + F.col(f"_run_{c}")).cast("long")
        )
    return out.drop(
        "_pid",
        *[f"_run_{c}" for c in sum_cols],
        *[f"_off_{c}" for c in sum_cols],
    )


@register(
    "events_ks_test",
    oracle="""
    WITH s AS (
      SELECT value,
             COUNT(*) FILTER (WHERE event_type = 'click') AS c1,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS c2
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY value
    ), cum AS (
      SELECT SUM(c1) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS r1,
             SUM(c2) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS r2
      FROM s
    ), tot AS (
      SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n1,
             CAST(COALESCE(SUM(c2), 0) AS BIGINT) AS n2
      FROM s
    )
    SELECT tot.n1, tot.n2,
           CAST(COALESCE(MAX(abs(r1 * tot.n2 - r2 * tot.n1)), 0) AS BIGINT)
             AS d_num,
           CASE WHEN tot.n1 * tot.n2 > 0 THEN
             ROUND(CAST(COALESCE(MAX(abs(r1 * tot.n2 - r2 * tot.n1)), 0)
                        AS DOUBLE) / (tot.n1 * tot.n2), 6)
           END AS d_stat
    FROM tot LEFT JOIN cum ON TRUE GROUP BY tot.n1, tot.n2
    """,
)
def events_ks_test(spark: SparkSession, d: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test — are click values and
    purchase values drawn from the same distribution? The drift gate a
    100 TB feature pipeline runs between snapshots. Computed EXACTLY:
    D = max |F1(x) - F2(x)| is evaluated as the INTEGER numerator
    max |r1·n2 - r2·n1| over the merged support (both CDFs only move
    at observed values), divided once at the end — no per-row float
    accumulation to drift cross-engine.

    Scale: one grouped pass collapses events to the distinct-value
    support; the two CDFs run in ONE distributed cumulative-sum pass
    (``_global_running_sums``: range shuffle + per-partition windows +
    O(#partitions) driver offsets — no single-partition sort); the max
    is a plain map-side-combinable aggregate."""
    ev = load(spark, d, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c2"),
    )
    cum, (n1_t, n2_t) = _global_running_sums(
        s, ["value"], ["c1", "c2"], with_totals=True
    )
    # grand totals are the running-sum fold's final accumulator —
    # exact integer sums of the same longs Spark's SUM adds, already
    # driver-side; re-entering them as a literal row removes the two
    # extra events scans the SUM(c1)/SUM(c2) re-aggregation paid
    tot = spark.createDataFrame([(n1_t, n2_t)], "n1 long, n2 long")
    dmax = cum.crossJoin(F.broadcast(tot)).agg(
        F.coalesce(
            F.max(
                F.abs(
                    F.col("run_c1") * F.col("n2")
                    - F.col("run_c2") * F.col("n1")
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("d_num")
    )
    return dmax.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "d_num",
        F.when(
            F.col("n1") * F.col("n2") > 0,
            F.round(
                F.col("d_num").cast("double") / (F.col("n1") * F.col("n2")),
                6,
            ),
        ).alias("d_stat"),
    )


@register(
    "events_mannwhitney",
    oracle="""
    WITH s AS (
      SELECT value,
             COUNT(*) FILTER (WHERE event_type = 'click') AS c1,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS c2
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY value
    ), cum AS (
      SELECT c1, c2, c1 + c2 AS cnt,
             SUM(c1) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
             + SUM(c2) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
             - c1 - c2 AS nbefore
      FROM s
    ), tot AS (
      SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n1,
             CAST(COALESCE(SUM(c2), 0) AS BIGINT) AS n2
      FROM s
    ), r AS (
      SELECT CAST(COALESCE(SUM(c1 * (2 * nbefore + cnt + 1)), 0) AS BIGINT)
               AS r1_x2
      FROM cum
    )
    SELECT tot.n1, tot.n2, r.r1_x2,
           CAST(r.r1_x2 - tot.n1 * (tot.n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * tot.n1 * tot.n2
                - (r.r1_x2 - tot.n1 * (tot.n1 + 1)) AS BIGINT) AS u2_x2,
           CASE WHEN tot.n1 * tot.n2 > 0 THEN
             CAST(LEAST(r.r1_x2 - tot.n1 * (tot.n1 + 1),
                        2 * tot.n1 * tot.n2
                        - (r.r1_x2 - tot.n1 * (tot.n1 + 1))) AS DOUBLE) / 2
           END AS u_stat
    FROM tot CROSS JOIN r
    """,
)
def events_mannwhitney(spark: SparkSession, d: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
    nonparametric location-shift screen completing the drift/AB family
    next to the exact KS statistic (``events_ks_test``), the chi-square
    independence test and Welch's t (``ab_ttest``): are click values
    stochastically larger than purchase values? Computed EXACTLY with
    midrank tie handling and zero floats until the final halving:
    collapse events to the distinct-value support, one distributed
    running-sum pass gives each value's rank offset, and the doubled
    average rank ``2·before + cnt + 1`` is an INTEGER, so the doubled
    rank sum R1×2 and both doubled U statistics accumulate as plain
    longs (u1_x2 + u2_x2 = 2·n1·n2 by construction — pinned in
    tests). One support-grain shuffle (``_global_running_sums``' range
    exchange) + global aggregates; no single-partition sort."""
    ev = load(spark, d, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c2"),
    )
    cum, (n1_t, n2_t) = _global_running_sums(
        s, ["value"], ["c1", "c2"], with_totals=True
    )
    # same literal re-entry as events_ks_test: the grand totals are
    # the offset fold's final accumulator, so the extra SUM pass over
    # the support (one more events scan) is pure recompute
    tot = spark.createDataFrame([(n1_t, n2_t)], "n1 long, n2 long")
    nbefore = (
        F.col("run_c1") + F.col("run_c2") - F.col("c1") - F.col("c2")
    )
    r = cum.agg(
        F.coalesce(
            F.sum(
                F.col("c1") * (2 * nbefore + F.col("c1") + F.col("c2") + 1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("r1_x2")
    )
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    u2 = 2 * F.col("n1") * F.col("n2") - u1
    return r.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "r1_x2",
        u1.cast("long").alias("u1_x2"),
        u2.cast("long").alias("u2_x2"),
        F.when(
            F.col("n1") * F.col("n2") > 0,
            F.least(u1, u2).cast("double") / 2,
        ).alias("u_stat"),
    )


@register(
    "events_chi_square",
    oracle="""
    WITH o AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS obs
      FROM events GROUP BY 1, 2
    ), rt AS (SELECT event_type, SUM(obs) AS row_n FROM o GROUP BY 1),
    ct AS (SELECT dow, SUM(obs) AS col_n FROM o GROUP BY 1),
    n AS (SELECT SUM(obs) AS total FROM o),
    terms AS (
      SELECT CAST(FLOOR(
               ((o.obs - CAST(rt.row_n * ct.col_n AS DOUBLE) / n.total)
                * (o.obs - CAST(rt.row_n * ct.col_n AS DOUBLE) / n.total))
               / (CAST(rt.row_n * ct.col_n AS DOUBLE) / n.total)
               * 1000000.0) AS BIGINT) AS term_micros
      FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
    )
    SELECT CAST(COALESCE((SELECT total FROM n), 0) AS BIGINT) AS n_events,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
           CAST(COALESCE(SUM(term_micros), 0) AS BIGINT) AS chi2_micros
    FROM terms
    """,
)
def events_chi_square(spark: SparkSession, d: str) -> DataFrame:
    """Chi-square independence test: is event type independent of
    day-of-week? The categorical drift/seasonality screen next to the
    numeric KS test (``events_ks_test``) and the distributional TV
    audit (``corpus_source_drift``). Each cell's (O−E)²/E term is
    floor-quantized to integer micros BEFORE summing — the established
    order-independence trick (float sums depend on partial-merge
    order; integer sums don't), making the statistic bit-exact
    cross-engine. dof = (types−1)(days−1) as usual.

    Scale: one grouped pass over events builds the contingency table
    (|types|×7 cells — tiny); marginals and the total are aggregates
    OF THE CELL TABLE, broadcast back; everything after the first
    shuffle is constant-size."""
    o = (
        load(spark, d, "events")
        .groupBy(
            "event_type", F.dayofweek("ts").alias("dow")
        )
        .agg(F.count("*").alias("obs"))
    )
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("row_n"))
    ct = o.groupBy("dow").agg(F.sum("obs").alias("col_n"))
    n = o.agg(F.sum("obs").alias("total"))
    e = F.col("row_n") * F.col("col_n") / F.col("total")
    term = F.floor(
        (F.col("obs") - e) * (F.col("obs") - e) / e * 1e6
    ).cast("long")
    terms = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(term.alias("term_micros"))
    )
    dof = (
        rt.agg(F.count("*").alias("nr"))
        .crossJoin(ct.agg(F.count("*").alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"))
    )
    return (
        terms.agg(
            F.coalesce(F.sum("term_micros"), F.lit(0))
            .cast("long")
            .alias("chi2_micros")
        )
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dof))
        .select(
            F.coalesce(F.col("total"), F.lit(0)).cast("long").alias("n_events"),
            F.col("dof").cast("long").alias("dof"),
            "chi2_micros",
        )
    )


#: Holt smoothing constants — exact binary fractions so every fold
#: step is the same IEEE multiply/add sequence on both engines
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25


@register(
    "window_holt",
    oracle=f"""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    ), folded AS (
      -- accumulator is a 2-element DOUBLE LIST [level, trend], not a
      -- struct: DuckDB 1.0's list_reduce mis-evaluates struct
      -- accumulators across iterations (verified: each single step is
      -- correct, chained steps corrupt the second field), and bare
      -- 0.5 literals are DECIMAL and would quantize the fold
      SELECT user_id, len(vals) AS n_obs,
             list_reduce(
               list_prepend(
                 [vals[1], CAST(0.0 AS DOUBLE)],
                 list_transform(vals[2:len(vals)],
                                x -> [x, CAST(NULL AS DOUBLE)])),
               (acc, e) -> [
                 CAST({HOLT_ALPHA} AS DOUBLE) * e[1]
                 + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (acc[1] + acc[2]),
                 CAST({HOLT_BETA} AS DOUBLE)
                 * ((CAST({HOLT_ALPHA} AS DOUBLE) * e[1]
                     + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (acc[1] + acc[2]))
                    - acc[1])
                 + CAST({1 - HOLT_BETA} AS DOUBLE) * acc[2]]
             ) AS st
      FROM s
    )
    SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS trend,
           ROUND(st[1] + st[2], 6) AS forecast
    FROM folded
    """,
)
def window_holt(spark: SparkSession, d: str) -> DataFrame:
    """Holt double-exponential smoothing per user series — the
    trend-aware extension of ``window_ewma``: level and trend states
    folded through the whole ordered series (l ← αx + (1−α)(l+b),
    b ← β(l−l_prev) + (1−β)b, init l=x₀ b=0), emitting each user's
    final state and one-step forecast l+b. A sequential recurrence NO
    window frame can express — the second member of the fold family
    (EWMA, survival curve): collect the ordered series in-row, fold
    once. α/β are exact binary fractions and both engines run the
    identical fold order, so the floats are bit-exact before the
    final rounding.

    Scale: one shuffle groups each user's series; the fold is in-row
    compute. Per-user series must fit a row (same envelope as every
    collected-frame op here) — at 100 TB you'd window the series per
    (user, month) first, which composes with this same fold."""
    ev = load(spark, d, "events")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    a, b_ = HOLT_ALPHA, HOLT_BETA
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.struct(
            F.element_at(F.col("vals"), 1).alias("l"),
            F.lit(0.0).alias("b"),
        ),
        lambda acc, x: F.struct(
            (F.lit(a) * x + F.lit(1 - a) * (acc.l + acc.b)).alias("l"),
            (
                F.lit(b_)
                * ((F.lit(a) * x + F.lit(1 - a) * (acc.l + acc.b)) - acc.l)
                + F.lit(1 - b_) * acc.b
            ).alias("b"),
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(vals.alias("vals"))
        .withColumn("st", fold)
        .select(
            "user_id",
            F.size("vals").cast("long").alias("n_obs"),
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(F.col("st.l") + F.col("st.b"), 6).alias("forecast"),
        )
    )


@register(
    "impute_group_median",
    oracle="""
    WITH masked AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
      FROM events
    ), med AS (
      SELECT event_type,
             PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM masked WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT m.event_id, m.event_type,
           COALESCE(m.value, med.med) AS value_filled,
           m.value IS NULL AS was_imputed
    FROM masked m JOIN med USING (event_type)
    """,
)
def impute_group_median(spark: SparkSession, d: str) -> DataFrame:
    """Missing-value imputation by per-group median — the ETL staple
    for sensor dropout / partial-ingest gaps: fill each NULL measure
    with the MEDIAN of its group's observed values (median, not mean,
    so one corrupt spike can't poison the fill). Dropout is simulated
    deterministically (event_id % 7) since the synthetic feed has no
    nulls; PERCENTILE_DISC keeps the fill an actual observed value and
    is deterministic cross-engine (ANSI: first value at cume_dist >=
    0.5 — same construct sql_percentile_within_group pins).

    Scale: one grouped exact-percentile pass (per-type sort; swap in
    approx_percentile for heavy-hitter groups at 100 TB) collapses to
    an O(|event types|) median table that BROADCASTS back over the
    fact scan — the fill itself is a narrow coalesce, no second
    shuffle of the fact table."""
    masked = load(spark, d, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("value"),
    )
    med = (
        masked.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
            ).alias("med")
        )
    )
    return masked.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.coalesce(F.col("value"), F.col("med")).alias("value_filled"),
        F.col("value").isNull().alias("was_imputed"),
    )


@register(
    "events_seasonal_dow",
    oracle="""
    WITH cell AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,6))) AS s
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, SUM(n_events) AS n_tot, SUM(s) AS s_tot
      FROM cell GROUP BY 1
    )
    SELECT c.event_type, CAST(c.dow AS INT) AS dow,
           CAST(c.n_events AS BIGINT) AS n_events,
           ROUND(CAST(c.s AS DOUBLE) / c.n_events, 6) AS dow_avg,
           ROUND((CAST(c.s AS DOUBLE) / c.n_events)
                 / (CAST(t.s_tot AS DOUBLE) / t.n_tot), 6) AS seasonal_index
    FROM cell c JOIN tot t USING (event_type)
    """,
)
def events_seasonal_dow(spark: SparkSession, d: str) -> DataFrame:
    """Day-of-week seasonal index per event type — the seasonality
    decomposition a metrics warehouse publishes next to the trend
    smoothers (``window_holt``, ``window_ewma``): index > 1 means that
    weekday runs hot vs the type's overall mean, and dividing a
    series by its index is the classic deseasonalization step. Sums
    ride DECIMAL(27,6) (value is 2-decimal, so the cast is exact and
    the sum order-independent) and become doubles only at the two
    final divisions; dayofweek is aligned across engines the same way
    as ``events_chi_square`` (+1 on the DuckDB side).

    Scale: one grouped pass collapses events to |types|x7 cells; the
    per-type totals aggregate the CELL table and broadcast back —
    constant-size work after the first shuffle."""
    cell = (
        load(spark, d, "events")
        .groupBy("event_type", F.dayofweek("ts").alias("dow"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DECV)).alias("s"),
        )
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("n_events").alias("n_tot"), F.sum("s").alias("s_tot")
    )
    dow_avg = F.col("s").cast("double") / F.col("n_events")
    type_avg = F.col("s_tot").cast("double") / F.col("n_tot")
    return cell.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(dow_avg, 6).alias("dow_avg"),
        F.round(dow_avg / type_avg, 6).alias("seasonal_index"),
    )


BOLL_WIN = 8
BOLL_MIN = 4


@register(
    "window_bollinger",
    oracle=f"""
    WITH w AS (
      SELECT user_id, event_id, ts, value,
             COUNT(value) OVER f AS n_win,
             SUM(CAST(value AS DECIMAL(18,6))) OVER f AS s,
             SUM(CAST(value AS DECIMAL(18,6))
                 * CAST(value AS DECIMAL(18,6))) OVER f AS ssq
      FROM events
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {BOLL_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value,
           CAST(n_win AS BIGINT) AS n_win,
           CASE WHEN n_win >= {BOLL_MIN} THEN
             ROUND(CAST(s AS DOUBLE) / n_win, 6) END AS mean_w,
           CASE WHEN n_win >= {BOLL_MIN} THEN
             ROUND(sqrt(GREATEST(CAST(ssq AS DOUBLE) / n_win
                   - (CAST(s AS DOUBLE) / n_win)
                     * (CAST(s AS DOUBLE) / n_win), 0)), 6) END AS std_w,
           CASE WHEN n_win >= {BOLL_MIN} THEN
             value > CAST(s AS DOUBLE) / n_win
                     + 2 * sqrt(GREATEST(CAST(ssq AS DOUBLE) / n_win
                       - (CAST(s AS DOUBLE) / n_win)
                         * (CAST(s AS DOUBLE) / n_win), 0))
             OR value < CAST(s AS DOUBLE) / n_win
                     - 2 * sqrt(GREATEST(CAST(ssq AS DOUBLE) / n_win
                       - (CAST(s AS DOUBLE) / n_win)
                         * (CAST(s AS DOUBLE) / n_win), 0))
           END AS breakout
    FROM w
    """,
)
def window_bollinger(spark: SparkSession, d: str) -> DataFrame:
    """Bollinger-band anomaly gating per user series: each event is
    judged against the mean ± 2σ of its PRIOR BOLL_WIN-row window
    (current row excluded — the honest streaming semantics: a spike
    must not widen the band that judges it), completing the despiking
    family next to ``window_hampel`` (median/MAD robust twin) and
    ``anomaly_cusum`` (drift). Sums and squares ride DECIMAL (value is
    2-decimal, squares 4-decimal — both exact), turning into doubles
    only in the final mean/variance/sqrt sequence, mirrored
    operation-for-operation across engines; warm-up rows (< BOLL_MIN
    priors) emit NULL bands rather than unstable estimates.

    Scale: one window pass partitioned by user_id (high-cardinality)
    over a bounded row frame — no global sort, no second shuffle."""
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-BOLL_WIN, -1)
    )
    dv = F.col("value").cast(DECV)
    w = load(spark, d, "events").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count("value").over(f).alias("n_win"),
        F.sum(dv).over(f).alias("s"),
        F.sum(dv * dv).over(f).alias("ssq"),
    )
    mean = F.col("s").cast("double") / F.col("n_win")
    var = F.greatest(
        F.col("ssq").cast("double") / F.col("n_win") - mean * mean, F.lit(0.0)
    )
    std = F.sqrt(var)
    ok = F.col("n_win") >= BOLL_MIN
    return w.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("n_win").cast("long").alias("n_win"),
        F.when(ok, F.round(mean, 6)).alias("mean_w"),
        F.when(ok, F.round(std, 6)).alias("std_w"),
        F.when(
            ok,
            (F.col("value") > mean + 2 * std)
            | (F.col("value") < mean - 2 * std),
        ).alias("breakout"),
    )


CORR_WIN = 7  # trailing days in the rolling-correlation frame


@register(
    "window_rolling_corr",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS x,
             CAST(COUNT(*) AS DECIMAL(15,3)) AS y
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, d, x, y,
             COUNT(*) OVER f AS n,
             SUM(x) OVER f AS sx, SUM(y) OVER f AS sy,
             SUM(x * x) OVER f AS sxx, SUM(y * y) OVER f AS syy,
             SUM(x * y) OVER f AS sxy
      FROM daily
      WINDOW f AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN {CORR_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d AS day,
           CAST(x AS DOUBLE) AS day_value,
           CAST(y AS BIGINT) AS day_events,
           CAST(n AS BIGINT) AS n_win,
           CASE WHEN n >= {CORR_WIN}
                 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
           THEN ROUND(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           END AS corr_w
    FROM w
    """,
)
def window_rolling_corr(spark: SparkSession, d: str) -> DataFrame:
    """Rolling Pearson correlation between two per-day series (daily
    value total vs daily event count, per event type) over a trailing
    CORR_WIN-day row frame — the moving co-movement diagnostic behind
    "did volume decouple from value this week" monitoring, completing
    the rolling family next to ``window_bollinger`` (one-series bands)
    and the global ``agg_corr``. The daily x totals are ROUNDED ONCE
    to DECIMAL(15,3) at the grain change (narrow enough that the
    cross-moment products stay inside 128-bit decimals in BOTH
    engines), then every windowed moment
    (Σx, Σy, Σx², Σy², Σxy) accumulates in DECIMAL — order-independent
    and bit-identical cross-engine — becoming doubles only inside the
    final r formula; warm-up rows (< CORR_WIN days) and zero-variance
    windows emit NULL rather than unstable estimates.

    Scale: one grouped pass collapses events to |types|×|days| cells,
    then one window pass partitioned by event_type over the tiny daily
    table — the corpus is touched once."""
    daily = (
        load(spark, d, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("x"),
            F.count("*").cast("decimal(15,3)").alias("y"),
        )
    )
    f = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(CORR_WIN - 1), 0)
    )
    w = daily.select(
        "event_type",
        "d",
        "x",
        "y",
        F.count("*").over(f).alias("n"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(f).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(f).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    return w.select(
        "event_type",
        F.col("d").alias("day"),
        F.col("x").cast("double").alias("day_value"),
        F.col("y").cast("long").alias("day_events"),
        F.col("n").cast("long").alias("n_win"),
        F.when(
            (F.col("n") >= CORR_WIN) & (vx > 0) & (vy > 0),
            F.round((nd * sxy - sx * sy) / F.sqrt(vx * vy), 6),
        ).alias("corr_w"),
    )


IQR_K = 1.5  # Tukey fence multiplier


@register(
    "anomaly_iqr",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), q AS (
      SELECT event_type, n,
             MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                      THEN value END) AS q1,
             MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                      THEN value END) AS q3
      FROM ranked GROUP BY event_type, n
    )
    SELECT e.event_type,
           CAST(q.n AS BIGINT) AS n,
           q.q1 AS q1, q.q3 AS q3,
           ROUND(q.q3 - q.q1, 6) AS iqr,
           ROUND(q.q1 - {IQR_K} * (q.q3 - q.q1), 6) AS fence_lo,
           ROUND(q.q3 + {IQR_K} * (q.q3 - q.q1), 6) AS fence_hi,
           CAST(SUM(CASE WHEN e.value < q.q1 - {IQR_K} * (q.q3 - q.q1)
                           OR e.value > q.q3 + {IQR_K} * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type, q.n, q.q1, q.q3
    """,
)
def anomaly_iqr(spark: SparkSession, d: str) -> DataFrame:
    """Tukey-fence (IQR) outlier gate per event type — the
    boxplot-rule member of the robust-anomaly family (``anomaly_mad``
    = median/MAD, ``agg_zscore_outliers`` = moment-based,
    ``window_hampel`` = rolling): quartiles as DISCRETE order
    statistics (rn = ceil(q·n) under an explicit (value, event_id)
    tiebreak — actual observed values, no interpolation ambiguity
    cross-engine), fences at q ± IQR_K·IQR, and the per-type census of
    rows outside them. Everything is picked or counted, never
    float-summed, so both engines agree bit-for-bit before the final
    display rounds.

    Scale: one window pass keyed by event_type ranks each group, the
    quartile table collapses to |types| rows and broadcasts back over
    the second scan for the outlier count — no all-row sort, no
    single-partition stage."""
    e = load(spark, d, "events")
    rw = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(cw).alias("n"),
    )
    q = ranked.groupBy("event_type", "n").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.25 * F.col("n")).cast("long"),
                F.col("value"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long"),
                F.col("value"),
            )
        ).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - IQR_K * iqr
    hi = F.col("q3") + IQR_K * iqr
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.sum(
                F.when((F.col("value") < lo) | (F.col("value") > hi), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "q1",
            "q3",
            F.round(iqr, 6).alias("iqr"),
            F.round(lo, 6).alias("fence_lo"),
            F.round(hi, 6).alias("fence_hi"),
            "n_outliers",
        )
    )


@register(
    "events_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS x
      FROM events GROUP BY 1, 2
    ), f AS (
      SELECT event_type, d, x,
             lag(x) OVER (PARTITION BY event_type ORDER BY d) AS fc
      FROM daily
    )
    SELECT event_type,
           CAST(COUNT(fc) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(abs(x - fc)) AS DOUBLE) / COUNT(fc), 6) AS mae,
           ROUND(CAST(SUM(abs(x - fc)) AS DOUBLE)
                 / CAST(SUM(CASE WHEN fc IS NOT NULL THEN abs(x) END)
                        AS DOUBLE), 6) AS wape
    FROM f GROUP BY event_type
    """,
)
def events_forecast_backtest(spark: SparkSession, d: str) -> DataFrame:
    """Naive-forecast backtest (MAE + WAPE per event type): score the
    persistence forecast "tomorrow = today" over the daily series —
    the floor every real forecasting model must beat, and the shape of
    ANY backtest join (forecast column lagged alongside actuals,
    scored only where a forecast exists). Daily totals are rounded
    ONCE to DECIMAL(15,3) at the grain change; absolute errors then
    accumulate in DECIMAL (order-independent) and turn into doubles
    only at the two final divisions. WAPE (Σ|err|/Σ|actual|) rather
    than MAPE — no per-day division, so zero-valued days cannot blow
    up the metric.

    Scale: one grouped pass to the daily grain, one lag window per
    type over the tiny daily table, one |types|-row aggregate."""
    daily = (
        load(spark, d, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    f = daily.withColumn("fc", F.lag("x").over(w))
    err = F.abs(F.col("x") - F.col("fc"))
    return f.groupBy("event_type").agg(
        F.count("fc").cast("long").alias("n_days"),
        F.round(
            F.sum(err).cast("double") / F.count("fc"), 6
        ).alias("mae"),
        F.round(
            F.sum(err).cast("double")
            / F.sum(
                F.when(F.col("fc").isNotNull(), F.abs(F.col("x")))
            ).cast("double"),
            6,
        ).alias("wape"),
    )


@register(
    "agg_geomean",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             CAST(floor(ln(l_extendedprice) * 1000000) AS BIGINT) AS lnm
      FROM lineitem WHERE l_extendedprice > 0
    )
    SELECT l_returnflag AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(lnm) AS BIGINT) AS log_sum_micros,
           ROUND(exp(CAST(SUM(lnm) AS DOUBLE) / 1000000.0 / COUNT(*)), 2)
             AS geomean
    FROM t GROUP BY l_returnflag
    """,
)
def agg_geomean(spark: SparkSession, d: str) -> DataFrame:
    """Exact-accumulation geometric mean per group — the right average
    for multiplicative quantities (growth rates, price relatives,
    latency ratios) where the arithmetic mean over-weights spikes.
    Each ln(x) term is floor-quantized to integer micros BEFORE the
    sum (the repo's order-independence recipe — float sums depend on
    partial-merge order, BIGINT sums don't), so ``log_sum_micros`` is
    bit-exact cross-engine and the only float steps are one division
    and one exp, rounded to cents (exp is not correctly-rounded
    across libms; at 1e-2 granularity a last-ulp disagreement cannot
    flip the rounding).

    Scale: one map-side-combinable grouped pass; positive-value guard
    keeps ln total."""
    li = load(spark, d, "lineitem").where(F.col("l_extendedprice") > 0)
    lnm = F.floor(F.log(F.col("l_extendedprice")) * 1000000).cast("long")
    return (
        li.select("l_returnflag", lnm.alias("lnm"))
        .groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("lnm").cast("long").alias("log_sum_micros"),
            F.round(
                F.exp(
                    F.sum("lnm").cast("double") / 1000000.0 / F.count("*")
                ),
                2,
            ).alias("geomean"),
        )
    )


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'orders->customer' AS relation,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM orders o
                 LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                 WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphan_children,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_parent,
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey))
                AS BIGINT) AS n_unreferenced_parents
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            LEFT JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_partkey IS NULL),
           (SELECT COUNT(*) FROM part),
           (SELECT COUNT(*) FROM part p
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_partkey = p.p_partkey))
    UNION ALL
    SELECT 'events->customer',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events e
            LEFT JOIN customer c ON e.user_id = c.c_custkey
            WHERE c.c_custkey IS NULL),
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM events e
                              WHERE e.user_id = c.c_custkey))
    """,
)
def dq_referential_integrity(spark: SparkSession, d: str) -> DataFrame:
    """Referential-integrity census across the star schema — the
    foreign-key checks a lakehouse cannot enforce at write time (no FK
    constraints on parquet) and therefore MUST audit: per relation,
    orphaned children (facts pointing at no dimension row — silent
    row loss in every inner join downstream) and unreferenced parents
    (dead SKUs / inactive customers — the coverage side). Each
    relation costs one left-anti count in each direction over the keys
    only; ``dq_expectations`` covers column-level predicates, this op
    covers the cross-table contract.

    Scale: per relation two key-projected anti-joins (dim side
    broadcasts); counts are map-side combined. The union of three
    1-row frames is model-state."""
    def audit(rel: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        orphans = child.join(
            F.broadcast(parent), child[ckey] == parent[pkey], "left_anti"
        )
        unref = parent.join(child, parent[pkey] == child[ckey], "left_anti")
        return (
            child.agg(F.count("*").cast("long").alias("n_child"))
            .crossJoin(
                orphans.agg(
                    F.count("*").cast("long").alias("n_orphan_children")
                )
            )
            .crossJoin(
                parent.agg(F.count("*").cast("long").alias("n_parent"))
            )
            .crossJoin(
                unref.agg(
                    F.count("*").cast("long").alias("n_unreferenced_parents")
                )
            )
            .select(
                F.lit(rel).alias("relation"),
                "n_child",
                "n_orphan_children",
                "n_parent",
                "n_unreferenced_parents",
            )
        )

    cust = load(spark, d, "customer").select("c_custkey")
    rels = [
        audit(
            "orders->customer",
            load(spark, d, "orders").select("o_custkey"),
            "o_custkey",
            cust,
            "c_custkey",
        ),
        audit(
            "lineitem->part",
            load(spark, d, "lineitem").select("l_partkey"),
            "l_partkey",
            load(spark, d, "part").select("p_partkey"),
            "p_partkey",
        ),
        audit(
            "events->customer",
            load(spark, d, "events").select("user_id"),
            "user_id",
            cust,
            "c_custkey",
        ),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionAll(r)
    return out


@register(
    "events_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT v.user_id,
             MIN(e.ts) AS first_purchase, MAX(v.first_view) AS fv
      FROM v JOIN events e ON e.user_id = v.user_id
       AND e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY v.user_id
    ), deltas AS (
      SELECT user_id,
             CAST(epoch_us(first_purchase) - epoch_us(fv) AS BIGINT)
               AS delta_us,
             ROW_NUMBER() OVER (ORDER BY epoch_us(first_purchase)
                                - epoch_us(fv), user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM p
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converters,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN delta_us END) AS p50_us,
           MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                    THEN delta_us END) AS p90_us
    FROM deltas
    """,
)
def events_time_to_convert(spark: SparkSession, d: str) -> DataFrame:
    """Time-to-convert distribution — the latency between a user's
    FIRST view and their first purchase AT OR AFTER it, summarized as
    discrete p50/p90 (actual observed microsecond deltas picked by the
    rn = ceil(q·n) order statistic, the same no-interpolation recipe
    as ``anomaly_iqr`` — exact cross-engine). The conversion funnel's
    "how long", next to ``funnel_conversion``'s "how many"; the
    ordering constraint (purchase ≥ first view) is the same
    order-aware matching, in time units.

    Scale: two user-keyed aggregates sharing one shuffle shape, then
    an order statistic over the converters table computed with the
    distributed global-ranking recipe (_global_running_sums: range
    shuffle + per-partition windows + O(#partitions) driver offsets —
    converters are O(users), so a single-partition sort would be a
    real bottleneck, not model state); deltas are integer micros end
    to end."""
    e = load(spark, d, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase"),
            F.max("first_view").alias("fv"),
        )
    )
    us = (
        F.unix_micros(F.col("first_purchase")) - F.unix_micros(F.col("fv"))
    ).alias("delta_us")
    deltas = p.select("user_id", us, F.lit(1).cast("long").alias("_one"))
    ranked, (n_conv,) = _global_running_sums(
        deltas, ["delta_us", "user_id"], ["_one"], with_totals=True
    )
    ranked = ranked.withColumnRenamed("run__one", "rn")
    # COUNT(*) == the running-_one fold's final accumulator; literal
    # re-entry saves recomputing the two-aggregate converters table
    n_tot = spark.createDataFrame([(n_conv,)], "n long")
    ranked = ranked.crossJoin(F.broadcast(n_tot))
    return ranked.agg(
        F.max("n").cast("long").alias("n_converters"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.50 * F.col("n")).cast("long"),
                F.col("delta_us"),
            )
        ).alias("p50_us"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.90 * F.col("n")).cast("long"),
                F.col("delta_us"),
            )
        ).alias("p90_us"),
    )


MARKOV_POWER_ROUNDS = 4


def _stationary_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    sql = f"""
    WITH trans AS ({ORACLES["markov_transitions"]}),
    tot AS (SELECT cur, SUM(n) AS t FROM trans GROUP BY cur),
    p0 AS (
      SELECT cur AS type,
             1000000 // (SELECT COUNT(DISTINCT cur) FROM trans) AS m
      FROM (SELECT DISTINCT cur FROM trans)
    )"""
    for i in range(1, MARKOV_POWER_ROUNDS + 1):
        sql += f""", p{i} AS (
      SELECT tr.nxt AS type, SUM((p.m * tr.n) // tt.t) AS m
      FROM trans tr
      JOIN p{i - 1} p ON p.type = tr.cur
      JOIN tot tt ON tt.cur = tr.cur
      GROUP BY tr.nxt
    )"""
    return sql + f"""
    SELECT type AS event_type,
           CAST(m AS BIGINT) AS stationary_micros,
           ROUND(CAST(m AS DOUBLE) / 1000000.0, 6) AS stationary
    FROM p{MARKOV_POWER_ROUNDS}
    """


@register("events_markov_stationary", oracle=_stationary_oracle())
def events_markov_stationary(spark: SparkSession, d: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — power
    iteration of ``markov_transitions``' matrix from the uniform start
    (where does user attention CONVERGE, the chain's long-run answer
    to "which state dominates"; the same fixed-point PageRank computes
    on the doc graph, here on the behavioral model). All arithmetic is
    INTEGER: the mass vector lives in micros and each update term is
    (π_i·n_ij) div t_i — integral division, so every round is
    bit-exact cross-engine with no float-summation order to pin
    (flooring leaks ≤|types| micros of mass per round, an audit-grade
    approximation documented here; the oracle unrolls identical
    rounds as CTEs).

    Scale: the transition matrix is |types|² = model state; each round
    is a broadcast join + tiny aggregate — corpus is touched once by
    the transition census."""
    trans = markov_transitions(spark, d).select("cur", "nxt", "n")
    # cache, NOT localCheckpoint: the matrix is reused 7× (totals,
    # spine, 4 power rounds) and cache is a lazy plan barrier —
    # localCheckpoint(eager=False) is NOT lazy under AQE (toRdd
    # materializes every query stage at checkpoint time, round-9
    # lazy-audit finding), and no loop lineage needs truncating at
    # MARKOV_POWER_ROUNDS=4.
    trans = trans.cache()
    tot = trans.groupBy("cur").agg(F.sum("n").alias("t"))
    # |types| as a broadcast 1-row aggregate, NOT a driver-side
    # count(): plan construction stays fully lazy (the
    # dq_hash_uniformity discipline) and the division mirrors the
    # oracle's scalar subquery exactly. Empty input: the distinct
    # spine is empty, so the crossJoin emits nothing — no rows ever
    # divide by the (absent) zero.
    nt = trans.select("cur").distinct().agg(
        F.count("*").cast("long").alias("_nt")
    )
    pi = (
        trans.select("cur")
        .distinct()
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("cur").alias("type"),
            F.expr("1000000 DIV _nt").cast("long").alias("m"),
        )
    )
    for _ in range(MARKOV_POWER_ROUNDS):
        pi = (
            trans.join(F.broadcast(pi), trans["cur"] == F.col("type"))
            .join(F.broadcast(tot), "cur")
            .select(
                "nxt",
                F.expr("(m * n) DIV t").alias("term"),
            )
            .groupBy(F.col("nxt").alias("type"))
            .agg(F.sum("term").cast("long").alias("m"))
        )
    return pi.select(
        F.col("type").alias("event_type"),
        F.col("m").alias("stationary_micros"),
        F.round(F.col("m").cast("double") / 1000000.0, 6).alias("stationary"),
    )


#: Poisson(1) inverse-CDF thresholds in integer micros (cumulative
#: P(X<=k), k=0..7): a hash-uniform below threshold k gets weight <= k.
#: Literal integers so both engines compare identically.
BOOT_CUM_MICROS = [367879, 735759, 919699, 980988, 996340, 999406,
                   999917, 999990]
BOOT_REPLICATES = 8


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH w AS (
      SELECT r.r AS replicate, e.value,
             len(list_filter({BOOT_CUM_MICROS},
                 t -> t <= ({{h}} % 1000000))) AS wt
      FROM events e
      CROSS JOIN (SELECT unnest(range(0, {BOOT_REPLICATES})) AS r) r
    )
    SELECT CAST(replicate AS BIGINT) AS replicate,
           CAST(SUM(wt) AS BIGINT) AS n_eff,
           ROUND(CAST(SUM(CAST(wt AS DECIMAL(18,6))
                          * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / SUM(wt), 6) AS rep_mean
    FROM w GROUP BY replicate
    """.replace(
        "{h}",
        DUCK_HASH60.format(
            x="e.event_id::VARCHAR || ':boot:' || r.r::VARCHAR"
        ),
    ),
)
def sample_poisson_bootstrap(spark: SparkSession, d: str) -> DataFrame:
    """Poisson bootstrap — the SCALABLE bootstrap: instead of
    resampling n rows with replacement (impossible distributed — it
    needs global coordination), every row independently draws a
    Poisson(1) weight per replicate (the n→∞ limit of Binomial(n,1/n))
    and each replicate's statistic is the weighted mean; the spread of
    the replicate means IS the standard error, no second pass over the
    data. Weights come from a salted-hash uniform pushed through the
    Poisson inverse CDF as integer-micro thresholds — deterministic,
    reproducible, engine-identical (never rand()); weighted sums ride
    DECIMAL.

    Scale: one scan fans out ×R in-task and map-side combines to R
    rows per partition before the tiny R-key shuffle — the bootstrap
    costs one pass regardless of corpus size, which is the method's
    entire reason to exist."""
    e = load(spark, d, "events")
    r = F.explode(
        F.sequence(F.lit(0), F.lit(BOOT_REPLICATES - 1))
    ).alias("replicate")
    u = hash60(
        F.concat(
            F.col("event_id").cast("string"),
            F.lit(":boot:"),
            F.col("replicate").cast("string"),
        )
    ) % 1000000
    # _let-bind the hash before the threshold filter: referenced
    # directly inside the lambda, the md5 re-evaluates once per
    # threshold (|BOOT_CUM_MICROS|× per row-replicate — the standard
    # interpreted-HOF no-CSE hazard; 35 s at the 10× probe)
    from pro_etl_spark.ops.multimodal import _let

    wt = _let(
        u,
        lambda uu: F.size(
            F.filter(
                F.array(*[F.lit(t).cast("long") for t in BOOT_CUM_MICROS]),
                lambda t: t <= uu,
            )
        ).cast("long"),
    )
    return (
        e.select("event_id", "value", r)
        .select("replicate", "value", wt.alias("wt"))
        .groupBy(F.col("replicate").cast("long").alias("replicate"))
        .agg(
            F.sum("wt").cast("long").alias("n_eff"),
            F.round(
                F.sum(
                    F.col("wt").cast(DECV) * F.col("value").cast(DECV)
                ).cast("double")
                / F.sum("wt"),
                6,
            ).alias("rep_mean"),
        )
    )


@register(
    "events_seasonal_residual",
    oracle="""
    WITH cell AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS dow_mean
      FROM events GROUP BY 1, 2
    ), res AS (
      SELECT e.event_type,
             e.value - c.dow_mean AS r
      FROM events e
      JOIN cell c ON c.event_type = e.event_type
                 AND c.dow = dayofweek(e.ts) + 1
    ), m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(r AS DECIMAL(27,6))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(r * r AS DECIMAL(27,6))) AS DOUBLE) AS srr
      FROM res GROUP BY event_type
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           ROUND(sqrt(GREATEST(srr / n - (sr / n) * (sr / n), 0)), 6)
             AS sigma_r,
           CAST((SELECT COUNT(*) FROM res
                 WHERE res.event_type = m.event_type
                   AND abs(res.r) > 3 * sqrt(GREATEST(
                         m.srr / m.n - (m.sr / m.n) * (m.sr / m.n), 0)))
                AS BIGINT) AS n_anomalies
    FROM m
    """,
)
def events_seasonal_residual(spark: SparkSession, d: str) -> DataFrame:
    """Seasonally-adjusted anomaly gate: subtract each event's
    (type, day-of-week) mean FIRST, then threshold the residual at
    3σ — the deseasonalization step ``agg_zscore_outliers`` skips,
    which matters because a weekly-periodic metric flags every Sunday
    as anomalous under a raw z-score while a real Sunday spike hides
    inside the weekly swing. Cell means and residual moments are
    DECIMAL-routed (order-independent); the quantization of r² to
    6 decimals happens per row BEFORE the sum, both engines identical;
    dayofweek alignment follows the events_chi_square recipe (+1 on
    the DuckDB side).

    Scale: one grouped pass to |types|×7 cells (broadcast back), one
    residual pass with the per-type moment aggregate and the anomaly
    census sharing a partitioning — the corpus is scanned twice,
    shuffled once."""
    e = load(spark, d, "events")
    cell = (
        e.groupBy("event_type", F.dayofweek("ts").alias("dow"))
        .agg(
            (
                F.sum(F.col("value").cast(DECV)).cast("double")
                / F.count("*")
            ).alias("dow_mean")
        )
    )
    res = e.withColumn("dow", F.dayofweek("ts")).join(
        F.broadcast(cell), ["event_type", "dow"]
    ).select("event_type", (F.col("value") - F.col("dow_mean")).alias("r"))
    res = res.cache()
    m = res.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("r").cast("decimal(27,6)")).cast("double").alias("sr"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(27,6)"))
        .cast("double")
        .alias("srr"),
    )
    sigma = F.sqrt(
        F.greatest(
            F.col("srr") / F.col("n")
            - (F.col("sr") / F.col("n")) * (F.col("sr") / F.col("n")),
            F.lit(0.0),
        )
    )
    flagged = (
        res.join(
            F.broadcast(m.select("event_type", "n", "sr", "srr")),
            "event_type",
        )
        .where(F.abs(F.col("r")) > 3 * sigma)
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_anomalies"))
    )
    return (
        m.join(flagged, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(sigma, 6).alias("sigma_r"),
            F.coalesce("n_anomalies", F.lit(0).cast("long")).alias(
                "n_anomalies"
            ),
        )
    )


VWAP_WIN = 24  # trailing trades in the rolling VWAP frame


@register(
    "window_vwap",
    oracle=f"""
    WITH g AS (
      SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(15,3)) * 1000 AS BIGINT)
               AS p3,
             CAST(CAST(l_quantity AS DECIMAL(9,3)) * 1000 AS BIGINT) AS q3
      FROM lineitem
    ), w AS (
      SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(SUM(p3 * q3) OVER f AS BIGINT) AS p6,
             CAST(SUM(q3) OVER f AS BIGINT) AS v3
      FROM g
      WINDOW f AS (PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN {VWAP_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
           CAST((2 * p6 * 1000 + v3) // (2 * v3) AS DOUBLE) / 1000000.0
             AS vwap,
           CAST(v3 AS DOUBLE) / 1000.0 AS vol_w
    FROM w
    """,
)
def window_vwap(spark: SparkSession, d: str) -> DataFrame:
    """Rolling VWAP (volume-weighted average price) per part over the
    trailing VWAP_WIN trades — the execution-quality benchmark every
    trading/procurement system computes (a fill above rolling VWAP
    overpaid; a PO priced below it beat the market): Σ(price·qty) /
    Σ(qty) over a bounded row frame.

    Rounding is TIE-FREE by construction (r12, fixes the only red
    CORRECTNESS_r11 row): price and qty become exact scaled longs
    (grains ×1000), the windowed sums P6 = Σ(p3·q3) (micros) and
    V3 = Σq3 stay integral, and round-half-up(P6·10⁶/V3·10³) is the
    exact integer division (2·P6·1000 + V3) div (2·V3) — no engine
    ever rounds an IEEE quotient, so the `...5`-at-the-6th-decimal
    lottery that split Spark/DuckDB on 2 of 60k rows at sf0.01 cannot
    recur. Magnitudes: p3·q3 ≤ ~5e12/row, P6 ≤ ~1.2e14 over 24 rows,
    2·P6·1000 ≤ 2.4e17 — comfortably inside int64 in both engines.

    Scale: one window pass partitioned by the high-cardinality part
    key over a bounded frame — no global sort, one shuffle; the
    integer formulation is also cheaper than DECIMAL at width."""
    f = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-(VWAP_WIN - 1), 0)
    )
    li = load(spark, d, "lineitem")
    p3 = (F.col("l_extendedprice").cast("decimal(15,3)") * 1000).cast(
        "long"
    )
    q3 = (F.col("l_quantity").cast("decimal(9,3)") * 1000).cast("long")
    win = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.sum(p3 * q3).over(f).alias("_p6"),
        F.sum(q3).over(f).alias("_v3"),
    )
    # `div` (not `/`) — Spark's `/` on longs is IEEE double division,
    # which is inexact past 2^53; `div` is exact integral division.
    return win.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "CAST((2 * _p6 * 1000 + _v3) div (2 * _v3) AS DOUBLE)"
            " / 1000000.0"
        ).alias("vwap"),
        (F.col("_v3").cast("double") / F.lit(1000.0)).alias("vol_w"),
    )


BURST_BUCKET_MIN = 15  # minutes per arrival-count bucket


@register(
    "events_burstiness",
    oracle=f"""
    WITH buckets AS (
      SELECT event_type, time_bucket(INTERVAL '{BURST_BUCKET_MIN} minutes', ts)
               AS b, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(c) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS mean_rate,
           ROUND((CAST(SUM(c * c) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(c) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(c) AS DOUBLE) / COUNT(*)))
                 / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6) AS fano
    FROM buckets GROUP BY event_type
    """,
)
def events_burstiness(spark: SparkSession, d: str) -> DataFrame:
    """Burstiness (Fano factor / index of dispersion) per event type:
    variance-to-mean ratio of arrival counts in fixed
    BURST_BUCKET_MIN-minute buckets — a Poisson-steady stream scores
    ≈1, machine retry storms and bot bursts score ≫1, throttled/
    regular feeds <1; the one-number triage BEFORE reaching for
    ``anomaly_cusum``'s changepoint machinery. Counts are integers,
    so every moment (Σc, Σc²) is an exact BIGINT sum — no quantization
    needed anywhere before the two final divisions.

    Scale: one grouped pass to |types|×|buckets| cells, then a
    |types|-key aggregate of the cell table."""
    b = (
        load(spark, d, "events")
        .groupBy(
            "event_type",
            F.window("ts", f"{BURST_BUCKET_MIN} minutes")["start"].alias("b"),
        )
        .agg(F.count("*").alias("c"))
    )
    mean = F.sum("c").cast("double") / F.count("*")
    return b.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("n_events"),
        F.round(mean, 6).alias("mean_rate"),
        F.round(
            (
                F.sum(F.col("c") * F.col("c")).cast("double") / F.count("*")
                - mean * mean
            )
            / mean,
            6,
        ).alias("fano"),
    )


TOP_MOVERS_K = 3


@register(
    "events_top_movers",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS x
      FROM events GROUP BY 1, 2
    ), delta AS (
      SELECT event_type, d, x,
             lag(x) OVER (PARTITION BY event_type ORDER BY d) AS px
      FROM daily
    )
    SELECT event_type, d AS day,
           CAST(x AS DOUBLE) AS day_value,
           ROUND(CAST(x - px AS DOUBLE) / CAST(px AS DOUBLE), 6)
             AS pct_change,
           CAST(rnk AS BIGINT) AS move_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY abs(CAST(x - px AS DOUBLE) / CAST(px AS DOUBLE))
                        DESC, d) AS rnk
      FROM delta WHERE px IS NOT NULL AND px <> 0
    ) WHERE rnk <= {TOP_MOVERS_K}
    """,
)
def events_top_movers(spark: SparkSession, d: str) -> DataFrame:
    """Top movers — the K largest day-over-day percentage swings per
    event type (the "what changed" panel every operations dashboard
    leads with): daily totals at the DECIMAL(15,3) grain, lag-1
    deltas, |pct| ranking with a deterministic date tiebreak. The
    pct change divides two decimals cast to double — identical
    operands both engines — and warm-up/zero-base days are excluded
    (a 0→x move is undefined, not infinite).

    Scale: one grouped pass to the daily grain, two windows sharing
    the event_type partitioning over the tiny daily table;
    WindowGroupLimit prunes to K per type before any sort spill."""
    daily = (
        load(spark, d, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    delta = daily.withColumn("px", F.lag("x").over(w)).where(
        F.col("px").isNotNull() & (F.col("px") != 0)
    )
    pct = (F.col("x") - F.col("px")).cast("double") / F.col("px").cast(
        "double"
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(pct).desc(), F.asc("d")
    )
    return (
        delta.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= TOP_MOVERS_K)
        .select(
            "event_type",
            F.col("d").alias("day"),
            F.col("x").cast("double").alias("day_value"),
            F.round(pct, 6).alias("pct_change"),
            F.col("rnk").cast("long").alias("move_rank"),
        )
    )


#: CUPED pre/post pivot — events before this instant form the
#: pre-experiment covariate window, the rest the experiment window
CUPED_PIVOT = "2024-01-16 00:00:00"


@register(
    "ab_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_PIVOT}'
                    THEN CAST(value AS DECIMAL(18,6)) END), 0) AS x,
             COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_PIVOT}'
                    THEN CAST(value AS DECIMAL(18,6)) END), 0) AS y
      FROM events GROUP BY user_id
    ), arm_moments AS (
      SELECT arm, COUNT(*) AS n,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM per_user GROUP BY arm
    ), pooled AS (
      SELECT CAST(SUM(CAST(n AS BIGINT)) AS DOUBLE) AS pn,
             SUM(sx) AS psx, SUM(sy) AS psy,
             SUM(sxy) AS psxy, SUM(sxx) AS psxx
      FROM arm_moments
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           ROUND(sy / n, 6) AS mean_post,
           ROUND((n * syy - sy * sy) / (CAST(n AS DOUBLE) * n), 6)
             AS var_raw,
           ROUND((n * syy - sy * sy) / (CAST(n AS DOUBLE) * n)
                 - 2 * ((pn * psxy - psx * psy) / (pn * psxx - psx * psx))
                     * ((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n))
                 + ((pn * psxy - psx * psy) / (pn * psxx - psx * psx))
                   * ((pn * psxy - psx * psy) / (pn * psxx - psx * psx))
                   * ((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n)), 6)
             AS var_cuped
    FROM arm_moments CROSS JOIN pooled
    """,
)
def ab_cuped(spark: SparkSession, d: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data)
    variance reduction — the standard A/B-test sensitivity booster:
    per user, covariate x = pre-period value sum and outcome y =
    experiment-period value sum; theta = cov(x,y)/var(x) is fit on the
    POOLED population (never per-arm — a per-arm theta re-introduces
    bias), and each arm reports raw vs CUPED-adjusted outcome
    variance, var(y') = var(y) - 2*theta*cov(x,y) + theta^2*var(x).
    The adjusted variance comes from that closed form over exact
    DECIMAL moment partials (n, Sigmax, Sigmay, Sigmaxy, Sigmaxx, Sigmayy), never
    from summing per-user residuals in floating point: double sums are
    partition-order-dependent, the moment identity is not — the same
    discipline as ``agg_corr``.

    Scale: one grouped pass to per-user (x, y) pairs, a 2-row arm
    aggregate, and a broadcast of the 1-row pooled theta — no second
    pass over the raw events, no driver-side data."""
    ev = load(spark, d, "events")
    pivot = F.lit(CUPED_PIVOT).cast("timestamp")
    dec = F.col("value").cast(DECV)
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.coalesce(
            F.sum(F.when(F.col("ts") < pivot, dec)), F.lit(0).cast(DECV)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= pivot, dec)), F.lit(0).cast(DECV)
        ).alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    arm = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    pooled = arm.agg(
        F.sum(F.col("n").cast("long")).cast("double").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )
    j = arm.crossJoin(F.broadcast(pooled))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    nd = n.cast("double")
    theta = (F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")) / (
        F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx")
    )
    var_raw = (n * syy - sy * sy) / (nd * n)
    cov = (n * sxy - sx * sy) / (nd * n)
    var_x = (n * sxx - sx * sx) / (nd * n)
    return j.select(
        F.col("arm").cast("long").alias("arm"),
        n.cast("long").alias("n_users"),
        F.round(sy / n, 6).alias("mean_post"),
        F.round(var_raw, 6).alias("var_raw"),
        F.round(var_raw - 2 * theta * cov + theta * theta * var_x, 6).alias(
            "var_cuped"
        ),
    )


#: DAU/WAU stickiness: trailing window width in days
STICKY_WINDOW_DAYS = 7


@register(
    "events_stickiness",
    oracle=f"""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), spread AS (
      SELECT user_id, d + CAST(i AS INTEGER) AS day
      FROM daily, UNNEST(range(0, {STICKY_WINDOW_DAYS})) AS t(i)
    ), wau AS (
      SELECT day, COUNT(DISTINCT user_id) AS wau FROM spread GROUP BY day
    ), dau AS (
      SELECT d AS day, COUNT(DISTINCT user_id) AS dau FROM daily GROUP BY d
    )
    SELECT dau.day AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau,
           ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
)
def events_stickiness(spark: SparkSession, d: str) -> DataFrame:
    """DAU/WAU stickiness — the product-analytics engagement headline:
    per active day, distinct daily actives over distinct
    trailing-{STICKY_WINDOW_DAYS}-day actives (1.0 = every weekly user
    shows up daily; ~1/7 = users touch once a week). The rolling
    DISTINCT is the trap here: a naive per-day re-scan is O(days x
    events), and count_distinct can't ride a sliding window frame.
    Instead each (day, user) first-touch row FANS OUT to the
    {STICKY_WINDOW_DAYS} future days it keeps alive (in-row sequence
    explode), turning the rolling distinct into a plain equi-keyed
    groupBy — the same forward-spread trick retention systems use.

    Scale: the fan-out is over the DEDUPED (day,user) table (bounded
    by users x days, orders of magnitude under raw events), factor
    {STICKY_WINDOW_DAYS}; both aggregates shuffle on the day key only.
    Inner-joining back to real active days drops the phantom trailing
    days the spread invents past each user's last touch."""
    daily = (
        load(spark, d, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    spread = daily.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(STICKY_WINDOW_DAYS - 1))
        ).alias("i"),
        F.col("d"),
    ).select("user_id", F.expr("date_add(d, i)").alias("day"))
    wau = spread.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = daily.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "funnel_attribution_position",
    oracle=f"""
    WITH touches AS (
      SELECT user_id, event_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ), purchases AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts,
             CAST(value AS DOUBLE) AS revenue
      FROM events WHERE event_type = 'purchase'
    ), trail AS (
      SELECT p.p_id, p.revenue, t.event_type, t.ts, t.event_id,
             ROW_NUMBER() OVER (PARTITION BY p.p_id
                                ORDER BY t.ts, t.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY p.p_id) AS k
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.ts < p.p_ts
       AND t.ts >= p.p_ts - INTERVAL '{ATTR_WINDOW_MIN} minutes'
    ), credited AS (
      SELECT event_type,
             CAST(ROUND(CASE
               WHEN k = 1 THEN 1.0
               WHEN k = 2 THEN 0.5
               WHEN rn = 1 OR rn = k THEN 0.4
               ELSE 0.2 / (k - 2)
             END * revenue, 9) AS DECIMAL(18,9)) AS credit
      FROM trail
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(CAST(SUM(credit) AS VARCHAR) AS DOUBLE) AS credited_revenue
    FROM credited GROUP BY event_type
    """,
)
def funnel_attribution_position(spark: SparkSession, d: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution —
    the standard counterweight to ``funnel_attribution``'s last-touch
    rule: each purchase's credit goes 40% to the FIRST touch in the
    {ATTR_WINDOW_MIN}-minute window, 40% to the LAST, and the middle
    touches split the remaining 20% evenly (1-touch trails take 100%,
    2-touch trails 50/50). Reported per touch channel (click/view).
    Per-touch credits are doubles computed from identical operands in
    both engines, then ROUNDed to DECIMAL(18,9) BEFORE the channel
    sum, so the aggregate is order-independent exact — never a raw
    double sum.

    Scale: purchases x prior-touches is a per-user interval join
    (shuffle keyed user_id, in-partition time filter, trail length
    bounded by the window); ranking windows partition by purchase id —
    millions of tiny partitions, no global sort; the final rollup is a
    |channels|-row aggregate."""
    ev = load(spark, d, "events")
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("double").alias("revenue"),
    )
    trail = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTES")
        ),
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wk = Window.partitionBy("p_id")
    trail = trail.withColumn("rn", F.row_number().over(w)).withColumn(
        "k", F.count("*").over(wk)
    )
    k, rn = F.col("k"), F.col("rn")
    weight = (
        F.when(k == 1, F.lit(1.0))
        .when(k == 2, F.lit(0.5))
        .when((rn == 1) | (rn == k), F.lit(0.4))
        .otherwise(F.lit(0.2) / (k - 2))
    )
    credited = trail.select(
        "event_type",
        F.round(weight * F.col("revenue"), 9)
        .cast("decimal(18,9)")
        .alias("credit"),
    )
    return credited.groupBy("event_type").agg(
        F.count("*").cast("long").alias("touches"),
        F.sum("credit").cast("double").alias("credited_revenue"),
    )


@register(
    "survival_nelson_aalen",
    oracle="""
    WITH span AS (
      SELECT user_id,
             date_diff('day',
                       CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS life,
             CAST(MAX(ts) AS DATE)
               = (SELECT CAST(MAX(ts) AS DATE) FROM events) AS censored
      FROM events GROUP BY user_id
    ), timed AS (
      SELECT user_id, censored,
             CASE WHEN censored THEN life ELSE life + 1 END AS t_obs
      FROM span
    ), days AS (
      SELECT t_obs AS t,
             COUNT(*) FILTER (WHERE NOT censored) AS d,
             COUNT(*) AS leaving
      FROM timed GROUP BY t_obs
    ), risk AS (
      SELECT t, d,
             (SELECT COUNT(*) FROM timed)
               - COALESCE(SUM(leaving) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM days
    ), ev AS (
      SELECT t, d, n_risk,
             CAST(d AS DOUBLE) / n_risk AS inc,
             CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk) AS vinc
      FROM risk WHERE d > 0
    ), packed AS (
      SELECT list(t ORDER BY t) AS ts_l, list(d ORDER BY t) AS ds,
             list(n_risk ORDER BY t) AS ns,
             list(inc ORDER BY t) AS incs, list(vinc ORDER BY t) AS vincs
      FROM ev
    )
    SELECT CAST(ts_l[i] AS BIGINT) AS t,
           CAST(ds[i] AS BIGINT) AS n_deaths,
           CAST(ns[i] AS BIGINT) AS n_risk,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                    list_slice(incs, 1, i)),
                       (acc, v) -> acc + v) AS cum_hazard,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                    list_slice(vincs, 1, i)),
                       (acc, v) -> acc + v) AS var_hazard
    FROM packed, LATERAL (SELECT unnest(range(1, len(ds) + 1)) AS i)
    """,
)
def survival_nelson_aalen(spark: SparkSession, d: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — Kaplan-Meier's
    sibling (``survival_km``, same censoring model: churn = no
    activity after day L, last-corpus-day users censored) reporting
    H(t) = Sigma d_i/n_i and its Poisson variance Sigma d_i/n_i^2 instead of
    the survival product. H(t) is what hazard-regression and
    competing-risk pipelines consume directly, and unlike KM it is
    additive — hazard increments from disjoint shards/time slices
    merge by plain addition. Exactness discipline: the cumulative
    sums are SEQUENTIAL in-row folds over the day-ordered increment
    list (curve-sized), never a float window aggregate whose
    combine order is partition-dependent; both engines fold the same
    list left-to-right, so doubles match bit-for-bit — no exp/log.

    Scale: identical to survival_km — one grouped pass over events,
    a per-day aggregate + one running integer sum, folds on the final
    curve-sized row only."""
    ev = load(spark, d, "events")
    max_day = ev.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    span = (
        ev.groupBy("user_id")
        .agg(
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            ).alias("life"),
            F.max(F.col("ts").cast("date")).alias("last_day"),
        )
        .crossJoin(F.broadcast(max_day))
        .select(
            "life", (F.col("last_day") == F.col("mx")).alias("censored")
        )
    )
    timed = span.select(
        "censored",
        F.when(F.col("censored"), F.col("life"))
        .otherwise(F.col("life") + 1)
        .alias("t_obs"),
    )
    n_total = timed.agg(F.count("*").alias("n_total"))
    days = timed.groupBy(F.col("t_obs").alias("t")).agg(
        F.count_if(~F.col("censored")).alias("d"),
        F.count("*").alias("leaving"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        days.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(wcum), F.lit(0)),
        )
        .where(F.col("d") > 0)
        .select(
            "t",
            "d",
            "n_risk",
            (F.col("d").cast("double") / F.col("n_risk")).alias("inc"),
            (
                F.col("d").cast("double")
                / (F.col("n_risk").cast("double") * F.col("n_risk"))
            ).alias("vinc"),
        )
    )
    packed = risk.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "n_risk", "inc", "vinc"))
        ).alias("curve")
    )
    out = F.transform(
        F.col("curve"),
        lambda s, i: F.struct(
            s.t.alias("t"),
            s.d.alias("n_deaths"),
            s.n_risk.alias("n_risk"),
            F.aggregate(
                F.slice(F.col("curve"), 1, i + 1),
                F.lit(0.0),
                lambda acc, x: acc + x.inc,
            ).alias("cum_hazard"),
            F.aggregate(
                F.slice(F.col("curve"), 1, i + 1),
                F.lit(0.0),
                lambda acc, x: acc + x.vinc,
            ).alias("var_hazard"),
        ),
    )
    return packed.select(F.explode(out).alias("p")).select(
        F.col("p.t").cast("long").alias("t"),
        F.col("p.n_deaths").cast("long").alias("n_deaths"),
        F.col("p.n_risk").cast("long").alias("n_risk"),
        F.col("p.cum_hazard").alias("cum_hazard"),
        F.col("p.var_hazard").alias("var_hazard"),
    )


@register(
    "skyline_pareto_front",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS pmax
      FROM orders GROUP BY 1
    ), front_days AS (
      SELECT day, pmax
      FROM (
        SELECT day, pmax,
               MAX(pmax) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        FROM daily
      ) WHERE prevmax IS NULL OR pmax > prevmax
    )
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders
    JOIN front_days
      ON CAST(o_orderdate AS DATE) = day
     AND CAST(o_totalprice AS DECIMAL(18,2)) = pmax
    """,
)
def skyline_pareto_front(spark: SparkSession, d: str) -> DataFrame:
    """2-D SKYLINE (Pareto front) — orders not dominated on
    (earlier date, higher price): an order is on the front iff no
    other order is both at most as late AND at least as expensive
    (with one strict). The classic skyline operator (Borzsony/
    Kossmann 2001) reduced to its scale-correct 2-D form: collapse to
    the per-day max price (grouped pass), then a single ordered scan
    keeps days whose max strictly exceeds the running max of all
    EARLIER days — O(n) after the groupBy, no pairwise dominance
    join. Equal-price-equal-day orders are mutually non-dominated and
    all kept. Prices compare as DECIMAL(18,2) so the dominance test
    never hinges on a float ulp.

    Scale: the fact table contributes one grouped pass (to |days|
    rows) and one semi-join back; the running-max window runs on the
    date-grain table only — the single-partition exchange moves
    |days| rows, the same model-state posture as ``pareto_abc``."""
    o = load(spark, d, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.max(dec).alias("pmax")
    )
    wprev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        daily.withColumn("prevmax", F.max("pmax").over(wprev))
        .where(F.col("prevmax").isNull() | (F.col("pmax") > F.col("prevmax")))
        .select("day", "pmax")
    )
    return (
        o.join(
            F.broadcast(front),
            (F.col("o_orderdate").cast("date") == F.col("day"))
            & (dec == F.col("pmax")),
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("day"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )


#: rate-limit audit: flag users exceeding this many events in any
#: sliding RATE_WINDOW_SEC-second window
RATE_WINDOW_SEC = 60
RATE_LIMIT = 5


@register(
    "events_rate_limit",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts,
             COUNT(*) OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN {RATE_WINDOW_SEC - 1} PRECEDING
                         AND CURRENT ROW) AS burst
      FROM events
    )
    SELECT user_id,
           CAST(MAX(burst) AS BIGINT) AS peak_rate,
           CAST(COUNT(*) FILTER (WHERE burst > {RATE_LIMIT}) AS BIGINT)
             AS n_violations
    FROM r GROUP BY user_id
    HAVING MAX(burst) > {RATE_LIMIT}
    """,
)
def events_rate_limit(spark: SparkSession, d: str) -> DataFrame:
    """Sliding-window rate-limiter audit — the abuse/bot triage query:
    per user, the count of events in the trailing
    {RATE_WINDOW_SEC}-second window at every event, reported as the
    user's peak rate plus how many events fired while over the
    {RATE_LIMIT}/min limit. The sliding count is a RANGE-frame window
    over epoch seconds — integer, exact, and evaluated per user
    partition (no global ordering anywhere); the same frame a
    streaming enforcement job would keep as state, run here as the
    offline backfill/audit twin of ``stream_topk_state``.

    Scale: one shuffle keyed user_id; within each user partition the
    range frame is a two-pointer pass over that user's timeline.
    Skewed power-users are bounded by their own event count, and the
    final HAVING collapses output to violators only."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-(RATE_WINDOW_SEC - 1), 0)
    )
    r = load(spark, d, "events").withColumn(
        "burst", F.count("*").over(w)
    )
    return (
        r.groupBy("user_id")
        .agg(
            F.max("burst").cast("long").alias("peak_rate"),
            F.count_if(F.col("burst") > RATE_LIMIT)
            .cast("long")
            .alias("n_violations"),
        )
        .where(F.col("peak_rate") > RATE_LIMIT)
    )


#: top-K most common 3-step behavioral paths
PATH_TOP_K = 20


@register(
    "events_path_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT event_type || '>' || t2 || '>' || t3 AS path
      FROM seq WHERE t3 IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM paths GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT {PATH_TOP_K}
    """,
)
def events_path_trigrams(spark: SparkSession, d: str) -> DataFrame:
    """Top-{PATH_TOP_K} behavioral PATHS — the most common 3-step
    event-type sequences across all user journeys (the "what do users
    actually do" census behind funnel design, and the n-gram
    generalization of ``markov_transitions``' single-step matrix:
    trigrams expose second-order structure a first-order Markov chain
    provably cannot, e.g. view>click>purchase vs click>view>purchase).
    Consecutive steps come from two lead() windows per user; ties in
    the top-K are broken by path string so the selection is a total
    order.

    Scale: the sequence pass shuffles once on user_id (each user's
    timeline sorts independently); the path census is a map-side-
    combinable groupBy; the final top-K is TakeOrderedAndProject —
    per-partition heaps merged on the driver, never a global sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, d, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    paths = seq.where(F.col("t3").isNotNull()).select(
        F.concat_ws(">", "event_type", "t2", "t3").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


@register(
    "events_twap",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             date_diff('second', ts,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)) AS dur
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(dur) AS BIGINT) AS n_intervals,
           CAST(SUM(dur) AS BIGINT) AS total_sec,
           ROUND(CAST(CAST(SUM(v * dur) AS VARCHAR) AS DOUBLE)
                 / CAST(SUM(dur) AS DOUBLE), 6) AS twap
    FROM seg WHERE dur IS NOT NULL
    GROUP BY user_id
    """,
)
def events_twap(spark: SparkSession, d: str) -> DataFrame:
    """Time-weighted average (TWAP) of `value` per user — each
    reading counts proportionally to how long it was the CURRENT
    state (seconds until the next event), the correct average for
    irregularly-sampled gauges (sensor readings, position marks,
    feature flags) where the arithmetic mean over-weights bursty
    periods. The final open-ended reading carries no duration and is
    excluded (standard TWAP convention). Weights are integer seconds
    and values ride DECIMAL(18,6), so the weighted sum is
    order-independent exact — the double division happens once per
    user.

    Scale: one window pass and one aggregate, both keyed user_id —
    a single shuffle; no global ordering anywhere."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = load(spark, d, "events").select(
        "user_id",
        F.col("value").cast(DECV).alias("v"),
        (F.lead(F.col("ts").cast("long")).over(w) - F.col("ts").cast("long")).alias(
            "dur"
        ),
    )
    return (
        seg.where(F.col("dur").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("dur").cast("long").alias("n_intervals"),
            F.sum("dur").cast("long").alias("total_sec"),
            F.round(
                F.sum(F.col("v") * F.col("dur")).cast("double")
                / F.sum("dur").cast("double"),
                6,
            ).alias("twap"),
        )
    )


@register(
    "agg_percentile_cont",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_cont(l_quantity, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_cont(spark: SparkSession, d: str) -> DataFrame:
    """Exact CONTINUOUS (interpolating) percentiles — the
    PERCENTILE_CONT semantics: at rank position r = p*(n-1) the value
    is lo + (r - floor(r))*(hi - lo) between the two straddling order
    statistics, vs the discrete nearest-rank family
    (``agg_percentile`` / ``sql_percentile_within_group``). Both
    engines compute the identical interpolation from identical
    operands (l_quantity values are small exact doubles), so the
    result pairs bit-for-bit without rounding. Four quantiles ride
    ONE sort per group, not four.

    Scale: Spark's exact percentile() aggregates per-group sorted
    sketches of the values — fine at dimension-key group counts;
    for a quantile of a 100 TB fact column switch to
    approx_percentile (``agg_approx_percentile``) — this op is the
    exact twin that certifies it."""
    return (
        load(spark, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
            F.percentile("l_quantity", F.lit(0.95)).alias("p95"),
        )
    )


#: bot-score gates: sliding-minute burst, error share, type diversity
BOT_BURST_MIN = 4
BOT_ERR_SHARE = 0.3
BOT_MIN_EVENTS = 40


@register(
    "events_bot_score",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             COUNT(*) OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN {RATE_WINDOW_SEC - 1} PRECEDING
                         AND CURRENT ROW) AS burst
      FROM events
    ), per_user AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             CAST(MAX(burst) AS BIGINT) AS peak_rate,
             COUNT(DISTINCT event_type) AS n_types,
             ROUND(CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                        AS DOUBLE) / COUNT(*), 6) AS error_share
      FROM r GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events, peak_rate,
           CAST(n_types AS BIGINT) AS n_types, error_share,
           CAST((CASE WHEN peak_rate >= {BOT_BURST_MIN} THEN 2 ELSE 0 END)
              + (CASE WHEN error_share >= {BOT_ERR_SHARE} THEN 1 ELSE 0 END)
              + (CASE WHEN n_types <= 2
                       AND n_events >= {BOT_MIN_EVENTS} THEN 1 ELSE 0 END)
             AS BIGINT) AS bot_score,
           (CASE WHEN peak_rate >= {BOT_BURST_MIN} THEN 2 ELSE 0 END)
              + (CASE WHEN error_share >= {BOT_ERR_SHARE} THEN 1 ELSE 0 END)
              + (CASE WHEN n_types <= 2
                       AND n_events >= {BOT_MIN_EVENTS} THEN 1 ELSE 0 END)
             >= 2 AS is_bot
    FROM per_user
    """,
)
def events_bot_score(spark: SparkSession, d: str) -> DataFrame:
    """Composite BOT/abuse score — the behavioral twin of the corpus
    family's ``pipeline_gopher_filter``: three independent integer/
    rational gates vote per user — (a) machine-speed bursts (peak
    {RATE_WINDOW_SEC}s sliding rate >= {BOT_BURST_MIN}, weight 2 — the
    strongest tell), (b) error-heavy traffic (share >=
    {BOT_ERR_SHARE}: scripted clients hammer broken endpoints), (c)
    monotone behavior (<= 2 distinct event types across >=
    {BOT_MIN_EVENTS} events: real users wander, scrapers loop). Score
    >= 2 flags the user, and every signal ships alongside the verdict
    so triage can see WHY. All gates are integer counts or one
    rounded rational — exact in both engines; thresholds are plan
    literals, not data-dependent.

    Scale: one user-keyed shuffle shared by the sliding-window pass
    and the profile aggregate; the census never leaves the user
    partitioning. The same gates run streaming as an
    applyInPandasWithState scorer (``stream_topk_state``'s shape)
    with identical semantics — this is the offline backfill."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-(RATE_WINDOW_SEC - 1), 0)
    )
    r = load(spark, d, "events").withColumn("burst", F.count("*").over(w))
    per_user = r.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("burst").cast("long").alias("peak_rate"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(
            F.count_if(F.col("event_type") == "error").cast("double")
            / F.count("*"),
            6,
        ).alias("error_share"),
    )
    score = (
        F.when(F.col("peak_rate") >= BOT_BURST_MIN, 2).otherwise(0)
        + F.when(F.col("error_share") >= BOT_ERR_SHARE, 1).otherwise(0)
        + F.when(
            (F.col("n_types") <= 2) & (F.col("n_events") >= BOT_MIN_EVENTS),
            1,
        ).otherwise(0)
    )
    return per_user.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "peak_rate",
        F.col("n_types").cast("long").alias("n_types"),
        "error_share",
        score.cast("long").alias("bot_score"),
        (score >= 2).alias("is_bot"),
    )


#: freshness SLA: a feed lagging more than this behind the corpus
#: high-water mark is stale
FRESHNESS_SLA_MIN = 60


@register(
    "dq_freshness",
    oracle=f"""
    WITH hw AS (SELECT MAX(ts) AS corpus_max FROM events),
    per_feed AS (
      SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT event_type, last_ts,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(floor(date_diff('second', last_ts, corpus_max) / 60.0)
                AS BIGINT) AS minutes_behind,
           date_diff('second', last_ts, corpus_max)
             > {FRESHNESS_SLA_MIN} * 60 AS is_stale
    FROM per_feed CROSS JOIN hw
    """,
)
def dq_freshness(spark: SparkSession, d: str) -> DataFrame:
    """Feed-freshness SLA audit — the first data-quality page every
    on-call loads: per feed (event type), the last-seen timestamp,
    how many minutes it lags the corpus high-water mark, and the
    stale flag at the {FRESHNESS_SLA_MIN}-minute SLA. Lag against the
    corpus max (not wall clock) keeps the check deterministic and
    replayable — the production twin swaps in current_timestamp().
    Complements ``dq_expectations`` (value rules) and
    ``cdc_late_dimension`` (late upstream data) with the
    arrival-liveness axis.

    Scale: one grouped pass to |feeds| rows plus a broadcast 1-row
    high-water mark — the fact table is touched once."""
    ev = load(spark, d, "events")
    hw = ev.agg(F.max("ts").alias("corpus_max"))
    per_feed = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count("*").alias("n_events")
    )
    lag_sec = F.col("corpus_max").cast("long") - F.col("last_ts").cast(
        "long"
    )
    return per_feed.crossJoin(F.broadcast(hw)).select(
        "event_type",
        "last_ts",
        F.col("n_events").cast("long").alias("n_events"),
        F.floor(lag_sec / 60.0).cast("long").alias("minutes_behind"),
        (lag_sec > FRESHNESS_SLA_MIN * 60).alias("is_stale"),
    )


#: two-sided alpha=0.05 and power=0.80 normal quantiles (z_{0.975},
#: z_{0.8}) — plan literals, the standard experiment-sizing pair
AB_Z_ALPHA = 1.959963984540054
AB_Z_POWER = 0.8416212335729143


@register(
    "ab_power_mde",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) END), 0) AS y
      FROM events GROUP BY user_id
    ), m AS (
      SELECT COUNT(*) AS n,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(sy / n, 6) AS mean_metric,
           ROUND((n * syy - sy * sy) / (CAST(n AS DOUBLE) * (n - 1)), 6)
             AS var_metric,
           ROUND(({AB_Z_ALPHA} + {AB_Z_POWER})
                 * sqrt(2 * ((n * syy - sy * sy)
                             / (CAST(n AS DOUBLE) * (n - 1)))
                        / (n / 2.0)), 6) AS mde_abs,
           ROUND(({AB_Z_ALPHA} + {AB_Z_POWER})
                 * sqrt(2 * ((n * syy - sy * sy)
                             / (CAST(n AS DOUBLE) * (n - 1)))
                        / (n / 2.0)) / (sy / n) * 100, 6) AS mde_pct
    FROM m
    """,
)
def ab_power_mde(spark: SparkSession, d: str) -> DataFrame:
    """Experiment POWER ANALYSIS — the minimum detectable effect
    (MDE) for a 50/50 A/B split at alpha=0.05 (two-sided) and 80%
    power: MDE = (z_alpha + z_power) * sqrt(2*sigma^2/n_per_arm), from the
    population variance of the per-user purchase metric. This is the
    question every experiment review asks BEFORE launch ("can this
    traffic even detect a 1% move?") and the design-time complement
    of ``ab_ttest`` (post-hoc significance) and ``ab_cuped``
    (variance reduction — rerun this after CUPED to see the MDE
    shrink). z quantiles are plan literals; variance comes from exact
    DECIMAL moments; sqrt is IEEE-exact — both engines evaluate the
    identical closed form once.

    Scale: one grouped pass to per-user metrics, one 1-row moment
    aggregate — the fact table is touched once."""
    ev = load(spark, d, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast(DECV),
                )
            ),
            F.lit(0).cast(DECV),
        ).alias("y")
    )
    m = per_user.agg(
        F.count("*").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    var = (n * syy - sy * sy) / (n.cast("double") * (n - 1))
    mde = (AB_Z_ALPHA + AB_Z_POWER) * F.sqrt(2 * var / (n / F.lit(2.0)))
    return m.select(
        n.cast("long").alias("n_users"),
        F.round(sy / n, 6).alias("mean_metric"),
        F.round(var, 6).alias("var_metric"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / (sy / n) * 100, 6).alias("mde_pct"),
    )


@register(
    "features_user_velocity",
    oracle="""
    WITH hw AS (SELECT MAX(ts) AS mx FROM events)
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE ts > mx - INTERVAL 1 DAY)
                AS BIGINT) AS n_1d,
           CAST(COUNT(*) FILTER (WHERE ts > mx - INTERVAL 7 DAY)
                AS BIGINT) AS n_7d,
           CAST(COUNT(*) FILTER (WHERE ts > mx - INTERVAL 30 DAY)
                AS BIGINT) AS n_30d,
           ROUND(CAST(COUNT(*) FILTER (WHERE ts > mx - INTERVAL 1 DAY)
                      AS DOUBLE)
                 / greatest(COUNT(*) FILTER
                              (WHERE ts > mx - INTERVAL 7 DAY), 1), 6)
             AS burst_ratio
    FROM events CROSS JOIN hw
    GROUP BY user_id
    """,
)
def features_user_velocity(spark: SparkSession, d: str) -> DataFrame:
    """VELOCITY FEATURES — the feature-store staple: per user, event
    counts over trailing 1/7/30-day windows anchored at the corpus
    high-water mark (deterministic replay; production swaps in the
    serving clock) plus the 1d/7d burst ratio that flags accelerating
    accounts. All three windows come from ONE pass with conditional
    aggregation — never three scans — and the anchor is a broadcast
    1-row aggregate; counts are integers, the ratio divides once.
    These are the offline-computed features a fraud/churn model
    consumes, and the batch twin of what ``stream_running_totals``
    maintains incrementally.

    Scale: one fact pass + user-keyed aggregate; the same shape
    backfills years of daily snapshots by re-anchoring mx per
    partition date."""
    ev = load(spark, d, "events")
    hw = ev.agg(F.max("ts").alias("mx"))
    j = ev.crossJoin(F.broadcast(hw))
    in_1d = F.col("ts") > F.col("mx") - F.expr("INTERVAL 1 DAY")
    in_7d = F.col("ts") > F.col("mx") - F.expr("INTERVAL 7 DAY")
    # the 30-day window is a REAL filter (not COUNT(*)): the test
    # corpus spans under 30 days so they coincide there, but on longer
    # data an unconditional count would silently become all-time
    in_30d = F.col("ts") > F.col("mx") - F.expr("INTERVAL 30 DAY")
    return j.groupBy("user_id").agg(
        F.count_if(in_1d).cast("long").alias("n_1d"),
        F.count_if(in_7d).cast("long").alias("n_7d"),
        F.count_if(in_30d).cast("long").alias("n_30d"),
        F.round(
            F.count_if(in_1d).cast("double")
            / F.greatest(F.count_if(in_7d), F.lit(1)),
            6,
        ).alias("burst_ratio"),
    )


#: future-label horizon (hours): will the user purchase within this?
LABEL_HORIZON_H = 24


@register(
    "features_future_label",
    oracle=f"""
    WITH seq AS (
      SELECT event_id, user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
      FROM events
    )
    SELECT event_id, user_id,
           next_purchase_ts IS NOT NULL
             AND next_purchase_ts <= ts + INTERVAL '{LABEL_HORIZON_H}' HOUR
             AS label_purchase_{LABEL_HORIZON_H}h,
           CAST(CASE WHEN next_purchase_ts IS NOT NULL
                      AND next_purchase_ts
                          <= ts + INTERVAL '{LABEL_HORIZON_H}' HOUR
                     THEN date_diff('second', ts, next_purchase_ts)
                END AS DOUBLE) AS seconds_to_purchase
    FROM seq
    """,
)
def features_future_label(spark: SparkSession, d: str) -> DataFrame:
    """FUTURE-LABEL generation — the supervised-learning companion to
    ``features_user_velocity``: for every event, did this user
    purchase within the next {LABEL_HORIZON_H} hours (binary label)
    and how long until it (regression label, NULL when no conversion
    in horizon). The lookahead is a STRICTLY-FUTURE frame (1 FOLLOWING
    → unbounded) of the conditional purchase timestamp — the current
    event never sees itself, so a purchase event's own label answers
    "will they purchase AGAIN", and feature/label timestamps can never
    leak (the bug class label pipelines are most often wrong about).
    seconds_to_purchase is DOUBLE on both sides because the column is
    nullable and the grading path materializes nullable ints as
    float64.

    Scale: one user-keyed window pass — the same exchange the feature
    ops ride; labels and features join back on event_id."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    seq = load(spark, d, "events").select(
        "event_id", "user_id", "ts", nxt.alias("next_purchase_ts")
    )
    horizon = F.col("ts") + F.expr(f"INTERVAL {LABEL_HORIZON_H} HOURS")
    in_h = F.col("next_purchase_ts").isNotNull() & (
        F.col("next_purchase_ts") <= horizon
    )
    return seq.select(
        "event_id",
        "user_id",
        in_h.alias(f"label_purchase_{LABEL_HORIZON_H}h"),
        F.when(
            in_h,
            F.col("next_purchase_ts").cast("long")
            - F.col("ts").cast("long"),
        )
        .cast("double")
        .alias("seconds_to_purchase"),
    )


@register(
    "dq_primary_key",
    oracle="""
    SELECT 'orders(o_orderkey)' AS key_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
             AS n_excess_rows,
           COUNT(*) = COUNT(DISTINCT o_orderkey) AS is_unique
    FROM orders
    UNION ALL
    SELECT 'lineitem(l_orderkey,l_linenumber)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           CAST(COUNT(*)
                - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           COUNT(*) = COUNT(DISTINCT (l_orderkey, l_linenumber))
    FROM lineitem
    """,
)
def dq_primary_key(spark: SparkSession, d: str) -> DataFrame:
    """PRIMARY-KEY uniqueness audit — the contract check upstream of
    every merge/join in the engine (a dup key turns ``merge_scd1``
    into a fan-out and ``join_broadcast_inner`` into a row
    multiplier): per declared key — simple and COMPOSITE — row count
    vs distinct count, the excess, and the verdict. Runs as ONE
    aggregate per table (no self-join, no window); the composite key
    distinct-counts a struct, the exact analogue of the tuple DuckDB
    counts.

    Scale: COUNT(DISTINCT) per table with map-side partials;
    at 100 TB swap in the bitmap partials (``agg_bitmap_distinct``)
    for re-checkable incremental audits."""
    o = load(spark, d, "orders").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
    )
    li = load(spark, d, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(
            F.struct("l_orderkey", "l_linenumber")
        ).alias("n_distinct"),
    )
    def shape(df, name):
        return df.select(
            F.lit(name).alias("key_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("long")
            .alias("n_excess_rows"),
            (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
        )
    return shape(o, "orders(o_orderkey)").unionAll(
        shape(li, "lineitem(l_orderkey,l_linenumber)")
    )


@register(
    "features_target_encoding",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           CAST(value AS DOUBLE) AS value,
           CASE WHEN n > 1
                THEN ROUND(CAST(CAST(s - CAST(value AS DECIMAL(18,6))
                                  AS VARCHAR) AS DOUBLE) / (n - 1), 6)
           END AS te_loo
    FROM events e JOIN g USING (event_type)
    """,
)
def features_target_encoding(spark: SparkSession, d: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding — replace a categorical with the
    mean target of its OTHER members, (Sigma_group - y_self)/(n-1): the
    high-cardinality-categorical workhorse (CatBoost-style) computed
    with the leakage discipline that makes it valid — a row never
    sees its own target, so the encoding can feed a model trained on
    the same rows. Implemented as one grouped moment pass + a
    broadcast-able join back (never a per-row window over the full
    partition): group sums ride DECIMAL so the subtraction of self is
    exact, then one double division. Singleton groups encode NULL
    (no peers — the honest answer; production blends toward the
    global prior).

    Scale: one aggregate to |categories| rows + one map-side join —
    the fact table is scanned once and never shuffled (the group
    table broadcasts)."""
    ev = load(spark, d, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DECV)).alias("s"),
    )
    j = ev.join(F.broadcast(g), "event_type")
    loo = (
        (F.col("s") - F.col("value").cast(DECV)).cast("double")
        / (F.col("n") - 1)
    )
    return j.select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.when(F.col("n") > 1, F.round(loo, 6)).alias("te_loo"),
    )


#: hash-uniformity audit: buckets and the 5% KS critical constant
HASH_AUDIT_BUCKETS = 1000
KS_CRIT_5PCT = 1.3581015157406195


@register(
    "dq_hash_uniformity",
    oracle=f"""
    WITH h AS (
      SELECT {DUCK_HASH60.format(
          x="(CAST(doc_id AS VARCHAR) || ':split')")}
             % {HASH_AUDIT_BUCKETS} AS b
      FROM documents
    ), cdf AS (
      SELECT b, COUNT(*) AS c,
             SUM(COUNT(*)) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM h GROUP BY b
    ), m AS (
      SELECT MAX(abs(CAST(cum AS DOUBLE)
                     / (SELECT COUNT(*) FROM h)
                     - CAST(b + 1 AS DOUBLE) / {HASH_AUDIT_BUCKETS}))
               AS d_stat,
             (SELECT COUNT(*) FROM h) AS n
      FROM cdf
    )
    SELECT CAST(n AS BIGINT) AS n_keys,
           ROUND(d_stat, 6) AS ks_d,
           ROUND({KS_CRIT_5PCT} / sqrt(CAST(GREATEST(n, 1) AS DOUBLE)), 6)
             AS ks_crit_5pct,
           d_stat < {KS_CRIT_5PCT} / sqrt(CAST(GREATEST(n, 1) AS DOUBLE))
             AS is_uniform
    FROM m
    """,
)
def dq_hash_uniformity(spark: SparkSession, d: str) -> DataFrame:
    """HASH-UNIFORMITY audit — a one-sample Kolmogorov-Smirnov test
    that the salted split hash (the one ``split_train_test`` and
    every sampler key on) actually distributes uniformly over its
    buckets: D = max |empirical CDF - uniform CDF| vs the 5% critical
    value 1.358/sqrt(n). This is the statistical guarantee under every
    'deterministic 80/10/10' claim in the engine — a biased hash
    silently skews every split, sample, and shard; the audit makes
    'we checked' a query. Bucket counts and cumulative sums are
    integers (exact); two divisions and the IEEE sqrt finish.

    Scale: one narrow hash pass, a {HASH_AUDIT_BUCKETS}-row bucket
    census, and a running sum over that census (model-state
    single-partition, pareto_abc's posture). Fully lazy: the total is
    a 1-row aggregate broadcast back onto the census (the
    dq_freshness / features_decay_score pattern), not a driver-side
    count() at plan-construction time — nothing runs until the
    returned DataFrame is evaluated, and documents is scanned once."""
    docs = load(spark, d, "documents")
    b = (
        hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":split")))
        % HASH_AUDIT_BUCKETS
    ).alias("b")
    h = docs.select(b)
    tot = h.agg(F.count("*").alias("n"))
    wcum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = (
        h.groupBy("b")
        .agg(F.count("*").alias("c"))
        .withColumn("cum", F.sum("c").over(wcum))
    )
    m = cdf.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.col("cum").cast("double") / F.col("n")
                - (F.col("b") + 1).cast("double") / HASH_AUDIT_BUCKETS
            )
        ).alias("d_stat"),
        # coalesce: empty census -> n=0 (matching the oracle's scalar
        # subquery), not NULL from MAX over zero rows
        F.coalesce(F.max("n"), F.lit(0)).alias("n"),
    )
    # GREATEST(n, 1): empty census must not divide by zero (ANSI
    # double division throws in Spark 4); mirrored in the oracle
    crit = F.lit(KS_CRIT_5PCT) / F.sqrt(
        F.greatest(F.col("n"), F.lit(1)).cast("double")
    )
    return m.select(
        F.col("n").cast("long").alias("n_keys"),
        F.round(F.col("d_stat"), 6).alias("ks_d"),
        F.round(crit, 6).alias("ks_crit_5pct"),
        (F.col("d_stat") < crit).alias("is_uniform"),
    )


#: recency decay: half-life in days; weights are 2^(-age/half_life)
#: precomputed in Python to 9 dp and inlined as DECIMAL literals in
#: BOTH plans — pow() is not bit-portable across engines, a table of
#: shared constants is
DECAY_HALF_LIFE_D = 7
DECAY_MAX_AGE_D = 45
_DECAY_W = {
    age: round(2.0 ** (-age / DECAY_HALF_LIFE_D), 9)
    for age in range(DECAY_MAX_AGE_D + 1)
}


def _decay_case_sql() -> str:
    whens = " ".join(
        f"WHEN {a} THEN CAST({w} AS DECIMAL(12,9))"
        for a, w in _DECAY_W.items()
    )
    return f"CASE age {whens} ELSE CAST(0 AS DECIMAL(12,9)) END"


@register(
    "features_decay_score",
    oracle=f"""
    WITH hw AS (SELECT CAST(MAX(ts) AS DATE) AS mx FROM events),
    daily AS (
      SELECT user_id,
             date_diff('day', CAST(ts AS DATE), mx) AS age,
             COUNT(*) AS c
      FROM events CROSS JOIN hw
      GROUP BY user_id, date_diff('day', CAST(ts AS DATE), mx)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_days_active,
           CAST(SUM(c) AS BIGINT) AS n_events,
           ROUND(CAST(CAST(SUM(c * ({_decay_case_sql()})) AS VARCHAR)
                      AS DOUBLE), 6) AS decay_score
    FROM daily GROUP BY user_id
    """,
)
def features_decay_score(spark: SparkSession, d: str) -> DataFrame:
    """RECENCY-DECAYED engagement score — Sigma over active days of
    count x 2^(-age/{DECAY_HALF_LIFE_D}d): yesterday's click counts
    ~2x one from a week ago, the standard recency feature for
    ranking/churn models and the batch equivalent of a decayed
    counter service. The decay table is PRECOMPUTED in Python to 9 dp
    and inlined as DECIMAL literals in both plans — pow() differs in
    the last ulp across engines, a shared constant table cannot — so
    the weighted sum is order-independent exact (integer counts x
    decimal weights). Ages beyond {DECAY_MAX_AGE_D} days weight zero
    (below 1% contribution at this half-life).

    Scale: one grouped pass to (user, age) cells — bounded by users x
    {DECAY_MAX_AGE_D} — then a user-keyed rollup; the anchor is a
    broadcast scalar. Backfills shift the anchor, nothing else."""
    ev = load(spark, d, "events")
    hw = ev.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    daily = (
        ev.crossJoin(F.broadcast(hw))
        .groupBy(
            "user_id",
            F.datediff(F.col("mx"), F.col("ts").cast("date")).alias("age"),
        )
        .agg(F.count("*").alias("c"))
    )
    w = F.lit(0).cast("decimal(12,9)")
    expr = None
    for a, wt in _DECAY_W.items():
        cond = F.when(
            F.col("age") == a, F.lit(str(wt)).cast("decimal(12,9)")
        )
        expr = cond if expr is None else expr.when(
            F.col("age") == a, F.lit(str(wt)).cast("decimal(12,9)")
        )
    weight = expr.otherwise(w)
    return daily.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_days_active"),
        F.sum("c").cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("c") * weight).cast("double"), 6
        ).alias("decay_score"),
    )


@register(
    "events_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS y
      FROM events GROUP BY 1
    ), slopes AS (
      SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
      FROM daily a JOIN daily b ON b.x > a.x
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_disc(slope, 0.5), 6) AS theil_sen_slope,
           ROUND(MIN(slope), 6) AS min_slope,
           ROUND(MAX(slope), 6) AS max_slope
    FROM slopes
    """,
)
def events_theil_sen(spark: SparkSession, d: str) -> DataFrame:
    """THEIL-SEN robust trend — the median of all pairwise
    day-over-day slopes of daily total value: one wild outlier day
    drags OLS (``agg_linear_fit``) arbitrarily but moves this
    estimator by at most one rank — the trend number to quote when
    the series has incidents in it. The pairwise expansion runs on
    the DAILY grain (|days| choose 2 — a few hundred pairs for a
    month, ~66k for a year), never on raw events, so the O(n^2) that
    makes Theil-Sen 'impractical' vanishes under pre-aggregation;
    slopes are DECIMAL-difference / integer-gap doubles and the
    median is the discrete (no-interpolation) order statistic, exact
    in both engines.

    Scale: one grouped pass to the daily grain, a broadcast self-join
    of that tiny table, one exact percentile over it."""
    daily = (
        load(spark, d, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("x")
        )
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("y")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        F.broadcast(b), F.col("b.x") > F.col("a.x")
    ).select(
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope")
    )
    return slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)"),
            6,
        ).alias("theil_sen_slope"),
        F.round(F.min("slope"), 6).alias("min_slope"),
        F.round(F.max("slope"), 6).alias("max_slope"),
    )


#: 4-4-5 fiscal calendar anchor: a Monday predating all order dates
FISCAL_ANCHOR = "1994-01-31"


@register(
    "fiscal_445_rollup",
    oracle=f"""
    WITH f AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS rev,
             CAST(floor(date_diff('day', DATE '{FISCAL_ANCHOR}',
                                  CAST(o_orderdate AS DATE)) / 7.0)
                  AS BIGINT) AS wk
      FROM orders
    ), p AS (
      SELECT rev,
             wk // 52 AS fy,
             (wk % 52) // 13 AS fq,
             CASE WHEN (wk % 52) % 13 < 4 THEN 1
                  WHEN (wk % 52) % 13 < 8 THEN 2
                  ELSE 3 END AS fp
      FROM f
    )
    SELECT CAST(fy AS BIGINT) AS fiscal_year,
           CAST(fq + 1 AS BIGINT) AS fiscal_quarter,
           CAST(fp AS BIGINT) AS fiscal_period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS revenue
    FROM p GROUP BY fy, fq, fp
    """,
)
def fiscal_445_rollup(spark: SparkSession, d: str) -> DataFrame:
    """4-4-5 FISCAL CALENDAR rollup — revenue by retail fiscal period
    (quarters of 4+4+5 whole weeks anchored on a fixed Monday): the
    calendar retail/CPG finance actually closes books on, where every
    period has a whole number of weeks so period-over-period compares
    like-for-like weekday mixes — something calendar months
    structurally cannot do (a 31-day month has 5 of some weekday).
    The mapping is pure integer arithmetic on the day offset from the
    anchor (week = days//7, year = week//52, quarter = week%52//13,
    period by the 4/4/5 split) — no calendar library, no timezone
    edge, exact in both engines; the rollup sums DECIMAL.

    Scale: a narrow derived-column pass + one grouped aggregate —
    fiscal mapping adds zero shuffles over a plain monthly rollup."""
    o = load(spark, d, "orders")
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit(FISCAL_ANCHOR).cast("date")
    )
    wk = F.floor(days / 7.0).cast("long")
    wiy = wk % 52
    fp = (
        F.when(wiy % 13 < 4, 1).when(wiy % 13 < 8, 2).otherwise(3)
    )
    p = o.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
        F.floor(wk / 52).cast("long").alias("fiscal_year"),
        (F.floor(wiy / 13) + 1).cast("long").alias("fiscal_quarter"),
        fp.cast("long").alias("fiscal_period"),
    )
    return p.groupBy("fiscal_year", "fiscal_quarter", "fiscal_period").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("rev").cast("double").alias("revenue"),
    )


@register(
    "events_control_chart",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS x
      FROM events GROUP BY 1, 2
    ), mr AS (
      SELECT event_type, d, x,
             abs(x - lag(x) OVER (PARTITION BY event_type ORDER BY d))
               AS mrange
      FROM daily
    ), lim AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) / COUNT(*) AS center,
             CAST(CAST(SUM(mrange) AS VARCHAR) AS DOUBLE)
               / COUNT(mrange) AS mr_bar
      FROM mr GROUP BY event_type
    )
    SELECT mr.event_type,
           CAST(MAX(n_days) AS BIGINT) AS n_days,
           ROUND(MAX(center), 6) AS center,
           ROUND(MAX(center) + 2.66 * MAX(mr_bar), 6) AS ucl,
           ROUND(MAX(center) - 2.66 * MAX(mr_bar), 6) AS lcl,
           CAST(COUNT(CASE WHEN CAST(x AS DOUBLE)
                                 > center + 2.66 * mr_bar
                             OR CAST(x AS DOUBLE)
                                 < center - 2.66 * mr_bar
                           THEN 1 END) AS BIGINT) AS n_violations
    FROM mr JOIN lim ON lim.event_type = mr.event_type
    GROUP BY mr.event_type
    """,
)
def events_control_chart(spark: SparkSession, d: str) -> DataFrame:
    """SHEWHART I-MR CONTROL CHART — statistical process control for
    the daily value stream: center line = mean of daily totals,
    control limits = center +- 2.66 x mean moving range (the
    individuals-chart constant 3/d2, d2=1.128), violations = days
    outside the limits. SPC is the operational complement of
    ``anomaly_cusum`` (CUSUM finds sustained shifts; control limits
    flag single excursions) and the chart ops teams actually pin on
    dashboards. Daily totals and moving ranges are DECIMAL (the
    |x_t - x_{t-1}| of decimals is exact), the limits are two double
    operations from exact sums, and 2.66 is a plan literal.

    Scale: one grouped pass to the daily grain, a lag window and two
    aggregates per event type — all keyed by event_type."""
    daily = (
        load(spark, d, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    mr = daily.withColumn(
        "mrange", F.abs(F.col("x") - F.lag("x").over(w))
    )
    lim = mr.groupBy(F.col("event_type").alias("lt")).agg(
        F.count("*").alias("n_days"),
        (F.sum("x").cast("double") / F.count("*")).alias("center"),
        (F.sum("mrange").cast("double") / F.count("mrange")).alias(
            "mr_bar"
        ),
    )
    j = mr.join(F.broadcast(lim), F.col("event_type") == F.col("lt"))
    ucl = F.col("center") + 2.66 * F.col("mr_bar")
    lcl = F.col("center") - 2.66 * F.col("mr_bar")
    viol = F.when(
        (F.col("x").cast("double") > ucl)
        | (F.col("x").cast("double") < lcl),
        1,
    )
    return j.groupBy("event_type").agg(
        F.max("n_days").cast("long").alias("n_days"),
        F.round(F.max("center"), 6).alias("center"),
        F.round(F.max(ucl), 6).alias("ucl"),
        F.round(F.max(lcl), 6).alias("lcl"),
        F.count(viol).cast("long").alias("n_violations"),
    )


@register(
    "ab_effect_size",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) END), 0) AS y
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, COUNT(*) AS n,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM per_user GROUP BY arm
    ), w AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        MAX(CASE WHEN arm = 0 THEN sy / n END) AS m0,
        MAX(CASE WHEN arm = 1 THEN sy / n END) AS m1,
        MAX(CASE WHEN arm = 0
                 THEN (n * syy - sy * sy) / (CAST(n AS DOUBLE) * (n - 1))
            END) AS v0,
        MAX(CASE WHEN arm = 1
                 THEN (n * syy - sy * sy) / (CAST(n AS DOUBLE) * (n - 1))
            END) AS v1
      FROM m
    )
    SELECT CAST(n0 AS BIGINT) AS n_control,
           CAST(n1 AS BIGINT) AS n_treatment,
           ROUND(m1 - m0, 6) AS mean_diff,
           ROUND((m1 - m0)
                 / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
                        / (n0 + n1 - 2)), 6) AS cohens_d,
           ROUND((m1 - m0)
                 / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
                        / (n0 + n1 - 2))
                 * (1 - 3.0 / (4 * (n0 + n1) - 9)), 6) AS hedges_g
    FROM w
    """,
)
def ab_effect_size(spark: SparkSession, d: str) -> DataFrame:
    """STANDARDIZED EFFECT SIZE for the A/B pair — Cohen's d (mean
    difference over pooled standard deviation) and its
    small-sample-corrected Hedges' g (the (1 - 3/(4N-9)) factor): the
    number that travels ACROSS experiments and metrics, where
    ``ab_ttest``'s p-value only answers "is it nonzero on this n".
    The experimentation trinity ships together: significance
    (ab_ttest), sensitivity (ab_power_mde), magnitude (this).
    Variances come from the same exact DECIMAL moment partials as the
    siblings; the pooled form and correction factor are single double
    evaluations of literals and exact sums.

    Scale: one grouped pass to per-user metrics, a 2-row arm
    aggregate, a 1-row pivot — fact table touched once."""
    ev = load(spark, d, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast(DECV),
                )
            ),
            F.lit(0).cast(DECV),
        ).alias("y"),
    )
    m = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    var = (n * syy - sy * sy) / (n.cast("double") * (n - 1))
    w = m.agg(
        F.max(F.when(F.col("arm") == 0, n)).alias("n0"),
        F.max(F.when(F.col("arm") == 1, n)).alias("n1"),
        F.max(F.when(F.col("arm") == 0, sy / n)).alias("m0"),
        F.max(F.when(F.col("arm") == 1, sy / n)).alias("m1"),
        F.max(F.when(F.col("arm") == 0, var)).alias("v0"),
        F.max(F.when(F.col("arm") == 1, var)).alias("v1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    pooled_sd = F.sqrt(
        ((n0 - 1) * F.col("v0") + (n1 - 1) * F.col("v1")) / (n0 + n1 - 2)
    )
    dd = (F.col("m1") - F.col("m0")) / pooled_sd
    return w.select(
        n0.cast("long").alias("n_control"),
        n1.cast("long").alias("n_treatment"),
        F.round(F.col("m1") - F.col("m0"), 6).alias("mean_diff"),
        F.round(dd, 6).alias("cohens_d"),
        F.round(dd * (1 - 3.0 / (4 * (n0 + n1) - 9)), 6).alias(
            "hedges_g"
        ),
    )


@register(
    "ab_ratio_delta_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS x,
             COUNT(CASE WHEN event_type IN ('view', 'click')
                   THEN 1 END) AS y
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM per_user WHERE y > 0 GROUP BY arm
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           ROUND(sx / sy, 6) AS ratio,
           ROUND(sqrt(greatest(
             ((sx / n) / (sy / n)) * ((sx / n) / (sy / n)) * (
               ((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)))
                 / ((sx / n) * (sx / n))
               - 2 * ((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * (n - 1)))
                   / ((sx / n) * (sy / n))
               + ((n * syy - sy * sy) / (CAST(n AS DOUBLE) * (n - 1)))
                   / ((sy / n) * (sy / n))
             ) / n, 0.0)), 6) AS se_delta,
           ROUND(sx / sy - 1.959963984540054 * sqrt(greatest(
             ((sx / n) / (sy / n)) * ((sx / n) / (sy / n)) * (
               ((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)))
                 / ((sx / n) * (sx / n))
               - 2 * ((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * (n - 1)))
                   / ((sx / n) * (sy / n))
               + ((n * syy - sy * sy) / (CAST(n AS DOUBLE) * (n - 1)))
                   / ((sy / n) * (sy / n))
             ) / n, 0.0)), 6) AS ci_lo,
           ROUND(sx / sy + 1.959963984540054 * sqrt(greatest(
             ((sx / n) / (sy / n)) * ((sx / n) / (sy / n)) * (
               ((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)))
                 / ((sx / n) * (sx / n))
               - 2 * ((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * (n - 1)))
                   / ((sx / n) * (sy / n))
               + ((n * syy - sy * sy) / (CAST(n AS DOUBLE) * (n - 1)))
                   / ((sy / n) * (sy / n))
             ) / n, 0.0)), 6) AS ci_hi
    FROM m
    """,
)
def ab_ratio_delta_ci(spark: SparkSession, d: str) -> DataFrame:
    """DELTA-METHOD confidence interval for a RATIO metric — per arm,
    purchases-per-engagement (Sigmax/Sigmay over users) with its standard
    error from the first-order Taylor expansion: var(X/Y) ~
    (mx/my)^2 (vx/mx^2 - 2cov/(mx my) + vy/my^2)/n. Ratio metrics (CTR,
    CVR, revenue-per-session) violate the per-user-independence
    assumption a naive t-test makes — the delta method is how
    experimentation platforms actually bound them. Counts are
    integers so every moment is exact; the closed form evaluates once
    per arm; the negative-variance guard (greatest(...,0)) covers
    degenerate arms.

    Scale: one grouped pass to per-user numerator/denominator pairs,
    one 2-row arm aggregate — same cost envelope as ab_ttest."""
    ev = load(spark, d, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            (F.col("user_id") % 2).alias("arm"),
            F.count_if(F.col("event_type") == "purchase").alias("x"),
            F.count_if(
                F.col("event_type").isin("view", "click")
            ).alias("y"),
        )
        .where(F.col("y") > 0)
    )
    x, y = F.col("x"), F.col("y")
    m = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    nd = n.cast("double")
    mx, my = sx / n, sy / n
    vx = (n * sxx - sx * sx) / (nd * (n - 1))
    vy = (n * syy - sy * sy) / (nd * (n - 1))
    cov = (n * sxy - sx * sy) / (nd * (n - 1))
    se = F.sqrt(
        F.greatest(
            (mx / my)
            * (mx / my)
            * (vx / (mx * mx) - 2 * cov / (mx * my) + vy / (my * my))
            / n,
            F.lit(0.0),
        )
    )
    z = 1.959963984540054
    return m.select(
        F.col("arm").cast("long").alias("arm"),
        n.cast("long").alias("n_users"),
        F.round(sx / sy, 6).alias("ratio"),
        F.round(se, 6).alias("se_delta"),
        F.round(sx / sy - z * se, 6).alias("ci_lo"),
        F.round(sx / sy + z * se, 6).alias("ci_hi"),
    )


#: MACD spans (daily): fast/slow/signal EMAs, alpha = 2/(span+1)
MACD_FAST, MACD_SLOW, MACD_SIGNAL = 12, 26, 9


def _macd_ema_sql(alpha: str, vals: str) -> str:
    """Sequential EMA fold over a day-ordered DuckDB list."""
    return f"""list_reduce(list_prepend(CAST({vals}[1] AS DOUBLE),
                 list_slice({vals}, 2, len({vals}))),
                 (acc, v) -> acc + {alpha} * (CAST(v AS DOUBLE) - acc))"""


@register(
    "events_macd",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS x
      FROM events GROUP BY 1
    ), packed AS (
      SELECT list(d ORDER BY d) AS ds, list(x ORDER BY d) AS xs
      FROM daily
    ), curves AS (
      SELECT ds[i] AS day,
             {_macd_ema_sql(f"(2.0 / {MACD_FAST + 1})",
                            "list_slice(xs, 1, i)")} AS ema_fast,
             {_macd_ema_sql(f"(2.0 / {MACD_SLOW + 1})",
                            "list_slice(xs, 1, i)")} AS ema_slow
      FROM packed, LATERAL (SELECT unnest(range(1, len(xs) + 1)) AS i)
    ), macd AS (
      SELECT day, ema_fast - ema_slow AS macd_line FROM curves
    ), packed2 AS (
      SELECT list(day ORDER BY day) AS ds,
             list(macd_line ORDER BY day) AS ms
      FROM macd
    )
    SELECT ds[i] AS day,
           ROUND(ms[i], 6) AS macd_line,
           ROUND({_macd_ema_sql(f"(2.0 / {MACD_SIGNAL + 1})",
                                "list_slice(ms, 1, i)")}, 6) AS signal_line,
           ROUND(ms[i] - {_macd_ema_sql(f"(2.0 / {MACD_SIGNAL + 1})",
                                        "list_slice(ms, 1, i)")}, 6)
             AS histogram
    FROM packed2, LATERAL (SELECT unnest(range(1, len(ms) + 1)) AS i)
    """,
)
def events_macd(spark: SparkSession, d: str) -> DataFrame:
    """MACD (moving-average convergence/divergence) over the daily
    value series — fast EMA({MACD_FAST}) minus slow EMA({MACD_SLOW}),
    with the EMA({MACD_SIGNAL}) signal line and the histogram that
    traders (and capacity planners reading demand trends) key off.
    Completes the technical-analysis window family (VWAP, Bollinger,
    drawdown, OHLC): three RECURSIVE smoothings, each evaluated as a
    sequential in-row fold over the day-ordered series (the
    survival_km / window_holt recipe) — bit-exact in both engines,
    never a partition-order-dependent float window.

    Scale: one grouped pass to the daily grain; every fold runs on
    the packed curve-sized row (|days| elements), not the corpus."""
    daily = (
        load(spark, d, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("x")
        )
    )
    packed = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("curve")
    )

    def ema(vals, alpha):
        return F.aggregate(
            F.slice(vals, 2, F.size(vals) - 1),
            F.element_at(vals, 1).cast("double"),
            lambda acc, v: acc + F.lit(alpha) * (v.cast("double") - acc),
        )

    af, asl, asg = (
        2.0 / (MACD_FAST + 1),
        2.0 / (MACD_SLOW + 1),
        2.0 / (MACD_SIGNAL + 1),
    )
    xs = F.transform(F.col("curve"), lambda s: s.x)
    macd_arr = F.transform(
        F.when(F.size("curve") > 0, F.sequence(F.lit(1), F.size("curve")))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.struct(
            F.element_at(F.col("curve"), i).d.alias("day"),
            (
                ema(F.slice(xs, 1, i), af) - ema(F.slice(xs, 1, i), asl)
            ).alias("macd_line"),
        ),
    )
    m2 = packed.select(macd_arr.alias("ms"))
    mvals = F.transform(F.col("ms"), lambda s: s.macd_line)
    out = F.transform(
        F.when(F.size("ms") > 0, F.sequence(F.lit(1), F.size("ms")))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.struct(
            F.element_at(F.col("ms"), i).day.alias("day"),
            F.round(F.element_at(F.col("ms"), i).macd_line, 6).alias(
                "macd_line"
            ),
            F.round(ema(F.slice(mvals, 1, i), asg), 6).alias(
                "signal_line"
            ),
            F.round(
                F.element_at(F.col("ms"), i).macd_line
                - ema(F.slice(mvals, 1, i), asg),
                6,
            ).alias("histogram"),
        ),
    )
    return m2.select(F.explode(out).alias("p")).select(
        "p.day", "p.macd_line", "p.signal_line", "p.histogram"
    )


@register(
    "basket_reorder_rate",
    oracle="""
    WITH cp AS (
      SELECT l_partkey, o_custkey,
             COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey, o_custkey
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(CASE WHEN n_orders >= 2 THEN 1 END) AS BIGINT)
             AS n_repeat_customers,
           ROUND(CAST(COUNT(CASE WHEN n_orders >= 2 THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS reorder_rate
    FROM cp GROUP BY l_partkey
    HAVING COUNT(*) >= 3
    """,
)
def basket_reorder_rate(spark: SparkSession, d: str) -> DataFrame:
    """REORDER RATE per product — the Instacart-style repeat-purchase
    signal: of the customers who ever bought a part, what share
    bought it in two or more DISTINCT orders. High reorder = staple
    (stock deep, surface in replenishment UX); low reorder on high
    volume = one-shot or disappointment — the complement of
    ``basket_affinity``'s cross-product view. Thin-support parts
    (<3 buyers) are suppressed as noise. Two cascaded grouped
    passes, all integer counts, one final division.

    Scale: the (part, customer) grain shuffle dominates and is
    map-side combinable; the fact join is key-local when lineitem is
    bucketed by orderkey."""
    cp = (
        load(spark, d, "lineitem")
        .join(
            load(spark, d, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_partkey", "o_custkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    return (
        cp.groupBy("l_partkey")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.count_if(F.col("n_orders") >= 2)
            .cast("long")
            .alias("n_repeat_customers"),
            F.round(
                F.count_if(F.col("n_orders") >= 2).cast("double")
                / F.count("*"),
                6,
            ).alias("reorder_rate"),
        )
        .where(F.col("n_customers") >= 3)
    )


@register(
    "orders_ship_latency",
    oracle="""
    WITH lat AS (
      SELECT o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(MIN(l_shipdate) AS DATE)) AS first_ship_d,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(MAX(l_shipdate) AS DATE)) AS last_ship_d
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(first_ship_d) AS DOUBLE) / COUNT(*), 6)
             AS avg_first_ship_days,
           ROUND(CAST(SUM(last_ship_d) AS DOUBLE) / COUNT(*), 6)
             AS avg_complete_days,
           CAST(quantile_disc(last_ship_d, 0.95) AS BIGINT)
             AS p95_complete_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def orders_ship_latency(spark: SparkSession, d: str) -> DataFrame:
    """ORDER-TO-SHIP latency by priority — the fulfillment SLA view:
    per order, days from order date to FIRST shipment (responsiveness)
    and to LAST shipment (completion), rolled up per priority with
    the p95 completion tail (the number an SLA is written against —
    means hide the tail). The per-order grain joins the fact pair
    once; day gaps are integers so every statistic is exact, and the
    p95 is the discrete order statistic.

    Scale: one orderkey-keyed join+aggregate (co-located when both
    tables are bucketed by orderkey — the join_bucketed layout), then
    a |priorities|-key rollup."""
    lat = (
        load(spark, d, "orders")
        .join(
            load(spark, d, "lineitem").select("l_orderkey", "l_shipdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.datediff(
                F.min(F.col("l_shipdate").cast("date")),
                F.col("o_orderdate").cast("date"),
            ).alias("first_ship_d"),
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.col("o_orderdate").cast("date"),
            ).alias("last_ship_d"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(
            F.sum("first_ship_d").cast("double") / F.count("*"), 6
        ).alias("avg_first_ship_days"),
        F.round(
            F.sum("last_ship_d").cast("double") / F.count("*"), 6
        ).alias("avg_complete_days"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY last_ship_d)"
        )
        .cast("long")
        .alias("p95_complete_days"),
    )


#: interrupted-time-series intervention date (mid-corpus)
ITS_PIVOT_DAY = "2024-01-16"


@register(
    "events_interrupted_ts",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(ts AS DATE) >= DATE '{ITS_PIVOT_DAY}' AS post,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS y
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT post, COUNT(*) AS n,
             CAST(SUM(t) AS DOUBLE) AS st,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(SUM(t * t) AS DOUBLE) AS stt,
             CAST(CAST(SUM(t * y) AS VARCHAR) AS DOUBLE) AS sty
      FROM daily GROUP BY post
    ), fits AS (
      SELECT post,
             (n * sty - st * sy) / (n * stt - st * st) AS slope,
             (sy - (n * sty - st * sy) / (n * stt - st * st) * st) / n
               AS intercept,
             n
      FROM m
    )
    SELECT
      CAST(MAX(CASE WHEN NOT post THEN n END) AS BIGINT) AS n_pre,
      CAST(MAX(CASE WHEN post THEN n END) AS BIGINT) AS n_post,
      ROUND(MAX(CASE WHEN NOT post THEN slope END), 6) AS slope_pre,
      ROUND(MAX(CASE WHEN post THEN slope END), 6) AS slope_post,
      ROUND(MAX(CASE WHEN post THEN slope END)
            - MAX(CASE WHEN NOT post THEN slope END), 6) AS slope_change,
      ROUND((MAX(CASE WHEN post THEN intercept END)
             + MAX(CASE WHEN post THEN slope END)
               * date_diff('day', DATE '2024-01-01',
                           DATE '{ITS_PIVOT_DAY}'))
            - (MAX(CASE WHEN NOT post THEN intercept END)
               + MAX(CASE WHEN NOT post THEN slope END)
                 * date_diff('day', DATE '2024-01-01',
                             DATE '{ITS_PIVOT_DAY}')), 6)
        AS level_change_at_pivot
    FROM fits
    """,
)
def events_interrupted_ts(spark: SparkSession, d: str) -> DataFrame:
    """INTERRUPTED TIME SERIES — the workhorse quasi-experimental
    design when you can't randomize (a pricing change, an incident, a
    policy rollout on {ITS_PIVOT_DAY}): fit the daily series with
    separate OLS lines pre and post the intervention and report the
    LEVEL jump at the pivot and the SLOPE change — did the line shift,
    did its trajectory bend, or both. Fits come from the exact
    DECIMAL/integer moment partials (the agg_linear_fit closed form,
    evaluated per segment), the comparison is two double evaluations
    at the pivot — no residual sums, nothing order-dependent.

    Scale: one grouped pass to the daily grain, a 2-row segment
    aggregate, a 1-row pivot — same envelope as the A/B family."""
    pivot_t = F.datediff(
        F.lit(ITS_PIVOT_DAY).cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        load(spark, d, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("t"),
            (
                F.col("ts").cast("date") >= F.lit(ITS_PIVOT_DAY).cast("date")
            ).alias("post"),
        )
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("y")
        )
    )
    t, y = F.col("t"), F.col("y")
    m = daily.groupBy("post").agg(
        F.count("*").alias("n"),
        F.sum(t).cast("double").alias("st"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(t * t).cast("double").alias("stt"),
        F.sum(t.cast("decimal(15,3)") * y).cast("double").alias("sty"),
    )
    n, st, sy = F.col("n"), F.col("st"), F.col("sy")
    stt, sty = F.col("stt"), F.col("sty")
    slope = (n * sty - st * sy) / (n * stt - st * st)
    intercept = (sy - slope * st) / n
    fits = m.select("post", "n", slope.alias("slope"), intercept.alias("b0"))
    pre = F.max(F.when(~F.col("post"), F.col("slope")))
    post = F.max(F.when(F.col("post"), F.col("slope")))
    pre_b = F.max(F.when(~F.col("post"), F.col("b0")))
    post_b = F.max(F.when(F.col("post"), F.col("b0")))
    return fits.agg(
        F.max(F.when(~F.col("post"), F.col("n")))
        .cast("long")
        .alias("n_pre"),
        F.max(F.when(F.col("post"), F.col("n")))
        .cast("long")
        .alias("n_post"),
        F.round(pre, 6).alias("slope_pre"),
        F.round(post, 6).alias("slope_post"),
        F.round(post - pre, 6).alias("slope_change"),
        F.round(
            (post_b + post * pivot_t) - (pre_b + pre * pivot_t), 6
        ).alias("level_change_at_pivot"),
    )


@register(
    "events_cooks_distance",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS y
      FROM events GROUP BY 1
    ), m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(t) AS DOUBLE) AS st,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(SUM(t * t) AS DOUBLE) AS stt,
             CAST(CAST(SUM(t * y) AS VARCHAR) AS DOUBLE) AS sty,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM daily
    ), fit AS (
      SELECT n, st, stt,
             (n * sty - st * sy) / (n * stt - st * st) AS b,
             (sy - (n * sty - st * sy) / (n * stt - st * st) * st) / n
               AS a,
             (syy - sy * sy / n
              - (n * sty - st * sy) / (n * stt - st * st)
                * (sty - st * sy / n)) / (n - 2) AS mse
      FROM m
    )
    SELECT CAST(t AS BIGINT) AS t,
           ROUND(CAST(y AS DOUBLE) - (a + b * t), 6) AS residual,
           ROUND(1.0 / n + (t - st / n) * (t - st / n)
                 / (stt - st * st / n), 6) AS leverage,
           ROUND(
             ((CAST(y AS DOUBLE) - (a + b * t))
              * (CAST(y AS DOUBLE) - (a + b * t)) / (2 * mse))
             * ((1.0 / n + (t - st / n) * (t - st / n)
                 / (stt - st * st / n))
                / ((1 - (1.0 / n + (t - st / n) * (t - st / n)
                         / (stt - st * st / n)))
                   * (1 - (1.0 / n + (t - st / n) * (t - st / n)
                           / (stt - st * st / n))))), 6) AS cooks_d
    FROM daily CROSS JOIN fit
    """,
)
def events_cooks_distance(spark: SparkSession, d: str) -> DataFrame:
    """COOK'S DISTANCE per day for the daily-trend OLS — which single
    days, if deleted, would most move the fitted line: the influence
    diagnostic that separates "high residual but harmless" from
    "quietly steering the slope" (high leverage x high residual). The
    triage companion to the trend family — ``events_theil_sen``
    resists influence, this MEASURES it, ``events_interrupted_ts``
    then tests what the influential day changed. Everything derives
    from the same six exact moment partials as agg_linear_fit:
    residuals, leverage h_t = 1/n + (t - tbar)^2/S_tt, and
    D = r^2 h / (p * MSE * (1-h)^2) with p=2 — closed doubles, no
    per-row matrix algebra.

    Scale: one grouped pass to the daily grain, a 1-row fit
    broadcast back over it — O(days) output."""
    daily = (
        load(spark, d, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("t")
        )
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("y")
        )
    )
    t, y = F.col("t"), F.col("y")
    m = daily.agg(
        F.count("*").alias("n"),
        F.sum(t).cast("double").alias("st"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(t * t).cast("double").alias("stt"),
        F.sum(t.cast("decimal(15,3)") * y).cast("double").alias("sty"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, st, sy = F.col("n"), F.col("st"), F.col("sy")
    stt, sty, syy = F.col("stt"), F.col("sty"), F.col("syy")
    b = (n * sty - st * sy) / (n * stt - st * st)
    fit = m.select(
        "n",
        "st",
        "stt",
        b.alias("b"),
        ((sy - b * st) / n).alias("a"),
        (
            (syy - sy * sy / n - b * (sty - st * sy / n)) / (n - 2)
        ).alias("mse"),
    )
    j = daily.crossJoin(F.broadcast(fit))
    resid = y.cast("double") - (F.col("a") + F.col("b") * t)
    lev = 1.0 / F.col("n") + (t - st / F.col("n")) * (
        t - st / F.col("n")
    ) / (stt - st * st / F.col("n"))
    cooks = (resid * resid / (2 * F.col("mse"))) * (
        lev / ((1 - lev) * (1 - lev))
    )
    return j.select(
        t.cast("long").alias("t"),
        F.round(resid, 6).alias("residual"),
        F.round(lev, 6).alias("leverage"),
        F.round(cooks, 6).alias("cooks_d"),
    )


@register(
    "events_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3)
                  AS DECIMAL(15,3)) AS y
      FROM events GROUP BY 1
    ), s AS (
      SELECT SUM(CASE WHEN b.y > a.y THEN 1
                      WHEN b.y < a.y THEN -1 ELSE 0 END) AS s_stat,
             COUNT(*) AS n_pairs
      FROM daily a JOIN daily b ON b.t > a.t
    ), n AS (SELECT COUNT(*) AS n FROM daily),
    ties AS (
      SELECT COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0) AS tie_term
      FROM (SELECT COUNT(*) AS c FROM daily GROUP BY y HAVING COUNT(*) > 1)
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           ROUND((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0, 6)
             AS var_s,
           ROUND(CASE
             WHEN s_stat > 0 THEN (s_stat - 1)
               / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)
             WHEN s_stat < 0 THEN (s_stat + 1)
               / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)
             ELSE 0.0 END, 6) AS z_stat,
           abs(CASE
             WHEN s_stat > 0 THEN (s_stat - 1)
               / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)
             WHEN s_stat < 0 THEN (s_stat + 1)
               / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)
             ELSE 0.0 END) > 1.959963984540054 AS significant_5pct
    FROM s CROSS JOIN n CROSS JOIN ties
    """,
)
def events_mann_kendall(spark: SparkSession, d: str) -> DataFrame:
    """MANN-KENDALL trend test — the nonparametric "is there a
    monotonic trend at all" significance test that completes the
    trend trio: ``events_theil_sen`` estimates the robust slope, this
    says whether it's distinguishable from noise (S = Sigma sign(y_j -
    y_i) over ordered pairs, variance with the exact tie correction,
    continuity-corrected z vs the 5% normal quantile), and
    ``events_interrupted_ts`` attributes a break. Distribution-free:
    no normality assumption on the daily totals, immune to monotone
    transforms. S and the tie term are pure integers; one sqrt + one
    division finish.

    Scale: the pair expansion runs on the DAILY grain (|days| choose
    2, broadcast self-join) exactly like theil_sen — never on raw
    events; everything else is 1-row model state."""
    daily = (
        load(spark, d, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("t")
        )
        .agg(
            F.round(F.sum(F.col("value").cast(DECV)), 3)
            .cast("decimal(15,3)")
            .alias("y")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(F.broadcast(b), F.col("b.t") > F.col("a.t")).agg(
        F.sum(
            F.when(F.col("b.y") > F.col("a.y"), 1)
            .when(F.col("b.y") < F.col("a.y"), -1)
            .otherwise(0)
        ).alias("s_stat")
    )
    n_df = daily.agg(F.count("*").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(n_df)).crossJoin(F.broadcast(ties))
    n, ss = F.col("n"), F.col("s_stat")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18.0
    z = (
        F.when(ss > 0, (ss - 1) / F.sqrt(var_s))
        .when(ss < 0, (ss + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        n.cast("long").alias("n_days"),
        ss.cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.959963984540054).alias("significant_5pct"),
    )


#: price/volume/mix bridge: period boundary (orders strictly before =
#: period A, on/after = period B)
PVM_PIVOT = "1998-01-01"


@register(
    "orders_price_volume_mix",
    oracle=f"""
    WITH seg AS (
      SELECT o_orderpriority AS seg,
             o_orderdate < TIMESTAMP '{PVM_PIVOT}' AS is_a,
             COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ), w AS (
      SELECT seg,
             MAX(CASE WHEN is_a THEN n ELSE 0 END) AS n_a,
             MAX(CASE WHEN NOT is_a THEN n ELSE 0 END) AS n_b,
             CAST(CAST(MAX(CASE WHEN is_a THEN rev END) AS VARCHAR)
                  AS DOUBLE) AS rev_a,
             CAST(CAST(MAX(CASE WHEN NOT is_a THEN rev END) AS VARCHAR)
                  AS DOUBLE) AS rev_b
      FROM seg GROUP BY seg
    )
    SELECT seg AS o_orderpriority,
           ROUND(rev_b - rev_a, 6) AS revenue_delta,
           ROUND((n_b - n_a) * (rev_a / n_a), 6) AS volume_effect,
           ROUND(n_b * (rev_b / n_b - rev_a / n_a), 6) AS price_effect,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM w WHERE n_a > 0 AND n_b > 0
    """,
)
def orders_price_volume_mix(spark: SparkSession, d: str) -> DataFrame:
    """PRICE/VOLUME variance bridge — the FP&A decomposition of a
    revenue change between two periods, per segment: volume effect =
    (count change) x (old average ticket), price effect = (new count)
    x (average-ticket change); the two sum EXACTLY to the revenue
    delta (the bridge identity — each effect holds the other factor
    at a consistent base, so nothing is left unexplained). This is
    the "why did revenue move" slide every finance review opens with,
    stated as one query. Revenue rides DECIMAL to the 1-row-per-
    segment pivot; the effects are double arithmetic on identical
    operands in both engines.

    Scale: one grouped pass to (segment, period) cells, a
    |segments|-row pivot — fact table touched once."""
    o = load(spark, d, "orders")
    seg = o.groupBy(
        F.col("o_orderpriority").alias("seg"),
        (F.col("o_orderdate") < F.lit(PVM_PIVOT).cast("timestamp")).alias(
            "is_a"
        ),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    w = seg.groupBy("seg").agg(
        F.max(F.when(F.col("is_a"), F.col("n")).otherwise(0)).alias("n_a"),
        F.max(F.when(~F.col("is_a"), F.col("n")).otherwise(0)).alias(
            "n_b"
        ),
        F.max(F.when(F.col("is_a"), F.col("rev")))
        .cast("double")
        .alias("rev_a"),
        F.max(F.when(~F.col("is_a"), F.col("rev")))
        .cast("double")
        .alias("rev_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    rev_a, rev_b = F.col("rev_a"), F.col("rev_b")
    return w.where((n_a > 0) & (n_b > 0)).select(
        F.col("seg").alias("o_orderpriority"),
        F.round(rev_b - rev_a, 6).alias("revenue_delta"),
        F.round((n_b - n_a) * (rev_a / n_a), 6).alias("volume_effect"),
        F.round(n_b * (rev_b / n_b - rev_a / n_a), 6).alias(
            "price_effect"
        ),
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
    )


@register(
    "ab_wilson_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), m AS (
      SELECT arm, COUNT(*) AS n, SUM(converted) AS x
      FROM per_user GROUP BY arm
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           CAST(x AS BIGINT) AS n_converted,
           ROUND(CAST(x AS DOUBLE) / n, 6) AS p_hat,
           ROUND((CAST(x AS DOUBLE) / n
                  + 1.959963984540054 * 1.959963984540054 / (2 * n)
                  - 1.959963984540054
                    * sqrt((CAST(x AS DOUBLE) / n)
                           * (1 - CAST(x AS DOUBLE) / n) / n
                           + 1.959963984540054 * 1.959963984540054
                             / (4.0 * n * n)))
                 / (1 + 1.959963984540054 * 1.959963984540054 / n), 6)
             AS wilson_lo,
           ROUND((CAST(x AS DOUBLE) / n
                  + 1.959963984540054 * 1.959963984540054 / (2 * n)
                  + 1.959963984540054
                    * sqrt((CAST(x AS DOUBLE) / n)
                           * (1 - CAST(x AS DOUBLE) / n) / n
                           + 1.959963984540054 * 1.959963984540054
                             / (4.0 * n * n)))
                 / (1 + 1.959963984540054 * 1.959963984540054 / n), 6)
             AS wilson_hi
    FROM m
    """,
)
def ab_wilson_ci(spark: SparkSession, d: str) -> DataFrame:
    """WILSON SCORE interval for the per-arm conversion rate — the
    proportion CI that behaves at the edges where the naive Wald
    interval fails (p near 0/1, small n: Wald collapses to zero width
    or exits [0,1]; Wilson stays calibrated — the standard
    recommendation since Brown/Cai/DasGupta). Conversion = did the
    user purchase at all (per-user dedup first, the correct unit —
    event-level proportions overweight heavy users). Counts are
    integers; the closed form evaluates once per arm with the z
    literal shared across the A/B family.

    Scale: one grouped pass to per-user flags, a 2-row arm
    aggregate."""
    per_user = (
        load(spark, d, "events")
        .groupBy("user_id")
        .agg(
            (F.col("user_id") % 2).alias("arm"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    m = per_user.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("x")
    )
    z = 1.959963984540054
    n, x = F.col("n"), F.col("x")
    p = x.cast("double") / n
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return m.select(
        F.col("arm").cast("long").alias("arm"),
        n.cast("long").alias("n_users"),
        x.cast("long").alias("n_converted"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@register(
    "features_behavior_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ), t AS (
      SELECT user_id, SUM(cnt) AS n, COUNT(*) AS n_types
      FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(n_types) AS BIGINT) AS n_types,
           CAST(SUM(CAST(floor(cnt * log2(CAST(n AS DOUBLE) / cnt) / n
                               * 1000000.0) AS BIGINT)) AS BIGINT)
             AS entropy_micros
    FROM c JOIN t ON t.user_id = c.user_id
    GROUP BY c.user_id
    """,
)
def features_behavior_entropy(spark: SparkSession, d: str) -> DataFrame:
    """BEHAVIORAL ENTROPY per user — Shannon entropy (micro-bit
    fixed-point) of the user's event-type mix: near zero = monotone
    automation (the ``events_bot_score`` 'monotone behavior' gate,
    here as a continuous feature), high = diverse organic usage; a
    standard churn/abuse model feature and the per-user twin of
    ``corpus_lang_entropy``. Exactness recipe inherited from that op:
    each -p*log2(p) term is floor-quantized to integer MICROS before
    the sum, so the one transcendental (log2 — not bit-portable in
    the last ulp across engines) is truncated below any divergence
    and the aggregate is an exact integer.

    Scale: two cascaded grouped passes keyed user_id — the same
    single exchange the feature family shares."""
    c = (
        load(spark, d, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    t = c.groupBy(F.col("user_id").alias("tu")).agg(
        F.sum("cnt").alias("n"), F.count("*").alias("n_types")
    )
    term = F.floor(
        F.col("cnt")
        * F.log2(F.col("n").cast("double") / F.col("cnt"))
        / F.col("n")
        * F.lit(1000000.0)
    ).cast("long")
    return (
        c.join(F.broadcast(t), F.col("user_id") == F.col("tu"))
        .groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.max("n_types").cast("long").alias("n_types"),
            F.sum(term).cast("long").alias("entropy_micros"),
        )
    )


@register(
    "agg_bayes_smoothed_rate",
    oracle="""
    WITH cp AS (
      SELECT l_partkey, o_custkey,
             COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey, o_custkey
    ), rates AS (
      SELECT l_partkey,
             COUNT(*) AS n,
             CAST(COUNT(CASE WHEN n_orders >= 2 THEN 1 END) AS DOUBLE)
               AS x
      FROM cp GROUP BY l_partkey
    ), rq AS (
      SELECT l_partkey, n, x,
             CAST(ROUND(x / n, 9) AS DECIMAL(18,9)) AS rd
      FROM rates
    ), mom AS (
      SELECT CAST(CAST(SUM(rd) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m,
             CAST(CAST(SUM(rd * rd) AS VARCHAR) AS DOUBLE) / COUNT(*)
               - (CAST(CAST(SUM(rd) AS VARCHAR) AS DOUBLE) / COUNT(*))
                 * (CAST(CAST(SUM(rd) AS VARCHAR) AS DOUBLE) / COUNT(*))
               AS v
      FROM rq
    ), prior AS (
      SELECT m,
             greatest(m * (1 - m) / greatest(v, 1e-9) - 1, 1.0) AS k
      FROM mom
    )
    SELECT l_partkey,
           CAST(n AS BIGINT) AS n_customers,
           ROUND(x / n, 6) AS raw_rate,
           ROUND((x + k * m) / (n + k), 6) AS smoothed_rate
    FROM rates CROSS JOIN prior
    """,
)
def agg_bayes_smoothed_rate(spark: SparkSession, d: str) -> DataFrame:
    """EMPIRICAL-BAYES smoothed rates — per-part reorder rate shrunk
    toward the global prior with a method-of-moments Beta strength
    (k = m(1-m)/v - 1): the fix for every leaderboard where a
    2-customer part with rate 1.0 outranks a 500-customer staple at
    0.62. Raw and smoothed ship together so the shrinkage is
    auditable; thin-support rows move a lot, well-supported ones
    barely. The moment fit quantizes each rate to DECIMAL(18,9)
    BEFORE the global sums — raw double sums over |parts| rows would
    be partition-order-dependent in the last ulp (the guard also
    floors pathological v). The ranking-
    stability counterpart of ``basket_reorder_rate``'s raw census.

    Scale: the (part, customer) grain dominates exactly as in the
    raw op; the prior is a 1-row broadcast back."""
    cp = (
        load(spark, d, "lineitem")
        .join(
            load(spark, d, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_partkey", "o_custkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    # cached (r13, VERDICT_r12 item 7): the per-part rate table feeds
    # BOTH the global moment fit and the final per-part projection.
    # The two branches prune different columns, so ReusedExchange never
    # deduped them and the lineitem⋈orders + two corpus-grain groupBys
    # ran twice (10 Exchanges). The cache is bounded at the |parts|
    # grain (the 1-row prior is derived from it, never from a second
    # fact scan) and computed inside the query — same integers, the
    # moment fit reads the identical DECIMAL(18,9) cells.
    rates = cp.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("n_orders") >= 2).cast("double").alias("x"),
    ).cache()
    r = F.col("x") / F.col("n")
    rd = F.round(r, 9).cast("decimal(18,9)")
    rq = rates.withColumn("rd", rd)
    mom = rq.agg(
        (F.sum("rd").cast("double") / F.count("*")).alias("m"),
        (
            F.sum(F.col("rd") * F.col("rd")).cast("double") / F.count("*")
            - (F.sum("rd").cast("double") / F.count("*"))
            * (F.sum("rd").cast("double") / F.count("*"))
        ).alias("v"),
    )
    prior = mom.select(
        "m",
        F.greatest(
            F.col("m") * (1 - F.col("m"))
            / F.greatest(F.col("v"), F.lit(1e-9))
            - 1,
            F.lit(1.0),
        ).alias("k"),
    )
    j = rates.crossJoin(F.broadcast(prior))
    return j.select(
        "l_partkey",
        F.col("n").cast("long").alias("n_customers"),
        F.round(r, 6).alias("raw_rate"),
        F.round(
            (F.col("x") + F.col("k") * F.col("m"))
            / (F.col("n") + F.col("k")),
            6,
        ).alias("smoothed_rate"),
    )


@register(
    "funnel_attribution_shapley",
    oracle=f"""
    WITH touches AS (
      SELECT DISTINCT p.event_id AS p_id, t.event_type AS channel,
             CAST(p.value AS DOUBLE) AS revenue
      FROM events p
      JOIN events t
        ON t.user_id = p.user_id
       AND t.event_type IN ('click', 'view')
       AND t.ts < p.ts
       AND t.ts >= p.ts - INTERVAL '{ATTR_WINDOW_MIN} minutes'
      WHERE p.event_type = 'purchase'
    ), sized AS (
      SELECT p_id, channel, revenue,
             COUNT(*) OVER (PARTITION BY p_id) AS n_channels
      FROM touches
    ), credited AS (
      SELECT channel,
             CAST(ROUND(revenue / n_channels, 9) AS DECIMAL(18,9))
               AS credit
      FROM sized
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_contributions,
           CAST(CAST(SUM(credit) AS VARCHAR) AS DOUBLE)
             AS shapley_revenue
    FROM credited GROUP BY channel
    """,
)
def funnel_attribution_shapley(spark: SparkSession, d: str) -> DataFrame:
    """SHAPLEY-VALUE attribution — the game-theoretic credit rule
    (average marginal contribution over all channel orderings), which
    for a BINARY reach value function (the conversion happens iff at
    least one present channel touched) collapses to the closed form:
    equal split among the channels PRESENT in each conversion's
    window. That closed form is stated honestly — the exponential
    orderings sum is exact here, not sampled — and differs materially
    from both ``funnel_attribution`` (last-touch: order decides) and
    ``funnel_attribution_position`` (40/20/40: position decides):
    Shapley is symmetric, so two channels that both reached get equal
    credit regardless of order. Presence is per (conversion, channel)
    DISTINCT — five clicks before one purchase count once. Credits
    round to DECIMAL before the channel rollup, order-independent.

    Scale: one per-user interval join (the attribution family's
    shared shape), a per-conversion presence window, a |channels|-row
    rollup."""
    ev = load(spark, d, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("double").alias("revenue"),
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    present = (
        purchases.join(
            touches,
            (F.col("t_user") == F.col("user_id"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (
                F.col("t_ts")
                >= F.col("p_ts")
                - F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTES")
            ),
        )
        .select("p_id", "channel", "revenue")
        .distinct()
    )
    sized = present.withColumn(
        "n_channels", F.count("*").over(Window.partitionBy("p_id"))
    )
    credited = sized.select(
        "channel",
        F.round(F.col("revenue") / F.col("n_channels"), 9)
        .cast("decimal(18,9)")
        .alias("credit"),
    )
    return credited.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_contributions"),
        F.sum("credit").cast("double").alias("shapley_revenue"),
    )


@register(
    "growth_accounting",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  // 7 AS BIGINT) AS w
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(w) AS first_w FROM wk GROUP BY user_id
    ), lab AS (
      SELECT wk.user_id, wk.w, first_w,
             lag(wk.w) OVER (PARTITION BY wk.user_id ORDER BY wk.w)
               AS prev_w
      FROM wk JOIN firsts ON firsts.user_id = wk.user_id
    ), states AS (
      SELECT w,
             COUNT(CASE WHEN w = first_w THEN 1 END) AS new_users,
             COUNT(CASE WHEN prev_w = w - 1 THEN 1 END) AS retained,
             COUNT(CASE WHEN w > first_w
                         AND (prev_w IS NULL OR prev_w < w - 1)
                   THEN 1 END) AS resurrected
      FROM lab GROUP BY w
    ), churn AS (
      SELECT a.w + 1 AS w, COUNT(*) AS churned
      FROM lab a
      WHERE NOT EXISTS (SELECT 1 FROM wk b
                        WHERE b.user_id = a.user_id AND b.w = a.w + 1)
        AND a.w + 1 <= (SELECT MAX(w) FROM wk)
      GROUP BY a.w + 1
    )
    SELECT s.w AS week,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(retained AS BIGINT) AS retained,
           CAST(resurrected AS BIGINT) AS resurrected,
           CAST(COALESCE(churned, 0) AS BIGINT) AS churned,
           CASE WHEN COALESCE(churned, 0) > 0
                THEN ROUND(CAST(new_users + resurrected AS DOUBLE)
                           / churned, 6) END AS quick_ratio
    FROM states s LEFT JOIN churn c ON c.w = s.w
    """,
)
def growth_accounting(spark: SparkSession, d: str) -> DataFrame:
    """GROWTH ACCOUNTING — the weekly active-user ledger every growth
    team runs (the Social Capital framework): actives decompose
    EXACTLY into new (first-ever week), retained (active last week
    too), and resurrected (returning after a gap); churned counts
    last week's actives who didn't return; quick ratio =
    (new + resurrected) / churned tells whether growth is refilling
    faster than the bucket leaks (>1 grows). Each user contributes to
    exactly one inflow state per active week by construction — the
    ledger identity ``retention_cohorts`` (fixed cohort view) and
    ``events_stickiness`` (intensity) don't give you. Pure integer
    set logic: per-user week lags, a first-week join, an anti-join
    for churn, one rational at the end.

    Scale: the deduped (user, week) grain bounds everything; lag and
    both aggregates ride user- then week-keyed shuffles."""
    wk = (
        load(spark, d, "events")
        .select(
            "user_id",
            F.floor(
                F.datediff(
                    F.col("ts").cast("date"),
                    F.lit("2024-01-01").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("w"),
        )
        .distinct()
    )
    firsts = wk.groupBy(F.col("user_id").alias("fu")).agg(
        F.min("w").alias("first_w")
    )
    lw = Window.partitionBy("user_id").orderBy("w")
    lab = wk.join(firsts, F.col("user_id") == F.col("fu")).select(
        "user_id", "w", "first_w", F.lag("w").over(lw).alias("prev_w")
    )
    states = lab.groupBy("w").agg(
        F.count(F.when(F.col("w") == F.col("first_w"), 1)).alias(
            "new_users"
        ),
        F.count(F.when(F.col("prev_w") == F.col("w") - 1, 1)).alias(
            "retained"
        ),
        F.count(
            F.when(
                (F.col("w") > F.col("first_w"))
                & (
                    F.col("prev_w").isNull()
                    | (F.col("prev_w") < F.col("w") - 1)
                ),
                1,
            )
        ).alias("resurrected"),
    )
    max_w = wk.agg(F.max("w").alias("mw"))
    nxt = wk.select(F.col("user_id").alias("nu"), F.col("w").alias("nw"))
    churn = (
        lab.join(
            nxt,
            (F.col("user_id") == F.col("nu"))
            & (F.col("nw") == F.col("w") + 1),
            "left_anti",
        )
        .crossJoin(F.broadcast(max_w))
        .where(F.col("w") + 1 <= F.col("mw"))
        .groupBy((F.col("w") + 1).alias("cw"))
        .agg(F.count("*").alias("churned"))
    )
    j = states.join(churn, F.col("w") == F.col("cw"), "left").select(
        F.col("w").alias("week"),
        F.col("new_users").cast("long").alias("new_users"),
        F.col("retained").cast("long").alias("retained"),
        F.col("resurrected").cast("long").alias("resurrected"),
        F.coalesce(F.col("churned"), F.lit(0))
        .cast("long")
        .alias("churned"),
    )
    return j.withColumn(
        "quick_ratio",
        F.when(
            F.col("churned") > 0,
            F.round(
                (F.col("new_users") + F.col("resurrected")).cast("double")
                / F.col("churned"),
                6,
            ),
        ),
    )


# --- rolling active users ---------------------------------------------

ROLLING_ACTIVE_DAYS = 7  # trailing window, inclusive of the day itself


@register(
    "retention_rolling_actives",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM du
    ), joined AS (
      SELECT d.day, u.user_id, u.day AS uday
      FROM days d
      JOIN du u
        ON u.day BETWEEN d.day - INTERVAL {ROLLING_ACTIVE_DAYS - 1} DAY
                     AND d.day
    )
    SELECT day,
           CAST(COUNT(DISTINCT CASE WHEN uday = day THEN user_id END)
                AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_{ROLLING_ACTIVE_DAYS}d,
           ROUND(CAST(COUNT(DISTINCT CASE WHEN uday = day
                                          THEN user_id END) AS DOUBLE)
                 / COUNT(DISTINCT user_id), 6) AS stickiness
    FROM joined GROUP BY day
    """,
)
def retention_rolling_actives(spark: SparkSession, d: str) -> DataFrame:
    """ROLLING ACTIVE USERS — per calendar day, the daily actives
    (DAU), the trailing-{ROLLING_ACTIVE_DAYS}-day distinct actives
    (rolling WAU — the industry-standard smoothing of weekday
    seasonality), and the DAU/WAU stickiness for THAT day. Where
    ``events_stickiness`` reports one corpus-level ratio, this is the
    daily time series a growth dashboard actually plots.

    Distinct-over-a-sliding-range isn't a window frame Spark (or SQL)
    supports directly — rolling distinct is NOT sum-decomposable — so
    the plan reduces events to the (day, user) grain first (one
    dedup shuffle), then range-joins that grain to the DAY dimension.
    Days are bounded (≤ corpus span, a few thousand rows at any data
    size), so the join broadcasts the day table and the fan-out is at
    most ×{ROLLING_ACTIVE_DAYS} per (day, user) row — at 100 TB the
    heavy reduction happens BEFORE any fan-out, and the final distinct
    count shuffles on the low-cardinality day key.

    Stickiness divides two exact integers once; ROUND(x, 6) of a
    ratio of counts is the same double in both engines."""
    ev = load(spark, d, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    du = ev.distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d0")
    joined = du.join(
        F.broadcast(days),
        (F.col("day") <= F.col("d0"))
        & (
            F.col("day")
            >= F.date_sub(F.col("d0"), ROLLING_ACTIVE_DAYS - 1)
        ),
    )
    dau = F.count_distinct(
        F.when(F.col("day") == F.col("d0"), F.col("user_id"))
    )
    wau = F.count_distinct("user_id")
    return joined.groupBy(F.col("d0").alias("day")).agg(
        dau.cast("long").alias("dau"),
        wau.cast("long").alias(f"wau_{ROLLING_ACTIVE_DAYS}d"),
        F.round(dau.cast("double") / wau, 6).alias("stickiness"),
    )


# --- weight of evidence / information value ---------------------------


@register(
    "features_woe_iv",
    oracle="""
    WITH lab AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS is_good
      FROM events GROUP BY user_id
    ), feat AS (
      SELECT user_id, event_type AS cat FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ), cells AS (
      SELECT f.cat,
             SUM(l.is_good) AS gc,
             SUM(1 - l.is_good) AS bc
      FROM feat f JOIN lab l USING (user_id)
      GROUP BY f.cat
    ), tot AS (
      SELECT SUM(gc) AS g, SUM(bc) AS b,
             CAST(COUNT(*) AS DOUBLE) AS ncat
      FROM cells
    ), rates AS (
      SELECT c.cat, c.gc, c.bc,
             (CAST(c.gc AS DOUBLE) + 0.5) / (t.g + 0.5 * t.ncat) AS pg,
             (CAST(c.bc AS DOUBLE) + 0.5) / (t.b + 0.5 * t.ncat) AS pb
      FROM cells c CROSS JOIN tot t
    ), woe AS (
      SELECT cat, gc, bc, pg, pb,
             CAST(FLOOR(LN(pg / pb) * 1000000000.0 + 0.5) AS BIGINT)
               AS woe_nanos
      FROM rates
    )
    SELECT cat AS first_event_type,
           CAST(gc AS BIGINT) AS n_good,
           CAST(bc AS BIGINT) AS n_bad,
           CAST(woe_nanos AS DOUBLE) / 1000000000.0 AS woe,
           CAST(FLOOR((pg - pb) * (CAST(woe_nanos AS DOUBLE)
                                   / 1000000000.0)
                      * 1000000000.0 + 0.5) AS BIGINT) AS iv_term_nanos
    FROM woe
    """,
)
def features_woe_iv(spark: SparkSession, d: str) -> DataFrame:
    """WEIGHT OF EVIDENCE / INFORMATION VALUE screening — the credit-
    scoring-born feature audit every tabular-ML pipeline still runs:
    per category of a feature (here: the user's FIRST event type,
    deterministic by (ts, event_id)), how strongly does it separate
    converters from non-converters (label: user ever purchases)?
    WOE = ln(P(cat|good)/P(cat|bad)) with 0.5 Laplace smoothing per
    cell; the per-category IV term (pg−pb)·WOE sums to the feature's
    information value (rule of thumb: IV > 0.3 strong, < 0.02 drop
    the feature).

    Determinism: counts are exact integers, the smoothed rates are
    single IEEE divisions, WOE floor-quantizes to integer nanos
    BEFORE the IV multiplication (which then floor-quantizes too) —
    the corpus_lang_entropy recipe, so no float sum ever reorders and
    ln's last-ulp wobble is fenced by the quantization grid.

    Scale: one user-grain label aggregate, one first-event window
    (both user-keyed shuffles over the fact table), then a
    category-grain rollup whose cardinality is the feature's — tiny;
    totals broadcast back."""
    ev = load(spark, d, "events")
    lab = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("is_good")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feat = (
        ev.select(
            "user_id", F.col("event_type").alias("cat"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "cat")
    )
    cells = (
        feat.join(lab, "user_id")
        .groupBy("cat")
        .agg(
            F.sum("is_good").alias("gc"),
            F.sum(1 - F.col("is_good")).alias("bc"),
        )
    )
    tot = cells.agg(
        F.sum("gc").alias("g"),
        F.sum("bc").alias("b"),
        F.count("*").cast("double").alias("ncat"),
    )
    r = cells.crossJoin(F.broadcast(tot))
    pg = (F.col("gc").cast("double") + 0.5) / (
        F.col("g") + 0.5 * F.col("ncat")
    )
    pb = (F.col("bc").cast("double") + 0.5) / (
        F.col("b") + 0.5 * F.col("ncat")
    )
    woe_nanos = F.floor(F.log(pg / pb) * 1_000_000_000.0 + 0.5).cast(
        "long"
    )
    woe = woe_nanos.cast("double") / 1_000_000_000.0
    return r.select(
        F.col("cat").alias("first_event_type"),
        F.col("gc").cast("long").alias("n_good"),
        F.col("bc").cast("long").alias("n_bad"),
        woe.alias("woe"),
        F.floor((pg - pb) * woe * 1_000_000_000.0 + 0.5)
        .cast("long")
        .alias("iv_term_nanos"),
    )


# --- change-point detection (binary segmentation, one split) ----------


@register(
    "events_changepoint_binseg",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, c,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             SUM(c) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS s
      FROM daily
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(c) AS sn FROM daily
    ), scored AS (
      SELECT day, i, s, t.n, t.sn,
             abs(t.n * s - i * t.sn) AS score
      FROM idx CROSS JOIN tot t
      WHERE i < t.n
    )
    SELECT day AS split_day,
           CAST(i AS BIGINT) AS split_i,
           CAST(n AS BIGINT) AS n_days,
           CAST(score AS BIGINT) AS score,
           ROUND(CAST(s AS DOUBLE) / i, 6) AS mean_before,
           ROUND(CAST(sn - s AS DOUBLE) / (n - i), 6) AS mean_after
    FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, i) = 1
    """,
)
def events_changepoint_binseg(spark: SparkSession, d: str) -> DataFrame:
    """CHANGE-POINT detection on the daily event-count series — one
    binary-segmentation split: the day boundary maximizing the
    cumulative-sum deviation |n·S_i − i·S_n| (the integer-exact
    equivalent of maximizing the two-segment mean-shift likelihood
    for fixed variance). Where ``anomaly_cusum`` flags WHEN a drift
    started against a fixed reference, this finds the single best
    structural break with no parameters at all — the first question
    ("did the pipeline change on some day?") a data-volume regression
    review asks.

    Exactness by construction: daily counts, prefix sums, and the
    score are ALL integers (no float appears until the two reported
    segment means), and the argmax tie-breaks on the earlier index —
    both engines pick the identical row.

    Scale: one day-grain rollup of the fact table (map-side
    combinable), then a running sum over the DAY dimension (bounded —
    thousands of rows at any corpus size; single-partition window on
    model-state-sized data, pareto_abc's posture)."""
    daily = (
        load(spark, d, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy("day")
    idx = daily.select(
        "day",
        "c",
        F.row_number().over(w).alias("i"),
        F.sum("c")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("s"),
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("c").alias("sn")
    )
    scored = (
        idx.crossJoin(F.broadcast(tot))
        .where(F.col("i") < F.col("n"))
        .select(
            "day",
            "i",
            "s",
            "n",
            "sn",
            F.abs(F.col("n") * F.col("s") - F.col("i") * F.col("sn")).alias(
                "score"
            ),
        )
    )
    pick = Window.orderBy(F.desc("score"), F.asc("i"))
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            F.col("day").alias("split_day"),
            F.col("i").cast("long").alias("split_i"),
            F.col("n").cast("long").alias("n_days"),
            F.col("score").cast("long").alias("score"),
            F.round(F.col("s").cast("double") / F.col("i"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("sn") - F.col("s")).cast("double")
                / (F.col("n") - F.col("i")),
                6,
            ).alias("mean_after"),
        )
    )


# --- Holt-Winters additive seasonal smoothing --------------------------

HW_ALPHA = 0.25    # level gain  — exact binary fractions, so 1-α etc.
HW_BETA = 0.0625   # trend gain    are exact and the fold is bit-stable
HW_GAMMA = 0.25    # seasonal gain
HW_PERIOD = 7      # weekly seasonality on the daily series


def _hw_step_sql() -> str:
    """One Holt-Winters update as a DuckDB list_reduce lambda step.
    Accumulator layout (the window_holt list-not-struct workaround):
    [level, trend, s_next, s_next+1, ..., s_next+6] — seasonals in
    consumption order, rotated each step. The folded element is a
    9-list whose first slot carries the observation (e[1])."""
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA
    lvl = (
        f"(CAST({a} AS DOUBLE) * (e[1] - acc[3])"
        f" + CAST({1 - a} AS DOUBLE) * (acc[1] + acc[2]))"
    )
    return f"""(acc, e) -> [
      {lvl},
      CAST({b} AS DOUBLE) * ({lvl} - acc[1])
        + CAST({1 - b} AS DOUBLE) * acc[2],
      acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
      CAST({g} AS DOUBLE) * (e[1] - {lvl})
        + CAST({1 - g} AS DOUBLE) * acc[3]
    ]"""


@register(
    "events_holt_winters",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1
    ), s AS (
      SELECT list(c ORDER BY day) AS vals FROM daily
    ), init AS (
      SELECT vals, len(vals) AS n,
             (vals[1] + vals[2] + vals[3] + vals[4] + vals[5]
              + vals[6] + vals[7]) / 7.0 AS l0
      FROM s WHERE len(vals) >= {HW_PERIOD + 1}
    ), folded AS (
      SELECT n,
             list_reduce(
               list_prepend(
                 [l0, CAST(0.0 AS DOUBLE),
                  vals[1] - l0, vals[2] - l0, vals[3] - l0, vals[4] - l0,
                  vals[5] - l0, vals[6] - l0, vals[7] - l0],
                 list_transform(vals[{HW_PERIOD + 1}:len(vals)],
                                x -> [x, CAST(NULL AS DOUBLE), NULL,
                                      NULL, NULL, NULL, NULL, NULL, NULL])),
               {_hw_step_sql()}
             ) AS st
      FROM init
    )
    SELECT CAST(r.range AS BIGINT) AS horizon_d,
           CAST(n AS BIGINT) AS n_days,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS trend,
           ROUND(st[2 + r.range], 6) AS seasonal,
           ROUND(st[1] + r.range * st[2] + st[2 + r.range], 6)
             AS forecast
    FROM folded, range(1, {HW_PERIOD + 1}) r
    """,
)
def events_holt_winters(spark: SparkSession, d: str) -> DataFrame:
    """HOLT-WINTERS additive seasonal smoothing of the daily event
    count — the weekly-seasonality-aware member of the fold family
    (EWMA → Holt → here): level, trend, and a rotating 7-slot
    seasonal state updated through the whole ordered series, emitting
    a 7-day-horizon forecast (level + h·trend + seasonal). The first
    {HW_PERIOD} days initialize (l₀ = their mean, seasonals = the
    deviations, trend 0 — documented simplified init); series shorter
    than {HW_PERIOD + 1} days emit nothing in both engines.

    Exactness: the gains are exact binary fractions (0.25, 0.0625),
    the accumulator is a 9-element double list folded in the identical
    order by both engines (the window_holt list-not-struct recipe), so
    every state is bit-identical before the final rounding.

    Scale: the series is the DAY-grain rollup — bounded at thousands
    of rows regardless of corpus size — so the collect-and-fold row is
    model state, and the only corpus-sized work is the map-side-
    combinable daily count."""
    daily = (
        load(spark, d, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    s = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            lambda r: r.c,
        ).alias("vals")
    ).where(F.size("vals") >= HW_PERIOD + 1)
    l0 = sum(
        (F.element_at(F.col("vals"), i) for i in range(2, HW_PERIOD + 1)),
        F.element_at(F.col("vals"), 1),
    ) / float(HW_PERIOD)
    init = s.select(
        "vals", F.size("vals").alias("n"), l0.alias("l0")
    )
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA

    def step(acc, x):
        lvl = F.lit(a) * (x - F.element_at(acc, 3)) + F.lit(1 - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        return F.array(
            lvl,
            F.lit(b) * (lvl - F.element_at(acc, 1))
            + F.lit(1 - b) * F.element_at(acc, 2),
            F.element_at(acc, 4),
            F.element_at(acc, 5),
            F.element_at(acc, 6),
            F.element_at(acc, 7),
            F.element_at(acc, 8),
            F.element_at(acc, 9),
            F.lit(g) * (x - lvl) + F.lit(1 - g) * F.element_at(acc, 3),
        )

    acc0 = F.array(
        F.col("l0"),
        F.lit(0.0),
        *[
            F.element_at(F.col("vals"), i) - F.col("l0")
            for i in range(1, HW_PERIOD + 1)
        ],
    )
    fold = F.aggregate(
        F.slice(
            F.col("vals"),
            HW_PERIOD + 1,
            F.greatest(F.size("vals") - HW_PERIOD, F.lit(0)),
        ),
        acc0,
        step,
    )
    folded = init.select("n", fold.alias("st"))
    return folded.select(
        F.explode(F.sequence(F.lit(1), F.lit(HW_PERIOD))).alias("h"),
        "n",
        "st",
    ).select(
        F.col("h").cast("long").alias("horizon_d"),
        F.col("n").cast("long").alias("n_days"),
        F.round(F.element_at(F.col("st"), 1), 6).alias("level"),
        F.round(F.element_at(F.col("st"), 2), 6).alias("trend"),
        F.round(
            F.element_at(F.col("st"), F.col("h") + 2), 6
        ).alias("seasonal"),
        F.round(
            F.element_at(F.col("st"), 1)
            + F.col("h") * F.element_at(F.col("st"), 2)
            + F.element_at(F.col("st"), F.col("h") + 2),
            6,
        ).alias("forecast"),
    )


# --- cohort lifetime-value curves --------------------------------------


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH first_o AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
               AS cohort_month
      FROM orders GROUP BY o_custkey
    ), rev AS (
      SELECT f.cohort_month,
             (EXTRACT(YEAR FROM o.o_orderdate)
              - EXTRACT(YEAR FROM f.cohort_month)) * 12
             + (EXTRACT(MONTH FROM o.o_orderdate)
                - EXTRACT(MONTH FROM f.cohort_month)) AS month_offset,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS m_rev,
             COUNT(DISTINCT o.o_custkey) AS m_buyers
      FROM orders o JOIN first_o f USING (o_custkey)
      GROUP BY 1, 2
    ), sized AS (
      SELECT cohort_month, COUNT(*) AS cohort_users
      FROM first_o GROUP BY 1
    )
    SELECT r.cohort_month,
           CAST(r.month_offset AS BIGINT) AS month_offset,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(r.m_buyers AS BIGINT) AS active_buyers,
           CAST(SUM(r.m_rev) OVER (PARTITION BY r.cohort_month
                                   ORDER BY r.month_offset
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue,
           ROUND(CAST(SUM(r.m_rev) OVER (PARTITION BY r.cohort_month
                                         ORDER BY r.month_offset
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW)
                      AS DOUBLE) / s.cohort_users, 6) AS ltv_per_user
    FROM rev r JOIN sized s USING (cohort_month)
    """,
)
def orders_cohort_ltv(spark: SparkSession, d: str) -> DataFrame:
    """COHORT LIFETIME-VALUE curves — the finance-grade companion to
    ``retention_cohorts``: customers grouped by first-order month,
    revenue accumulated by month offset, normalized per cohort user —
    the curve whose plateau IS the LTV input to CAC math, and the
    cohort-vs-cohort comparison that tells you whether newer vintages
    monetize faster. Revenue rides DECIMAL end-to-end (exact,
    order-independent) and converts to double once per output row via
    the running window over the tiny (cohort × offset) grid.

    Scale: one customer-grain first-order pass, one fact pass keyed
    (cohort, offset) with map-side combine; the cumulative window
    partitions by cohort over ≤ months rows — model-state."""
    o = load(spark, d, "orders")
    first_o = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate"))
        .cast("date")
        .alias("cohort_month")
    )
    rev = (
        o.join(first_o, "o_custkey")
        .groupBy(
            "cohort_month",
            (
                (F.year("o_orderdate") - F.year("cohort_month")) * 12
                + (F.month("o_orderdate") - F.month("cohort_month"))
            ).alias("month_offset"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "m_rev"
            ),
            F.count_distinct("o_custkey").alias("m_buyers"),
        )
    )
    sized = first_o.groupBy("cohort_month").agg(
        F.count("*").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = rev.join(F.broadcast(sized), "cohort_month")
    cum = F.sum("m_rev").over(w).cast("double")
    return j.select(
        "cohort_month",
        F.col("month_offset").cast("long").alias("month_offset"),
        F.col("cohort_users").cast("long").alias("cohort_users"),
        F.col("m_buyers").cast("long").alias("active_buyers"),
        cum.alias("cum_revenue"),
        F.round(cum / F.col("cohort_users"), 6).alias("ltv_per_user"),
    )


# --- open-order backlog aging ------------------------------------------

AGING_BUCKETS_D = (30, 60, 90)  # aging fences in days


@register(
    "orders_backlog_aging",
    oracle=f"""
    WITH hw AS (SELECT MAX(o_orderdate) AS d0 FROM orders),
    open_o AS (
      SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
             date_diff('day', o.o_orderdate, a.d0) AS age_d
      FROM orders o CROSS JOIN hw a
      WHERE o.o_orderstatus <> 'F'
    ), bucketed AS (
      SELECT o_orderpriority,
             CASE WHEN age_d < {AGING_BUCKETS_D[0]} THEN '0-29d'
                  WHEN age_d < {AGING_BUCKETS_D[1]} THEN '30-59d'
                  WHEN age_d < {AGING_BUCKETS_D[2]} THEN '60-89d'
                  ELSE '90d+' END AS age_bucket,
             o_totalprice
      FROM open_o
    )
    SELECT o_orderpriority, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS backlog_value
    FROM bucketed GROUP BY 1, 2
    """,
)
def orders_backlog_aging(spark: SparkSession, d: str) -> DataFrame:
    """OPEN-ORDER BACKLOG AGING — the operations WIP report: every
    not-yet-finalized order (status ≠ 'F') bucketed by age at the
    corpus high-water date (0-29 / 30-59 / 60-89 / 90+ days), with
    counts and DECIMAL-exact backlog value per priority class. The
    90d+ bucket per priority is the escalation queue; its value is
    the revenue-at-risk number. Deterministic replay anchors at
    MAX(o_orderdate); production swaps in the run date.

    Scale: one fact pass with a broadcast 1-row anchor; integer day
    arithmetic; group keys are (priority × 4 buckets) — fully
    map-side combinable."""
    o = load(spark, d, "orders")
    asof = o.agg(F.max("o_orderdate").alias("d0"))
    open_o = o.where(F.col("o_orderstatus") != "F").crossJoin(
        F.broadcast(asof)
    )
    age = F.datediff(F.col("d0"), F.col("o_orderdate"))
    b0, b1, b2 = AGING_BUCKETS_D
    bucket = (
        F.when(age < b0, "0-29d")
        .when(age < b1, "30-59d")
        .when(age < b2, "60-89d")
        .otherwise("90d+")
    )
    return open_o.groupBy(
        "o_orderpriority", bucket.alias("age_bucket")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("backlog_value"),
    )


# --- time-constrained funnel -------------------------------------------

FUNNEL_STEP1_WINDOW_H = 1    # click within 1 h of first view
FUNNEL_STEP2_WINDOW_H = 24   # purchase within 24 h of that click


@register(
    "funnel_time_constrained",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts >= v.vt
        AND e.ts <= v.vt + INTERVAL {FUNNEL_STEP1_WINDOW_H} HOUR
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= c.ct
        AND e.ts <= c.ct + INTERVAL {FUNNEL_STEP2_WINDOW_H} HOUR
      GROUP BY 1
    )
    SELECT * FROM (
      SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_no,
             CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 'click_1h', 2, COUNT(*) FROM c
      UNION ALL
      SELECT 'purchase_24h', 3, COUNT(*) FROM p
    )
    """,
)
def funnel_time_constrained(spark: SparkSession, d: str) -> DataFrame:
    """TIME-CONSTRAINED ordered funnel — the production variant of
    ``funnel_conversion``: a step only counts within its window
    (click ≤ {FUNNEL_STEP1_WINDOW_H} h after the first view, purchase
    ≤ {FUNNEL_STEP2_WINDOW_H} h after that click). Unbounded funnels
    credit conversions weeks later to the original touch, inflating
    every step-through rate; windowed funnels are what growth teams
    actually report. Timestamp comparisons only — no floats.

    Scale: three user-keyed min-aggregations, each consuming the
    previous step's (user, ts) table as a broadcast-able join — the
    fact table is scanned per step but never self-joined row×row."""
    ev = load(spark, d, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") >= F.col("vt"))
            & (
                F.col("ts")
                <= F.col("vt")
                + F.expr(f"INTERVAL {FUNNEL_STEP1_WINDOW_H} HOURS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") >= F.col("ct"))
            & (
                F.col("ts")
                <= F.col("ct")
                + F.expr(f"INTERVAL {FUNNEL_STEP2_WINDOW_H} HOURS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def census(df, step, no):
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(no).cast("long").alias("step_no"),
            F.count("*").cast("long").alias("n_users"),
        )

    return (
        census(v, "view", 1)
        .unionByName(census(c, "click_1h", 2))
        .unionByName(census(p, "purchase_24h", 3))
    )


# --- ABC / XYZ inventory segmentation ----------------------------------

ABC_A, ABC_B = 0.5, 0.8        # cumulative revenue-share fences
XYZ_X, XYZ_Y = 0.5, 1.0        # coefficient-of-variation fences


@register(
    "orders_abc_xyz",
    oracle=f"""
    WITH part_rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
             SUM(rev) OVER () AS tot
      FROM part_rev
    ), abc AS (
      SELECT l_partkey, rev,
             CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                       <= {ABC_A} THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                       <= {ABC_B} THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    ), monthly AS (
      SELECT l.l_partkey,
             date_trunc('month', o.o_orderdate) AS m,
             SUM(CAST(l.l_quantity AS BIGINT)) AS q
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ), xyz AS (
      SELECT l_partkey,
             COUNT(*) AS n,
             CAST(SUM(q) AS DOUBLE) AS sx,
             CAST(SUM(q * q) AS DOUBLE) AS sxx
      FROM monthly GROUP BY l_partkey
    ), xyz_cls AS (
      SELECT l_partkey,
             CASE WHEN n < 2 OR sx = 0 THEN 'Z'
                  WHEN sqrt((n * sxx - sx * sx)
                            / (CAST(n AS DOUBLE) * (n - 1)))
                       / (sx / n) <= {XYZ_X} THEN 'X'
                  WHEN sqrt((n * sxx - sx * sx)
                            / (CAST(n AS DOUBLE) * (n - 1)))
                       / (sx / n) <= {XYZ_Y} THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM xyz
    )
    SELECT a.abc_class, x.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(a.rev) AS DOUBLE) AS revenue
    FROM abc a JOIN xyz_cls x USING (l_partkey)
    GROUP BY 1, 2
    """,
)
def orders_abc_xyz(spark: SparkSession, d: str) -> DataFrame:
    """ABC/XYZ inventory segmentation — the planner's 3×3 grid:
    revenue importance (A = top {ABC_A:.0%} of cumulative revenue,
    B = next, C = tail — ``pareto_abc``'s fences) CROSSED with demand
    variability (X = monthly-quantity CV ≤ {XYZ_X}, Y ≤ {XYZ_Y},
    Z = erratic or thin history). AX cells get automated reorder
    policies; CZ cells get manual review — the matrix IS the policy
    map, and this op computes it end-to-end from facts.

    Exactness: revenues ride DECIMAL; the cumulative share uses a
    deterministic (rev DESC, partkey) order; CV comes from exact
    integer quantity moments with one closed form in double (the
    agg_corr/sqrt discipline); thin histories (n < 2) and zero-demand
    parts class as Z, identically in both engines.

    Scale: two part-keyed fact rollups (map-side combinable), a
    running sum over the PART-grain table (range-shuffled at real
    scale; the part dimension is 1e-4 of lineitem), and a part-keyed
    class join — no fact-table window anywhere."""
    li = load(spark, d, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    wcum = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = part_rev.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )
    share = F.col("cum").cast("double") / F.col("tot").cast("double")
    abc = ranked.select(
        "l_partkey",
        "rev",
        F.when(share <= ABC_A, "A")
        .when(share <= ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    o = load(spark, d, "orders").select("o_orderkey", "o_orderdate")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_partkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    xyz = monthly.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("q").cast("double").alias("sx"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    cv = F.sqrt(
        (n * sxx - sx * sx) / (n.cast("double") * (n - 1))
    ) / (sx / n)
    xyz_cls = xyz.select(
        "l_partkey",
        F.when((n < 2) | (sx == 0), "Z")
        .when(cv <= XYZ_X, "X")
        .when(cv <= XYZ_Y, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz_cls, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


# --- supplier scorecard --------------------------------------------------


@register(
    "supplier_scorecard",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           ROUND(CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS return_rate,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate))
                      AS DOUBLE) / COUNT(*), 6) AS avg_ship_days,
           CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS worst_ship_days
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
)
def supplier_scorecard(spark: SparkSession, d: str) -> DataFrame:
    """SUPPLIER SCORECARD — the procurement-review rollup: per
    supplier, net revenue (DECIMAL-exact), return rate (share of 'R'
    lines — the quality signal), part breadth, and order→ship latency
    (mean and worst case — the reliability signal). One row per
    supplier is what the quarterly business review sorts by; the
    columns are the negotiation agenda.

    Exactness: revenue rides DECIMAL; rates and means divide exact
    integer counts/day-sums once; day gaps are integer datediffs.

    Scale: lineitem joins supplier/nation broadcast and orders on the
    order key (the fact-to-fact join AQE plans shuffle-local when both
    are bucketed by orderkey); one supplier-keyed aggregate with
    map-side combine."""
    li = load(spark, d, "lineitem")
    s = load(spark, d, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, d, "nation").select("n_nationkey", "n_name")
    o = load(spark, d, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    ship_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation")).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
        F.round(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("return_rate"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
        F.round(
            F.sum(ship_days).cast("double") / F.count("*"), 6
        ).alias("avg_ship_days"),
        F.max(ship_days).cast("long").alias("worst_ship_days"),
    )


# --- Poisson rate confidence intervals ----------------------------------

POISSON_Z = 1.959963984540054  # 97.5th normal quantile, shared literal


@register(
    "events_poisson_rate_ci",
    oracle=f"""
    WITH span AS (
      SELECT CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) + 1 AS BIGINT) AS days
      FROM events
    ), c AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT c.event_type,
           CAST(c.n AS BIGINT) AS n_events,
           CAST(s.days AS BIGINT) AS span_days,
           ROUND(CAST(c.n AS DOUBLE) / s.days, 6) AS rate_per_day,
           ROUND((c.n - {POISSON_Z} * sqrt(CAST(c.n AS DOUBLE)))
                 / s.days, 6) AS rate_lo,
           ROUND((c.n + {POISSON_Z} * sqrt(CAST(c.n AS DOUBLE)))
                 / s.days, 6) AS rate_hi
    FROM c CROSS JOIN span s
    """,
)
def events_poisson_rate_ci(spark: SparkSession, d: str) -> DataFrame:
    """POISSON RATE with 95% CI per event type — the ops-monitoring
    primitive behind "is this event stream's rate abnormal": events
    per day over the corpus span, with the normal-approximation
    interval (n ± z·√n)/days that a volume-drop alert compares
    yesterday's count against. The z constant is a shared literal and
    sqrt is IEEE-portable (agg_corr discipline), so both engines emit
    identical bounds.

    Scale: one map-side-combinable type census + a broadcast 1-row
    span; nothing else."""
    ev = load(spark, d, "events")
    span = ev.agg(
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("long")
        .alias("days")
    )
    c = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    j = c.crossJoin(F.broadcast(span))
    n = F.col("n").cast("double")
    days = F.col("days")
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("days").cast("long").alias("span_days"),
        F.round(n / days, 6).alias("rate_per_day"),
        F.round((n - POISSON_Z * F.sqrt(n)) / days, 6).alias("rate_lo"),
        F.round((n + POISSON_Z * F.sqrt(n)) / days, 6).alias("rate_hi"),
    )


@register(
    "events_roc_auc",
    oracle="""
    WITH u AS (
      SELECT user_id,
             user_id % 8 AS cohort,
             SUM(CASE WHEN event_type <> 'purchase'
                      THEN CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS score_micros,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
      FROM events GROUP BY user_id
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cohort
                                   ORDER BY score_micros, user_id) AS rn
      FROM u
    ), mr AS (
      SELECT *, AVG(rn) OVER (PARTITION BY cohort, score_micros) AS midrank
      FROM r
    )
    SELECT CAST(cohort AS BIGINT) AS cohort,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg,
           CASE WHEN SUM(label) = 0 OR SUM(label) = COUNT(*) THEN NULL
                ELSE ROUND((SUM(CASE WHEN label = 1 THEN midrank ELSE 0 END)
                            - SUM(label) * (SUM(label) + 1) / 2.0)
                           / (SUM(label) * (COUNT(*) - SUM(label))), 6)
           END AS auc
    FROM mr GROUP BY cohort
    """,
)
def events_roc_auc(spark: SparkSession, d: str) -> DataFrame:
    """Distributed ROC-AUC per cohort via the rank-sum identity
    (AUC = (Σ midranks of positives − n⁺(n⁺+1)/2) / (n⁺·n⁻), the
    Mann-Whitney U normalization) — the standard offline-eval metric
    for any churn/propensity model, computed WITHOUT materializing the
    curve. Label: user ever purchased; score: the user's non-purchase
    engagement value. Ties take proper MIDRANKS (average rank over the
    tied score), so the result equals the trapezoidal ROC integral
    exactly.

    Exactness: the score is an integer-micros SUM (order-independent),
    ranks are integers, midranks are k/2 multiples — every engine-side
    double is exact far below 2^53, and the one closing division is a
    single IEEE op, rounded at 1e-6.

    Scale: ranking windows are PARTITIONED BY COHORT (the eval grain),
    never global — each cohort's sort is a keyed range-shuffle. With
    billions of rows per cohort, swap the in-cohort window for the
    ``_global_ntile`` offset recipe (same file) or a score-bucketed
    histogram AUC; the rank-sum identity itself is unchanged."""
    ev = load(spark, d, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") != "purchase",
                F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("score_micros"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    ).withColumn("cohort", F.col("user_id") % 8)
    w_rn = Window.partitionBy("cohort").orderBy("score_micros", "user_id")
    w_mid = Window.partitionBy("cohort", "score_micros")
    mr = u.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "midrank", F.avg("rn").over(w_mid)
    )
    npos = F.sum("label")
    nneg = F.count("*") - npos
    ranksum = F.sum(F.when(F.col("label") == 1, F.col("midrank")).otherwise(0.0))
    auc = F.when(
        (npos == 0) | (nneg == 0), F.lit(None).cast("double")
    ).otherwise(
        F.round((ranksum - npos * (npos + 1) / 2.0) / (npos * nneg), 6)
    )
    return mr.groupBy(F.col("cohort").cast("long").alias("cohort")).agg(
        npos.cast("long").alias("n_pos"),
        nneg.cast("long").alias("n_neg"),
        auc.alias("auc"),
    )


@register(
    "events_calibration_bins",
    oracle="""
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
      FROM events GROUP BY user_id
    ), p AS (
      SELECT user_id, label,
             CAST(FLOOR(1000000.0 * clicks / (clicks + views)) AS BIGINT)
               AS p_micros
      FROM u WHERE clicks + views > 0
    )
    SELECT CAST(LEAST(9, p_micros // 100000) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(SUM(p_micros) / COUNT(*) / 1000000.0, 6) AS avg_predicted,
           ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS frac_positive,
           ROUND(ABS(SUM(p_micros) / COUNT(*) / 1000000.0
                     - CAST(SUM(label) AS DOUBLE) / COUNT(*)), 6)
             AS abs_gap
    FROM p GROUP BY 1
    """,
)
def events_calibration_bins(spark: SparkSession, d: str) -> DataFrame:
    """CALIBRATION / reliability-diagram bins — the companion eval to
    ``events_roc_auc``: bucket a predicted probability (here the
    user's click share, clicks/(clicks+views)) into ten fixed-width
    bins and compare mean prediction vs realized positive rate per
    bin; the per-bin |gap| column is the ECE contribution before
    weighting. A model can have high AUC and still be badly
    calibrated — production eval needs both.

    Exactness: the prediction is floor-quantized to integer micros at
    the USER level, so every aggregate is an integer sum; the two
    closing divisions are single IEEE ops rounded at 1e-6.

    Scale: one user-keyed grouped pass, then a 10-group aggregate —
    map-side combinable end to end."""
    ev = load(spark, d, "events")
    u = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").alias("clicks"),
        F.count_if(F.col("event_type") == "view").alias("views"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    p = u.where(F.col("clicks") + F.col("views") > 0).select(
        "label",
        F.floor(
            1000000.0 * F.col("clicks") / (F.col("clicks") + F.col("views"))
        )
        .cast("long")
        .alias("p_micros"),
    )
    avg_pred = F.sum("p_micros") / F.count("*") / 1000000.0
    frac_pos = F.sum("label").cast("double") / F.count("*")
    return p.groupBy(
        F.least(F.lit(9), F.floor(F.col("p_micros") / 100000))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(avg_pred, 6).alias("avg_predicted"),
        F.round(frac_pos, 6).alias("frac_positive"),
        F.round(F.abs(avg_pred - frac_pos), 6).alias("abs_gap"),
    )


@register(
    "events_entropy_rate",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), t AS (
      SELECT event_type AS src, nxt AS dst, COUNT(*) AS n_ij
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), m AS (
      SELECT src, SUM(n_ij) AS n_i FROM t GROUP BY src
    ), tot AS (
      SELECT SUM(n_ij) AS n FROM t
    )
    SELECT t.src AS state,
           CAST(MAX(m.n_i) AS BIGINT) AS n_out,
           ROUND(MAX(m.n_i) / MAX(tot.n), 6) AS pi,
           CAST(SUM(CAST(FLOOR(CAST(t.n_ij AS DOUBLE) / m.n_i
                                * log2(CAST(m.n_i AS DOUBLE) / t.n_ij)
                                * 1000000.0) AS BIGINT)) AS BIGINT)
             AS h_cond_micros
    FROM t JOIN m USING (src) CROSS JOIN tot
    GROUP BY t.src
    """,
)
def events_entropy_rate(spark: SparkSession, d: str) -> DataFrame:
    """MARKOV ENTROPY RATE decomposition of the event stream — per
    source state: the empirical occupancy π_i and the conditional
    next-step entropy H(X_{t+1}|X_t = i) = Σ_j p_ij·log2(1/p_ij) in
    micro-bits; Σ_i π_i·H_i is the chain's entropy rate, the
    standard predictability measure for behavioral sequences (a bot
    replaying one loop scores ≈ 0; organic browsing is high). Builds
    on the same transition table as ``events_markov_stationary`` but
    answers the information-theoretic question instead of the
    steady-state one.

    Exactness: every -p·log2(p) term floor-quantizes to integer
    MICROS before its sum (the ``features_behavior_entropy``
    discipline — log2 is not bit-portable in the last ulp); π is one
    IEEE division rounded at 1e-6.

    Scale: the lead() window is keyed per user (bounded per-user
    history), the transition census is |types|² rows — model-state
    scale — and everything after is broadcast arithmetic."""
    ev = load(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    t = s.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").alias("n_ij"))
    m = t.groupBy(F.col("src").alias("msrc")).agg(F.sum("n_ij").alias("n_i"))
    tot = t.agg(F.sum("n_ij").alias("n"))
    term = F.floor(
        F.col("n_ij").cast("double")
        / F.col("n_i")
        * F.log2(F.col("n_i").cast("double") / F.col("n_ij"))
        * F.lit(1000000.0)
    ).cast("long")
    return (
        t.join(m, F.col("src") == F.col("msrc"))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("src").alias("state"))
        .agg(
            F.max("n_i").cast("long").alias("n_out"),
            F.round(F.max("n_i") / F.max("n"), 6).alias("pi"),
            F.sum(term).cast("long").alias("h_cond_micros"),
        )
    )


@register(
    "events_lorenz_deciles",
    oracle="""
    WITH u AS (
      SELECT user_id,
             SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS v_micros
      FROM events GROUP BY user_id
    ), t AS (
      SELECT *, NTILE(10) OVER (ORDER BY v_micros, user_id) AS dec
      FROM u
    ), g AS (
      SELECT dec, COUNT(*) AS n_users, SUM(v_micros) AS v
      FROM t GROUP BY dec
    ), tot AS (SELECT SUM(v) AS tv FROM g)
    SELECT CAST(g.dec AS BIGINT) AS decile,
           CAST(g.n_users AS BIGINT) AS n_users,
           ROUND(CAST(g.v AS DOUBLE) / tot.tv, 6) AS value_share,
           ROUND(CAST(c.cum AS DOUBLE) / tot.tv, 6) AS cum_share
    FROM g
    JOIN (SELECT a.dec, SUM(b.v) AS cum
          FROM g a JOIN g b ON b.dec <= a.dec GROUP BY a.dec) c
      ON c.dec = g.dec
    CROSS JOIN tot
    """,
)
def events_lorenz_deciles(spark: SparkSession, d: str) -> DataFrame:
    """LORENZ CURVE by user-value decile — the distributional view
    behind ``agg_gini``: rank users by total event value, cut into
    exact deciles, and report each decile's share and cumulative
    share of total value ("the top decile carries X% of revenue").
    The curve points are what a concentration dashboard plots; the
    Gini is 1−2·Σ(cum_share)/10 off the same rows.

    Exactness: per-user value is an integer-micros sum; the decile cut
    is the distributed ``_global_ntile`` (range-shuffle + literal
    offsets — NO single-partition sort), bit-identical to the oracle's
    NTILE(10) because (v_micros, user_id) is a total order; shares are
    single IEEE divisions rounded at 1e-6.

    Scale: one user-keyed aggregate, one range exchange for the
    ranking, then 10-row arithmetic (the cumulative sum is a 10×10
    broadcast triangle join, not a window — nothing single-partition
    anywhere)."""
    ev = load(spark, d, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long"))
        .alias("v_micros")
    )
    tiled = _global_ntile(
        u, 10, [F.col("v_micros"), F.col("user_id")], key="user_id"
    )
    g = (
        u.join(tiled, "user_id")
        .groupBy(F.col("_ntile").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("v_micros").alias("v"),
        )
    )
    tot = g.agg(F.sum("v").alias("tv"))
    cum = (
        g.alias("a")
        .join(F.broadcast(g.alias("b")), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("cdec"))
        .agg(F.sum("b.v").alias("cum"))
    )
    return (
        g.join(F.broadcast(cum), F.col("decile") == F.col("cdec"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_users",
            F.round(F.col("v").cast("double") / F.col("tv"), 6).alias(
                "value_share"
            ),
            F.round(F.col("cum").cast("double") / F.col("tv"), 6).alias(
                "cum_share"
            ),
        )
    )


@register(
    "ab_ucb_allocation",
    oracle="""
    WITH a AS (
      SELECT event_type AS arm, COUNT(*) AS n,
             SUM(CAST(FLOOR(LEAST(GREATEST(value, 0.0), 100.0) * 10000.0
                            + 0.5) AS BIGINT)) AS r_micros
      FROM events GROUP BY event_type
    ), tot AS (
      SELECT SUM(n) AS big_n,
             CAST(FLOOR(LN(CAST(SUM(n) AS DOUBLE)) * 1000000000.0)
               AS BIGINT) AS ln_nanos
      FROM a
    ), s AS (
      SELECT arm, n, r_micros,
             CAST(r_micros AS DOUBLE) / n / 1000000.0 AS mean_r,
             CAST(FLOOR(SQRT(2.0 * (ln_nanos / 1000000000.0) / n)
                        * 1000000.0) AS BIGINT) AS bonus_micros
      FROM a CROSS JOIN tot
    ), best AS (
      SELECT MAX(CAST(FLOOR(mean_r * 1000000.0) AS BIGINT) + bonus_micros)
               AS best_u
      FROM s
    )
    SELECT s.arm, CAST(s.n AS BIGINT) AS n_plays,
           ROUND(s.mean_r, 6) AS mean_reward,
           ROUND(s.bonus_micros / 1000000.0, 6) AS bonus,
           ROUND((CAST(FLOOR(s.mean_r * 1000000.0) AS BIGINT)
                  + s.bonus_micros) / 1000000.0, 6) AS ucb,
           CAST(FLOOR(s.mean_r * 1000000.0) AS BIGINT) + s.bonus_micros
             = best.best_u AS is_chosen
    FROM s CROSS JOIN best
    """,
)
def ab_ucb_allocation(spark: SparkSession, d: str) -> DataFrame:
    """UCB1 bandit allocation over the event arms — mean reward plus
    the √(2·ln N / nᵢ) exploration bonus per arm, flagging the arm a
    UCB1 policy plays next. The deterministic counterpart to Thompson
    sampling (which needs RNG and can't be oracle-paired): this is the
    standard batch re-allocation step an experimentation platform runs
    nightly on logged data.

    Exactness: rewards clamp to [0,100] and floor-quantize to 1e-4
    grains BEFORE the sum (integer arithmetic); ln N (the one
    non-bit-portable transcendental) floor-quantizes to integer nanos
    and both engines feed the SAME quantized value through the
    IEEE-portable sqrt; the argmax compares integer micro-UCBs, so
    the winner flag can't flip on a last-ulp tie.

    Scale: one map-side-combinable census to |arms| rows, then
    broadcast scalar arithmetic — corpus-size-independent after the
    first exchange."""
    ev = load(spark, d, "events")
    a = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(
                F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(100.0))
                * 10000.0
                + F.lit(0.5)
            ).cast("long")
        ).alias("r_micros"),
    )
    tot = a.agg(
        F.sum("n").alias("big_n"),
        F.floor(F.log(F.sum("n").cast("double")) * 1000000000.0)
        .cast("long")
        .alias("ln_nanos"),
    )
    s = a.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n",
        (F.col("r_micros").cast("double") / F.col("n") / 1000000.0).alias(
            "mean_r"
        ),
        F.floor(
            F.sqrt(2.0 * (F.col("ln_nanos") / 1000000000.0) / F.col("n"))
            * 1000000.0
        )
        .cast("long")
        .alias("bonus_micros"),
    )
    u_micros = F.floor(F.col("mean_r") * 1000000.0).cast("long") + F.col(
        "bonus_micros"
    )
    s = s.withColumn("u_micros", u_micros)
    best = s.agg(F.max("u_micros").alias("best_u"))
    return s.crossJoin(F.broadcast(best)).select(
        "arm",
        F.col("n").cast("long").alias("n_plays"),
        F.round(F.col("mean_r"), 6).alias("mean_reward"),
        F.round(F.col("bonus_micros") / 1000000.0, 6).alias("bonus"),
        F.round(F.col("u_micros") / 1000000.0, 6).alias("ucb"),
        (F.col("u_micros") == F.col("best_u")).alias("is_chosen"),
    )


@register(
    "events_gap_distribution",
    oracle="""
    WITH s AS (
      SELECT event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), g AS (
      SELECT event_type,
             date_diff('second', prev_ts, ts) AS gap_s
      FROM s WHERE prev_ts IS NOT NULL
    ), b AS (
      SELECT event_type,
             CASE WHEN gap_s < 60 THEN 'lt_1m'
                  WHEN gap_s < 3600 THEN 'lt_1h'
                  WHEN gap_s < 86400 THEN 'lt_1d'
                  ELSE 'ge_1d' END AS bucket
      FROM g
    ), c AS (
      SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
    ), t AS (
      SELECT event_type, SUM(n) AS tn FROM c GROUP BY event_type
    )
    SELECT c.event_type, c.bucket, CAST(c.n AS BIGINT) AS n_gaps,
           ROUND(CAST(c.n AS DOUBLE) / t.tn, 6) AS pct
    FROM c JOIN t USING (event_type)
    """,
)
def events_gap_distribution(spark: SparkSession, d: str) -> DataFrame:
    """INTER-ARRIVAL GAP histogram per event type — the distribution
    of the wait between a user's consecutive events of the same type,
    bucketed at the minute/hour/day breakpoints. The shape is the
    standard input to retention cadence analysis and to choosing the
    ``sessionize`` timeout (the knee between lt_1h and lt_1d mass),
    and a spike at tiny gaps is the ``events_rate_limit`` signal in
    distribution form.

    Exactness: gaps are integer epoch-second differences; the one
    division per output row is a single IEEE op rounded at 1e-6.

    Scale: the lag window is keyed (user, type) — bounded per-user
    history per partition — and the two census aggregates after it
    are |types|×4 rows."""
    ev = load(spark, d, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    b = s.select(
        "event_type",
        F.when(F.col("gap_s") < 60, "lt_1m")
        .when(F.col("gap_s") < 3600, "lt_1h")
        .when(F.col("gap_s") < 86400, "lt_1d")
        .otherwise("ge_1d")
        .alias("bucket"),
    )
    c = b.groupBy("event_type", "bucket").agg(F.count("*").alias("n"))
    t = c.groupBy(F.col("event_type").alias("te")).agg(F.sum("n").alias("tn"))
    return (
        c.join(F.broadcast(t), F.col("event_type") == F.col("te"))
        .select(
            "event_type",
            "bucket",
            F.col("n").cast("long").alias("n_gaps"),
            F.round(F.col("n").cast("double") / F.col("tn"), 6).alias("pct"),
        )
    )


@register(
    "dq_functional_dependency",
    oracle="""
    WITH fd1 AS (
      SELECT 'p_brand->p_type' AS fd, p_brand AS lhs,
             COUNT(DISTINCT p_type) AS n_rhs, COUNT(*) AS n_rows
      FROM part GROUP BY p_brand
    ), fd2 AS (
      SELECT 'p_type->p_size' AS fd, p_type AS lhs,
             COUNT(DISTINCT p_size) AS n_rhs, COUNT(*) AS n_rows
      FROM part GROUP BY p_type
    ), u AS (
      SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_lhs,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs,
           ROUND(SUM(CASE WHEN n_rhs > 1 THEN n_rows ELSE 0 END)
                 / CAST(SUM(n_rows) AS DOUBLE), 6) AS row_violation_share
    FROM u GROUP BY fd
    """,
)
def dq_functional_dependency(spark: SparkSession, d: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY audit — does X → Y actually hold in the
    data? For each candidate FD, count the left-hand-side values that
    map to MORE than one right-hand-side value and the share of rows
    living under a violating key. The de-facto schema-discovery /
    data-contract check (a column pair believed 1:1 silently drifting
    to 1:N is a classic silent-join-fanout bug upstream of every
    dimension merge); here auditing p_brand→p_type (expected broken —
    brands span types) and p_type→p_size (expected broken too) so the
    violation math is exercised, with the clean-FD zero row shape
    covered by the test fixtures.

    Exactness: all counts are integers; the one share division is a
    single IEEE op rounded at 1e-6.

    Scale: one grouped pass per FD keyed by its LHS (map-side
    combinable count-distinct per key), then a |distinct LHS|-row
    rollup — no joins, no windows; audit any number of FDs in one
    pass each."""
    part = load(spark, d, "part")

    def fd(name: str, lhs: str, rhs: str) -> DataFrame:
        return part.groupBy(F.col(lhs).alias("lhs")).agg(
            F.countDistinct(rhs).alias("n_rhs"),
            F.count("*").alias("n_rows"),
        ).select(F.lit(name).alias("fd"), "lhs", "n_rhs", "n_rows")

    u = fd("p_brand->p_type", "p_brand", "p_type").unionAll(
        fd("p_type->p_size", "p_type", "p_size")
    )
    return u.groupBy("fd").agg(
        F.count("*").cast("long").alias("n_lhs"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_lhs"),
        F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
        F.round(
            F.sum(F.when(F.col("n_rhs") > 1, F.col("n_rows")).otherwise(0))
            / F.sum("n_rows").cast("double"),
            6,
        ).alias("row_violation_share"),
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS grp
      FROM customer GROUP BY 1, 2
    ), tot AS (SELECT SUM(grp) AS n FROM g)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN grp < k THEN grp ELSE 0 END) AS BIGINT)
             AS rows_below_k,
           ROUND(SUM(CASE WHEN grp < k THEN grp ELSE 0 END)
                 / CAST(MAX(tot.n) AS DOUBLE), 6) AS share_below_k
    FROM g CROSS JOIN tot CROSS JOIN (VALUES (2), (5), (10)) AS t(k)
    GROUP BY k
    """,
)
def k_anonymity_audit(spark: SparkSession, d: str) -> DataFrame:
    """K-ANONYMITY audit over quasi-identifiers — the privacy gate a
    training-data pipeline runs before releasing derived tables: an
    equivalence class is the set of rows sharing the quasi-identifier
    tuple (here nation × market segment), and any class smaller than
    k re-identifies its members. Reports, for the standard k ladder
    (2/5/10), how many rows live in classes below k — the rows that
    need suppression or generalization before release. Complements
    ``text_pii_scrub`` (direct identifiers) with the LINKAGE-risk
    half of the privacy review.

    Exactness: class sizes and sums are integers; one division per
    output row, rounded at 1e-6.

    Scale: one grouped census keyed by the quasi-identifier tuple,
    then a 3-row broadcast ladder over the |classes|-row rollup —
    corpus-size-independent after the first exchange."""
    g = (
        load(spark, d, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("grp"))
    )
    tot = g.agg(F.sum("grp").alias("n"))
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    )
    below = F.sum(F.when(F.col("grp") < F.col("k"), F.col("grp")).otherwise(0))
    return (
        g.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            below.cast("long").alias("rows_below_k"),
            F.round(below / F.max("n").cast("double"), 6).alias(
                "share_below_k"
            ),
        )
    )


HILL_K = 20  # top-order statistics per type used by the Hill estimator


@register(
    "events_hill_tail_index",
    oracle=f"""
    WITH u AS (
      SELECT event_type, user_id,
             SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY v DESC, user_id) AS rn
      FROM u WHERE v > 0
    ), thr AS (
      SELECT event_type, v AS x_thr FROM r WHERE rn = {HILL_K} + 1
    ), terms AS (
      SELECT r.event_type,
             CAST(FLOOR(LN(CAST(r.v AS DOUBLE) / thr.x_thr)
                        * 1000000000.0) AS BIGINT) AS t_nanos
      FROM r JOIN thr USING (event_type) WHERE r.rn <= {HILL_K}
    )
    SELECT terms.event_type,
           CAST({HILL_K} AS BIGINT) AS k,
           CAST(MAX(thr.x_thr) AS BIGINT) AS x_threshold_micros,
           ROUND({HILL_K} / (SUM(t_nanos) / 1000000000.0), 6) AS hill_alpha
    FROM terms JOIN thr USING (event_type)
    GROUP BY terms.event_type
    """,
)
def events_hill_tail_index(spark: SparkSession, d: str) -> DataFrame:
    """HILL TAIL-INDEX estimator per event type — α̂ = k / Σ ln(x⁽ⁱ⁾/
    x⁽ᵏ⁺¹⁾) over the top-k per-user value totals: the standard
    heavy-tail diagnostic (α < 2 → infinite variance — means and
    z-scores stop being meaningful; whale users / fraud bursts live
    here). The power-law twin of ``text_zipf_fit``, on behavioral
    value rather than token frequency.

    Exactness: per-user totals are integer micros; the top-(k+1)
    order statistics use an explicit (value, user) tie-break; each
    ln ratio floor-quantizes to integer NANOS before the sum (the
    transcendental discipline), leaving one IEEE division.

    Scale: one user-keyed aggregate, then a per-type top-(k+1) —
    a window over |users-per-type| here, a per-type TakeOrdered
    (bounded heap, no global sort) when users stop fitting one
    partition's sort."""
    ev = load(spark, d, "events")
    u = (
        ev.groupBy("event_type", "user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long")
            ).alias("v")
        )
        .where(F.col("v") > 0)
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("v"), F.asc("user_id"))
    r = u.withColumn("rn", F.row_number().over(w))
    thr = r.where(F.col("rn") == HILL_K + 1).select(
        F.col("event_type").alias("te"), F.col("v").alias("x_thr")
    )
    terms = (
        r.where(F.col("rn") <= HILL_K)
        .join(F.broadcast(thr), F.col("event_type") == F.col("te"))
        .select(
            "event_type",
            "x_thr",
            F.floor(
                F.log(F.col("v").cast("double") / F.col("x_thr"))
                * 1000000000.0
            )
            .cast("long")
            .alias("t_nanos"),
        )
    )
    return terms.groupBy("event_type").agg(
        F.lit(HILL_K).cast("long").alias("k"),
        F.max("x_thr").cast("long").alias("x_threshold_micros"),
        F.round(
            F.lit(HILL_K) / (F.sum("t_nanos") / 1000000000.0), 6
        ).alias("hill_alpha"),
    )


#: fixed candidate periods and their Python-precomputed cos/sin basis
#: (micro-quantized shared literals — transcendentals never cross the
#: engine boundary, the mm_phash/DCT pattern)
import math as _math

_SPECTRUM_PERIODS = (7, 14, 30)
_SPECTRUM_BASIS = [
    (
        p,
        r,
        int(_math.floor(_math.cos(2 * _math.pi * r / p) * 1e6 + 0.5)),
        int(_math.floor(_math.sin(2 * _math.pi * r / p) * 1e6 + 0.5)),
    )
    for p in _SPECTRUM_PERIODS
    for r in range(p)
]
_SPECTRUM_BASIS_SQL = "(VALUES " + ",".join(
    f"({p}, {r}, {c}, {s})" for p, r, c, s in _SPECTRUM_BASIS
) + ")"


@register(
    "events_seasonal_spectrum",
    oracle=f"""
    WITH basis AS (
      SELECT * FROM {_SPECTRUM_BASIS_SQL} AS b(p, r, cosm, sinm)
    ), lo AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
    ), daily AS (
      SELECT date_diff('day', lo.d0, CAST(ts AS DATE)) AS t,
             COUNT(*) AS n
      FROM events, lo GROUP BY 1
    ), tot AS (
      SELECT SUM(n) AS tn, COUNT(*) AS days FROM daily
    ), c AS (
      SELECT b.p,
             SUM(CAST((daily.n * tot.days - tot.tn) * b.cosm
                      AS DECIMAL(38,0))) AS sc,
             SUM(CAST((daily.n * tot.days - tot.tn) * b.sinm
                      AS DECIMAL(38,0))) AS ss,
             MAX(tot.tn) AS tn, MAX(tot.days) AS days
      FROM daily JOIN basis b ON b.r = daily.t % b.p
      CROSS JOIN tot
      GROUP BY b.p
    )
    SELECT CAST(p AS BIGINT) AS period,
           CAST(days AS BIGINT) AS n_days,
           ROUND(SQRT(POW(CAST(sc AS DOUBLE), 2)
                      + POW(CAST(ss AS DOUBLE), 2))
                 / (CAST(tn AS DOUBLE) * days * 1000000.0), 6)
             AS amp_ratio
    FROM c
    """,
)
def events_seasonal_spectrum(spark: SparkSession, d: str) -> DataFrame:
    """SEASONALITY SPECTRUM — single-frequency DFT power of the daily
    event-count series at the candidate periods (7/14/30 days),
    reported as the seasonal amplitude relative to the mean level:
    the detector that says WHICH cadence a series actually has before
    ``events_seasonal_dow`` (assumes weekly) or ``window_holt_winters``
    (needs the period as input) run. Because cos(2πt/p) only takes p
    distinct values, the basis is a 51-row literal table joined on
    t mod p — no per-row transcendentals, no data-length-dependent
    basis.

    Exactness: counts are integers; mean-centering multiplies through
    by |days| so (n_t·days − total) stays integer; basis values are
    micro-quantized shared literals; the two spectral sums accumulate
    as DECIMAL(38,0) (exact); the closing sqrt/div are IEEE on
    identical doubles.

    Scale: one date-grain census (|days| rows — model state), a
    51-row broadcast join, and a 3-group aggregate; the fact table is
    touched once."""
    ev = load(spark, d, "events")
    lo = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(lo))
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("t")
        )
        .agg(F.count("*").alias("n"))
    )
    tot = daily.agg(F.sum("n").alias("tn"), F.count("*").alias("days"))
    basis = F.broadcast(
        spark.createDataFrame(
            _SPECTRUM_BASIS, "p long, r long, cosm long, sinm long"
        )
    )
    centered = F.col("n") * F.col("days") - F.col("tn")
    c = (
        daily.crossJoin(F.broadcast(tot))
        .join(basis, F.col("r") == F.col("t") % F.col("p"))
        .groupBy("p")
        .agg(
            F.sum((centered * F.col("cosm")).cast("decimal(38,0)")).alias(
                "sc"
            ),
            F.sum((centered * F.col("sinm")).cast("decimal(38,0)")).alias(
                "ss"
            ),
            F.max("tn").alias("tn"),
            F.max("days").alias("days"),
        )
    )
    amp = F.sqrt(
        F.pow(F.col("sc").cast("double"), 2)
        + F.pow(F.col("ss").cast("double"), 2)
    ) / (F.col("tn").cast("double") * F.col("days") * 1000000.0)
    return c.select(
        F.col("p").cast("long").alias("period"),
        F.col("days").cast("long").alias("n_days"),
        F.round(amp, 6).alias("amp_ratio"),
    )


MARKOV_ATTR_ROUNDS = 8  # truncated absorbing-chain iterations
_MARKOV_CHANNELS = ("click", "error", "signup", "view")


def _markov_attr_oracle() -> str:
    """Transition census from first-purchase-truncated journeys, then
    MARKOV_ATTR_ROUNDS unrolled value-iteration CTEs over the
    (variant, state) grid — variant = full chain or one channel
    removed — every round floor-quantized to integer micros."""
    removed_vals = ", ".join(
        [f"('full', '')"] + [f"('-{c}', '{c}')" for c in _MARKOV_CHANNELS]
    )
    sql = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), pp AS (
      SELECT user_id, MIN(rn) AS prn FROM seq
      WHERE event_type = 'purchase' GROUP BY user_id
    ), kept AS (
      SELECT s.user_id, s.event_type, s.rn
      FROM seq s LEFT JOIN pp ON pp.user_id = s.user_id
      WHERE pp.prn IS NULL OR s.rn <= pp.prn
    ), edges AS (
      SELECT 'START' AS src, event_type AS dst
      FROM kept WHERE rn = 1
      UNION ALL
      SELECT event_type AS src,
             COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY rn),
                      CASE WHEN event_type = 'purchase' THEN NULL
                           ELSE 'END' END) AS dst
      FROM kept
    ), trans AS MATERIALIZED (
      SELECT src, dst, COUNT(*) AS n_st FROM edges
      WHERE dst IS NOT NULL GROUP BY src, dst
    ), outdeg AS (
      SELECT src, SUM(n_st) AS n_s FROM trans GROUP BY src
    ), base AS (
      SELECT o.src AS state, o.n_s,
             COALESCE(CAST(FLOOR(CAST(MAX(CASE WHEN t.dst = 'purchase'
                                              THEN t.n_st END) * 1000000
                                      AS DOUBLE) / o.n_s) AS BIGINT), 0)
               AS b
      FROM outdeg o LEFT JOIN trans t
        ON t.src = o.src AND t.dst = 'purchase'
      GROUP BY o.src, o.n_s
    ), variants AS (
      SELECT * FROM (VALUES {removed_vals}) AS v(variant, removed)
    ), r0 AS MATERIALIZED (
      SELECT v.variant, v.removed, b.state, b.n_s, b.b, b.b AS r
      FROM variants v CROSS JOIN base b
    )"""
    prev = "r0"
    for k in range(1, MARKOV_ATTR_ROUNDS + 1):
        sql += f""", r{k} AS MATERIALIZED (
      SELECT p.variant, p.removed, p.state, p.n_s, p.b,
             p.b + COALESCE(SUM(
               CAST(FLOOR(CAST(t.n_st * q.r AS DOUBLE) / p.n_s)
                 AS BIGINT)), 0) AS r
      FROM {prev} p
      LEFT JOIN trans t
        ON t.src = p.state
       AND t.dst NOT IN ('purchase', 'END')
       AND t.dst <> p.removed
      LEFT JOIN {prev} q
        ON q.variant = p.variant AND q.state = t.dst
      GROUP BY p.variant, p.removed, p.state, p.n_s, p.b
    )"""
        prev = f"r{k}"
    return sql + f"""
    , starts AS (
      SELECT variant, removed, r FROM {prev} WHERE state = 'START'
    ), eff AS (
      SELECT s.removed AS channel,
             f.r AS r_full,
             1.0 - CAST(s.r AS DOUBLE) / f.r AS removal
      FROM starts s CROSS JOIN (SELECT r FROM starts
                                WHERE variant = 'full') f
      WHERE s.variant <> 'full'
    ), tot AS (SELECT SUM(removal) AS t FROM eff)
    SELECT channel,
           ROUND(r_full / 1000000.0, 6) AS p_convert,
           ROUND(removal, 6) AS removal_effect,
           ROUND(removal / tot.t, 6) AS attribution_share
    FROM eff CROSS JOIN tot
    """


@register("funnel_attribution_markov", oracle=_markov_attr_oracle())
def funnel_attribution_markov(spark: SparkSession, d: str) -> DataFrame:
    """MARKOV REMOVAL-EFFECT attribution — the data-driven member of
    the attribution family (last-touch ``funnel_attribution``,
    position ``funnel_attribution_position``, Shapley
    ``funnel_attribution_shapley``): fit a first-order chain to
    first-purchase-truncated journeys (START → channels → purchase |
    END), compute the conversion probability from START by truncated
    value iteration, then each channel's credit is its REMOVAL EFFECT
    — how much conversion drops when every edge into that channel is
    redirected to loss. The industry-standard answer to "which step
    actually CARRIES conversions" rather than "which step happened to
    be adjacent".

    Exactness: transition counts are integers; every value-iteration
    round floor-quantizes to integer micros (both engines run the
    SAME truncated recursion, so exactness never depends on
    convergence); the three closing divisions are IEEE, rounded 1e-6.

    Scale: the only corpus-sized work is the journey census (one
    user-keyed window pass + a grouped count to ≤|states|² rows);
    the chain algebra runs on the (5 variants × |states|) grid —
    model state, collected once and iterated on the driver in exact
    integer/IEEE arithmetic (bit-identical to the former in-engine
    rounds); the closing 4-row algebra stays in Spark."""
    ev = load(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    pp = (
        seq.where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("pu"))
        .agg(F.min("rn").alias("prn"))
    )
    kept = (
        seq.join(pp, seq["user_id"] == pp["pu"], "left")
        .where(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .select("user_id", "event_type", "rn")
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    starts_e = kept.where(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    follows = kept.select(
        F.col("event_type").alias("src"),
        F.coalesce(
            F.lead("event_type").over(w2),
            F.when(F.col("event_type") == "purchase", F.lit(None)).otherwise(
                F.lit("END")
            ),
        ).alias("dst"),
    )
    trans = (
        starts_e.unionAll(follows)
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_st"))
    )
    # MODEL-STATE rounds on the driver (r12, guide §1.2): the 8 value
    # iterations used to run as 8 Spark rounds of two broadcast joins
    # each over the ≤ (5 variants × |states|) grid behind per-round
    # localCheckpoint pins — ~16 tiny chained stages of pure job
    # overhead; the only corpus-sized work is the journey census
    # above. Collecting the transition census (≤ |states|² integer
    # cells — the same class as the k-means/PCA trainers' collected
    # centroids; the operator was already construction-eager,
    # lazy_audit ALLOWED) and running the rounds in Python replicates
    # every engine op bit-for-bit: counts are integers, each term is
    # floor(float(n_st·r) / n_s) with long→double casts exact under
    # 2^53 and IEEE division, and the per-round sum is an integer sum.
    # The closing 4-row algebra stays in Spark unchanged.
    import math

    tr = [(row[0], row[1], row[2]) for row in trans.collect()]
    n_s: dict = {}
    for s_, _d, n_ in tr:
        n_s[s_] = n_s.get(s_, 0) + n_
    conv = {s_: n_ for s_, d_, n_ in tr if d_ == "purchase"}
    b = {
        s_: (
            math.floor(float(conv[s_] * 1000000) / float(n_s[s_]))
            if s_ in conv
            else 0
        )
        for s_ in n_s
    }
    variants = [("full", "")] + [(f"-{c}", c) for c in _MARKOV_CHANNELS]
    hop = {}
    for s_, d_, n_ in tr:
        if d_ not in ("purchase", "END"):
            hop.setdefault(s_, []).append((d_, n_))
    rv = {(v, s_): b[s_] for v, _rm in variants for s_ in n_s}
    for _ in range(MARKOV_ATTR_ROUNDS):
        new_rv = {}
        for v, rm in variants:
            for s_ in n_s:
                acc = 0
                for d_, n_ in hop.get(s_, ()):
                    if d_ == rm:
                        continue
                    q = rv.get((v, d_))
                    if q is not None:
                        acc += math.floor(float(n_ * q) / float(n_s[s_]))
                new_rv[(v, s_)] = b[s_] + acc
        rv = new_rv
    starts = spark.createDataFrame(
        [
            (v, rm, rv[(v, "START")])
            for v, rm in variants
            if (v, "START") in rv
        ],
        "variant string, removed string, r long",
    )
    full = starts.where(F.col("variant") == "full").select(
        F.col("r").alias("r_full")
    )
    eff = (
        starts.where(F.col("variant") != "full")
        .crossJoin(F.broadcast(full))
        .select(
            F.col("removed").alias("channel"),
            "r_full",
            (1.0 - F.col("r").cast("double") / F.col("r_full")).alias(
                "removal"
            ),
        )
    )
    tot = eff.agg(F.sum("removal").alias("t"))
    return eff.crossJoin(F.broadcast(tot)).select(
        "channel",
        F.round(F.col("r_full") / 1000000.0, 6).alias("p_convert"),
        F.round(F.col("removal"), 6).alias("removal_effect"),
        F.round(F.col("removal") / F.col("t"), 6).alias("attribution_share"),
    )


@register(
    "events_sessionization_sensitivity",
    oracle="""
    WITH g AS (
      SELECT user_id,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id), ts) AS gap_s
      FROM events
    ), nu AS (
      SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      FROM events
    ), t AS (SELECT * FROM (VALUES (600), (1800), (3600)) AS v(timeout_s))
    SELECT CAST(t.timeout_s AS BIGINT) AS timeout_s,
           CAST(MAX(nu.n_users)
                + SUM(CASE WHEN g.gap_s > t.timeout_s THEN 1 ELSE 0 END)
             AS BIGINT) AS n_sessions,
           ROUND(CAST(MAX(nu.n_events) AS DOUBLE)
                 / (MAX(nu.n_users)
                    + SUM(CASE WHEN g.gap_s > t.timeout_s
                               THEN 1 ELSE 0 END)), 6)
             AS avg_events_per_session
    FROM g CROSS JOIN nu CROSS JOIN t
    GROUP BY t.timeout_s
    """,
)
def events_sessionization_sensitivity(spark: SparkSession, d: str) -> DataFrame:
    """SESSIONIZE-TIMEOUT sensitivity ladder — session count and mean
    session size at the 10/30/60-minute cutoffs, computed WITHOUT
    materializing sessions: #sessions(T) = #users + #gaps > T (every
    over-timeout gap starts one new session). This is the tuning
    answer that ``events_gap_distribution`` only shapes: pick the
    knee where the count stops falling and feed it to ``sessionize``.

    Exactness: gaps are integer epoch-second diffs; session counts
    are integers; one IEEE division per row at 1e-6.

    Scale: one user-keyed lag pass over the fact table, one tiny
    census, a 3-row broadcast ladder — the fact table never re-scans
    per timeout."""
    ev = load(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s")
    )
    nu = ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    t = spark.range(1).select(
        F.explode(
            F.array(F.lit(600), F.lit(1800), F.lit(3600))
        ).alias("timeout_s")
    )
    n_sessions = F.max("n_users") + F.sum(
        F.when(F.col("gap_s") > F.col("timeout_s"), 1).otherwise(0)
    )
    return (
        g.crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(t))
        .groupBy(F.col("timeout_s").cast("long").alias("timeout_s"))
        .agg(
            n_sessions.cast("long").alias("n_sessions"),
            F.round(
                F.max("n_events").cast("double") / n_sessions, 6
            ).alias("avg_events_per_session"),
        )
    )


RFM_PIVOT_DATE = "1998-01-01"  # period split for the migration matrix


@register(
    "orders_rfm_migration_matrix",
    oracle=f"""
    WITH m AS (
      SELECT o_custkey AS custkey,
             CASE WHEN o_orderdate < DATE '{RFM_PIVOT_DATE}'
                  THEN 'A' ELSE 'B' END AS period,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY 1, 2
    ), s AS (
      SELECT custkey, period,
             NTILE(3) OVER (PARTITION BY period
                            ORDER BY monetary, custkey) AS seg
      FROM m
    )
    SELECT a.seg AS seg_before, b.seg AS seg_after,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (SELECT custkey, seg FROM s WHERE period = 'A') a
    JOIN (SELECT custkey, seg FROM s WHERE period = 'B') b
      USING (custkey)
    GROUP BY a.seg, b.seg
    """,
)
def orders_rfm_migration_matrix(spark: SparkSession, d: str) -> DataFrame:
    """SEGMENT MIGRATION matrix — tercile the customers by monetary
    value in the before/after halves of the order history (pivot
    1998-01-01) and cross-tabulate where each customer MOVED: the
    retention-marketing view that a static ``rfm_segmentation``
    snapshot can't answer (who decayed out of the top tercile, who
    graduated in). Customers active in only one period drop out of
    the matrix by design (they're the separate churn/new census of
    ``growth_accounting``).

    Exactness: monetary sums in DECIMAL(18,2); the tercile cut is the
    distributed ``_global_ntile`` PER PERIOD (a (monetary, custkey)
    total order), matching the oracle's NTILE(3); counts are
    integers.

    Scale: one customer×period aggregate, two range exchanges for the
    per-period ranking, a key-joined 3×3 rollup."""
    orders = load(spark, d, "orders")
    m = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.when(
            F.col("o_orderdate") < F.lit(RFM_PIVOT_DATE).cast("timestamp"),
            "A",
        )
        .otherwise("B")
        .alias("period"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary")
    )
    segs = []
    for per in ("A", "B"):
        sub = m.where(F.col("period") == per)
        tiled = _global_ntile(
            sub, 3, [F.col("monetary"), F.col("custkey")], key="custkey"
        ).select(
            F.col("custkey").alias(f"ck_{per.lower()}"),
            F.col("_ntile").alias(f"seg_{per.lower()}"),
        )
        segs.append(tiled)
    a, b = segs
    return (
        a.join(b, F.col("ck_a") == F.col("ck_b"))
        .groupBy(
            F.col("seg_a").cast("long").alias("seg_before"),
            F.col("seg_b").cast("long").alias("seg_after"),
        )
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


@register(
    "events_conversion_lag_curve",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.vt
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), lat AS (
      SELECT v.user_id,
             date_diff('day', v.vt, p.pt) AS lag_days
      FROM v LEFT JOIN p ON p.user_id = v.user_id
    ), ladder AS (
      SELECT CAST(r.range AS BIGINT) AS d FROM range(14) r
    ), nv AS (SELECT COUNT(*) AS n_viewers FROM lat)
    SELECT l.d AS within_days,
           CAST(MAX(nv.n_viewers) AS BIGINT) AS n_viewers,
           CAST(SUM(CASE WHEN lat.lag_days IS NOT NULL
                          AND lat.lag_days <= l.d
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN lat.lag_days IS NOT NULL
                           AND lat.lag_days <= l.d
                          THEN 1 ELSE 0 END)
                 / CAST(MAX(nv.n_viewers) AS DOUBLE), 6) AS cum_rate
    FROM lat CROSS JOIN ladder l CROSS JOIN nv
    GROUP BY l.d
    """,
)
def events_conversion_lag_curve(spark: SparkSession, d: str) -> DataFrame:
    """CUMULATIVE CONVERSION-LAG curve — for each horizon d in 0..13
    days, the share of first-time viewers whose first subsequent
    purchase landed within d days: the attribution-window CDF that
    tells you where to SET the window every windowed-funnel and
    attribution operator takes as input (``funnel_time_constrained``
    evaluates ONE window; this evaluates them all in one pass).
    ``events_time_to_convert`` gives latency percentiles among
    converters; this curve is anchored on ALL viewers, so it also
    shows the never-converted asymptote.

    Exactness: latencies are integer day diffs; the ladder is a
    14-row literal; one IEEE division per output row at 1e-6.

    Scale: two user-keyed min-aggregates, a 14-row broadcast ladder
    over the |viewers|-row latency table — the fact table is scanned
    twice (the funnel family's shared shape), never per horizon."""
    ev = load(spark, d, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v.select(F.col("user_id").alias("vu"), "vt"),
              (F.col("user_id") == F.col("vu")) & (F.col("ts") >= F.col("vt")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    lat = v.join(
        p.select(F.col("user_id").alias("pu"), "pt"),
        F.col("user_id") == F.col("pu"),
        "left",
    ).select(
        F.datediff(F.col("pt").cast("date"), F.col("vt").cast("date")).alias(
            "lag_days"
        )
    )
    ladder = spark.range(14).select(F.col("id").cast("long").alias("d"))
    nv = lat.agg(F.count("*").alias("n_viewers"))
    conv = F.sum(
        F.when(
            F.col("lag_days").isNotNull() & (F.col("lag_days") <= F.col("d")),
            1,
        ).otherwise(0)
    )
    return (
        lat.crossJoin(F.broadcast(ladder))
        .crossJoin(F.broadcast(nv))
        .groupBy(F.col("d").alias("within_days"))
        .agg(
            F.max("n_viewers").cast("long").alias("n_viewers"),
            conv.cast("long").alias("n_converted"),
            F.round(
                conv / F.max("n_viewers").cast("double"), 6
            ).alias("cum_rate"),
        )
    )
