"""Warehouse-maintenance / CDC operators: SCD1 merge-upsert and SCD2
validity intervals.

The reference's whole pipeline is a change-application job (join an
export against a mapping, rewrite matched rows, keep the rest —
/root/reference/migrate.py:186-236), i.e. an SCD1 MERGE in disguise.
These operators generalize that into the two standard dimension-
maintenance patterns a warehouse/ETL user expects:

- ``merge_scd1``: MERGE INTO semantics (update matched, insert new,
  keep untouched) expressed as one full-outer join — the table-format-
  agnostic core of Delta/Iceberg MERGE. A ``row_action`` column tags
  each row so a writer can split update/insert/keep outputs (the
  reference's found/total audit generalized per-row).
- ``scd2_intervals``: type-2 history — compress consecutive duplicate
  states per key, then derive [valid_from, valid_to) intervals and an
  is_current flag with lead().

Scale posture: merge is ONE shuffle join on the natural key (AQE skew
handles hot keys; at 100 TB both sides bucket/cluster by the key so the
join is co-located). SCD2 is two window passes over the SAME partition
key — Spark reuses the first shuffle's partitioning for the second
window, so it costs one shuffle of the change feed, not two.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.registry import register

DECV = "decimal(18,6)"

#: source keys shifted by this become "new account" inserts, so the
#: merge exercises all three MERGE branches on the synthetic data
INSERT_KEY_SHIFT = 10_000
#: order-count cutoff selecting which rollup rows also spawn an insert
INSERT_MIN_ORDERS = 15
#: rollup rows below this stay OUT of the change feed, so low-activity
#: customers exercise the untouched pass-through ('keep') branch
UPDATE_MIN_ORDERS = 5


@register(
    "merge_scd1",
    oracle=f"""
    WITH src0 AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS new_bal,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), src AS (
      SELECT k, new_bal FROM src0 WHERE n_orders >= {UPDATE_MIN_ORDERS}
      UNION ALL
      SELECT k + {INSERT_KEY_SHIFT}, new_bal FROM src0
      WHERE n_orders >= {INSERT_MIN_ORDERS}
    )
    SELECT COALESCE(c.c_custkey, s.k) AS c_custkey,
           COALESCE(c.c_name, 'NEW ACCOUNT') AS c_name,
           COALESCE(c.c_nationkey, -1) AS c_nationkey,
           CASE WHEN s.k IS NOT NULL THEN s.new_bal
                ELSE c.c_acctbal END AS c_acctbal,
           COALESCE(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
           CASE WHEN s.k IS NOT NULL AND c.c_custkey IS NOT NULL THEN 'update'
                WHEN c.c_custkey IS NULL THEN 'insert'
                ELSE 'keep' END AS row_action
    FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k
    """,
)
def merge_scd1(spark: SparkSession, d: str) -> DataFrame:
    """SCD1 MERGE (upsert) without a table format: target ``customer``
    merged with a change feed derived from ``orders`` (per-customer
    spend rollup; rollup rows past a cutoff are re-keyed to act as
    brand-new accounts so insert/update/keep all occur). Update wins on
    match, unmatched source rows insert with defaults, unmatched target
    rows pass through — the semantics of ``MERGE INTO t USING s``,
    produced by one full-outer shuffle join. Float sums ride DECIMAL so
    the merged balance is bit-identical cross-engine."""
    src0 = (
        load(spark, d, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DECV)).cast("double").alias("new_bal"),
            F.count("*").alias("n_orders"),
        )
    )
    src = src0.where(F.col("n_orders") >= UPDATE_MIN_ORDERS).select(
        "k", "new_bal"
    ).unionAll(
        src0.where(F.col("n_orders") >= INSERT_MIN_ORDERS).select(
            (F.col("k") + INSERT_KEY_SHIFT).alias("k"), "new_bal"
        )
    )
    c = load(spark, d, "customer")
    matched = F.col("k").isNotNull()
    existed = F.col("c_custkey").isNotNull()
    return c.join(src, c.c_custkey == src.k, "full_outer").select(
        F.coalesce("c_custkey", "k").alias("c_custkey"),
        F.coalesce("c_name", F.lit("NEW ACCOUNT")).alias("c_name"),
        F.coalesce("c_nationkey", F.lit(-1)).alias("c_nationkey"),
        F.when(matched, F.col("new_bal")).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("c_mktsegment"),
        F.when(matched & existed, F.lit("update"))
        .when(~existed, F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("row_action"),
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH ch AS (
      SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS ok,
             o_orderstatus AS status,
             LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), comp AS (
      SELECT custkey, ts, ok, status FROM ch
      WHERE prev_status IS NULL OR status <> prev_status
    )
    SELECT custkey, status, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts, ok) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts, ok) IS NULL)
             AS is_current
    FROM comp
    """,
)
def scd2_intervals(spark: SparkSession, d: str) -> DataFrame:
    """SCD2 (type-2 dimension) build: treat each order as a state
    observation of its customer, drop consecutive repeats of the same
    status (lag filter — classic change compression), then turn the
    surviving change points into [valid_from, valid_to) validity
    intervals with lead(); the open interval is flagged is_current.
    Both window passes share the custkey partitioning, so the whole
    history build costs one shuffle of the change feed."""
    w = Window.partitionBy("custkey").orderBy("ts", "ok")
    ch = load(spark, d, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
    ).withColumn("prev_status", F.lag("status").over(w))
    comp = ch.where(
        F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status"))
    )
    w2 = Window.partitionBy("custkey").orderBy("ts", "ok")
    return comp.select(
        "custkey",
        "status",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


SESSION_GAP = "30 MINUTE"


@register(
    "sessionize",
    oracle="""
    SELECT event_id, user_id, ts,
           user_id || '-' || CAST(session_num AS VARCHAR) AS session_id,
           CAST(session_num AS BIGINT) AS session_num
    FROM (
      SELECT event_id, user_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_num
      FROM (
        SELECT event_id, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
      )
    )
    """,
)
def sessionize(spark: SparkSession, d: str) -> DataFrame:
    """Sessionization (gaps-and-islands): assign every event a stable
    session id — a new session starts after a 30-minute silence. Same
    change-compression machinery as ``scd2_intervals`` (lag → flag →
    running sum), sharing the user_id partitioning across both window
    passes, so the whole assignment is one shuffle of the events. The
    batch twin of ``stream_session``'s session windows: that one
    aggregates per session, this one labels the raw events (what a
    sessionized clickstream table stores)."""
    from pro_etl_spark.io import load as _load

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = prev.isNull() | (
        F.col("ts") > prev + F.expr(f"INTERVAL {SESSION_GAP}")
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = _load(spark, d, "events").select("event_id", "user_id", "ts")
    return (
        ev.withColumn("is_new", is_new.cast("long"))
        .withColumn("session_num", F.sum("is_new").over(run))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.concat_ws("-", "user_id", "session_num").alias("session_id"),
            "session_num",
        )
    )


#: deterministic snapshot windows carved from `orders` so the diff
#: exercises all three change kinds: rows only in A (deletes), only in
#: B (inserts), and overlapping rows whose payload was perturbed
#: (updates)
SNAP_A_MAX = "1997-07-01"
SNAP_B_MIN = "1996-01-01"
UPDATE_MOD = 13

_SNAPSHOT_CTE = f"""
    snap_a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < DATE '{SNAP_A_MAX}'
    ),
    snap_b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % {UPDATE_MOD} = 0
                  THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderdate >= DATE '{SNAP_B_MIN}'
    )
"""


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH {_SNAPSHOT_CTE}
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           a.o_totalprice AS old_price,
           b.o_totalprice AS new_price
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_orderstatus <> b.o_orderstatus
    """,
)
def cdc_snapshot_diff(spark: SparkSession, d: str) -> DataFrame:
    """Snapshot differencing — derive a change feed (insert / update /
    delete rows) from two full table snapshots, the standard way to
    bootstrap CDC when the source system exposes only periodic dumps.
    One full-outer join co-partitioned on the natural key classifies
    every row; unchanged rows (the overwhelming majority at 100 TB) are
    filtered out BEFORE anything downstream sees them, so the emitted
    feed is proportional to the churn, not the table. At scale both
    snapshots are bucketed by the key, making the join co-located and
    shuffle-free; AQE skew-join covers hot keys otherwise. Payload
    comparison is column-wise here (two columns); a wide table would
    compare a single ``xxhash64(struct(*))`` row digest instead — same
    plan shape, one expression."""
    o = load(spark, d, "orders")
    a = o.where(F.col("o_orderdate") < F.lit(SNAP_A_MAX).cast("date")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.where(F.col("o_orderdate") >= F.lit(SNAP_B_MIN).cast("date")).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % UPDATE_MOD == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    aj = a.alias("a")
    bj = b.alias("b")
    changed = (
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
    )
    return (
        aj.join(bj, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .where(changed)
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("a.o_orderkey").isNull(), "insert")
            .when(F.col("b.o_orderkey").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
        )
    )


#: join_temporal: quantity cutoff keeping the probed fact slice a
#: selective, pushdown-pruned subset of lineitem
TEMPORAL_MIN_QTY = 45


@register(
    "join_temporal",
    oracle="""
    WITH ch AS (
      SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS ok,
             o_orderstatus AS status,
             LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), comp AS (
      SELECT custkey, ts, ok, status FROM ch
      WHERE prev_status IS NULL OR status <> prev_status
    ), iv AS (
      SELECT custkey, status, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts, ok) AS valid_to
      FROM comp
    ), fact AS (
      SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS custkey,
             l.l_shipdate AS ship_date, o.o_orderstatus
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_quantity >= 45
    )
    SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ship_date,
           v.status AS status_at_ship,
           (v.status <> f.o_orderstatus) AS changed_since_order
    FROM fact f JOIN iv v
      ON v.custkey = f.custkey
     AND v.valid_from <= f.ship_date
     AND (v.valid_to IS NULL OR f.ship_date < v.valid_to)
    """,
)
def join_temporal(spark: SparkSession, d: str) -> DataFrame:
    """Point-in-time (temporal) join: probe each fact against the SCD2
    dimension AS OF the fact's own timestamp — "what was this
    customer's status when the line item actually shipped", the
    time-travel lookup every feature-store / training-label pipeline
    needs to avoid leakage from future dimension states.

    Dimension = the ``scd2_intervals`` history (consecutive-duplicate
    compression means intervals tile [first_change, ∞) per key with no
    overlap, so every fact matches EXACTLY one row — the join cannot
    fan out). Probe = lineitem, quantity-pruned at the parquet scan,
    keyed to custkey through its order. Plan shape: one equi-join on
    orderkey (co-located at 100 TB when both tables bucket by
    orderkey), then an equi-join on custkey carrying the range
    predicate as a residual filter — Spark evaluates the BETWEEN
    post-shuffle on co-partitioned keys, and because the dimension is
    the change-compressed history (orders of magnitude smaller than
    the fact stream) AQE typically broadcasts it outright."""
    w = Window.partitionBy("custkey").orderBy("ts", "ok")
    ch = load(spark, d, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
    ).withColumn("prev_status", F.lag("status").over(w))
    comp = ch.where(
        F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status"))
    )
    iv = comp.select(
        "custkey",
        "status",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    fact = (
        load(spark, d, "lineitem")
        .where(F.col("l_quantity") >= TEMPORAL_MIN_QTY)
        .join(
            load(spark, d, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ship_date"),
            "o_orderstatus",
        )
    )
    v = iv.alias("v")
    f_ = fact.alias("f")
    return (
        f_.join(
            v,
            (F.col("v.custkey") == F.col("f.custkey"))
            & (F.col("v.valid_from") <= F.col("f.ship_date"))
            & (
                F.col("v.valid_to").isNull()
                | (F.col("f.ship_date") < F.col("v.valid_to"))
            ),
        )
        .select(
            F.col("f.l_orderkey").alias("l_orderkey"),
            F.col("f.l_linenumber").alias("l_linenumber"),
            F.col("f.custkey").alias("custkey"),
            F.col("f.ship_date").alias("ship_date"),
            F.col("v.status").alias("status_at_ship"),
            (F.col("v.status") != F.col("f.o_orderstatus")).alias(
                "changed_since_order"
            ),
        )
    )


#: merge_cdc_apply: deterministic changelog synthesis knobs — every
#: 89th customer's stream ends in a delete test, every 50th order is
#: re-keyed into a brand-new account insert, the rest are updates
CDC_DELETE_MOD = 89
CDC_INSERT_MOD = 50
CDC_INSERT_SHIFT = 1_000_000


@register(
    "merge_cdc_apply",
    oracle=f"""
    WITH chg0 AS (
      SELECT o_custkey, o_orderkey, o_orderdate AS ts,
             o_totalprice AS bal,
             CASE WHEN o_custkey % {CDC_DELETE_MOD} = 0 THEN 'D'
                  WHEN o_orderkey % {CDC_INSERT_MOD} = 0 THEN 'I'
                  ELSE 'U' END AS op
      FROM orders
    ), chg AS (
      SELECT CASE WHEN op = 'I' THEN o_custkey + {CDC_INSERT_SHIFT}
                  ELSE o_custkey END AS k,
             op, ts, o_orderkey AS seq, bal
      FROM chg0
    ), latest AS (
      SELECT k, op, bal FROM chg
      QUALIFY row_number() OVER (PARTITION BY k
                                 ORDER BY ts DESC, seq DESC) = 1
    )
    SELECT COALESCE(c.c_custkey, s.k) AS custkey,
           COALESCE(c.c_name, 'NEW ACCOUNT') AS name,
           CASE WHEN s.k IS NOT NULL THEN s.bal
                ELSE c.c_acctbal END AS bal,
           CASE WHEN s.k IS NULL THEN 'keep'
                WHEN c.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS row_action
    FROM customer c FULL OUTER JOIN latest s ON c.c_custkey = s.k
    WHERE s.op IS NULL OR s.op <> 'D'
    """,
)
def merge_cdc_apply(spark: SparkSession, d: str) -> DataFrame:
    """Apply an ordered I/U/D changelog to a base table — the CDC
    consumer half (``cdc_snapshot_diff`` produces such a feed; this
    replays one): last change per key wins, a terminal delete removes
    the row, upserts update-or-insert, untouched base rows pass
    through. This is the table-format-agnostic core of `MERGE` from a
    Debezium/stream tail, and the batch twin of the streaming
    ``stream_dedup`` keep-latest discipline.

    Plan: the changelog collapses to one row per key FIRST
    (MAX(STRUCT(ts, seq, …)) — a hash aggregate with map-side
    partials, so only one candidate row per key per map partition is
    shuffled), and the full-outer join against the base is keyed
    change-count-sized, not feed-sized. At 100 TB the base is bucketed by key, making the
    apply a co-located join; the window and join share the same key so
    Spark reuses the exchange. Deletes are filtered AFTER the join
    (matched-delete must still eliminate its base row, which a
    pre-join filter could not express)."""
    o = load(spark, d, "orders")
    chg0 = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("bal"),
        F.when(F.col("o_custkey") % CDC_DELETE_MOD == 0, "D")
        .when(F.col("o_orderkey") % CDC_INSERT_MOD == 0, "I")
        .otherwise("U")
        .alias("op"),
    )
    chg = chg0.select(
        F.when(F.col("op") == "I", F.col("o_custkey") + CDC_INSERT_SHIFT)
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        "op",
        "ts",
        F.col("o_orderkey").alias("seq"),
        "bal",
    )
    # last-change-per-key: MAX(STRUCT(ts, seq, op, bal)) is the
    # identical (ts DESC, seq DESC) pick — seq (= o_orderkey) is
    # unique per key, so (ts, seq) is a total order and op/bal are
    # never compared. The former row_number window shuffled and
    # SORTED the whole change feed; the aggregate collapses each map
    # partition to one row per key BEFORE the exchange (guide §2.3
    # "aggregate before you shuffle") — at 100 TB the shuffle drops
    # from feed-sized to keys×partitions.
    latest = (
        chg.groupBy("k")
        .agg(
            F.max(
                F.struct(
                    F.col("ts").alias("ts"),
                    F.col("seq").alias("seq"),
                    F.col("op").alias("op"),
                    F.col("bal").alias("bal"),
                )
            ).alias("m")
        )
        .select("k", F.col("m.op").alias("op"), F.col("m.bal").alias("bal"))
    )
    c = load(spark, d, "customer")
    return (
        c.join(latest, c.c_custkey == latest.k, "full_outer")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("c_custkey", "k").alias("custkey"),
            F.coalesce("c_name", F.lit("NEW ACCOUNT")).alias("name"),
            F.when(F.col("k").isNotNull(), F.col("bal"))
            .otherwise(F.col("c_acctbal"))
            .alias("bal"),
            F.when(F.col("k").isNull(), "keep")
            .when(F.col("c_custkey").isNull(), "insert")
            .otherwise("update")
            .alias("row_action"),
        )
    )


@register(
    "interval_concurrency",
    oracle="""
    WITH labeled AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_num
      FROM (
        SELECT event_id, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
      )
    ), sessions AS (
      SELECT user_id, session_num,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM labeled GROUP BY user_id, session_num
    ), bounds AS (
      SELECT CAST(date_trunc('day', s_start) AS TIMESTAMP) AS day,
             s_start AS ts, 1 AS delta, user_id, session_num
      FROM sessions
      UNION ALL
      SELECT CAST(date_trunc('day', s_start) AS TIMESTAMP) AS day,
             s_end AS ts, -1 AS delta, user_id, session_num
      FROM sessions
    ), swept AS (
      SELECT day,
             SUM(delta) OVER (PARTITION BY day
                              ORDER BY ts, delta DESC, user_id, session_num
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS live
      FROM bounds
    )
    SELECT day, CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY day
    """,
)
def interval_concurrency(spark: SparkSession, d: str) -> DataFrame:
    """Peak concurrent sessions per day by SWEEP-LINE: every session
    becomes a (+1 at start, −1 at end) boundary pair, a running sum
    over the time-ordered boundaries is the live-session count, and
    the daily max of that count is the capacity-planning number
    (license seats, connection pools). Ordering puts starts before
    ends at the same instant (delta DESC) — inclusive-interval
    overlap — with (user, session) as the final tiebreak so the
    running sum is deterministic cross-engine.

    Scale: sessions build on the SAME one-user-shuffle machinery as
    ``sessionize``; the sweep partitions by DAY (each session
    attributed to its start day — the dashboard convention, documented
    rather than silently wrong for midnight-crossers), so the running
    sum is per-day-keyed, never a single global sort. At 100 TB the
    boundary table is 2 rows/session — orders of magnitude smaller
    than the events — and each day's sweep is an independent
    partition."""
    from pro_etl_spark.io import load as _load

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = prev.isNull() | (
        F.col("ts") > prev + F.expr(f"INTERVAL {SESSION_GAP}")
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = (
        _load(spark, d, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("is_new", is_new.cast("long"))
        .withColumn("session_num", F.sum("is_new").over(run))
        .groupBy("user_id", "session_num")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    day = F.date_trunc("day", F.col("s_start"))
    bounds = sessions.select(
        day.alias("day"), F.col("s_start").alias("ts"),
        F.lit(1).alias("delta"), "user_id", "session_num",
    ).unionAll(
        sessions.select(
            day.alias("day"), F.col("s_end").alias("ts"),
            F.lit(-1).alias("delta"), "user_id", "session_num",
        )
    )
    sweep = Window.partitionBy("day").orderBy(
        "ts", F.desc("delta"), "user_id", "session_num"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        bounds.withColumn("live", F.sum("delta").over(sweep))
        .groupBy("day")
        .agg(F.max("live").cast("long").alias("peak_concurrent"))
    )


IVM_MINUTES = 30


@register(
    "interval_merge",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, ts,
             ts + INTERVAL {IVM_MINUTES} MINUTE AS te
      FROM events
    ), flagged AS (
      SELECT user_id, ts, te,
             CASE WHEN MAX(te) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) IS NULL
                       OR ts > MAX(te) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), ids AS (
      SELECT user_id, ts, te,
             SUM(new_island) OVER (PARTITION BY user_id
                                   ORDER BY ts, te
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS island_id
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           MIN(ts) AS island_start, MAX(te) AS island_end,
           COUNT(*) AS n_events,
           CAST((epoch_us(MAX(te)) - epoch_us(MIN(ts))) // 60000000
                AS BIGINT) AS span_minutes
    FROM ids GROUP BY user_id, island_id
    """,
)
def interval_merge(spark: SparkSession, d: str) -> DataFrame:
    """Gaps-and-islands interval COALESCING: give each event a
    [ts, ts+30min) activity interval and stitch overlapping/touching
    intervals per user into maximal islands — the classic SQL-hard
    merge behind availability windows, on-call coverage, and
    machine-uptime stitching, complementing ``interval_concurrency``
    (sweep-line peak) and ``sessionize`` (gap-based sessions differ:
    an island is bounded by interval OVERLAP, not inter-event gaps).
    An island break is `ts > running MAX(end) over all prior rows` —
    the running max (not lag) is what makes nested intervals correct;
    the break flags' running sum numbers the islands. Every
    comparison is timestamp/integer, so islands are bit-deterministic
    cross-engine.

    Scale: two window passes over one user_id partitioning
    (high-cardinality) + one grouped reduce — a single shuffle."""
    iv = load(spark, d, "events").select(
        "user_id",
        "event_id",
        "ts",
        (F.col("ts") + F.expr(f"INTERVAL {IVM_MINUTES} MINUTES")).alias("te"),
    )
    prior = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "ts",
        "te",
        F.when(
            F.max("te").over(prior).isNull()
            | (F.col("ts") > F.max("te").over(prior)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "te")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ids = flagged.select(
        "user_id", "ts", "te", F.sum("new_island").over(run).alias("island_id")
    )
    return ids.groupBy("user_id", "island_id").agg(
        F.min("ts").alias("island_start"),
        F.max("te").alias("island_end"),
        F.count("*").alias("n_events"),
        F.expr(
            "(unix_micros(max(te)) - unix_micros(min(ts))) div 60000000"
        ).alias("span_minutes"),
    ).select(
        "user_id",
        F.col("island_id").cast("long").alias("island_id"),
        "island_start",
        "island_end",
        F.col("n_events").cast("long").alias("n_events"),
        "span_minutes",
    )


@register(
    "merge_scd2_apply",
    oracle="""
    WITH batch AS (
      SELECT c_custkey AS custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS acctbal
      FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
    ), changed AS (
      SELECT b.custkey, b.acctbal AS new_bal
      FROM batch b JOIN customer c ON b.custkey = c.c_custkey
      WHERE b.acctbal <> c.c_acctbal
    )
    SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal,
           CAST(1 AS INT) AS version,
           (ch.custkey IS NULL) AS is_current
    FROM customer c LEFT JOIN changed ch ON c.c_custkey = ch.custkey
    UNION ALL
    SELECT custkey, new_bal AS acctbal, CAST(2 AS INT) AS version,
           TRUE AS is_current
    FROM changed
    """,
)
def merge_scd2_apply(spark: SparkSession, d: str) -> DataFrame:
    """SCD2 MERGE (type-2 upsert) — the nightly warehouse pattern
    ``scd2_intervals`` builds history FROM, here run as the forward
    operation: an incoming snapshot batch lands against the current
    dimension; rows whose tracked attribute actually CHANGED close
    their open version (is_current=false) and insert a successor
    (version+1, current); re-sent-but-identical rows are a NO-OP (the
    change detector, not the batch membership, drives versioning —
    the classic MERGE mistake is versioning on arrival); keys absent
    from the batch are untouched. The batch is derived
    deterministically from the dim itself (every 7th key changes,
    every 11th re-sends unchanged) so the oracle recomputes the merge
    relationally.

    Scale: ONE equi-join of batch against the current-version slice
    (batch is the small side — broadcast), then a union; the dimension
    is never rewritten wholesale, matching how a lakehouse MERGE
    touches only matched files."""
    dim = load(spark, d, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    batch = dim.where(
        (F.col("custkey") % 7 == 0) | (F.col("custkey") % 11 == 0)
    ).select(
        "custkey",
        F.when(F.col("custkey") % 7 == 0, F.col("acctbal") + 100.0)
        .otherwise(F.col("acctbal"))
        .alias("new_bal"),
    )
    changed = (
        F.broadcast(batch)
        .join(dim, "custkey")
        .where(F.col("new_bal") != F.col("acctbal"))
        .select("custkey", "new_bal")
    )
    closed_or_kept = dim.join(
        F.broadcast(changed.select("custkey", F.lit(True).alias("ch"))),
        "custkey",
        "left",
    ).select(
        "custkey",
        "acctbal",
        F.lit(1).cast("int").alias("version"),
        F.col("ch").isNull().alias("is_current"),
    )
    inserted = changed.select(
        "custkey",
        F.col("new_bal").alias("acctbal"),
        F.lit(2).cast("int").alias("version"),
        F.lit(True).alias("is_current"),
    )
    return closed_or_kept.unionAll(inserted)


@register(
    "cdc_late_dimension",
    oracle="""
    SELECT o.o_orderkey,
           CASE WHEN o.o_custkey % 3 <> 0 THEN 1 ELSE 2 END
             AS resolved_stage,
           c.c_mktsegment AS segment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def cdc_late_dimension(spark: SparkSession, d: str) -> DataFrame:
    """LATE-ARRIVING DIMENSION handling — the ingestion reality every
    streaming warehouse hits: facts land before their dimension row
    exists (the order beats the customer-master sync). The pattern:
    join facts against the dim snapshot available NOW; matched facts
    enrich immediately (stage 1), unmatched facts PARK with a
    placeholder instead of being dropped or blocking the batch; when
    the dim catch-up arrives, only the parked facts re-join (stage 2).
    Here the v1 snapshot deterministically lacks every third customer,
    so both paths populate; the oracle proves the two-stage union
    equals the one-shot join against the complete dimension — the
    invariant the pattern must preserve.

    Scale: stage 1 is the normal broadcast enrichment; stage 2
    re-joins ONLY the parked slice (dup-sized, not fact-sized) — the
    whole point vs re-running the full join when the dim updates."""
    facts = load(spark, d, "orders").select("o_orderkey", "o_custkey")
    dim_full = load(spark, d, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dim_v1 = dim_full.where(F.col("c_custkey") % 3 != 0)
    stage1 = facts.join(
        F.broadcast(dim_v1), facts["o_custkey"] == dim_v1["c_custkey"], "left"
    )
    resolved1 = stage1.where(F.col("c_custkey").isNotNull()).select(
        "o_orderkey",
        F.lit(1).cast("int").alias("resolved_stage"),
        F.col("c_mktsegment").alias("segment"),
    )
    parked = stage1.where(F.col("c_custkey").isNull()).select(
        "o_orderkey", "o_custkey"
    )
    resolved2 = parked.join(
        F.broadcast(dim_full), parked["o_custkey"] == dim_full["c_custkey"]
    ).select(
        "o_orderkey",
        F.lit(2).cast("int").alias("resolved_stage"),
        F.col("c_mktsegment").alias("segment"),
    )
    return resolved1.unionAll(resolved2)


@register(
    "merge_scd3",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS new_bal
      FROM orders GROUP BY 1
      HAVING COUNT(*) >= {UPDATE_MIN_ORDERS}
    )
    SELECT c_custkey, c_name,
           CASE WHEN s.k IS NOT NULL THEN s.new_bal
                ELSE c.c_acctbal END AS c_acctbal,
           CASE WHEN s.k IS NOT NULL THEN c.c_acctbal END AS prev_acctbal,
           s.k IS NOT NULL AS changed
    FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
    """,
)
def merge_scd3(spark: SparkSession, d: str) -> DataFrame:
    """SCD TYPE-3 merge — the third slowly-changing-dimension
    discipline next to ``merge_scd1`` (overwrite) and
    ``scd2_intervals`` (full history): track LIMITED history by
    keeping the prior value in a dedicated ``prev_*`` column when an
    update lands — the "current + previous" shape reporting teams ask
    for when they need period-over-period comparisons but not a
    row-per-version dimension. Same source as the SCD1 twin (per-
    customer recomputed balance, update gate >= {UPDATE_MIN_ORDERS}
    orders); unchanged rows carry NULL prev (type-3 semantics: prev
    is only meaningful when a change occurred this run).

    Scale: identical to merge_scd1 — one aggregate over the facts,
    one key-partitioned LEFT join against the dimension (co-located
    when both are bucketed by custkey); type-3 adds zero extra
    passes, just two projected CASE columns."""
    src = (
        load(spark, d, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("new_bal"),
            F.count("*").alias("n_orders"),
        )
        .where(F.col("n_orders") >= UPDATE_MIN_ORDERS)
        .drop("n_orders")
    )
    c = load(spark, d, "customer")
    changed = F.col("k").isNotNull()
    return c.join(src, c.c_custkey == F.col("k"), "left").select(
        "c_custkey",
        "c_name",
        F.when(changed, F.col("new_bal"))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(changed, F.col("c_acctbal")).alias("prev_acctbal"),
        changed.alias("changed"),
    )


@register(
    "interval_allen_census",
    oracle="""
    WITH spans AS (
      SELECT user_id, event_type, MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, event_type
    ), pairs AS (
      SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
             CASE
               WHEN a.s = b.s AND a.e = b.e THEN 'equals'
               WHEN a.e < b.s THEN 'before'
               WHEN b.e < a.s THEN 'after'
               WHEN a.e = b.s THEN 'meets'
               WHEN b.e = a.s THEN 'met_by'
               WHEN a.s = b.s AND a.e < b.e THEN 'starts'
               WHEN a.s = b.s AND a.e > b.e THEN 'started_by'
               WHEN a.e = b.e AND a.s > b.s THEN 'finishes'
               WHEN a.e = b.e AND a.s < b.s THEN 'finished_by'
               WHEN a.s > b.s AND a.e < b.e THEN 'during'
               WHEN a.s < b.s AND a.e > b.e THEN 'contains'
               WHEN a.s < b.s AND a.e < b.e THEN 'overlaps'
               ELSE 'overlapped_by'
             END AS relation
      FROM spans a JOIN spans b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM pairs GROUP BY relation
    """,
)
def interval_allen_census(spark: SparkSession, d: str) -> DataFrame:
    """ALLEN'S INTERVAL ALGEBRA census — classify every pair of
    per-user activity spans (one interval per event type: first to
    last occurrence) into the 13 Allen relations (before/meets/
    overlaps/starts/during/finishes, their inverses, equals) and
    count each relation's frequency. This is the formal vocabulary
    under every temporal-join question the cdc family answers
    piecemeal (``join_interval_overlap`` = one relation bucket,
    ``join_temporal`` = point-in-'during'); the census tells you
    WHICH temporal join a dataset actually needs — if 95% of spans
    are 'before', sessionized funnels beat interval joins. Pure
    timestamp comparisons: exact in both engines by construction.

    Scale: spans are one grouped pass (|users| x |types| rows); the
    pair join is user-keyed with a bounded per-user fan-out
    (|types| choose 2 = 10 here), never a global product; the census
    is a |relations|-row aggregate."""
    spans = (
        load(spark, d, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    a, b = spans.alias("a"), spans.alias("b")
    s_a, e_a = F.col("a.s"), F.col("a.e")
    s_b, e_b = F.col("b.s"), F.col("b.e")
    relation = (
        F.when((s_a == s_b) & (e_a == e_b), "equals")
        .when(e_a < s_b, "before")
        .when(e_b < s_a, "after")
        .when(e_a == s_b, "meets")
        .when(e_b == s_a, "met_by")
        .when((s_a == s_b) & (e_a < e_b), "starts")
        .when((s_a == s_b) & (e_a > e_b), "started_by")
        .when((e_a == e_b) & (s_a > s_b), "finishes")
        .when((e_a == e_b) & (s_a < s_b), "finished_by")
        .when((s_a > s_b) & (e_a < e_b), "during")
        .when((s_a < s_b) & (e_a > e_b), "contains")
        .when((s_a < s_b) & (e_a < e_b), "overlaps")
        .otherwise("overlapped_by")
    )
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(F.col("a.user_id").alias("user_id"), relation.alias("relation"))
    return pairs.groupBy("relation").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "interval_gaps",
    oracle="""
    WITH labeled AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_num
      FROM (
        SELECT event_id, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
      )
    ), sessions AS (
      SELECT user_id, session_num,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM labeled GROUP BY user_id, session_num
    ), gaps AS (
      SELECT user_id,
             date_diff('second',
                       LAG(s_end) OVER (PARTITION BY user_id
                                        ORDER BY session_num),
                       s_start) AS idle_sec
      FROM sessions
    )
    SELECT user_id,
           CAST(COUNT(idle_sec) AS BIGINT) AS n_gaps,
           CAST(SUM(idle_sec) AS BIGINT) AS total_idle_sec,
           CAST(MAX(idle_sec) AS BIGINT) AS max_idle_sec
    FROM gaps WHERE idle_sec IS NOT NULL
    GROUP BY user_id
    """,
)
def interval_gaps(spark: SparkSession, d: str) -> DataFrame:
    """INTERVAL COMPLEMENT (gaps) — the idle periods BETWEEN a user's
    merged activity sessions: where ``interval_merge`` coalesces
    overlapping spans and ``interval_concurrency`` sweeps their
    overlap, this op measures what's left — per user, how many idle
    gaps, their total and maximum length. The operational read:
    max_idle is time-to-churn-risk, total_idle/(span) is engagement
    density; in capacity terms gaps are reclaimable window. Sessions
    are the standard 30-minute-timeout build (identical CTE to
    ``interval_concurrency``), gaps a lag over each user's session
    sequence — integer seconds, exact.

    Scale: everything is keyed user_id — the sessionize window, the
    session aggregate, the gap lag, the final rollup ride ONE
    exchange."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, d, "events").withColumn(
        "prev_ts", F.lag("ts").over(w)
    )
    labeled = ev.withColumn(
        "session_num",
        F.sum(
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.col("ts")
                    > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")
                ),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    sessions = labeled.groupBy("user_id", "session_num").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    wg = Window.partitionBy("user_id").orderBy("session_num")
    gaps = sessions.select(
        "user_id",
        (
            F.col("s_start").cast("long")
            - F.lag(F.col("s_end").cast("long")).over(wg)
        ).alias("idle_sec"),
    ).where(F.col("idle_sec").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("idle_sec").cast("long").alias("n_gaps"),
        F.sum("idle_sec").cast("long").alias("total_idle_sec"),
        F.max("idle_sec").cast("long").alias("max_idle_sec"),
    )


# --- interval difference (subtract blackout windows) -------------------

BLACKOUT_START_H = 2  # daily maintenance window [02:00, 04:00)
BLACKOUT_END_H = 4


def _interval_difference_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    return f"""
    WITH islands AS ({ORACLES["interval_merge"]}),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    blk AS (
      SELECT CAST(day AS TIMESTAMP) + INTERVAL {BLACKOUT_START_H} HOUR AS bs,
             CAST(day AS TIMESTAMP) + INTERVAL {BLACKOUT_END_H} HOUR AS be
      FROM days
    ), ov AS (
      SELECT i.user_id, i.island_id, i.island_start, i.island_end,
             GREATEST(b.bs, i.island_start) AS cs,
             LEAST(b.be, i.island_end) AS ce
      FROM islands i JOIN blk b
        ON b.bs < i.island_end AND i.island_start < b.be
    ), mids AS (
      SELECT user_id, island_id,
             COALESCE(LAG(ce) OVER (PARTITION BY user_id, island_id
                                    ORDER BY cs),
                      island_start) AS seg_start,
             cs AS seg_end
      FROM ov
    ), tails AS (
      SELECT i.user_id, i.island_id,
             COALESCE(MAX(o.ce), i.island_start) AS seg_start,
             i.island_end AS seg_end
      FROM islands i LEFT JOIN ov o
        ON o.user_id = i.user_id AND o.island_id = i.island_id
      GROUP BY i.user_id, i.island_id, i.island_start, i.island_end
    ), segs AS (
      SELECT * FROM mids UNION ALL SELECT * FROM tails
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           seg_start, seg_end,
           CAST((epoch_us(seg_end) - epoch_us(seg_start)) // 60000000
                AS BIGINT) AS seg_minutes
    FROM segs WHERE seg_start < seg_end
    """


@register("interval_difference", oracle=_interval_difference_oracle())
def interval_difference(spark: SparkSession, d: str) -> DataFrame:
    """INTERVAL DIFFERENCE — subtract a set of blackout windows (daily
    [0{BLACKOUT_START_H}:00, 0{BLACKOUT_END_H}:00) maintenance) from
    each user's merged activity islands, emitting the surviving
    sub-intervals. The set-algebra completion of the interval family:
    merge (union), concurrency (sweep count), gaps (complement within
    bounds), Allen census (pair relations) — and now A \\ B, the shape
    behind SLA carve-outs, billing-hour exclusions, and
    maintenance-aware uptime.

    Plan: islands come from ``interval_merge`` (shared machinery);
    blackouts are a DAY-dimension scaffold (bounded, broadcast). Each
    island's overlapping blackouts are clipped to it, sorted, and the
    survivors fall out of one LAG pass ([prev_end, next_blackout_start)
    per blackout, plus the [last_blackout_end, island_end) tail per
    island via a grouped MAX — islands with no overlap pass through
    whole in the same branch). Every boundary is a timestamp
    comparison — no floats anywhere.

    Scale: islands are user-keyed; the blackout join broadcasts the
    day-sized table; the LAG window partitions on (user, island) —
    per-partition rows = overlapping blackouts, bounded by island
    span in days."""
    islands = interval_merge(spark, d).select(
        "user_id", "island_id", "island_start", "island_end"
    )
    days = (
        load(spark, d, "events")
        .select(F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    blk = days.select(
        (
            F.col("day").cast("timestamp")
            + F.expr(f"INTERVAL {BLACKOUT_START_H} HOURS")
        ).alias("bs"),
        (
            F.col("day").cast("timestamp")
            + F.expr(f"INTERVAL {BLACKOUT_END_H} HOURS")
        ).alias("be"),
    )
    ov = islands.join(
        F.broadcast(blk),
        (F.col("bs") < F.col("island_end"))
        & (F.col("island_start") < F.col("be")),
    ).select(
        "user_id",
        "island_id",
        "island_start",
        "island_end",
        F.greatest("bs", "island_start").alias("cs"),
        F.least("be", "island_end").alias("ce"),
    )
    w = Window.partitionBy("user_id", "island_id").orderBy("cs")
    mids = ov.select(
        "user_id",
        "island_id",
        F.coalesce(F.lag("ce").over(w), F.col("island_start")).alias(
            "seg_start"
        ),
        F.col("cs").alias("seg_end"),
    )
    tails = (
        islands.join(
            ov.select(
                F.col("user_id").alias("ou"),
                F.col("island_id").alias("oi"),
                "ce",
            ),
            (F.col("user_id") == F.col("ou"))
            & (F.col("island_id") == F.col("oi")),
            "left",
        )
        .groupBy("user_id", "island_id", "island_start", "island_end")
        .agg(F.max("ce").alias("mce"))
        .select(
            "user_id",
            "island_id",
            F.coalesce(F.col("mce"), F.col("island_start")).alias(
                "seg_start"
            ),
            F.col("island_end").alias("seg_end"),
        )
    )
    segs = mids.unionByName(tails)
    return segs.where(F.col("seg_start") < F.col("seg_end")).select(
        "user_id",
        F.col("island_id").cast("long").alias("island_id"),
        "seg_start",
        "seg_end",
        F.expr(
            "(unix_micros(seg_end) - unix_micros(seg_start)) div 60000000"
        ).alias("seg_minutes"),
    )


# --- per-session feature profile -----------------------------------------


def _session_profile_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    return f"""
    WITH labeled AS ({ORACLES["sessionize"]}),
    ev AS (
      SELECT l.user_id, l.session_num, l.ts, e.event_type, e.value
      FROM labeled l JOIN events e ON e.event_id = l.event_id
    )
    SELECT user_id,
           CAST(session_num AS BIGINT) AS session_num,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_s,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS n_purchases,
           COUNT(*) = 1 AS is_bounce,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS total_value
    FROM ev GROUP BY user_id, session_num
    """


@register("features_session_profile", oracle=_session_profile_oracle())
def features_session_profile(spark: SparkSession, d: str) -> DataFrame:
    """PER-SESSION FEATURE PROFILE — the session-grain feature table a
    personalization / churn model trains on, composed directly on
    ``sessionize``'s event labeling: duration, event count and
    diversity, purchase count, the bounce flag (single-event
    sessions — THE engagement metric), and the DECIMAL-exact value
    sum. Completes the grain ladder: event-grain (sessionize) →
    session-grain (this) → user-grain (features_user_velocity).

    Scale: sessionize's one user-keyed shuffle already colocates each
    session's events, so this rollup adds only a map-side-combinable
    aggregate on (user, session) — no new exchange of the fact
    table."""
    labeled = sessionize(spark, d).select(
        "event_id", "user_id", "session_num"
    )
    ev = load(spark, d, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    j = labeled.join(ev, "event_id")
    return j.groupBy("user_id", "session_num").agg(
        F.min("ts").alias("session_start"),
        F.count("*").cast("long").alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        )
        .cast("long")
        .alias("duration_s"),
        F.count_distinct("event_type").cast("long").alias("n_event_types"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("n_purchases"),
        (F.count("*") == 1).alias("is_bounce"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    ).select(
        "user_id",
        F.col("session_num").cast("long").alias("session_num"),
        "session_start",
        "n_events",
        "duration_s",
        "n_event_types",
        "n_purchases",
        "is_bounce",
        "total_value",
    )
