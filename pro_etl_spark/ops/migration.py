"""The flagship migration-reconciliation pipeline (SURVEY §3, §7.4).

This is the reference's essential computation re-expressed set-based:
a mapping table (the CSV of migrate.py:78-85) is deduplicated
first-row-wins (J4), validated (null default + regex domain,
migrate.py:136-150), joined against the customer corpus (the XML of
migrate.py:88-115) and split semi/anti into OK / Not OK / Not-found log
rows (migrate.py:259-266) — one declarative plan instead of an O(M·N)
per-row XPath loop.

The mapping table is derived *deterministically* from the flat
``customer`` table (per FIXTURES.md A1's edge-case inventory: unknown
keys → anti path, duplicate keys → first-wins, NULL/invalid
delivery_day → default/advisory-invalid), so the DuckDB oracle can
reconstruct it exactly.

Scale: mapping ≪ corpus, so the join broadcasts the mapping side —
the 100 TB customer corpus never shuffles; validation and status
derivation are per-row narrow expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.registry import register

DELIVERY_RE = r"^-[1-9]D$"
REASON_OK = "Found in source XML file"
REASON_INVALID = "Invalid value! Please check CSV input file (delivery_day)"
REASON_NOT_FOUND = "Not found in source XML"


def mapping_df(spark: SparkSession, d: str) -> DataFrame:
    """Deterministic migration-list stand-in (FIXTURES.md A1).

    - known keys:    every 3rd custkey
    - unknown keys:  every 15th custkey shifted by +1_000_000 (anti path)
    - duplicate keys: every 9th custkey repeated with ord=1 (first-wins)
    - delivery_day:  NULL (→ default), '-12D' (invalid), '-9D', '-3D'
    - mandatory_reference: 'true' / 'false' / NULL / 'TRUE' (lower-cased later)
    """
    c = load(spark, d, "customer")
    k = F.col("c_custkey")

    def row(cur, ord_):
        return [
            cur.cast("string").alias("current_customer_id"),
            F.concat(F.lit("X"), cur.cast("string")).alias("new_customer_id"),
            F.concat(F.lit("SRC"), (k % 3).cast("string")).alias("new_source_id"),
            F.concat(F.lit("ST"), ((k % 7) + ord_).cast("string")).alias("new_store_id"),
            F.concat(F.lit("Store "), ((k % 7) + ord_).cast("string")).alias("new_store_name"),
            F.when(k % 4 == 0, "true")
            .when(k % 4 == 1, "false")
            .when(k % 4 == 2, F.lit(None).cast("string"))
            .otherwise("TRUE")
            .alias("mandatory_reference"),
            F.when(k % 7 == 0, F.lit(None).cast("string"))
            .when(k % 7 == 1, "-12D")
            .when(k % 7 == 2, "-9D")
            .otherwise("-3D")
            .alias("delivery_day"),
            F.lit(ord_).alias("ord"),
        ]

    known = c.where(k % 3 == 0).select(*row(k, 0))
    unknown = c.where(k % 15 == 0).select(*row(k + 1000000, 0))
    dups = c.where(k % 9 == 0).select(*row(k, 1))
    return known.unionByName(unknown).unionByName(dups)


#: oracle-side reconstruction of mapping_df (kept in lockstep)
MAPPING_SQL = """
WITH raw_mapping AS (
  SELECT CAST(c_custkey AS VARCHAR) AS current_customer_id,
         'X' || CAST(c_custkey AS VARCHAR) AS new_customer_id,
         'SRC' || CAST(c_custkey % 3 AS VARCHAR) AS new_source_id,
         'ST' || CAST(c_custkey % 7 AS VARCHAR) AS new_store_id,
         'Store ' || CAST(c_custkey % 7 AS VARCHAR) AS new_store_name,
         CASE c_custkey % 4 WHEN 0 THEN 'true' WHEN 1 THEN 'false'
                            WHEN 2 THEN NULL ELSE 'TRUE' END AS mandatory_reference,
         CASE c_custkey % 7 WHEN 0 THEN NULL WHEN 1 THEN '-12D'
                            WHEN 2 THEN '-9D' ELSE '-3D' END AS delivery_day,
         0 AS ord
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT CAST(c_custkey + 1000000 AS VARCHAR),
         'X' || CAST(c_custkey + 1000000 AS VARCHAR),
         'SRC' || CAST(c_custkey % 3 AS VARCHAR),
         'ST' || CAST(c_custkey % 7 AS VARCHAR),
         'Store ' || CAST(c_custkey % 7 AS VARCHAR),
         CASE c_custkey % 4 WHEN 0 THEN 'true' WHEN 1 THEN 'false'
                            WHEN 2 THEN NULL ELSE 'TRUE' END,
         CASE c_custkey % 7 WHEN 0 THEN NULL WHEN 1 THEN '-12D'
                            WHEN 2 THEN '-9D' ELSE '-3D' END,
         0
  FROM customer WHERE c_custkey % 15 = 0
  UNION ALL
  SELECT CAST(c_custkey AS VARCHAR),
         'X' || CAST(c_custkey AS VARCHAR),
         'SRC' || CAST(c_custkey % 3 AS VARCHAR),
         'ST' || CAST(c_custkey % 7 + 1 AS VARCHAR),
         'Store ' || CAST(c_custkey % 7 + 1 AS VARCHAR),
         CASE c_custkey % 4 WHEN 0 THEN 'true' WHEN 1 THEN 'false'
                            WHEN 2 THEN NULL ELSE 'TRUE' END,
         CASE c_custkey % 7 WHEN 0 THEN NULL WHEN 1 THEN '-12D'
                            WHEN 2 THEN '-9D' ELSE '-3D' END,
         1
  FROM customer WHERE c_custkey % 9 = 0
)
"""

MAPPING_DEDUP_SQL = """
, mapping AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY current_customer_id
                                 ORDER BY ord, new_store_id) AS rn
    FROM raw_mapping
  ) WHERE rn = 1
)
"""


def reconciliation(spark: SparkSession, d: str) -> DataFrame:
    """mapping → dedup first-wins → validate → broadcast-join corpus →
    status/reason log (the whole of migrate.py:108-270 as one plan)."""
    m = mapping_df(spark, d)
    w = Window.partitionBy("current_customer_id").orderBy("ord", "new_store_id")
    m = (
        m.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "ord")
    )
    m = m.withColumn(
        "delivery_final",
        F.coalesce(F.nullif(F.col("delivery_day"), F.lit("")), F.lit("-3D")),
    ).withColumn("delivery_valid", F.col("delivery_final").rlike(DELIVERY_RE))

    corpus = load(spark, d, "customer").select(
        F.col("c_custkey").cast("string").alias("id")
    )
    # 100 TB posture: a plain mapping-LEFT-JOIN-corpus would have to
    # shuffle the huge corpus (Spark cannot broadcast the preserved
    # side of an outer join). Instead: (1) broadcast the small key set
    # into a semi-join that filters the corpus to matched ids — a
    # narrow, shuffle-free scan of the big side; (2) left-join the
    # mapping against that now-tiny id set, broadcast on the right.
    keys = m.select("current_customer_id")
    matched_ids = corpus.join(
        F.broadcast(keys), corpus.id == keys.current_customer_id, "left_semi"
    )
    joined = m.join(
        F.broadcast(matched_ids), m.current_customer_id == matched_ids.id, "left"
    )
    return joined.select(
        F.col("current_customer_id").alias("current_id"),
        F.col("new_customer_id").alias("new_id"),
        F.when(F.col("id").isNull(), "Not OK")
        .when(~F.col("delivery_valid"), "Not OK")
        .otherwise("OK")
        .alias("status"),
        F.when(F.col("id").isNull(), REASON_NOT_FOUND)
        .when(~F.col("delivery_valid"), REASON_INVALID)
        .otherwise(REASON_OK)
        .alias("reason"),
    )


@register(
    "migration_reconciliation",
    oracle=MAPPING_SQL
    + MAPPING_DEDUP_SQL
    + f"""
    SELECT m.current_customer_id AS current_id,
           m.new_customer_id AS new_id,
           CASE WHEN c.c_custkey IS NULL THEN 'Not OK'
                WHEN NOT regexp_matches(COALESCE(NULLIF(m.delivery_day, ''), '-3D'),
                                        '^-[1-9]D$') THEN 'Not OK'
                ELSE 'OK' END AS status,
           CASE WHEN c.c_custkey IS NULL THEN '{REASON_NOT_FOUND}'
                WHEN NOT regexp_matches(COALESCE(NULLIF(m.delivery_day, ''), '-3D'),
                                        '^-[1-9]D$') THEN '{REASON_INVALID}'
                ELSE '{REASON_OK}' END AS reason
    FROM mapping m
    LEFT JOIN customer c ON m.current_customer_id = CAST(c.c_custkey AS VARCHAR)
    """,
)
def migration_reconciliation(spark: SparkSession, d: str) -> DataFrame:
    """Flagship: the reference's reconciliation log
    (current_id, new_id, status ∈ {OK, Not OK}, reason) —
    migrate.py:103-104/259-270 semantics, advisory-validation policy
    (§2.11.4: invalid rows still flow, only the log flags them)."""
    return reconciliation(spark, d)


@register(
    "migration_summary",
    oracle=MAPPING_SQL
    + MAPPING_DEDUP_SQL
    + f"""
    , log AS (
      SELECT CASE WHEN c.c_custkey IS NULL THEN 'Not OK'
                  WHEN NOT regexp_matches(COALESCE(NULLIF(m.delivery_day, ''), '-3D'),
                                          '^-[1-9]D$') THEN 'Not OK'
                  ELSE 'OK' END AS status,
             CASE WHEN c.c_custkey IS NULL THEN '{REASON_NOT_FOUND}'
                  WHEN NOT regexp_matches(COALESCE(NULLIF(m.delivery_day, ''), '-3D'),
                                          '^-[1-9]D$') THEN '{REASON_INVALID}'
                  ELSE '{REASON_OK}' END AS reason
      FROM mapping m
      LEFT JOIN customer c ON m.current_customer_id = CAST(c.c_custkey AS VARCHAR)
    )
    SELECT status, reason, COUNT(*) AS n FROM log GROUP BY status, reason
    """,
)
def migration_summary(spark: SparkSession, d: str) -> DataFrame:
    """A2/A3: the found/total reconciliation rollup the reference
    prints (migrate.py:272) — a groupBy over the same single plan
    (§3.3: no second pass over the data)."""
    return reconciliation(spark, d).groupBy("status", "reason").agg(
        F.count("*").alias("n")
    )
