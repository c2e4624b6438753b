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
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql.types import ArrayType, DataType, StringType, StructType

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


#: run timestamp written into profile/creation-date (migrate.py:97 uses
#: now(); pinned here so the oracle is deterministic)
RUN_TS = "2026-08-13T00:00:00+00:00"


#: struct fields of the canonical user shape that serialize as XML
#: *attributes*, not element text — the reference's id-rewrite loop
#: (``for element in user.iter(): if element.text == current_id``,
#: migrate.py:223-225) touches text nodes only, so these are exempt.
#: (``business_partner_no`` is an attribute too, but the reference
#: rewrites it under the same equals-old-id condition, migrate.py:221-222,
#: so it is NOT exempt.)
_XML_ATTR_FIELDS = frozenset({"name", "dt"})
_XML_ATTR_ARRAYS = frozenset({"user_groups"})


def _rewrite_id_nodes(col: Column, dtype: DataType, subst, path=()) -> Column:
    """Schema-driven generalized subtree id-rewrite (migrate.py:221-225):
    apply ``subst`` to EVERY string field in the user subtree except the
    fields that serialize as XML attributes the reference never
    id-rewrites (user-group ids, custom-attribute name/dt:dt). Works on
    any user schema — the ops corpus (credentials.last_logged_in/last_ip)
    and the CLI XML shape (credentials.login) alike — so a login equal
    to the old customer id is rewritten exactly as the reference does."""
    if isinstance(dtype, StringType):
        leaf = path[-1] if path else ""
        parent = path[-2] if len(path) > 1 else ""
        if leaf in _XML_ATTR_FIELDS or parent in _XML_ATTR_ARRAYS:
            return col
        return subst(col)
    if isinstance(dtype, StructType):
        return F.struct(
            *[
                _rewrite_id_nodes(
                    col[f.name], f.dataType, subst, path + (f.name,)
                ).alias(f.name)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, ArrayType):
        return F.transform(
            col,
            lambda e: _rewrite_id_nodes(e, dtype.elementType, subst, path + ("[]",)),
        )
    return col


def apply_migration(
    nested: DataFrame, mapping: DataFrame, run_ts: str = RUN_TS
) -> DataFrame:
    """The reference's whole per-customer transform (migrate.py:116-257)
    as one immutable Column-expression chain over the nested docs:

    - id := new_customer_id                        (migrate.py:153)
    - attr rewrites by name: MEK_Store_Id /
      MEK_WarehouseID → new_store_id, MEK_Store_Name → new_store_name,
      MEK_DataAreaID / MEK_SourceID → new_source_id (migrate.py:161-173)
    - upsert MEK_DefaultDeliveryday (dt:dt=string, default '-3D')
                                                   (migrate.py:143-150, 181-200)
    - upsert MEK_CustomerOrderNumberMandatory (dt:dt=boolean,
      lower-cased) only when mapped value is non-null
                                                   (migrate.py:203-216; isNotNull
                                                    per SURVEY §2.11.2, not the
                                                    reference's NaN bug)
    - per user: business-partner-no := new id when it equals the old id
                                                   (migrate.py:221-222)
      · any descendant text field equal to the old id := new id —
        default_customer, credentials.login, custom-attribute values
        (schema-driven, see ``_rewrite_id_nodes``)
                                                   (migrate.py:223-225)
      · add CG_Mekonomen to user-groups if absent  (migrate.py:227-234)
      · delete LastOrderDate attr                  (migrate.py:236-240)
      · delete credentials/last-logged-in          (migrate.py:242-247)
      · profile/creation-date := run date          (migrate.py:249-254)

    Advisory validation (§2.11.4): invalid delivery_day rows still flow
    through this transform — only the reconciliation log flags them.

    Join strategy: mapping ≪ corpus ⇒ broadcast inner join; the corpus
    side stays narrow (no shuffle), the transform is per-row expressions.
    """
    j = nested.join(
        F.broadcast(mapping),
        nested["id"] == mapping["current_customer_id"],
        "inner",
    )
    # bind to the source frames, not F.col: the final select aliases its
    # output column "id", and name-based refs inside lambdas resolve
    # against the select's own aliases (verified on Spark 4.1)
    old_id = nested["id"]
    new_id = mapping["new_customer_id"]
    delivery = F.coalesce(F.nullif(F.col("delivery_day"), F.lit("")), F.lit("-3D"))
    mandatory = F.lower(F.col("mandatory_reference"))

    def rewrite_attr(a: Column) -> Column:
        value = (
            F.when(a["name"].isin("MEK_Store_Id", "MEK_WarehouseID"), F.col("new_store_id"))
            .when(a["name"] == "MEK_Store_Name", F.col("new_store_name"))
            .when(a["name"].isin("MEK_DataAreaID", "MEK_SourceID"), F.col("new_source_id"))
            .otherwise(a["value"])
        )
        return F.struct(a["name"].alias("name"), a["dt"].alias("dt"), value.alias("value"))

    from pro_etl_spark.ops.nested import attr_upsert

    attrs = F.transform(F.col("custom_attributes"), rewrite_attr)
    attrs = attr_upsert(attrs, "MEK_DefaultDeliveryday", "string", delivery, delivery)
    attrs = F.when(
        mandatory.isNotNull(),
        attr_upsert(
            attrs, "MEK_CustomerOrderNumberMandatory", "boolean", mandatory, mandatory
        ),
    ).otherwise(attrs)

    user_type = nested.schema["users"].dataType.elementType

    def subst(c: Column) -> Column:
        return F.when(c == old_id, new_id).otherwise(c)

    def rewrite_user(u: Column) -> Column:
        # generalized subtree id-rewrite (migrate.py:221-225): EVERY
        # text-node field equal to the old id becomes the new id —
        # default_customer, credentials.login, custom-attribute values —
        # and business-partner-no under the same condition
        # (migrate.py:221-222: set only when it equals the old id)
        u = _rewrite_id_nodes(u, user_type, subst)
        u = u.withField(
            "user_groups",
            F.when(
                F.array_contains(u["user_groups"], "CG_Mekonomen"), u["user_groups"]
            ).otherwise(F.concat(u["user_groups"], F.array(F.lit("CG_Mekonomen")))),
        )
        u = u.withField(
            "custom_attributes",
            F.filter(u["custom_attributes"], lambda a: a["name"] != "LastOrderDate"),
        )
        u = u.withField("credentials", u["credentials"].dropFields("last_logged_in"))
        u = u.withField("profile.creation_date", F.lit(run_ts))
        return u

    return j.select(
        new_id.alias("id"),
        attrs.alias("custom_attributes"),
        F.transform(F.col("users"), rewrite_user).alias("users"),
    )


@register(
    "migration_transform",
    oracle=MAPPING_SQL
    + MAPPING_DEDUP_SQL
    + f"""
    , matched AS (
      SELECT c.c_custkey AS key, m.*
      FROM mapping m
      JOIN customer c ON m.current_customer_id = CAST(c.c_custkey AS VARCHAR)
    ), users AS (
      SELECT key, 0 AS user_no FROM matched
      UNION ALL
      SELECT key, 1 FROM matched WHERE key % 10 = 0
    )
    SELECT m.new_customer_id AS id,
           2 + 1 + CASE WHEN lower(m.mandatory_reference) IS NOT NULL
                        THEN 1 ELSE 0 END AS n_attrs,
           COALESCE(NULLIF(m.delivery_day, ''), '-3D') AS delivery_value,
           lower(m.mandatory_reference) AS mandatory_value,
           m.new_store_id AS store_id_value,
           -- bp-no is rewritten only when it equals the old id
           -- (migrate.py:221-222); the synthetic corpus prefixes it
           -- 'BP', so it never matches and survives unchanged
           'BP' || CAST(u.key AS VARCHAR) || '-' || CAST(u.user_no AS VARCHAR)
             AS business_partner_no,
           m.new_customer_id AS default_customer,
           TRUE AS in_mek_group,
           FALSE AS has_last_order_date,
           '{RUN_TS}' AS creation_date
    FROM matched m JOIN users u ON m.key = u.key
    """,
)
def migration_transform(spark: SparkSession, d: str) -> DataFrame:
    """The reference's *output document* (the delta XML content,
    migrate.py:256-257), flattened one row per (customer, user) so the
    oracle can verify every transformed field: rewritten id/store attrs,
    delivery-day upsert with default, boolean-typed mandatory flag,
    FK + subtree id rewrite, group insert, attr/credential deletion,
    and creation-date overwrite.

    Note the nested build gives every matched customer (key%3==0) a
    pre-existing MEK_DefaultDeliveryday ('-5D'), so n_attrs counts the
    *update* branch of that upsert; the insert branch is covered by
    ``arr_upsert``.
    """
    from pro_etl_spark.ops.nested import nested_customers

    nested = nested_customers(spark, d).drop("key")
    m = mapping_df(spark, d)
    w = Window.partitionBy("current_customer_id").orderBy("ord", "new_store_id")
    m = m.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn", "ord")
    out = apply_migration(nested, m)
    attr = lambda name: F.get(  # noqa: E731
        F.filter(F.col("custom_attributes"), lambda a: a["name"] == name), 0
    )["value"]
    return out.select(
        "id",
        F.size("custom_attributes").alias("n_attrs"),
        attr("MEK_DefaultDeliveryday").alias("delivery_value"),
        attr("MEK_CustomerOrderNumberMandatory").alias("mandatory_value"),
        attr("MEK_Store_Id").alias("store_id_value"),
        F.explode("users").alias("u"),
    ).select(
        "id",
        "n_attrs",
        "delivery_value",
        "mandatory_value",
        "store_id_value",
        F.col("u.business_partner_no").alias("business_partner_no"),
        F.col("u.default_customer").alias("default_customer"),
        F.array_contains("u.user_groups", "CG_Mekonomen").alias("in_mek_group"),
        F.exists(
            "u.custom_attributes", lambda a: a["name"] == "LastOrderDate"
        ).alias("has_last_order_date"),
        F.col("u.profile.creation_date").alias("creation_date"),
    )


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
