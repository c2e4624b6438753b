"""Nested-record transform library (SURVEY §2.8 F9–F15, §2.10 X4).

The reference's inner loop (migrate.py:116-257) mutates a nested XML
customer document: conditional attribute-array rewrites, upserts,
element deletion, struct-field overwrite/delete, and a subtree key
rewrite. Here the same semantics are pure Column expressions over the
canonical nested schema (SURVEY §1.5):

    id string,
    custom_attributes array<struct<name,dt,value>>,
    users array<struct<business_partner_no, default_customer,
                       profile struct<creation_date>,
                       credentials struct<last_logged_in, last_ip>,
                       user_groups array<string>,
                       custom_attributes array<struct<name,dt,value>>>>

Because the driver's testdata has no nested table, ``nested_customers``
builds one *deterministically* from the flat ``customer`` table (pure
projection — no shuffle, no UDF), and every query flattens its result
back to relational rows so the DuckDB oracle can recompute it from
first principles. All transforms are `F.transform`/`F.filter`/
`F.exists`/`withField`/`dropFields` — JVM-side, zero Python UDFs,
single narrow stage: at 100 TB this runs embarrassingly parallel with
no shuffle at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from pro_etl_spark.io import load
from pro_etl_spark.registry import register


def _attr(name: str, dt: str, value: Column) -> Column:
    return F.struct(
        F.lit(name).alias("name"), F.lit(dt).alias("dt"), value.alias("value")
    )


def attr_upsert(
    arr: Column, name: str, dt: str, on_update: Column, on_insert: Column
) -> Column:
    """F11 combinator — update the named attribute in place when it
    exists (value := on_update, dt retagged), append
    ``(name, dt, on_insert)`` otherwise (migrate.py:186-216). Shared by
    the standalone ``arr_upsert`` operator and ``apply_migration``."""
    updated = F.transform(
        arr,
        lambda a: F.struct(
            a["name"].alias("name"),
            F.when(a["name"] == name, F.lit(dt)).otherwise(a["dt"]).alias("dt"),
            F.when(a["name"] == name, on_update).otherwise(a["value"]).alias("value"),
        ),
    )
    appended = F.concat(arr, F.array(_attr(name, dt, on_insert)))
    return F.when(F.exists(arr, lambda a: a["name"] == name), updated).otherwise(
        appended
    )


def nested_customers(spark: SparkSession, d: str) -> DataFrame:
    """Deterministic nested stand-in for the reference's XML export
    (schema per SURVEY §1.2/§1.5; variety per FIXTURES.md A2: attrs
    present/absent, groups present/absent, 1-2 users, LastOrderDate
    present/absent, a field whose value equals the customer id)."""
    c = load(spark, d, "customer")
    k = F.col("c_custkey")
    ks = k.cast("string")

    base_attrs = F.array(
        _attr(
            "MEK_Company",
            "string",
            F.when(k % 2 == 0, F.lit("Mekonomen")).otherwise(F.col("c_mktsegment")),
        ),
        _attr("MEK_Store_Id", "string", F.col("c_nationkey").cast("string")),
    )
    attrs = F.when(
        k % 3 == 0,
        F.concat(base_attrs, F.array(_attr("MEK_DefaultDeliveryday", "string", F.lit("-5D")))),
    ).otherwise(base_attrs)

    def user(i: int) -> Column:
        return F.struct(
            F.concat(F.lit("BP"), ks, F.lit(f"-{i}")).alias("business_partner_no"),
            ks.alias("default_customer"),
            F.struct(F.lit("2020-01-01T00:00:00+00:00").alias("creation_date")).alias("profile"),
            F.struct(
                F.lit("2023-05-01T10:00:00").alias("last_logged_in"),
                F.lit("10.0.0.1").alias("last_ip"),
            ).alias("credentials"),
            F.when(k % 5 == 0, F.array(F.lit("CG_Mekonomen"), F.lit("CG_Other")))
            .otherwise(F.array(F.lit("CG_Other")))
            .alias("user_groups"),
            F.when(
                k % 2 == 1,
                F.array(
                    _attr("LastOrderDate", "string", F.lit("2023-12-24")),
                    _attr("Foo", "string", F.lit("bar")),
                ),
            )
            .otherwise(F.array(_attr("Foo", "string", F.lit("bar"))))
            .alias("custom_attributes"),
        )

    users = F.when(k % 10 == 0, F.array(user(0), user(1))).otherwise(F.array(user(0)))
    # cached: ~10 queries derive from this build, and Spark's
    # CacheManager matches by logical plan, so every invocation in the
    # same session (the driver's whole sweep) shares one materialization
    return c.select(
        ks.alias("id"),
        k.alias("key"),
        attrs.alias("custom_attributes"),
        users.alias("users"),
    ).cache()


#: oracle-side flat reconstruction of the same nested build
_BASE = """
WITH base AS (
  SELECT c_custkey AS key, CAST(c_custkey AS VARCHAR) AS id,
         c_mktsegment, c_nationkey
  FROM customer
)
"""


@register(
    "scan_nested",
    oracle=_BASE
    + """
    SELECT id,
           2 + CASE WHEN key % 3 = 0 THEN 1 ELSE 0 END AS n_attrs,
           1 + CASE WHEN key % 10 = 0 THEN 1 ELSE 0 END AS n_users
    FROM base
    """,
)
def scan_nested(spark: SparkSession, d: str) -> DataFrame:
    """S4: nested-document scan (XML rowTag=customer in the reference,
    migrate.py:88-91; parquet-backed nested rows here). Returns shape
    stats per document."""
    n = nested_customers(spark, d)
    return n.select(
        "id",
        F.size("custom_attributes").alias("n_attrs"),
        F.size("users").alias("n_users"),
    )


@register(
    "explode_attrs",
    oracle=_BASE
    + """
    SELECT id, 0 AS pos, 'MEK_Company' AS name, 'string' AS dt,
           CASE WHEN key % 2 = 0 THEN 'Mekonomen' ELSE c_mktsegment END AS value
    FROM base
    UNION ALL
    SELECT id, 1, 'MEK_Store_Id', 'string', CAST(c_nationkey AS VARCHAR) FROM base
    UNION ALL
    SELECT id, 2, 'MEK_DefaultDeliveryday', 'string', '-5D' FROM base WHERE key % 3 = 0
    """,
)
def explode_attrs(spark: SparkSession, d: str) -> DataFrame:
    """X4: generator/UDTF surface — posexplode the attribute array into
    the relational view the DuckDB oracle consumes (SURVEY §2.10)."""
    n = nested_customers(spark, d)
    return n.select(
        "id", F.posexplode("custom_attributes").alias("pos", "attr")
    ).select("id", "pos", "attr.name", "attr.dt", "attr.value")


@register(
    "arr_transform",
    oracle=_BASE
    + """
    SELECT id, 'MEK_Company' AS name,
           CASE WHEN key % 2 = 0 THEN 'Meca' ELSE c_mktsegment END AS value
    FROM base
    UNION ALL
    SELECT id, 'MEK_Store_Id', 'ST-' || CAST(c_nationkey AS VARCHAR) FROM base
    UNION ALL
    SELECT id, 'MEK_DefaultDeliveryday', '-5D' FROM base WHERE key % 3 = 0
    """,
)
def arr_transform(spark: SparkSession, d: str) -> DataFrame:
    """F9: per-element conditional rewrite of the attribute array — the
    reference's if/elif chain over custom-attributes (migrate.py:161-183:
    MEK_Company 'Mekonomen'→'Meca', store-id rewrite) as one
    `F.transform` pass."""
    n = nested_customers(spark, d)
    rewritten = F.transform(
        F.col("custom_attributes"),
        lambda a: F.struct(
            a["name"].alias("name"),
            a["dt"].alias("dt"),
            F.when((a["name"] == "MEK_Company") & (a["value"] == "Mekonomen"), F.lit("Meca"))
            .when(a["name"] == "MEK_Store_Id", F.concat(F.lit("ST-"), a["value"]))
            .otherwise(a["value"])
            .alias("value"),
        ),
    )
    return (
        n.select("id", F.explode(rewritten).alias("attr"))
        .select("id", "attr.name", "attr.value")
    )


@register(
    "arr_exists",
    oracle=_BASE
    + """
    SELECT id,
           key % 3 = 0 AS has_delivery,
           key % 5 = 0 AS has_mek_group
    FROM base
    """,
)
def arr_exists(spark: SparkSession, d: str) -> DataFrame:
    """F10: existence probes — attr-by-name (migrate.py:158-159,191,207)
    and group membership through the nested users array
    (migrate.py:230: ``'CG_Mekonomen' not in existing_ids``)."""
    n = nested_customers(spark, d)
    return n.select(
        "id",
        F.exists("custom_attributes", lambda a: a["name"] == "MEK_DefaultDeliveryday").alias(
            "has_delivery"
        ),
        F.exists(
            "users", lambda u: F.array_contains(u["user_groups"], "CG_Mekonomen")
        ).alias("has_mek_group"),
    )


@register(
    "arr_upsert",
    oracle=_BASE
    + """
    SELECT id, 'MEK_Company' AS name, 'string' AS dt,
           CASE WHEN key % 2 = 0 THEN 'Mekonomen' ELSE c_mktsegment END AS value
    FROM base
    UNION ALL
    SELECT id, 'MEK_Store_Id', 'string', CAST(c_nationkey AS VARCHAR) FROM base
    UNION ALL
    SELECT id, 'MEK_DefaultDeliveryday', 'string',
           CASE WHEN key % 3 = 0 THEN '-2D' ELSE '-3D' END
    FROM base
    UNION ALL
    SELECT id, 'MEK_CustomerOrderNumberMandatory', 'boolean', 'true' FROM base
    """,
)
def arr_upsert(spark: SparkSession, d: str) -> DataFrame:
    """F11: array upsert — update-in-place when the attribute exists,
    append otherwise (migrate.py:186-216). Delivery-day takes the
    mapped value when present and the '-3D' default when appended
    (migrate.py:143-144); the mandatory flag is typed dt:dt=boolean
    with lower-cased text (migrate.py:210-216)."""
    n = nested_customers(spark, d)
    arr = attr_upsert(
        F.col("custom_attributes"),
        "MEK_DefaultDeliveryday",
        "string",
        F.lit("-2D"),
        F.lit("-3D"),
    )
    arr = attr_upsert(
        arr,
        "MEK_CustomerOrderNumberMandatory",
        "boolean",
        F.lower(F.lit("TRUE")),
        F.lower(F.lit("TRUE")),
    )
    return (
        n.select("id", F.explode(arr).alias("attr"))
        .select("id", "attr.name", "attr.dt", "attr.value")
    )


_USERS = """
, users AS (
  SELECT key, id, 0 AS user_no FROM base
  UNION ALL
  SELECT key, id, 1 AS user_no FROM base WHERE key % 10 = 0
)
"""


@register(
    "arr_filter",
    oracle=_BASE
    + _USERS
    + """
    SELECT id, 'BP' || id || '-' || CAST(user_no AS VARCHAR) AS business_partner_no,
           'Foo' AS attr_name, 'bar' AS attr_value
    FROM users
    """,
)
def arr_filter(spark: SparkSession, d: str) -> DataFrame:
    """F12: array-element deletion by predicate — the reference removes
    every LastOrderDate attribute from each user (migrate.py:236-240)."""
    n = nested_customers(spark, d)
    cleaned = F.transform(
        F.col("users"),
        lambda u: u.withField(
            "custom_attributes",
            F.filter(u["custom_attributes"], lambda a: a["name"] != "LastOrderDate"),
        ),
    )
    return (
        n.select("id", F.explode(cleaned).alias("u"))
        .select("id", F.col("u.business_partner_no").alias("business_partner_no"),
                F.explode("u.custom_attributes").alias("attr"))
        .select("id", "business_partner_no",
                F.col("attr.name").alias("attr_name"),
                F.col("attr.value").alias("attr_value"))
    )


@register(
    "struct_dropfield",
    oracle=_BASE
    + _USERS
    + """
    SELECT id, 'BP' || id || '-' || CAST(user_no AS VARCHAR) AS business_partner_no,
           '{"last_ip":"10.0.0.1"}' AS credentials_json
    FROM users
    """,
)
def struct_dropfield(spark: SparkSession, d: str) -> DataFrame:
    """F13: nested struct-field removal — delete
    credentials/last-logged-in (migrate.py:242-247) via dropFields."""
    n = nested_customers(spark, d)
    cleaned = F.transform(
        F.col("users"),
        lambda u: u.withField("credentials", u["credentials"].dropFields("last_logged_in")),
    )
    return (
        n.select("id", F.explode(cleaned).alias("u"))
        .select(
            "id",
            F.col("u.business_partner_no").alias("business_partner_no"),
            F.to_json("u.credentials").alias("credentials_json"),
        )
    )


@register(
    "struct_withfield",
    oracle=_BASE
    + _USERS
    + """
    SELECT id, 'X' || id AS business_partner_no,
           '2024-06-01T00:00:00+00:00' AS creation_date
    FROM users
    """,
)
def struct_withfield(spark: SparkSession, d: str) -> DataFrame:
    """F14: nested struct-field overwrite — business-partner-no := new
    customer id (migrate.py:221-222) and profile/creation-date := run
    date (migrate.py:249-254)."""
    n = nested_customers(spark, d)
    new_id = F.concat(F.lit("X"), F.col("id"))
    rewritten = F.transform(
        F.col("users"),
        lambda u: u.withField("business_partner_no", new_id).withField(
            "profile",
            F.struct(F.lit("2024-06-01T00:00:00+00:00").alias("creation_date")),
        ),
    )
    return (
        n.select("id", F.explode(rewritten).alias("u"))
        .select(
            "id",
            F.col("u.business_partner_no").alias("business_partner_no"),
            F.col("u.profile.creation_date").alias("creation_date"),
        )
    )


@register(
    "subtree_rewrite",
    oracle=_BASE
    + _USERS
    + """
    SELECT 'X' || id AS new_id,
           'BP' || id || '-' || CAST(user_no AS VARCHAR) AS business_partner_no,
           'X' || id AS default_customer
    FROM users
    """,
)
def subtree_rewrite(spark: SparkSession, d: str) -> DataFrame:
    """F15: schema-opaque subtree rewrite — the reference replaces the
    text of *any* descendant element equal to the old customer id
    (migrate.py:223-225). JSON round-trip fallback (SURVEY §7.3.2):
    to_json → regexp_replace of the exact-quoted old id → from_json.
    Only exact full-string matches rewrite (BP<id>-0 is untouched),
    matching lxml's ``elem.text == customer_id`` test."""
    n = nested_customers(spark, d)
    users_type = dict(zip(n.schema.names, [f.dataType for f in n.schema.fields]))["users"]
    old_q = F.concat(F.lit('"'), F.col("id"), F.lit('"'))
    new_q = F.concat(F.lit('"X'), F.col("id"), F.lit('"'))
    rewritten = F.from_json(
        F.regexp_replace(F.to_json(F.col("users")), old_q, new_q), users_type
    )
    return (
        n.select(
            F.concat(F.lit("X"), F.col("id")).alias("new_id"),
            F.explode(rewritten).alias("u"),
        )
        .select(
            "new_id",
            F.col("u.business_partner_no").alias("business_partner_no"),
            F.col("u.default_customer").alias("default_customer"),
        )
    )


@register(
    "fn_xpath",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_orderstatus AS status,
           o_totalprice AS total,
           CAST(o_orderpriority LIKE '1-%' AS BOOLEAN) AS is_urgent
    FROM orders WHERE o_orderkey % 16 = 0
    """,
)
def fn_xpath(spark: SparkSession, d: str) -> DataFrame:
    """XPath extraction scalars (Spark's ``xpath_long`` /
    ``xpath_string`` / ``xpath_double`` / ``xpath_boolean``) — the
    query-side complement of the reference's XPath-driven document
    surgery (migrate.py:116ff navigates customers with lxml XPath):
    each order is rendered as an XML fragment, then every field is
    recovered through a real XPath evaluation (attribute axis, child
    text(), numeric cast, boolean existence test). The oracle states
    the round-trip contract — extract(render(row)) == row — so any
    serialization or parsing drift hash-fails. Spark's double→string
    cast is shortest-roundtrip, so ``xpath_double`` recovers
    o_totalprice bit-exactly.

    Scale: narrow, no shuffle, no UDF — but each xpath_* call parses
    the document AGAIN (4 calls = 4 DOM parses per row; measured 49 s
    for 600k rows at sf0.1), so the op runs on a deterministic 1/16
    key sample: XPath scalars are for OCCASIONAL extraction. A bulk
    XML column at 100 TB gets parsed ONCE into a struct (from_xml
    with an explicit schema — the scan path scan_nested exercises)
    and fields come from struct access, not repeated XPath."""
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey").cast("string"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status><total>"),
        F.col("o_totalprice").cast("string"),
        F.lit('</total><priority level="'),
        F.col("o_orderpriority"),
        F.lit('"/></order>'),
    )
    return (
        load(spark, d, "orders")
        .where(F.col("o_orderkey") % 16 == 0)
        .select(xml.alias("xml"))
        .select(
            F.expr("xpath_long(xml, '/order/@id')").alias("order_id"),
            F.expr("xpath_string(xml, '/order/status/text()')").alias(
                "status"
            ),
            F.expr("xpath_double(xml, '/order/total/text()')").alias(
                "total"
            ),
            F.expr(
                'xpath_boolean(xml, \'/order/priority[starts-with(@level, "1-")]\')'
            ).alias("is_urgent"),
        )
    )


@register(
    "arr_ops_family",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT doc_id,
           CAST(COALESCE(list_position(toks, 'spark'), 0) AS INTEGER)
             AS spark_pos,
           len(list_filter(toks, x -> x <> 'the')) AS n_without_the,
           list_has_any(toks, ['join', 'merge']) AS mentions_join,
           -- COALESCE pins Spark's array_join semantics: an EMPTY
           -- match list renders '' there, but DuckDB's
           -- array_to_string([]) returns NULL (realized 13/295 rows
           -- at sf0.1 where a doc mentions none of the three ops)
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(toks, x -> x IN ('scan', 'sort', 'hash')))), ','),
             '') AS ops_found,
           toks[1] AS first_tok,
           toks[-1] AS last_tok
    FROM t
    """,
)
def arr_ops_family(spark: SparkSession, d: str) -> DataFrame:
    """Array-function surface beyond the HOF core: array_position
    (1-based locate, 0 = absent), array_remove-style filtered count,
    arrays_overlap set probe, the filter->distinct->sort->join
    normalization chain, and head/tail element access (negative
    index = from the end). These are the building blocks the dedup/
    text families compose implicitly; this key pins their exact
    cross-engine semantics — notably 1-BASED positions and
    NULL-vs-0 on absence — so a refactor can't silently shift
    indexing conventions.

    Scale: narrow in-row projection, pushed filter, no shuffle."""
    t = (
        load(spark, d, "documents")
        .where(F.col("doc_id") % 17 == 0)
        .select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
        )
    )
    toks = F.col("toks")
    return t.select(
        "doc_id",
        F.array_position(toks, "spark").cast("int").alias("spark_pos"),
        F.size(F.array_remove(toks, "the")).alias("n_without_the"),
        F.arrays_overlap(
            toks, F.array(F.lit("join"), F.lit("merge"))
        ).alias("mentions_join"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.filter(
                        toks,
                        lambda x: x.isin("scan", "sort", "hash"),
                    )
                )
            ),
            ",",
        ).alias("ops_found"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
    )
