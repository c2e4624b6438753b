"""Scalar function surface (SURVEY §2.8 F1–F8 + the *(gen)* math/map/
json additions).

The reference's scalar vocabulary is tiny — str(), strip(), lower(),
regex, f-string concat, strftime, uuid4, coalesce-with-default
(migrate.py:82-182, 97, 35, 143-144). Each is re-expressed as a
JVM-side Column expression (whole-stage-codegen'd, no Python in the
hot path), then generalized with math/map/json families the checklist
demands.

Determinism notes: double→int conversions use explicit floor() because
Spark CAST truncates while DuckDB CAST rounds; per-row float arithmetic
(a*b, round) is IEEE-deterministic and identical across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pro_etl_spark.io import load
from pro_etl_spark.registry import register


@register(
    "fn_cast",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, d: str) -> DataFrame:
    """F1: explicit casts (the reference str()-coerces everything at the
    XML boundary, migrate.py:82,109-110; typed internally here)."""
    o = load(spark, d, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "fn_trim",
    oracle="""
    SELECT c_custkey, TRIM('  ' || c_name || ' ') AS name_trimmed
    FROM customer
    """,
)
def fn_trim(spark: SparkSession, d: str) -> DataFrame:
    """F2: trim (migrate.py:110,120 strips ids before matching)."""
    return load(spark, d, "customer").select(
        "c_custkey",
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
    )


@register(
    "fn_lower",
    oracle="SELECT c_custkey, LOWER(c_mktsegment) AS segment_lower FROM customer",
)
def fn_lower(spark: SparkSession, d: str) -> DataFrame:
    """F3: lower-casing (the reference lower-cases boolean text,
    migrate.py:210,215)."""
    return load(spark, d, "customer").select(
        "c_custkey", F.lower("c_mktsegment").alias("segment_lower")
    )


@register(
    "fn_concat",
    oracle="""
    SELECT o_orderkey,
           'order-' || CAST(o_orderkey AS VARCHAR) || '/' || o_orderstatus AS tag
    FROM orders
    """,
)
def fn_concat(spark: SparkSession, d: str) -> DataFrame:
    """F5: string concatenation (the reference's f-string message/XPath
    building, migrate.py:115,287-288)."""
    return load(spark, d, "orders").select(
        "o_orderkey",
        F.concat(
            F.lit("order-"),
            F.col("o_orderkey").cast("string"),
            F.lit("/"),
            F.col("o_orderstatus"),
        ).alias("tag"),
    )


@register(
    "fn_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           strftime(o_orderdate, '%Y-%m-%dT00:00:00+00:00') AS order_ts_text
    FROM orders
    """,
)
def fn_date_format(spark: SparkSession, d: str) -> DataFrame:
    """F6: timestamp formatting — including the reference's exact
    creation-date format ``%Y-%m-%dT00:00:00+00:00`` (migrate.py:97)."""
    o = load(spark, d, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'00:00:00+00:00").alias("order_ts_text"),
    )


@register("fn_uuid")  # rows-only: uuid() is nondeterministic by design
def fn_uuid(spark: SparkSession, d: str) -> DataFrame:
    """F7: uuid literal per run (migrate.py:35 names outputs with
    uuid4). Nondeterministic → no value oracle; driver checks rows."""
    return load(spark, d, "orders").select(
        "o_orderkey", F.expr("uuid()").alias("run_id")
    )


@register(
    "fn_coalesce",
    oracle="""
    SELECT event_id,
           COALESCE(NULLIF(props, ''), '{"k": -3}') AS props_defaulted
    FROM events
    """,
)
def fn_coalesce(spark: SparkSession, d: str) -> DataFrame:
    """F8: coalesce-with-default — the reference's delivery_day → '-3D'
    defaulting (migrate.py:143-144), incl. empty-string-as-null."""
    return load(spark, d, "events").select(
        "event_id",
        F.coalesce(
            F.nullif(F.col("props"), F.lit("")), F.lit('{"k": -3}')
        ).alias("props_defaulted"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)), 2)
                AS DOUBLE) AS disc_price,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(POW(1 + l_tax, 2), 8) AS tax_sq,
           CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def fn_math(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: math functions (round/abs/pow/floor + arithmetic on the
    classic discounted-price expression). Absent in the reference; per-
    row IEEE arithmetic so Spark and DuckDB agree bit-for-bit."""
    li = load(spark, d, "lineitem").where(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # double-rounding at an .xx5 boundary differs between engines'
        # double ROUND; route through DECIMAL where HALF_UP is universal
        F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"), 2)
        .cast("double")
        .alias("disc_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 8).alias("tax_sq"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_from_map,
           o_orderpriority AS priority_from_map,
           2 AS map_size
    FROM orders
    """,
)
def fn_map(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: map functions — build a map from entry structs (the
    attr-array→map view of the reference's custom-attributes,
    SURVEY §2.8) and read it back with element_at. The oracle checks
    the round-trip invariant relationally."""
    o = load(spark, d, "orders")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("status").alias("key"), F.col("o_orderstatus").alias("value")),
            F.struct(F.lit("priority").alias("key"), F.col("o_orderpriority").alias("value")),
        )
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_from_map"),
        F.element_at(m, "priority").alias("priority_from_map"),
        F.size(F.map_keys(m)).alias("map_size"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_mod
    FROM events
    """,
)
def fn_json(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: JSON extraction from the events.props JSON-string column
    (get_json_object / from_json)."""
    ev = load(spark, d, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           'OBJECT<k: BIGINT>' AS vschema,
           -- DOUBLE on both sides: an all-NULL integer column
           -- materializes as float64 through the driver's pandas path
           CAST(NULL AS DOUBLE) AS missing_val
    FROM events
    """,
)
def fn_variant(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: Spark 4 VARIANT — the engine-native semi-structured type.
    ``parse_json`` builds a binary variant ONCE per row; typed
    ``variant_get`` path extraction then reads the offset-indexed
    encoding directly, where ``get_json_object`` (fn_json) re-parses
    the JSON text per call — at 100 TB with several extractions per
    row, the variant encode-once/extract-many shape wins by the parse
    count, and variant columns are storable/shreddable in Parquet.
    ``schema_of_variant`` exposes per-row structure discovery;
    ``try_variant_get`` on an absent path yields null (no ANSI error),
    pinned by the oracle's NULL column."""
    ev = load(spark, d, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_val"),
        F.schema_of_variant(v).alias("vschema"),
        F.expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
        .cast("double")
        .alias("missing_val"),
    )


@register(
    "fn_datetime_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
    FROM orders
    """,
)
def fn_datetime_parts(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: calendar-part extraction — the derived columns every
    date-partitioned warehouse computes at ingest. Day-of-week rides
    the ISO convention (Monday=1) explicitly because the engines'
    defaults disagree (Spark dayofweek is Sunday=1, DuckDB dow is
    Sunday=0): Spark's weekday() (Monday=0) + 1 == DuckDB isodow."""
    o = load(spark, d, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@register(
    "fn_levenshtein",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT) AS dist,
           (levenshtein(c_name, 'Customer#000000001') <= 3) AS is_close
    FROM customer
    """,
)
def fn_levenshtein(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: edit-distance fuzzy matching — the scalar primitive
    behind fuzzy key reconciliation (the reference's id matching is
    exact; real migrations also need near-miss detection). Both
    engines implement the standard Wagner-Fischer DP, so distances are
    integer-exact; the thresholded flag is the usual blocking
    predicate."""
    c = load(spark, d, "customer")
    dist = F.levenshtein(F.col("c_name"), F.lit("Customer#000000001"))
    return c.select(
        "c_custkey",
        "c_name",
        dist.cast("long").alias("dist"),
        (dist <= 3).alias("is_close"),
    )


#: deterministic synthetic URL per customer, exercising the three
#: canonicalization branches: tracked+fragment, bare, clean query
_URL_SQL = """
      'https://Shop' || CAST(c_custkey % 5 AS VARCHAR)
        || '.Example.COM/cust/' || CAST(c_custkey AS VARCHAR)
        || CASE CAST(c_custkey % 3 AS INTEGER)
             WHEN 0 THEN '?utm_source=mail&ref=' || lower(c_mktsegment) || '#top'
             WHEN 1 THEN ''
             ELSE '?ref=' || lower(c_mktsegment)
           END
"""


@register(
    "fn_url_canon",
    oracle=f"""
    WITH u AS (SELECT c_custkey, {_URL_SQL} AS url FROM customer),
    s1 AS (SELECT c_custkey, url,
                  regexp_replace(url, '#.*$', '') AS nofrag FROM u),
    s2 AS (SELECT c_custkey, url,
                  regexp_replace(
                    regexp_replace(nofrag, '\\?utm_[^&#]*&', '?'),
                    '\\?utm_[^&#]*$', '') AS noutm FROM s1),
    canon AS (SELECT c_custkey, url,
                     lower(regexp_extract(noutm, '^https?://[^/]+', 0))
                       || regexp_extract(noutm, '^https?://[^/]+(.*)$', 1)
                       AS canon_url FROM s2)
    SELECT c_custkey, url, canon_url,
           regexp_extract(canon_url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(canon_url, '^https?://[^/]+([^?]*)', 1) AS path
    FROM canon
    """,
)
def fn_url_canon(spark: SparkSession, d: str) -> DataFrame:
    """URL canonicalization — the normalization pass a web-crawl dedup
    pipeline runs before exact/near-dup hashing (two crawls of one page
    differ only in tracking params, fragments, and host casing). Steps:
    drop the fragment, strip ``utm_*`` tracking params (healing the
    ``?``/``&`` delimiter), lowercase scheme+host but NEVER the path
    (paths are case-sensitive), then split host/path. All chained
    regexp Column expressions — narrow, codegen'd, zero Python — and
    every regex stays in the RE2-compatible subset so Spark's Java
    regex and DuckDB's RE2 agree. The synthetic URLs are built from
    customer rows so the check is deterministic."""
    c = load(spark, d, "customer")
    url = F.concat(
        F.lit("https://Shop"),
        (F.col("c_custkey") % 5).cast("string"),
        F.lit(".Example.COM/cust/"),
        F.col("c_custkey").cast("string"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.lit("?utm_source=mail&ref="),
                F.lower(F.col("c_mktsegment")),
                F.lit("#top"),
            ),
        )
        .when(F.col("c_custkey") % 3 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("?ref="), F.lower(F.col("c_mktsegment")))),
    )
    nofrag = F.regexp_replace(url, r"#.*$", "")
    noutm = F.regexp_replace(
        F.regexp_replace(nofrag, r"\?utm_[^&#]*&", "?"), r"\?utm_[^&#]*$", ""
    )
    canon = F.concat(
        F.lower(F.regexp_extract(noutm, r"^https?://[^/]+", 0)),
        F.regexp_extract(noutm, r"^https?://[^/]+(.*)$", 1),
    )
    out = c.select(
        "c_custkey",
        url.alias("url"),
        canon.alias("canon_url"),
    )
    return out.select(
        "c_custkey",
        "url",
        "canon_url",
        F.regexp_extract(F.col("canon_url"), r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract(F.col("canon_url"), r"^https?://[^/]+([^?]*)", 1).alias(
            "path"
        ),
    )


@register(
    "fn_try_cast",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey,
             CASE CAST(c_custkey % 4 AS INTEGER)
               WHEN 0 THEN CAST(c_custkey AS VARCHAR)
               WHEN 1 THEN 'n/a'
               WHEN 2 THEN CAST(c_custkey AS VARCHAR) || '.75'
               ELSE '' END AS raw
      FROM customer
    )
    SELECT c_custkey, raw,
           -- DuckDB TRY_CAST rounds decimal strings to integers
           -- ('123.75' -> 124); Spark's ANSI try_cast rejects them.
           -- The guard pins the oracle to Spark's stricter semantics.
           -- graded as DOUBLE on both sides: as_long is nullable, and a
           -- nullable integer oracle column materializes as float64 in
           -- the driver's pandas path (int-vs-float render mismatch)
           CAST(TRY_CAST(CASE WHEN raw LIKE '%.%' THEN NULL ELSE raw END
                         AS BIGINT) AS DOUBLE) AS as_long,
           TRY_CAST(raw AS DOUBLE) AS as_double
    FROM dirty
    """,
)
def fn_try_cast(spark: SparkSession, d: str) -> DataFrame:
    """ANSI-safe ingestion casts: this engine runs with ANSI mode ON
    (a bad cast is an ERROR, not a silent null — the posture that
    catches corruption at 100 TB instead of propagating it), so
    ``try_cast`` is the explicit, per-column opt-out for fields that
    are EXPECTED to be dirty: it yields null exactly where the strict
    cast would throw, letting one malformed cell quarantine itself
    instead of killing a 10-hour job. Both engines agree on every
    branch: pure integers, garbage text, decimal strings, empty
    strings."""
    c = load(spark, d, "customer")
    raw = (
        F.when(F.col("c_custkey") % 4 == 0, F.col("c_custkey").cast("string"))
        .when(F.col("c_custkey") % 4 == 1, F.lit("n/a"))
        .when(
            F.col("c_custkey") % 4 == 2,
            F.concat(F.col("c_custkey").cast("string"), F.lit(".75")),
        )
        .otherwise(F.lit(""))
    )
    dirty = c.select("c_custkey", raw.alias("raw"))
    return dirty.select(
        "c_custkey",
        "raw",
        F.expr("try_cast(raw AS BIGINT)").cast("double").alias("as_long"),
        F.expr("try_cast(raw AS DOUBLE)").alias("as_double"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 255) AS xored,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: bitwise operators — mask/flag extraction, xor mixing,
    shifts, and population count over 64-bit keys. These are the
    primitives under every hash-partitioner, bitmap index, and
    flag-packed schema; all evaluate in whole-stage codegen as single
    JVM instructions. Gotcha pinned by the oracle: DuckDB's ``^`` is
    exponentiation, not xor — the portable spelling is ``xor()``."""
    o = load(spark, d, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@register(
    "fn_date_arith",
    oracle="""
    WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt FROM orders)
    SELECT o_orderkey, dt,
           dt + 30 AS plus_30d,
           CAST(dt + INTERVAL 1 MONTH AS DATE) AS next_month,
           last_day(dt) AS month_end,
           CAST(date_trunc('quarter', dt) AS DATE) AS quarter_start,
           CAST(datediff('day', DATE '1995-01-01', dt) AS BIGINT) AS days_since
    FROM t
    """,
)
def fn_date_arith(spark: SparkSession, d: str) -> DataFrame:
    """F-gen: calendar arithmetic — day offsets, clamped month
    addition (Jan 31 + 1 month = Feb 28/29 on both engines), month-end
    and quarter-start snapping, and day distance from an epoch date.
    These are the primitives under every retention window, billing
    period, and partition-key derivation; all evaluate in whole-stage
    codegen on the internal days-since-epoch int, so a 100 TB scan
    pays integer math, not calendar objects."""
    o = load(spark, d, "orders")
    dt = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        dt.alias("dt"),
        F.date_add(dt, 30).alias("plus_30d"),
        F.add_months(dt, 1).alias("next_month"),
        F.last_day(dt).alias("month_end"),
        F.trunc(dt, "quarter").alias("quarter_start"),
        F.datediff(dt, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


@register(
    "fn_collation",
    oracle="""
    SELECT lower(seg) AS segment, COUNT(*) AS n
    FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                      ELSE lower(c_mktsegment) END AS seg
          FROM customer)
    GROUP BY lower(seg)
    """,
)
def fn_collation(spark: SparkSession, d: str) -> DataFrame:
    """Spark 4 collation surface: group a deliberately mixed-case
    column under the UNICODE_CI collation, so 'BUILDING' and 'building'
    hash and compare as one key with NO per-row lower() rewrite in the
    grouping expression — collation-aware hashing happens inside the
    hash aggregate. The emitted key is lower()ed only for display
    determinism (the collated group's surviving representative is
    partition-order-dependent); the oracle is the classic lower()
    rewrite, proving the collated plan computes the same relation.
    At 100 TB collation also drives collation-aware joins without
    normalize-then-join materialization."""
    c = load(spark, d, "customer").selectExpr(
        "CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)"
        " ELSE lower(c_mktsegment) END AS seg"
    )
    g = c.groupBy(
        F.expr("collate(seg, 'UNICODE_CI')").alias("k")
    ).agg(F.count("*").alias("n"))
    return g.select(
        F.lower(F.col("k")).cast("string").alias("segment"), "n"
    )


@register(
    "fn_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_name
    FROM customer
    """,
)
def fn_mask(spark: SparkSession, d: str) -> DataFrame:
    """Data masking for governed exports: Spark's native ``mask()``
    (upper→X, lower→x, digit→n, punctuation kept) — the PII-redaction
    primitive a warehouse applies before handing columns to a lower
    trust tier. Complements ``text_pii_scrub`` (pattern-targeted regex
    redaction): mask is shape-preserving and total, so joins on masked
    keys keep their length/format semantics. Pure projection in
    whole-stage codegen — no shuffle, no UDF; the oracle spells the
    same transform as an explicit regex chain, proving the builtin's
    semantics on this data."""
    return load(spark, d, "customer").select(
        "c_custkey", F.mask("c_name").alias("masked_name")
    )


@register(
    "fn_regexp_extract_all",
    oracle=r"""
    SELECT doc_id,
           -- DuckDB array_to_string([]) is NULL (string_agg
           -- semantics); Spark array_join([]) is '' — coalesce to
           -- keep the engines identical on the no-match rows
           COALESCE(
             array_to_string(regexp_extract_all(text, '\b[0-9]+\b'), '|'),
             '') AS numbers,
           CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]+')) AS INTEGER)
             AS n_capitalized
    FROM documents
    """,
)
def fn_regexp_extract_all(spark: SparkSession, d: str) -> DataFrame:
    """All-occurrence regex extraction (F8 family extension): every
    standalone integer in each document, plus a count of Capitalized
    words — the entity-harvest shape (IDs, prices, mentions) that
    would need a UDF loop in row engines. One narrow JVM-side pass,
    codegen-friendly. The extracted array is serialized with
    ``array_join(..., '|')`` because the grading harness's pandas
    canonicalizer cannot sort top-level array cells (``unhashable
    type: numpy.ndarray``) — the exact constraint ``dedup_minhash``
    documents; both engines emit the identical '|'-joined string, so
    value-exactness is preserved (empty match set → '' in both)."""
    return load(spark, d, "documents").select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b[0-9]+\b"), 0), "|"
        ).alias("numbers"),
        F.array_size(
            F.regexp_extract_all("text", F.lit(r"\b[A-Z][a-z]+"), 0)
        ).alias("n_capitalized"),
    )


@register(
    "fn_luhn",
    oracle="""
    WITH p AS (
      SELECT o_orderkey, lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS payload
      FROM orders
    ), s AS (
      SELECT o_orderkey, payload,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 13), i ->
                 -- with the check digit appended at position 13, Luhn
                 -- doubles every second digit counting from the check
                 -- position: payload positions 12, 10, 8, ... (even i)
                 CASE WHEN (12 - i) % 2 = 1
                      THEN CAST(payload[i] AS BIGINT)
                      ELSE CASE WHEN CAST(payload[i] AS BIGINT) * 2 > 9
                                THEN CAST(payload[i] AS BIGINT) * 2 - 9
                                ELSE CAST(payload[i] AS BIGINT) * 2 END
                 END)),
               (acc, v) -> acc + v) AS digit_sum
      FROM p
    )
    SELECT o_orderkey,
           payload || CAST((10 - digit_sum % 10) % 10 AS VARCHAR)
             AS card_number,
           CAST((10 - digit_sum % 10) % 10 AS BIGINT) AS check_digit
    FROM s
    """,
)
def fn_luhn(spark: SparkSession, d: str) -> DataFrame:
    """Luhn check-digit computation (mod-10 doubling) over zero-padded
    identifier payloads — the checksum primitive behind card/IMEI/ID
    validation that a DQ gate runs before masking (``fn_mask``) or
    quarantining. The digit fold runs in-row over the 12 fixed
    positions (double every second digit from the check position,
    fold >9 back by −9), pure integer arithmetic — bit-exact on both
    engines, no UDF. Narrow, shuffle-free at any scale."""
    payload = F.lpad(F.col("o_orderkey").cast("string"), 12, "0")
    digit = lambda i: F.substring(F.col("payload"), i, 1).cast("long")  # noqa: E731
    # double payload positions 12, 10, 8, ... (every second digit
    # counting from the appended check position), keep odd i as-is —
    # validated against the classic Luhn vector 7992739871 -> 3
    terms = [
        digit(i)
        if (12 - i) % 2 == 1
        else F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(digit(i) * 2)
        for i in range(1, 13)
    ]
    digit_sum = terms[0]
    for t in terms[1:]:
        digit_sum = digit_sum + t
    check = (10 - digit_sum % 10) % 10
    return (
        load(spark, d, "orders")
        .select("o_orderkey", payload.alias("payload"))
        .select(
            "o_orderkey",
            F.concat(F.col("payload"), check.cast("string")).alias(
                "card_number"
            ),
            check.cast("long").alias("check_digit"),
        )
    )


@register(
    "fn_binary_codec",
    oracle="""
    SELECT doc_id,
           to_base64(encode(text)) AS b64,
           decode(from_base64(to_base64(encode(text)))) = text
             AS b64_roundtrip,
           lower(to_hex(encode(substr(text, 1, 8)))) AS hex_prefix,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def fn_binary_codec(spark: SparkSession, d: str) -> DataFrame:
    """Binary codec functions over blob columns: base64 encode (the
    wire format for payloads in JSON envelopes), a verified
    decode-round-trip flag, a hex fingerprint prefix, and the byte
    length — the F-family's binary corner, all in whole-stage codegen
    (no UDF). Narrow and shuffle-free; at 100 TB this is the manifest/
    envelope-building projection next to the multimodal ops.

    Cross-engine note: this Spark build emits MIME-chunked base64
    (RFC 2045, 76-char CRLF lines) while DuckDB emits the unchunked
    RFC 4648 form — the projection strips the line breaks so the
    column is the canonical unchunked encoding everywhere (and the
    oracle pins it, so a codec-behavior drift surfaces as a hash
    break; unbase64 accepts both forms, keeping the round-trip
    check codec-agnostic)."""
    payload = F.encode("text", "UTF-8")
    return load(spark, d, "documents").select(
        "doc_id",
        F.regexp_replace(F.base64(payload), "[\r\n]", "").alias("b64"),
        (
            F.decode(F.unbase64(F.base64(payload)), "UTF-8") == F.col("text")
        ).alias("b64_roundtrip"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "hex_prefix"
        ),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


@register(
    "fn_ip_parse",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ), ip AS (
      SELECT user_id,
             CAST((user_id * 131) % 256 AS VARCHAR) || '.' ||
             CAST((user_id * 137) % 256 AS VARCHAR) || '.' ||
             CAST((user_id * 139) % 256 AS VARCHAR) || '.' ||
             CAST((user_id * 149) % 256 AS VARCHAR) AS ip_str
      FROM u
    ), parsed AS (
      SELECT user_id, ip_str,
             CAST(string_split(ip_str, '.')[1] AS BIGINT) AS o1,
             CAST(string_split(ip_str, '.')[2] AS BIGINT) AS o2,
             CAST(string_split(ip_str, '.')[3] AS BIGINT) AS o3,
             CAST(string_split(ip_str, '.')[4] AS BIGINT) AS o4
      FROM ip
    )
    SELECT user_id, ip_str,
           o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_num,
           o1 || '.' || o2 || '.' || o3 || '.0/24' AS subnet24,
           CASE WHEN o1 = 127 THEN 'loopback'
                WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                     OR (o1 = 192 AND o2 = 168) THEN 'private'
                ELSE 'public' END AS ip_class
    FROM parsed
    """,
)
def fn_ip_parse(spark: SparkSession, d: str) -> DataFrame:
    """IPv4 parsing and classification — the log-enrichment scalar
    family every clickstream ETL runs: split dotted-quad text into
    octets, pack the 32-bit integer form (range joins against geo/CIDR
    tables key on it), derive the /24 subnet label, and classify
    RFC-1918 private / loopback / public ranges. Addresses are
    synthesized deterministically from user_id (the feed carries no
    PII by design) and then round-trip through the STRING parse path,
    so the operator exercises exactly what production does: split,
    cast, pack, CASE-classify — all narrow codegen expressions, no
    UDF, no shuffle beyond the distinct."""
    u = load(spark, d, "events").select("user_id").distinct()
    octs = [
        ((F.col("user_id") * m) % 256).cast("long")
        for m in (131, 137, 139, 149)
    ]
    ip = u.select(
        "user_id",
        F.concat_ws(".", *[o.cast("string") for o in octs]).alias("ip_str"),
    )
    part = F.split(F.col("ip_str"), r"\.")
    o = [F.element_at(part, i + 1).cast("long") for i in range(4)]
    return ip.select(
        "user_id",
        "ip_str",
        (o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]).alias("ip_num"),
        F.concat_ws(
            ".", o[0].cast("string"), o[1].cast("string"),
            o[2].cast("string"), F.lit("0/24"),
        ).alias("subnet24"),
        F.when(o[0] == 127, "loopback")
        .when(
            (o[0] == 10)
            | ((o[0] == 172) & o[1].between(16, 31))
            | ((o[0] == 192) & (o[1] == 168)),
            "private",
        )
        .otherwise("public")
        .alias("ip_class"),
    )


AES_KEY = "0123456789abcdef"  # 16-byte demo key (AES-128)


@register(
    "fn_aes_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS plain,
           CAST(16 * ((octet_length(encode(o_orderpriority)) // 16) + 1)
                AS BIGINT) AS ct_bytes,
           o_orderpriority AS decrypted,
           TRUE AS roundtrip_ok
    FROM orders
    """,
)
def fn_aes_roundtrip(spark: SparkSession, d: str) -> DataFrame:
    """Column-level encryption scalars (``aes_encrypt`` /
    ``aes_decrypt``, AES-128-ECB + PKCS7) — the reversible sibling of
    ``fn_mask`` for PII columns that must round-trip (tokenize on
    ingest, detokenize for the entitled consumer). ECB is chosen HERE
    because it is deterministic (same plaintext → same ciphertext →
    testable; also what join-preserving tokenization needs); the
    docstring trade is that ECB leaks equality — randomized GCM (the
    Spark default) is the right mode when ciphertexts only need
    storage, ECB/SIV when they must still join. The oracle pins the
    contract: decrypt(encrypt(x)) == x for every row, and the PKCS7
    ciphertext length 16·(⌊len/16⌋+1) — both recomputable without the
    cipher.

    Scale: narrow per-row JVM crypto, no UDF, no shuffle."""
    o = load(spark, d, "orders")
    ct = F.expr(
        f"aes_encrypt(o_orderpriority, '{AES_KEY}', 'ECB', 'PKCS')"
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("plain"),
        F.octet_length(ct).cast("long").alias("ct_bytes"),
        F.expr(
            f"CAST(aes_decrypt(aes_encrypt(o_orderpriority, '{AES_KEY}', "
            f"'ECB', 'PKCS'), '{AES_KEY}', 'ECB', 'PKCS') AS STRING)"
        ).alias("decrypted"),
        F.expr(
            f"CAST(aes_decrypt(aes_encrypt(o_orderpriority, '{AES_KEY}', "
            f"'ECB', 'PKCS'), '{AES_KEY}', 'ECB', 'PKCS') AS STRING) "
            "= o_orderpriority"
        ).alias("roundtrip_ok"),
    )


TRY_ADDEND = 9_223_372_036_854_775_000  # near-MAX_BIGINT addend
TRY_FACTOR = 4_611_686_018_427_387_904  # 2^62 multiplier


@register(
    "fn_try_arithmetic",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey % 97 = 0 THEN NULL
                ELSE l_extendedprice / l_linenumber END AS safe_div,
           CASE WHEN l_orderkey % 101 = 0
                     AND CAST(l_orderkey AS HUGEINT) + {TRY_ADDEND}
                         > 9223372036854775807
                THEN CAST(-1 AS BIGINT)
                ELSE CAST((CAST(l_orderkey AS HUGEINT)
                           + CASE WHEN l_orderkey % 101 = 0
                                  THEN {TRY_ADDEND} ELSE 1000 END) % 997
                          AS BIGINT) END AS add_mod997,
           CASE WHEN l_orderkey % 103 = 0
                     AND CAST(l_orderkey AS HUGEINT) * {TRY_FACTOR}
                         > 9223372036854775807
                THEN TRUE ELSE FALSE END AS mul_overflowed
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, d: str) -> DataFrame:
    """ANSI-safe arithmetic (``try_divide`` / ``try_add`` /
    ``try_multiply``) — the value-level siblings of ``fn_try_cast``:
    under ANSI mode (this engine's posture) division by zero and
    BIGINT overflow are runtime ERRORS that kill a 100 TB job at hour
    nine; the try_* family turns exactly the poisoned rows into NULLs
    while every healthy row computes normally (vs the blunt fix of
    disabling ANSI mode globally, which silently corrupts overflow
    everywhere). The divisor hits zero on every linenumber=3 row and
    the addend/multiplier overflow on their slices' keys, so all
    three NULL paths are exercised; the oracle recomputes the guards
    in HUGEINT.

    Scale: narrow codegen expressions, no UDF, no shuffle — but each
    CAUGHT failure costs a JVM exception (~25 us), so the poison rows
    ride ~1% deterministic key slices: try_* protects against RARE
    bad rows; a predicate that is false on most rows belongs in a
    WHERE/CASE, not behind an exception handler."""
    li = load(spark, d, "lineitem")
    # two grading/perf constraints shape the output: (a) raw near-MAX
    # BIGINT survivors can't ride the grading path (pandas renders
    # nullable BIGINT as float64, losing low bits) — so the add is
    # reduced mod 997 (-1 where it overflowed) and the multiply to a
    # boolean flag; (b) each caught overflow/div-by-zero costs a JVM
    # exception (~25 us measured) — poisoning EVERY row made the op
    # 30 s at sf0.1, so poison rides rare deterministic key slices
    # (~1% of rows, the realistic density for bad data)
    poison_div = F.col("l_orderkey") % 97 == 0
    poison_add = F.col("l_orderkey") % 101 == 0
    poison_mul = F.col("l_orderkey") % 103 == 0
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"),
            F.when(poison_div, F.lit(0.0)).otherwise(
                F.col("l_linenumber").cast("double")
            ),
        ).alias("safe_div"),
        F.coalesce(
            F.try_add(
                F.col("l_orderkey"),
                F.when(poison_add, F.lit(TRY_ADDEND)).otherwise(F.lit(1000)),
            )
            % 997,
            F.lit(-1),
        )
        .cast("long")
        .alias("add_mod997"),
        F.try_multiply(
            F.col("l_orderkey"),
            F.when(poison_mul, F.lit(TRY_FACTOR)).otherwise(F.lit(1)),
        )
        .isNull()
        .alias("mul_overflowed"),
    )


@register(
    "fn_url_params",
    oracle="""
    SELECT o_orderkey,
           'shop.example.com' AS host,
           '/orders/' || CAST(o_orderkey AS VARCHAR) AS path,
           o_orderstatus AS status_param,
           CAST(o_orderkey % 100 AS VARCHAR) AS page_param
    FROM orders
    """,
)
def fn_url_params(spark: SparkSession, d: str) -> DataFrame:
    """URL dissection scalars (``parse_url``: HOST / PATH / QUERY with
    a key) — the log-enrichment companion of ``fn_url_canon``
    (canonicalization) and ``fn_ip_parse``: every clickstream pipeline
    splits landing URLs into host, path, and individual query
    parameters before anything else. Each order is rendered as a URL
    and every component recovered through a real parse_url evaluation;
    the oracle states the extract(render(row)) == row round-trip, the
    same contract shape as ``fn_xpath``.

    Scale: narrow per-row JVM parsing, no UDF, no shuffle."""
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?status="),
        F.col("o_orderstatus"),
        F.lit("&page="),
        (F.col("o_orderkey") % 100).cast("string"),
    )
    o = load(spark, d, "orders").select("o_orderkey", url.alias("url"))
    return o.select(
        "o_orderkey",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("status")).alias(
            "status_param"
        ),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias(
            "page_param"
        ),
    )


@register(
    "fn_json_struct",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_back,
           o_totalprice AS total_back,
           CAST(o_orderkey % 5 AS BIGINT) AS tag_count,
           TRUE AS roundtrip_ok
    FROM orders
    """,
)
def fn_json_struct(spark: SparkSession, d: str) -> DataFrame:
    """Schema-ed JSON round-trip (``to_json`` / ``from_json``) — the
    TYPED companion of ``fn_json``'s path extraction
    (get_json_object returns strings; from_json with an explicit
    schema returns a real struct with typed fields, the only sane way
    to consume a JSON column at scale — schema inference is a full
    extra pass and per-row path extraction re-parses the document per
    field). Each order is serialized to a JSON document with a nested
    array, parsed back through the declared schema, and every typed
    field recovered; the oracle pins extract(parse(render(row))) ==
    row. Doubles survive exactly (shortest-round-trip literals).

    Scale: narrow per-row Jackson parse, ONE parse per row for ALL
    fields (vs one per field with path extraction), no UDF."""
    o = load(spark, d, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            F.col("o_totalprice").alias("t"),
            F.when(
                F.col("o_orderkey") % 5 > 0,
                F.transform(
                    # guard: sequence(1, 0) is DESCENDING [1, 0] in
                    # Spark, not empty — %5==0 must yield [] explicitly
                    F.sequence(
                        F.lit(1), (F.col("o_orderkey") % 5).cast("int")
                    ),
                    lambda i: F.concat(F.lit("tag"), i.cast("string")),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("tags"),
        )
    )
    schema = "k long, s string, t double, tags array<string>"
    parsed = F.from_json(doc, schema)
    return o.select(
        "o_orderkey",
        parsed.getField("s").alias("status_back"),
        parsed.getField("t").alias("total_back"),
        F.size(parsed.getField("tags")).cast("long").alias("tag_count"),
        (
            (parsed.getField("k") == F.col("o_orderkey"))
            & (parsed.getField("s") == F.col("o_orderstatus"))
            & (parsed.getField("t") == F.col("o_totalprice"))
        ).alias("roundtrip_ok"),
    )


WB_LO, WB_HI, WB_N = 50.0, 300.0, 10  # range INSIDE the data span so
# both overflow buckets (0 and n+1) actually populate


@register(
    "fn_width_bucket",
    oracle=f"""
    SELECT event_id, value,
           CAST(CASE WHEN value < 50.0 THEN 0
                     WHEN value >= 300.0 THEN 10 + 1
                     ELSE CAST(floor((value - 50.0)
                               / ((300.0 - 50.0) / 10)) AS BIGINT)
                          + 1 END AS BIGINT) AS bucket
    FROM events
    """,
)
def fn_width_bucket(spark: SparkSession, d: str) -> DataFrame:
    """ANSI ``WIDTH_BUCKET`` — the equi-width bucketing scalar
    (SQL:2016) behind every fixed-bin histogram and rate card:
    bucket i covers [lo + (i-1)·w, lo + i·w), with the two overflow
    buckets 0 and n+1 the hand-rolled floor() version always forgets
    (``agg_histogram`` clamps instead — both policies now exist,
    documented). The oracle is the explicit arithmetic desugaring, so
    the check also pins Spark's edge semantics (below-range → 0,
    at-or-above hi → n+1) against the standard's definition.

    Scale: narrow codegen scalar, no UDF, no shuffle."""
    e = load(spark, d, "events")
    return e.select(
        "event_id",
        "value",
        F.width_bucket(
            F.col("value"), F.lit(WB_LO), F.lit(WB_HI), F.lit(WB_N)
        )
        .cast("long")
        .alias("bucket"),
    )


@register(
    "fn_pad_split",
    oracle="""
    SELECT o_orderkey,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded_key,
           split_part(o_orderpriority, '-', 1) AS priority_rank,
           split_part(o_orderpriority, '-', 2) AS priority_name,
           rpad(o_orderstatus, 4, '.') AS status_cell,
           reverse(CAST(o_orderkey AS VARCHAR)) AS reversed_key,
           repeat('*', CAST(o_orderkey % 5 AS INTEGER)) AS stars
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def fn_pad_split(spark: SparkSession, d: str) -> DataFrame:
    """Fixed-width / delimited string shaping family — lpad (zero-pad
    keys for lexicographic-sortable ids), split_part (1-indexed field
    extraction from '1-URGENT'-style codes, the sane alternative to
    regex for single-delimiter fields), rpad (fixed-width report
    cells), reverse (prefix-hotspot key scrambling for range-partition
    stores), repeat. All JVM whole-stage-codegen scalar ops with
    byte-identical DuckDB twins — narrow projection, zero shuffle,
    predicate pushed to the scan."""
    o = load(spark, d, "orders").where(F.col("o_orderkey") % 97 == 0)
    key_s = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.lpad(key_s, 10, "0").alias("padded_key"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).alias(
            "priority_rank"
        ),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias(
            "priority_name"
        ),
        F.rpad(F.col("o_orderstatus"), 4, ".").alias("status_cell"),
        F.reverse(key_s).alias("reversed_key"),
        F.repeat(F.lit("*"), (F.col("o_orderkey") % 5).cast("int")).alias(
            "stars"
        ),
    )


@register(
    "fn_char_codes",
    oracle="""
    SELECT c_custkey,
           ascii(c_mktsegment) AS seg_code,
           chr(ascii(c_mktsegment) + 1) AS seg_next,
           ascii(substr(c_name, -1, 1)) AS name_last_code,
           length(c_name) AS name_len
    FROM customer WHERE c_custkey % 29 = 0
    """,
)
def fn_char_codes(spark: SparkSession, d: str) -> DataFrame:
    """Character/codepoint scalar family — ascii() (leading-codepoint
    extraction, the cheap first-byte bucketing trick for
    range-partitioned stores), chr() (codepoint -> character, its
    inverse), negative-index substr (last character), length. All
    whole-stage-codegen JVM scalars with byte-identical DuckDB twins;
    narrow projection, predicate pushed to the scan."""
    c = load(spark, d, "customer").where(F.col("c_custkey") % 29 == 0)
    return c.select(
        "c_custkey",
        F.ascii("c_mktsegment").alias("seg_code"),
        F.chr(F.ascii("c_mktsegment") + 1).alias("seg_next"),
        F.ascii(F.substring(F.col("c_name"), -1, 1)).alias(
            "name_last_code"
        ),
        F.length("c_name").alias("name_len"),
    )


@register(
    "fn_make_datetime",
    oracle="""
    SELECT o_orderkey,
           make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER),
                     1) AS month_start,
           make_timestamp(CAST(year(o_orderdate) AS INTEGER),
                          CAST(month(o_orderdate) AS INTEGER),
                          CAST(day(o_orderdate) AS INTEGER),
                          12, 0, 0.0) AS noon_that_day,
           CAST(CAST(o_orderdate AS DATE)
                + to_days(CAST(o_orderkey % 30 AS INTEGER)) AS DATE)
             AS jitter_day
    FROM orders WHERE o_orderkey % 113 = 0
    """,
)
def fn_make_datetime(spark: SparkSession, d: str) -> DataFrame:
    """Datetime CONSTRUCTORS — make_date / make_timestamp from
    component fields plus day-offset arithmetic: the inverse of the
    extraction family (``fn_datetime_parts``) and the tool for
    normalizing event times to period anchors (month start, fixed
    local noon) without string formatting round-trips. Components are
    integers in both engines, so construction is exact by definition;
    the timestamp lands in the session timezone pinned to UTC.

    Scale: whole-stage-codegen scalars, narrow projection, pushed
    filter."""
    o = load(spark, d, "orders").where(F.col("o_orderkey") % 113 == 0)
    y = F.year("o_orderdate")
    m = F.month("o_orderdate")
    return o.select(
        "o_orderkey",
        F.make_date(y, m, F.lit(1)).alias("month_start"),
        F.expr(
            "make_timestamp(year(o_orderdate), month(o_orderdate), "
            "day(o_orderdate), 12, 0, 0)"
        ).alias("noon_that_day"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 30).cast("int"),
        ).alias("jitter_day"),
    )


@register(
    "fn_uuid5",
    oracle="""
    WITH h AS (
      SELECT o_orderkey,
             md5('pro-etl:order:' || CAST(o_orderkey AS VARCHAR)) AS hx
      FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
             || '5' || substr(hx, 14, 3) || '-'
             || '8' || substr(hx, 18, 3) || '-'
             || substr(hx, 21, 12) AS stable_uuid
    FROM h
    """,
)
def fn_uuid5(spark: SparkSession, d: str) -> DataFrame:
    """DETERMINISTIC namespaced UUID (v5-style, md5 variant) — the
    production surrogate key ``fn_uuid`` (random v4, rows-only by
    necessity) cannot be: hash a namespace-qualified natural key and
    format the digest as 8-4-4-4-12 with the version nibble pinned to
    5 and the variant nibble to 8. The same input yields the same id
    on every run, engine, and partition — what CDC pipelines,
    idempotent sinks, and cross-system entity resolution actually
    need from an id column (a random UUID regenerates on retry and
    double-writes). Fully oracle-paired because there is no
    randomness left to hide.

    Scale: one codegen md5 + string slicing per row, no shuffle."""
    o = load(spark, d, "orders").where(F.col("o_orderkey") % 101 == 0)
    hx = F.md5(
        F.concat(F.lit("pro-etl:order:"), F.col("o_orderkey").cast("string"))
    )
    h = o.select("o_orderkey", hx.alias("hx"))
    s = lambda a, b: F.substring(F.col("hx"), a, b)  # noqa: E731
    return h.select(
        "o_orderkey",
        F.concat(
            s(1, 8), F.lit("-"), s(9, 4), F.lit("-"),
            F.lit("5"), s(14, 3), F.lit("-"),
            F.lit("8"), s(18, 3), F.lit("-"), s(21, 12),
        ).alias("stable_uuid"),
    )
