"""End-to-end migration job: the reference's whole program
(``python migrate.py``, README.md:48-51 of the reference) as a
Spark-native CLI.

    python -m pro_etl_spark.migrate_cli \
        --xml input/export.xml --csv input/migration_list.csv \
        --output-dir output/

Pipeline (mirrors SURVEY §3.1's trace, set-based):

1. mapping CSV with an **explicit schema** (no inference — fixes
   migrate.py:79), first-row-wins dedup on the join key (J4)
2. customer XML via Spark's native XML source with an **explicit
   schema** (arrays stay arrays even for single elements), normalized
   to the canonical nested shape of SURVEY §1.5
3. validation (delivery-day regex + '-3D' default, null checks) and
   the OK / Not OK / Not-found reconciliation log (migrate.py:103-270)
4. ``apply_migration`` — the full nested-document rewrite
   (migrate.py:116-257) on the semi-join side
5. sinks: one enveloped delta XML written as the reference's flat
   ``<output-dir>/<YYYY-MM-DD>/output-<uuid>.xml`` (migrate.py:286-293)
   + a log CSV in a sibling ``output-<uuid>-log/`` directory, and the
   found/total summary on stdout (migrate.py:272)

Scale: the mapping broadcasts; the corpus never shuffles; the document
rewrite and XML record serialization are narrow Column expressions.
"""

from __future__ import annotations

import argparse
import datetime
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from pro_etl_spark import xml_io
from pro_etl_spark.ops.migration import (
    DELIVERY_RE,
    REASON_INVALID,
    REASON_NOT_FOUND,
    REASON_OK,
    apply_migration,
)

def run_ts_text() -> str:
    """Run timestamp written into profile/creation-date — the
    reference's ``%Y-%m-%dT00:00:00+00:00`` of "today" (migrate.py:97),
    computed per run() (not at import) so long-lived drivers crossing
    midnight stamp the actual run date."""
    return datetime.date.today().isoformat() + "T00:00:00+00:00"

#: CSV contract of the reference (README.md:16-24 of the reference)
CSV_SCHEMA = StructType(
    [
        StructField("current_customer_id", StringType(), True),
        StructField("new_customer_id", StringType(), True),
        StructField("new_source_id", StringType(), True),
        StructField("new_store_id", StringType(), True),
        StructField("new_store_name", StringType(), True),
        StructField("mandatory_reference", StringType(), True),
        StructField("delivery_day", StringType(), True),
    ]
)


def _attr_st() -> ArrayType:
    return ArrayType(
        StructType(
            [
                StructField("_VALUE", StringType(), True),
                StructField("_dt:dt", StringType(), True),
                StructField("_name", StringType(), True),
            ]
        )
    )


#: explicit read schema for the customer XML (field names follow the
#: native XML source's attribute conventions: attributes are
#: ``_``-prefixed, element text is ``_VALUE``); declaring it keeps
#: single-element collections as arrays
XML_SCHEMA = StructType(
    [
        StructField("_id", StringType(), True),
        StructField(
            "custom-attributes",
            StructType([StructField("custom-attribute", _attr_st(), True)]),
            True,
        ),
        StructField(
            "user",
            ArrayType(
                StructType(
                    [
                        StructField("_business-partner-no", StringType(), True),
                        StructField("default-customer", StringType(), True),
                        StructField(
                            "user-groups",
                            StructType(
                                [
                                    StructField(
                                        "user-group",
                                        ArrayType(
                                            StructType(
                                                [StructField("_id", StringType(), True)]
                                            )
                                        ),
                                        True,
                                    )
                                ]
                            ),
                            True,
                        ),
                        StructField(
                            "custom-attributes",
                            StructType(
                                [StructField("custom-attribute", _attr_st(), True)]
                            ),
                            True,
                        ),
                        StructField(
                            "credentials",
                            StructType(
                                [
                                    StructField("login", StringType(), True),
                                    StructField("last-logged-in", StringType(), True),
                                ]
                            ),
                            True,
                        ),
                        StructField(
                            "profile",
                            StructType(
                                [StructField("creation-date", StringType(), True)]
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)


def _canon_attrs(c: F.Column) -> F.Column:
    arr = F.coalesce(c["custom-attribute"], F.array().cast(_attr_st()))
    return F.transform(
        arr,
        lambda a: F.struct(
            a["_name"].alias("name"),
            F.coalesce(a["_dt:dt"], F.lit("string")).alias("dt"),
            F.coalesce(a["_VALUE"], F.lit("")).alias("value"),
        ),
    )


def read_customers_xml(spark: SparkSession, path: str) -> DataFrame:
    """Native XML scan with the explicit schema, normalized to the
    canonical nested shape (SURVEY §1.5) that ``apply_migration`` and
    ``xml_io.customer_xml`` operate on."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema(XML_SCHEMA)
        .load(path)
    )
    users = F.transform(
        F.coalesce(F.col("user"), F.array().cast(XML_SCHEMA["user"].dataType)),
        lambda u: F.struct(
            F.coalesce(u["_business-partner-no"], F.lit("")).alias(
                "business_partner_no"
            ),
            F.coalesce(u["default-customer"], F.lit("")).alias("default_customer"),
            F.struct(
                F.coalesce(u["profile"]["creation-date"], F.lit("")).alias(
                    "creation_date"
                )
            ).alias("profile"),
            F.struct(
                u["credentials"]["login"].alias("login"),
                u["credentials"]["last-logged-in"].alias("last_logged_in"),
            ).alias("credentials"),
            F.transform(
                F.coalesce(
                    u["user-groups"]["user-group"],
                    F.array().cast(
                        ArrayType(StructType([StructField("_id", StringType())]))
                    ),
                ),
                lambda g: g["_id"],
            ).alias("user_groups"),
            _canon_attrs(u["custom-attributes"]).alias("custom_attributes"),
        ),
    )
    return raw.select(
        F.col("_id").alias("id"),
        _canon_attrs(F.col("custom-attributes")).alias("custom_attributes"),
        users.alias("users"),
    )


def read_mapping_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd CSV read + first-row-wins dedup (J4: the reference's
    emergent first-match semantics made explicit, SURVEY §2.3).

    Normalization happens HERE, once: ids and delivery_day are trimmed
    at ingestion (the reference strips ids before matching,
    migrate.py:110,120) so the log, the transform join, and strict-mode
    filtering all see identical keys. First-wins order is
    (file path, in-partition row id): exact row order within each file
    for unsplit small files — the mapping contract — and deterministic
    file order if a glob ever matches several."""
    m = spark.read.schema(CSV_SCHEMA).option("header", True).csv(path)
    m = m.withColumn("_file", F.col("_metadata.file_path")).withColumn(
        "ord", F.monotonically_increasing_id()
    )
    m = m.withColumn("current_customer_id", F.trim("current_customer_id")).withColumn(
        "delivery_day", F.trim("delivery_day")
    )
    w = Window.partitionBy("current_customer_id").orderBy("_file", "ord")
    return (
        m.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn", "ord", "_file")
    )


def reconcile(mapping: DataFrame, customers: DataFrame) -> DataFrame:
    """The OK / Not OK / Not-found log (migrate.py:103-104, 259-266) —
    semi side validated, anti side flagged, one broadcast plan."""
    # inputs arrive normalized (trimmed) from read_mapping_csv — one
    # normalization point keeps log, transform, and strict filter in
    # agreement on the same keys/values
    delivery = F.coalesce(F.nullif(F.col("delivery_day"), F.lit("")), F.lit("-3D"))
    # 100 TB posture (same as ops.migration.reconciliation): Spark can't
    # broadcast the preserved side of an outer join, so semi-filter the
    # corpus by the broadcast key set first (narrow scan of the big
    # side), then left-join the mapping against the now-small match set.
    keys = mapping.select(F.col("current_customer_id").alias("_k"))
    matched = (
        customers.join(F.broadcast(keys), customers["id"] == keys["_k"], "left_semi")
        .select(F.col("id").alias("_cid"))
    )
    j = mapping.join(
        F.broadcast(matched),
        mapping["current_customer_id"] == matched["_cid"],
        "left",
    )
    missing = (
        F.col("current_customer_id").isNull()
        | F.col("new_customer_id").isNull()
        | F.col("new_source_id").isNull()
        | F.col("new_store_id").isNull()
        | F.col("new_store_name").isNull()
    )
    return j.select(
        F.col("current_customer_id").alias("current_id"),
        F.col("new_customer_id").alias("new_id"),
        F.when(F.col("_cid").isNull(), "Not OK")
        .when(missing, "Not OK")
        .when(~delivery.rlike(DELIVERY_RE), "Not OK")
        .otherwise("OK")
        .alias("status"),
        F.when(F.col("_cid").isNull(), REASON_NOT_FOUND)
        .when(missing, "Missing values! Please check CSV input file")
        .when(~delivery.rlike(DELIVERY_RE), REASON_INVALID)
        .otherwise(REASON_OK)
        .alias("reason"),
    )


def run(
    spark: SparkSession,
    xml_path: str,
    csv_path: str,
    output_dir: str,
    strict: bool = False,
    scale: bool = False,
) -> dict[str, str]:
    """Execute the full migration; returns the output file paths.

    ``strict=False`` (default) replicates the reference's advisory
    policy (SURVEY §2.11.4): rows failing validation still flow to the
    output document, only the log flags them. ``strict=True`` excludes
    every "Not OK" row from the output document — the log is unchanged
    either way, so the reconciliation trail is complete in both modes.

    ``scale=True`` switches the delta-XML sink from the reference's
    flat single file (driver stream-concat — correct for its contract,
    a single-writer ceiling for a corpus-sized export) to the
    manifest document: records stay in distributed part files, the
    envelope is two O(1)-byte parts, and a manifest lists the parts in
    document order. Consumers either read the file set directly
    (``xml_io.read_manifest_document``) or hand the manifest to the
    storage layer's concat primitive (``xml_io.compose_manifest`` —
    hdfs concat / S3 multipart compose) for a physical single file; no
    record byte ever moves through the driver.
    """
    mapping = read_mapping_csv(spark, csv_path)
    customers = read_customers_xml(spark, xml_path)

    log = reconcile(F.broadcast(mapping), customers)
    # the log feeds the CSV sink, the summary counts, and (in strict
    # mode) the transform filter — persist so the reconciliation join
    # runs once, not once per consumer
    log = log.persist()
    transform_input = mapping
    if strict:
        ok_keys = log.where(F.col("status") == "OK").select(
            F.col("current_id").alias("_ok")
        )
        transform_input = mapping.join(
            F.broadcast(ok_keys),
            mapping["current_customer_id"] == ok_keys["_ok"],
            "left_semi",
        )
    run_ts = run_ts_text()
    migrated = apply_migration(customers, transform_input, run_ts=run_ts)

    run_date = run_ts[:10]  # same clock read as the document timestamps
    run_id = uuid.uuid4().hex[:12]
    out_dir = f"{output_dir}/{run_date}"
    # envelope fidelity: carry the input document's root attributes
    # (xsi:schemaLocation, version attrs — migrate.py:274-284) forward
    _tag, root_attrs = xml_io.read_root_attrs(xml_path)
    nsmap = dict(xml_io.ENFINITY_NSMAP)
    attrs_out = {}
    for k, v in root_attrs.items():
        if k.startswith("{"):
            uri, local = k[1:].split("}")
            pfx = next((p for p, u in nsmap.items() if u == uri), None)
            if pfx:
                attrs_out[f"{pfx}:{local}"] = v
        else:
            attrs_out[k] = v

    # reference file layout: output/<YYYY-MM-DD>/output-<uuid>.xml as a
    # FLAT file (migrate.py:286-293) — the XML sink is a driver-side
    # single-document write, so no Spark part-directory is needed; the
    # row-wise log (no reference counterpart) lands in a sibling dir
    import os

    os.makedirs(out_dir, exist_ok=True)
    if scale:
        xml_out = f"{out_dir}/output-{run_id}-xml"
        xml_out = xml_io.write_xml_document_manifest(
            xml_io.customer_xml(migrated), xml_out,
            root_tag="enfinity", root_attrs=attrs_out, nsmap=nsmap,
        )
    else:
        xml_out = f"{out_dir}/output-{run_id}.xml"
        xml_io.write_xml_document(
            xml_io.customer_xml(migrated), xml_out,
            root_tag="enfinity", root_attrs=attrs_out, nsmap=nsmap,
        )
    log_out = f"{out_dir}/output-{run_id}-log"
    log.coalesce(1).write.mode("overwrite").option("header", True).csv(log_out)

    # log is persisted and already materialized by the CSV write above,
    # so both counts are cache hits, not re-joins
    total = log.count()
    found = log.where(F.col("reason") != REASON_NOT_FOUND).count()
    log.unpersist()
    print(f"{found}/{total} customers found in source XML")
    kind = "delta XML manifest" if scale else "delta XML"
    print(f"{kind}: {xml_out}")
    print(f"log CSV:   {log_out}")
    return {
        "xml": xml_out,
        "log": log_out,
        "found": str(found),
        "total": str(total),
        "run_ts": run_ts,
    }


def latest_file(directory: str, extension: str) -> str | None:
    """Newest file with the extension in ``directory``, by mtime — the
    reference's default input-discovery mode (migrate.py:39-42 lists by
    extension sorted by mtime desc; its interactive pick defaults to
    the newest when not answered). Driver-side like the reference:
    file discovery is a metadata operation, not a data scan (the
    Spark-side ``_metadata``-based variant is ``ops.sources.
    scan_latest_files``)."""
    import os

    try:
        paths = [
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.endswith(extension)
        ]
    except FileNotFoundError:
        return None
    return max(paths, key=os.path.getmtime) if paths else None


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "--xml",
        help="customer export XML (default: newest *.xml in --input-dir)",
    )
    p.add_argument(
        "--csv",
        help="migration list CSV (default: newest *.csv in --input-dir)",
    )
    p.add_argument(
        "--input-dir",
        default="input",
        help="directory searched for the newest .xml/.csv when --xml/--csv "
        "are omitted (reference migrate.py:56-69 default mode)",
    )
    p.add_argument("--output-dir", required=True)
    p.add_argument("--master", default="local[*]")
    p.add_argument(
        "--strict",
        action="store_true",
        help="exclude validation-failed rows from the output document "
        "(default: advisory — they flow through and the log flags them)",
    )
    p.add_argument(
        "--scale",
        action="store_true",
        help="write the delta XML as a manifest document (distributed "
        "part files + O(1) envelope + ordered manifest) instead of a "
        "driver-streamed single file; stitch with the storage layer's "
        "concat primitive via xml_io.compose_manifest, or read the "
        "file set directly with xml_io.read_manifest_document",
    )
    a = p.parse_args(argv)
    xml_path = a.xml or latest_file(a.input_dir, ".xml")
    csv_path = a.csv or latest_file(a.input_dir, ".csv")
    if not xml_path or not csv_path:
        p.error(
            f"no --xml/--csv given and no .xml/.csv files found in "
            f"'{a.input_dir}' (pass --input-dir or explicit paths)"
        )
    if not a.xml or not a.csv:
        print(f"discovered inputs: xml={xml_path} csv={csv_path}")
    spark = (
        SparkSession.builder.master(a.master)
        .appName("pro_etl_spark-migrate")
        .getOrCreate()
    )
    try:
        run(
            spark, xml_path, csv_path, a.output_dir,
            strict=a.strict, scale=a.scale,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
