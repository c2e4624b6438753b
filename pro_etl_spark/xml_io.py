"""XML document I/O with envelope fidelity (SURVEY §2.1 S5, §7.2-7.3).

The reference emits ONE namespaced XML document: declaration, root
``<enfinity>`` carrying the preserved nsmap + ``xsi:schemaLocation`` +
version attributes, and pretty-printed ``<customer>`` records
(migrate.py:94, 274-298). Two Spark-native gaps force custom code here
(SURVEY §7.2): the built-in XML writer cannot emit namespace-prefixed
attribute names (``dt:dt`` — Woodstox rejects ``:`` without a binding),
and it writes one root per part file rather than a single enveloped
document.

Split of labor:
- **records (the 100 TB side)**: serialized executor-side as pure
  Column expressions — escape, concat, array_join; whole-stage-codegen
  friendly, zero Python in the hot path — written with the text sink
  (one part file per partition, no driver materialization).
- **envelope (the O(1) side)**: the driver streams part files between a
  hand-built header/footer (`assemble_document`). At real scale this
  concat step belongs to the storage layer (S3 multipart compose /
  `hdfs concat`); the per-record bytes are already final.

Reading uses Spark's native XML source, which handles namespaced
attributes fine (``dt:dt`` → struct field ``_dt:dt``).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

#: the reference's namespace map (migrate.py:72-75)
ENFINITY_NSMAP = {
    "i": "http://www.intershop.com/xml/ns/intershop/customer/impex/7.3",
    "dt": "http://www.intershop.com/xml/ns/enfinity/6.5/core/impex-dt",
    "xsi": "http://www.w3.org/2001/XMLSchema-instance",
}


def xml_escape(c: Column) -> Column:
    """XML 1.0 text/attribute escaping as Column expressions (&, <, >,
    \", in that order so ampersands escape first)."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return c


def _attrs_xml(arr: Column, indent: str) -> Column:
    """<custom-attributes> block for an array<struct<name,dt,value>>
    (attribute shape per migrate.py:161,195,211: name + dt:dt + text)."""
    inner = F.array_join(
        F.transform(
            arr,
            lambda a: F.concat(
                F.lit(f'{indent}  <custom-attribute name="'),
                xml_escape(a["name"]),
                F.lit('" dt:dt="'),
                xml_escape(a["dt"]),
                F.lit('">'),
                xml_escape(a["value"]),
                F.lit("</custom-attribute>"),
            ),
        ),
        "\n",
    )
    return F.when(F.size(arr) > 0, F.concat(
        F.lit(f"{indent}<custom-attributes>\n"),
        inner,
        F.lit(f"\n{indent}</custom-attributes>"),
    )).otherwise(F.lit(f"{indent}<custom-attributes/>"))


def _user_xml(u: Column, cred_fields: tuple[str, ...]) -> Column:
    """<user> block for the canonical users element (SURVEY §1.2):
    business-partner-no attribute, user-groups set, custom-attributes,
    credentials (whatever fields survive the migration — the reference
    deletes only last-logged-in, keeping siblings, migrate.py:242-247),
    profile."""
    groups = F.array_join(
        F.transform(
            u["user_groups"],
            lambda g: F.concat(
                F.lit('      <user-group id="'), xml_escape(g), F.lit('"/>')
            ),
        ),
        "\n",
    )
    creds: list[Column] = []
    for f in cred_fields:
        el = f.replace("_", "-")
        creds.append(
            F.when(
                u["credentials"][f].isNotNull(),
                F.concat(
                    F.lit(f"      <{el}>"),
                    xml_escape(u["credentials"][f]),
                    F.lit(f"</{el}>\n"),
                ),
            ).otherwise(F.lit(""))
        )
    cred_block = (
        F.when(
            F.concat(*creds) != "",
            F.concat(F.lit("    <credentials>\n"), F.concat(*creds), F.lit("    </credentials>\n")),
        ).otherwise(F.lit(""))
        if creds
        else F.lit("")
    )
    return F.concat(
        F.lit('  <user business-partner-no="'),
        xml_escape(u["business_partner_no"]),
        F.lit('">\n'),
        F.lit("    <default-customer>"),
        xml_escape(u["default_customer"]),
        F.lit("</default-customer>\n"),
        F.lit("    <user-groups>\n"),
        groups,
        F.lit("\n    </user-groups>\n"),
        _attrs_xml(u["custom_attributes"], "    "),
        F.lit("\n"),
        cred_block,
        F.lit("    <profile>\n      <creation-date>"),
        xml_escape(u["profile"]["creation_date"]),
        F.lit("</creation-date>\n    </profile>\n  </user>"),
    )


def customer_xml(df: DataFrame) -> DataFrame:
    """Render each nested customer row (post-``apply_migration`` schema)
    to its ``<customer>`` element — a single-column DataFrame of XML
    text, computed entirely executor-side. The credentials fields to
    emit are discovered from the input schema (string fields only)."""
    users_t = df.schema["users"].dataType.elementType
    cred_fields: tuple[str, ...] = ()
    if "credentials" in users_t.fieldNames():
        cred_fields = tuple(
            f.name
            for f in users_t["credentials"].dataType.fields
            if f.dataType.simpleString() == "string"
        )
    rec = F.concat(
        F.lit('<customer id="'),
        xml_escape(F.col("id")),
        F.lit('">\n'),
        _attrs_xml(F.col("custom_attributes"), "  "),
        F.lit("\n"),
        F.array_join(
            F.transform(F.col("users"), lambda u: _user_xml(u, cred_fields)), "\n"
        ),
        F.lit("\n</customer>"),
    )
    return df.select(rec.alias("value"))


def write_xml_document(
    records: DataFrame,
    out_file: str,
    root_tag: str = "enfinity",
    root_attrs: dict[str, str] | None = None,
    nsmap: dict[str, str] | None = None,
) -> str:
    """Write a single enveloped XML document: distributed text write of
    the record column, then stream-concatenate the parts between the
    envelope header/footer (O(1) driver memory; migrate.py:274-298
    fidelity — declaration, nsmap, root attrs, pretty records)."""
    parts_dir = out_file + ".parts"
    records.write.mode("overwrite").text(parts_dir)
    ns = "".join(f' xmlns:{p}="{u}"' for p, u in (nsmap or {}).items())
    ra = "".join(f' {k}="{v}"' for k, v in (root_attrs or {}).items())
    with open(out_file, "w", encoding="utf-8") as w:
        w.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        w.write(f"<{root_tag}{ns}{ra}>\n")
        for part in sorted(glob.glob(os.path.join(parts_dir, "part-*"))):
            with open(part, "r", encoding="utf-8") as r:
                shutil.copyfileobj(r, w)
        w.write(f"</{root_tag}>\n")
    return out_file


def write_xml_document_sharded(
    records: DataFrame,
    out_dir: str,
    shards: int,
    shard_key,
    root_tag: str = "enfinity",
    root_attrs: dict[str, str] | None = None,
    nsmap: dict[str, str] | None = None,
    shard_assign=None,
) -> DataFrame:
    """Sharded XML sink — the 100 TB escape from the single-writer
    ceiling of ``write_xml_document`` (which stream-concatenates every
    part through ONE driver file handle; correct for the reference's
    single-document contract, a bottleneck for a corpus-sized export).

    Each shard becomes one complete well-formed XML document written
    entirely executor-side: records are hashed to a shard, the envelope
    header and footer are emitted as ordinary ROWS (ord 0 / 2 around
    the records at ord 1), and a ``repartition(shards, shard)`` +
    ``sortWithinPartitions`` + ``partitionBy(shard)`` text write makes
    each shard directory hold exactly one part file whose line order is
    header → records → footer. No collect, no driver concatenation —
    the write parallelism IS the shard count.

    Returns the per-shard manifest (shard, n_records) — O(shards)
    rows, the same model-state-sized commit record
    ``sink_manifest_commit`` uses (a reader lists shard dirs, not
    in-flight files).

    ``shard_key`` is the Column the shard assignment hashes; callers
    pick a stable id so re-runs land records in the same shard.
    ``shard_assign``, when given, is used VERBATIM as the shard number
    (must already be in [0, shards)) instead of hashing ``shard_key`` —
    callers that need a cross-engine-reproducible placement (e.g. a
    value oracle recomputing ``id % shards`` in another SQL engine,
    where Spark's Murmur3 ``hash()`` has no twin) pass an explicit
    arithmetic assignment here."""
    import pyspark.sql.functions as F

    ns = "".join(f' xmlns:{p}="{u}"' for p, u in (nsmap or {}).items())
    ra = "".join(f' {k}="{v}"' for k, v in (root_attrs or {}).items())
    header = f'<?xml version="1.0" encoding="UTF-8"?>\n<{root_tag}{ns}{ra}>'
    footer = f"</{root_tag}>"

    col = records.columns[0]
    assign = (
        shard_assign.cast("int")
        if shard_assign is not None
        else F.pmod(F.hash(shard_key), F.lit(shards))
    )
    body = records.select(
        assign.alias("shard"),
        F.lit(1).alias("ord"),
        F.col(col).alias("line"),
    )
    spark = records.sparkSession
    shard_ids = spark.range(shards).select(F.col("id").cast("int").alias("shard"))
    envelope = shard_ids.select(
        "shard", F.lit(0).alias("ord"), F.lit(header).alias("line")
    ).unionByName(
        shard_ids.select("shard", F.lit(2).alias("ord"), F.lit(footer).alias("line"))
    )
    (
        body.unionByName(envelope)
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "ord")
        # the text source allows exactly one data column; dropping ord
        # AFTER the sort keeps the physical row order (Project preserves
        # per-partition order, and the surviving [shard] prefix already
        # satisfies the dynamic-partition write's ordering requirement,
        # so no re-sort is planned)
        .select("shard", "line")
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(out_dir)
    )
    return body.groupBy("shard").agg(F.count("*").alias("n_records"))


def read_xml_document(spark: SparkSession, path: str, row_tag: str = "customer") -> DataFrame:
    """Scan the records of an XML document with the native source
    (namespaced attrs land as ``_``-prefixed fields, e.g. ``_dt:dt``)."""
    return spark.read.format("xml").option("rowTag", row_tag).load(path)


def read_root_attrs(path: str) -> tuple[str, dict[str, str]]:
    """Driver-side peek at the envelope: root tag + attributes
    (namespace-expanded keys), without loading the document body."""
    import xml.etree.ElementTree as ET

    for _event, elem in ET.iterparse(path, events=("start",)):
        return elem.tag, dict(elem.attrib)
    raise ValueError(f"no root element in {path}")
