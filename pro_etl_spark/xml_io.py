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
- **envelope (the O(1) side)**: `write_xml_document` streams part
  files between a hand-built header/footer through the driver — fine
  for the reference-parity single document, a single-writer ceiling at
  100 TB. `write_xml_document_manifest` is the scale mode: the
  document is an ordered file set (header part, record parts, footer
  part) plus a manifest; envelope assembly writes O(1) bytes + one
  manifest line per part (no record byte touches the driver), and the
  final stitch — when one physical file is truly needed — is the
  storage layer's primitive (`hdfs concat` / S3 multipart compose),
  handed to `compose_manifest` as a callable. `read_manifest_document`
  consumes the file set directly, so most readers never compose.

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


def write_xml_document_manifest(
    records: DataFrame,
    out_dir: str,
    root_tag: str = "enfinity",
    root_attrs: dict[str, str] | None = None,
    nsmap: dict[str, str] | None = None,
) -> str:
    """Storage-layer-compose form of ``write_xml_document`` — the 100×
    answer to the single-document envelope (VERDICT r10 #6). The
    document is materialized as an ORDERED FILE SET: an O(1)-byte
    header part (declaration + root open tag), the distributed record
    parts exactly as the text sink wrote them, and an O(1)-byte footer
    part — plus a MANIFEST file listing the parts in document order.
    NO record byte moves through the driver: envelope assembly is two
    tiny files and one manifest line per part, flat in data volume by
    construction (and measured so — see tests/test_xml_io.py).

    When a consumer truly needs one physical file, the stitch is the
    storage layer's primitive — ``hdfs concat`` splices blocks without
    copying, S3 multipart compose assembles from uploaded parts —
    which ``compose_manifest`` accepts as a callable; its local
    stream-copy default exists only for filesystems (like this
    sandbox's) that lack one. Consumers that can read a file set never
    compose at all: ``read_manifest_document`` parses records straight
    off the parts and envelope attrs off the header.

    Returns the manifest path."""
    parts_dir = os.path.join(out_dir, "parts")
    records.write.mode("overwrite").text(parts_dir)
    ns = "".join(f' xmlns:{p}="{u}"' for p, u in (nsmap or {}).items())
    ra = "".join(f' {k}="{v}"' for k, v in (root_attrs or {}).items())
    header = os.path.join(out_dir, "00_header.xml")
    footer = os.path.join(out_dir, "zz_footer.xml")
    with open(header, "w", encoding="utf-8") as w:
        w.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        w.write(f"<{root_tag}{ns}{ra}>\n")
    with open(footer, "w", encoding="utf-8") as w:
        w.write(f"</{root_tag}>\n")
    manifest = os.path.join(out_dir, "MANIFEST")
    ordered = (
        [header]
        + sorted(glob.glob(os.path.join(parts_dir, "part-*")))
        + [footer]
    )
    with open(manifest, "w", encoding="utf-8") as w:
        w.write("\n".join(ordered) + "\n")
    return manifest


def compose_manifest(manifest_path: str, out_file: str, concat=None) -> str:
    """Stitch a manifest's ordered parts into one physical file.

    ``concat`` is the storage-layer primitive — signature
    ``concat(paths: list[str], out_file: str)`` — e.g. an ``hdfs
    concat`` / S3-multipart-compose binding that splices blocks
    without streaming them through any single node. The default is a
    local stream-copy fallback (the only primitive a plain local FS
    offers); at scale, pass the real one."""
    with open(manifest_path, "r", encoding="utf-8") as r:
        paths = [ln.strip() for ln in r if ln.strip()]
    if concat is not None:
        concat(paths, out_file)
        return out_file
    with open(out_file, "w", encoding="utf-8") as w:
        for p in paths:
            with open(p, "r", encoding="utf-8") as src:
                shutil.copyfileobj(src, w)
    return out_file


def read_manifest_document(
    spark: SparkSession,
    manifest_path: str,
    row_tag: str = "customer",
    schema=None,
    infer_sample_records: int = 64,
) -> tuple[str, dict[str, str], DataFrame]:
    """Read a manifest document WITHOUT composing it: root tag +
    envelope attrs come from the O(1) header part; records come
    straight off the distributed fragment parts. The native XML
    source can't read root-less fragments (one root per file — it
    corrupt-records everything after the first element; measured), so
    the fragment read is built from two JVM-side primitives instead:
    the text source splits record boundaries with ``lineSep =
    "</row_tag>\\n"`` (escaped content can never contain a literal
    ``<``, so the boundary is unambiguous), and ``from_xml`` parses
    each record under a synthetic wrapper that re-binds the envelope's
    namespace declarations (fragments inherit them from the root at
    compose time; standalone they'd be undeclared). Fully distributed,
    no Python in the row path, and the single physical file never
    exists — this is the consumption path at scale.

    Schema: pass ``schema`` (DDL string or StructType of ONE record's
    fields) for production reads — heterogeneous corpora REQUIRE it
    for guaranteed fidelity. Without it, the record schema is inferred
    from a bounded MULTI-record sample (``infer_sample_records``,
    default 64) merged through one ``schema_of_xml`` call, so a child
    element that repeats in ANY sampled record (the real corpus has
    1-user and 2-user customers) infers as an array and single-child
    records parse as 1-element arrays — uniform, lossless. (The r11
    head(1) form let the first record's shape decide: a 1-user sample
    inferred ``user`` as a struct and silently mangled 2-user records,
    ADVICE_r11.) Residual inference risk: a field that repeats ONLY in
    records outside the sample still infers as a lone struct — that is
    inherent to bounded sampling, which is why ``schema`` exists.

    Returns (root_tag, root_attrs, records) with the record fields
    under their parsed struct columns."""
    import re

    with open(manifest_path, "r", encoding="utf-8") as r:
        paths = [ln.strip() for ln in r if ln.strip()]
    root_tag, root_attrs = read_root_attrs(paths[0])
    with open(paths[0], "r", encoding="utf-8") as r:
        ns = " ".join(re.findall(r'xmlns:[^\s=]+="[^"]*"', r.read()))
    close = f"</{row_tag}>"
    frags = (
        spark.read.option("lineSep", close + "\n")
        .text(paths[1:-1])
        .where(F.trim(F.col("value")) != "")
    )
    wrapped = frags.select(
        F.concat(
            F.lit(f"<w {ns}>"), F.col("value"), F.lit(close), F.lit("</w>")
        ).alias("xml")
    )
    if schema is not None:
        from pyspark.sql import types as T

        if isinstance(schema, T.StructType):
            wrapper_schema = T.StructType(
                [T.StructField(row_tag, schema)]
            )
        else:
            wrapper_schema = f"STRUCT<{row_tag}: {schema}>"
        return root_tag, root_attrs, wrapped.select(
            F.from_xml("xml", wrapper_schema).alias("w")
        ).select(f"w.{row_tag}.*")

    # bounded MULTI-record sample merged through ONE schema_of_xml
    # call: with >=2 records under the wrapper the inferencer unions
    # field shapes across records AND sees repetition, so a child that
    # repeats anywhere in the sample becomes an array for every record
    sample_rows = frags.select("value").head(infer_sample_records)
    if not sample_rows:
        raise ValueError(
            f"manifest {manifest_path} has no {row_tag} records to "
            "infer a schema from — pass an explicit schema= for "
            "empty documents"
        )
    merged = (
        f"<w {ns}>"
        + "".join(r[0] + close for r in sample_rows)
        + "</w>"
    )
    ddl = spark.range(1).select(
        F.schema_of_xml(F.lit(merged)).alias("s")
    ).first()[0]
    parsed = wrapped.select(F.from_xml("xml", ddl).alias("w"))
    from pyspark.sql import types as T

    field = parsed.schema["w"].dataType[row_tag].dataType
    if isinstance(field, T.ArrayType):
        # multi-record inference wraps the row tag itself in an array;
        # each fragment holds exactly one record, so [0] unwraps it
        records = parsed.select(
            F.col(f"w.{row_tag}").getItem(0).alias("_r")
        ).select("_r.*")
    else:
        records = parsed.select(f"w.{row_tag}.*")
    return root_tag, root_attrs, records


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
    if shard_assign is not None:
        # loud range gate (ADVICE_r11): a null or out-of-range caller
        # assignment (e.g. a non-numeric id cast to int -> NULL) must
        # fail the job, not silently land records in bogus partition
        # dirs the manifest never accounts for
        a = shard_assign.cast("int")
        assign = F.when(
            a.isNotNull() & (a >= 0) & (a < shards), a
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"write_xml_document_sharded: shard_assign "
                        f"outside [0, {shards}): "
                    ),
                    F.coalesce(
                        shard_assign.cast("string"), F.lit("NULL")
                    ),
                )
            )
        )
    else:
        assign = F.pmod(F.hash(shard_key), F.lit(shards))
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
