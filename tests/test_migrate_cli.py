"""End-to-end CLI test: the reference's whole program (XML + CSV in →
delta XML + log CSV out, found/total summary) driven through
``pro_etl_spark.migrate_cli`` on a fixture that covers the reference's
example edge cases (SURVEY §5.1): a fully-valid row, a false-flag row,
an empty delivery_day (→ '-3D' default), an invalid delivery_day
(advisory Not OK but still transformed), a duplicated key
(first-row-wins) and an unknown non-ASCII id (anti path)."""

from __future__ import annotations

import textwrap
import xml.etree.ElementTree as ET

import pyspark.sql.functions as F
import pytest

from pathlib import Path

from pro_etl_spark import migrate_cli, xml_io

FIXTURE_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8"?>
    <enfinity xmlns:i="http://www.intershop.com/xml/ns/intershop/customer/impex/7.3" xmlns:dt="http://www.intershop.com/xml/ns/enfinity/6.5/core/impex-dt" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xsi:schemaLocation="http://www.intershop.com/xml/ns/intershop/customer/impex/7.3 customer.xsd" major="7" minor="3">
      <customer id="1001">
        <custom-attributes>
          <custom-attribute name="MEK_Store_Id" dt:dt="string">OLD1</custom-attribute>
          <custom-attribute name="MEK_Store_Name" dt:dt="string">Old Store</custom-attribute>
          <custom-attribute name="MEK_DataAreaID" dt:dt="string">OLDSRC</custom-attribute>
        </custom-attributes>
        <user business-partner-no="1001">
          <default-customer>1001</default-customer>
          <user-groups>
            <user-group id="CG_Other"/>
          </user-groups>
          <custom-attributes>
            <custom-attribute name="LastOrderDate" dt:dt="string">2023-01-01</custom-attribute>
            <custom-attribute name="Keep" dt:dt="string">yes</custom-attribute>
          </custom-attributes>
          <credentials>
            <login>u1001</login>
            <last-logged-in>2023-06-01T08:00:00</last-logged-in>
          </credentials>
          <profile>
            <creation-date>2019-05-05T00:00:00+00:00</creation-date>
          </profile>
        </user>
      </customer>
      <customer id="1002">
        <custom-attributes>
          <custom-attribute name="MEK_DefaultDeliveryday" dt:dt="string">-5D</custom-attribute>
        </custom-attributes>
        <user business-partner-no="1002">
          <default-customer>1002</default-customer>
          <user-groups>
            <user-group id="CG_Mekonomen"/>
          </user-groups>
          <custom-attributes/>
          <credentials>
            <login>u1002</login>
          </credentials>
          <profile>
            <creation-date>2020-06-06T00:00:00+00:00</creation-date>
          </profile>
        </user>
      </customer>
      <customer id="1003">
        <custom-attributes/>
        <user business-partner-no="1003">
          <default-customer>1003</default-customer>
          <user-groups>
            <user-group id="CG_Other"/>
          </user-groups>
          <custom-attributes/>
          <credentials>
            <login>u1003</login>
          </credentials>
          <profile>
            <creation-date>2021-07-07T00:00:00+00:00</creation-date>
          </profile>
        </user>
      </customer>
      <customer id="1004">
        <custom-attributes/>
        <user business-partner-no="1004">
          <default-customer>1004</default-customer>
          <user-groups>
            <user-group id="CG_Other"/>
          </user-groups>
          <custom-attributes/>
          <credentials>
            <login>u1004</login>
          </credentials>
          <profile>
            <creation-date>2022-08-08T00:00:00+00:00</creation-date>
          </profile>
        </user>
      </customer>
    </enfinity>
    """)

FIXTURE_CSV = textwrap.dedent("""\
    current_customer_id,new_customer_id,new_source_id,new_store_id,new_store_name,mandatory_reference,delivery_day
    1001,N1001,SRC9,ST9,New Store Nine,TRUE,-2D
    1002,N1002,SRC9,ST9,New Store Nine,false,
    1003,N1003,SRC9,ST9,New Store Nine,,-12D
    1003,DUPE,SRC8,ST8,Dupe Store,,-4D
    4123Ö47,N4123,SRC9,ST9,New Store Nine,true,-3D
    """)


@pytest.fixture(scope="module")
def cli_out(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    xml = d / "export.xml"
    csv = d / "mapping.csv"
    xml.write_text(FIXTURE_XML, encoding="utf-8")
    csv.write_text(FIXTURE_CSV, encoding="utf-8")
    out = migrate_cli.run(spark, str(xml), str(csv), str(d / "out"))
    return out


def test_summary_counts(cli_out):
    # 4 distinct mapping keys after first-wins dedup: 1001, 1002, 1003, 4123Ö47
    assert cli_out["total"] == "4"
    assert cli_out["found"] == "3"  # 4123Ö47 not in XML


def test_output_layout_matches_reference(cli_out):
    # reference writes output/<YYYY-MM-DD>/output-<uuid>.xml as a flat
    # file (migrate.py:286-293)
    import re
    from pathlib import Path

    p = Path(cli_out["xml"])
    assert p.is_file()
    assert re.fullmatch(r"output-[0-9a-f]{12}\.xml", p.name)
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", p.parent.name)
    assert cli_out["run_ts"].startswith(p.parent.name)


def test_scale_mode_writes_manifest_document(spark, tmp_path, cli_out):
    """--scale swaps the driver-streamed single file for the manifest
    document (VERDICT r11 #8): the CLI's 100x story must match the
    library's. The manifest composes to EXACTLY the bytes the flat
    mode writes (same records, same envelope, same order), and the
    file set is consumable without composing at all."""
    d = tmp_path
    (d / "export.xml").write_text(FIXTURE_XML, encoding="utf-8")
    (d / "mapping.csv").write_text(FIXTURE_CSV, encoding="utf-8")
    out = migrate_cli.run(
        spark,
        str(d / "export.xml"),
        str(d / "mapping.csv"),
        str(d / "out"),
        scale=True,
    )
    manifest = Path(out["xml"])
    assert manifest.is_file() and manifest.name == "MANIFEST"
    composed = str(d / "composed.xml")
    xml_io.compose_manifest(str(manifest), composed)
    assert (
        open(composed, "rb").read() == open(cli_out["xml"], "rb").read()
    )
    root_tag, attrs, records = xml_io.read_manifest_document(
        spark, str(manifest)
    )
    assert root_tag == "enfinity"
    assert attrs["major"] == "7"
    got = {r[0] for r in records.select("_id").collect()}
    assert got == {"N1001", "N1002", "N1003"}


def test_log_statuses(spark, cli_out):
    log = spark.read.option("header", True).csv(cli_out["log"])
    got = {r.current_id: (r.status, r.reason) for r in log.collect()}
    assert len(got) == 4
    assert got["1001"][0] == "OK"
    assert got["1002"][0] == "OK"  # empty delivery_day → '-3D' default is valid
    assert got["1003"] == ("Not OK", migrate_cli.REASON_INVALID)  # -12D invalid
    assert got["4123Ö47"] == ("Not OK", migrate_cli.REASON_NOT_FOUND)


def test_delta_xml_document(spark, cli_out):
    root = ET.parse(cli_out["xml"]).getroot()
    assert root.tag == "enfinity"
    assert root.attrib["major"] == "7"
    assert root.attrib[
        "{http://www.w3.org/2001/XMLSchema-instance}schemaLocation"
    ].endswith("customer.xsd")

    custs = {c.attrib["id"]: c for c in root.findall("customer")}
    # advisory validation: invalid 1003 still flows to the output (§2.11.4)
    assert set(custs) == {"N1001", "N1002", "N1003"}

    DT = "{http://www.intershop.com/xml/ns/enfinity/6.5/core/impex-dt}dt"

    def attrs(el):
        return {
            a.attrib["name"]: (a.attrib.get(DT), a.text)
            for a in el.findall("custom-attributes/custom-attribute")
        }

    a1 = attrs(custs["N1001"])
    assert a1["MEK_Store_Id"] == ("string", "ST9")
    assert a1["MEK_Store_Name"] == ("string", "New Store Nine")
    assert a1["MEK_DataAreaID"] == ("string", "SRC9")
    assert a1["MEK_DefaultDeliveryday"] == ("string", "-2D")
    assert a1["MEK_CustomerOrderNumberMandatory"] == ("boolean", "true")

    # empty delivery_day → default; upsert updates the existing attr
    a2 = attrs(custs["N1002"])
    assert a2["MEK_DefaultDeliveryday"] == ("string", "-3D")
    assert a2["MEK_CustomerOrderNumberMandatory"] == ("boolean", "false")

    # NULL mandatory_reference → attribute absent (no literal 'nan':
    # the reference's §2.11.2 bug, not replicated); invalid -12D written
    # as-is (advisory)
    a3 = attrs(custs["N1003"])
    assert "MEK_CustomerOrderNumberMandatory" not in a3
    assert a3["MEK_DefaultDeliveryday"] == ("string", "-12D")
    # first-row-wins: the DUPE row did not apply
    assert custs["N1003"].find("user").attrib["business-partner-no"] == "N1003"

    u1 = custs["N1001"].find("user")
    assert u1.find("default-customer").text == "N1001"
    groups = {g.attrib["id"] for g in u1.findall("user-groups/user-group")}
    assert "CG_Mekonomen" in groups and "CG_Other" in groups
    ua = {a.attrib["name"] for a in u1.findall("custom-attributes/custom-attribute")}
    assert "LastOrderDate" not in ua and "Keep" in ua
    assert u1.find("credentials/last-logged-in") is None
    assert u1.find("credentials/login").text == "u1001"
    assert u1.find("profile/creation-date").text == cli_out["run_ts"]


def test_strict_mode_excludes_invalid(spark, tmp_path):
    """strict=True drops 'Not OK' rows from the output document while
    the log keeps the complete reconciliation trail (SURVEY §7.3.4)."""
    xml = tmp_path / "export.xml"
    csv = tmp_path / "mapping.csv"
    xml.write_text(FIXTURE_XML, encoding="utf-8")
    csv.write_text(FIXTURE_CSV, encoding="utf-8")
    out = migrate_cli.run(spark, str(xml), str(csv), str(tmp_path / "out"), strict=True)
    root = ET.parse(out["xml"]).getroot()
    ids = {c.attrib["id"] for c in root.findall("customer")}
    assert ids == {"N1001", "N1002"}  # N1003 (-12D) excluded under strict
    log = spark.read.option("header", True).csv(out["log"])
    assert log.count() == 4  # log unchanged: full trail


def test_group_not_duplicated(spark, cli_out):
    root = ET.parse(cli_out["xml"]).getroot()
    n1002 = [c for c in root.findall("customer") if c.attrib["id"] == "N1002"][0]
    groups = [g.attrib["id"] for g in n1002.findall("user/user-groups/user-group")]
    assert groups.count("CG_Mekonomen") == 1


def test_login_not_rewritten_when_distinct(spark, cli_out):
    """The generalized id-rewrite touches only text equal to the old id:
    u1001 != 1001, so the login survives (migrate.py:223-225)."""
    root = ET.parse(cli_out["xml"]).getroot()
    n1001 = [c for c in root.findall("customer") if c.attrib["id"] == "N1001"][0]
    assert n1001.find("user/credentials/login").text == "u1001"


FIXTURE_XML_LOGIN_IS_ID = FIXTURE_XML.replace(
    "<login>u1002</login>", "<login>1002</login>"
)


def test_subtree_rewrite_hits_login(spark, tmp_path):
    """Golden case for the reference's generalized descendant rewrite
    (migrate.py:223-225): a login whose text equals the old customer id
    comes out rewritten to the new id."""
    xml = tmp_path / "export.xml"
    csv = tmp_path / "mapping.csv"
    xml.write_text(FIXTURE_XML_LOGIN_IS_ID, encoding="utf-8")
    csv.write_text(FIXTURE_CSV, encoding="utf-8")
    out = migrate_cli.run(spark, str(xml), str(csv), str(tmp_path / "out"))
    root = ET.parse(out["xml"]).getroot()
    n1002 = [c for c in root.findall("customer") if c.attrib["id"] == "N1002"][0]
    assert n1002.find("user/credentials/login").text == "N1002"


def test_default_input_discovery(spark, tmp_path, capsys, monkeypatch):
    """--xml/--csv omitted → the CLI picks the newest .xml/.csv from
    --input-dir by mtime (reference migrate.py:39-69 default mode)."""
    import os
    import time

    inp = tmp_path / "input"
    inp.mkdir()
    (inp / "old.xml").write_text("<enfinity/>", encoding="utf-8")
    (inp / "old.csv").write_text("x\n", encoding="utf-8")
    (inp / "export.xml").write_text(FIXTURE_XML, encoding="utf-8")
    (inp / "mapping.csv").write_text(FIXTURE_CSV, encoding="utf-8")
    now = time.time()
    os.utime(inp / "old.xml", (now - 1000, now - 1000))
    os.utime(inp / "old.csv", (now - 1000, now - 1000))
    os.utime(inp / "export.xml", (now, now))
    os.utime(inp / "mapping.csv", (now, now))

    assert migrate_cli.latest_file(str(inp), ".xml") == str(inp / "export.xml")
    assert migrate_cli.latest_file(str(inp), ".csv") == str(inp / "mapping.csv")
    assert migrate_cli.latest_file(str(tmp_path / "nope"), ".xml") is None

    # end-to-end through main(): the builder returns the already-active
    # test session; neuter stop() so main()'s finally doesn't tear down
    # the shared fixture
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    migrate_cli.main(
        [
            "--input-dir",
            str(inp),
            "--output-dir",
            str(tmp_path / "out"),
            "--master",
            spark.sparkContext.master,
        ]
    )
    printed = capsys.readouterr().out
    assert f"discovered inputs: xml={inp / 'export.xml'}" in printed
    assert "3/4 customers found in source XML" in printed
