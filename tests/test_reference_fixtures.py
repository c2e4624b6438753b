"""Reference-parity proof on the reference's OWN shipped fixtures
(`/root/reference/input/examples/` — public example data): the CSV
lists four distinct customer ids, the XML export contains a single
placeholder customer (id "----"), so the documented reference
semantics (migrate.py:39-306) produce a 0/4 found summary, four
"Not found in source file" log rows (not-found outranks the
invalid '---' delivery_day — migrate.py logs the anti side first),
an EMPTY delta document, and an envelope that carries the input
root's version attributes + xsi:schemaLocation forward
(migrate.py:274-284). Skipped when the reference checkout is absent
so the repo stays standalone.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pytest

from pro_etl_spark import migrate_cli

REF_DIR = "/root/reference/input/examples"
REF_XML = f"{REF_DIR}/Example Full Customer Export from MekB2BNO.xml"
REF_CSV = f"{REF_DIR}/Example Customer Migration List.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(REF_XML) and os.path.isfile(REF_CSV)),
    reason="reference example fixtures not present",
)


@pytest.fixture(scope="module")
def ref_out(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_fixtures")
    return migrate_cli.run(spark, REF_XML, REF_CSV, str(d / "out"))


def test_found_total_summary(ref_out):
    # four distinct CSV keys (401419, 128756, 412347, 4123Ö47); none
    # match the placeholder customer id "----"
    assert ref_out["total"] == "4"
    assert ref_out["found"] == "0"


def test_all_rows_logged_not_found(spark, ref_out):
    log = spark.read.option("header", True).csv(ref_out["log"])
    rows = {r.current_id: (r.status, r.reason) for r in log.collect()}
    assert set(rows) == {"401419", "128756", "412347", "4123Ö47"}
    for cid, (status, reason) in rows.items():
        assert status == "Not OK", cid
        # not-found outranks the invalid '---' delivery_day on 4123Ö47
        assert reason == migrate_cli.REASON_NOT_FOUND, cid
    # new ids pass through from the mapping (including the duplicate
    # new id X412347X shared by rows 412347 and 4123Ö47)
    new_ids = {r.new_id for r in log.collect()}
    assert new_ids == {"X401419X", "X128756X", "X412347X"}


def test_empty_delta_document_with_envelope_fidelity(ref_out):
    root = ET.parse(ref_out["xml"]).getroot()
    assert root.tag == "enfinity"
    # version attributes copied from the input root (migrate.py:279-281)
    assert root.attrib["major"] == "6"
    assert root.attrib["minor"] == "1"
    assert root.attrib["family"] == "enfinity"
    assert root.attrib["branch"] == "enterprise"
    assert root.attrib["build"] == "4.53.1_6"
    # xsi:schemaLocation preserved verbatim (migrate.py:275-277)
    loc = root.attrib["{http://www.w3.org/2001/XMLSchema-instance}schemaLocation"]
    assert "b2b_customer.xsd" in loc and loc.endswith("dt.xsd")
    # no CSV id matched, so the delta contains zero customers
    assert root.findall("customer") == []
