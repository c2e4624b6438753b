"""Portable cross-engine hashing primitives.

Token/content hashing uses the first 15 hex chars of md5 parsed as a
60-bit integer — bit-identical in Spark
(``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,15))::BIGINT``) — so even hash-based
operators (MinHash signatures, SimHash bit vectors, fingerprints,
salted splits) get full value oracles.

Lives in its own module so ``ops.text`` and ``ops.dedup`` can share it
without a circular import (text's pipeline oracle composes on dedup's
LSH pair CTE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def hash60(col: Column) -> Column:
    """Portable 60-bit md5-derived hash (same value in DuckDB via
    ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


DUCK_HASH60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
