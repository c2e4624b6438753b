"""UDF / UDAF / grouped-map surface (SURVEY §2.10 X1–X3).

The reference's entire per-customer transform is one hand-written
Python "UDF" in a loop (migrate.py:116-257). Design rule: native
Column expressions first (everything in the reference is expressible
natively — §2.10); these operators exist to prove the escape hatch is
wired correctly, Arrow-vectorized end-to-end, never row-at-a-time.

Each UDF here intentionally computes something *also* expressible in
SQL so the DuckDB oracle can verify the Arrow round-trip exactly
(integer/exact-float ops only — no order-dependent accumulation).

UDFs are created lazily (inside the query functions) because
``pandas_udf`` type parsing needs an active SparkSession.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from pro_etl_spark.io import load
from pro_etl_spark.registry import register


@register(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, d: str) -> DataFrame:
    """X1: scalar vectorized UDF (Arrow batches — one Python call per
    ~10k-row batch, never per row). The oracle recomputes the same
    statistic relationally, verifying the Arrow transfer."""

    @pandas_udf("long")
    def n_spaces(text: pd.Series) -> pd.Series:
        return text.str.count(" ").astype("int64")

    return load(spark, d, "documents").select(
        "doc_id", n_spaces(F.col("text")).alias("n_spaces")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS spend_delta
    FROM orders
    """,
)
def udf_grouped_map(spark: SparkSession, d: str) -> DataFrame:
    """X2: grouped-map applyInPandas — the literal shape of the
    reference's per-customer loop (migrate.py:108-257) if it were ever
    needed: each key's rows arrive as one pandas frame. Deterministic
    (min-based, no float accumulation)."""

    def delta(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        out["spend_delta"] = pdf["o_totalprice"] - pdf["o_totalprice"].min()
        return out

    return (
        load(spark, d, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(delta, "o_custkey long, o_orderkey long, spend_delta double")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT o_custkey, MAX(o_totalprice) - MIN(o_totalprice) AS price_range
    FROM orders GROUP BY o_custkey
    """,
)
def udf_grouped_agg(spark: SparkSession, d: str) -> DataFrame:
    """X3: UDAF via pandas_udf grouped-agg (max-min: exact on any
    accumulation order)."""

    @pandas_udf("double")
    def price_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        load(spark, d, "orders")
        .groupBy("o_custkey")
        .agg(price_range(F.col("o_totalprice")).alias("price_range"))
    )
