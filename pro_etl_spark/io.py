"""Readers for the driver-generated parquet tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` so Catalyst gets full
pushdown/pruning; never ``collect`` here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so users can drive
    the engine through plain ``spark.sql`` — the SQL twin of the
    DataFrame surface (same Catalyst plans)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which vanilla Spark
        # cannot convert; read nanos as long (legacy conf, runtime-
        # settable) and truncate to microseconds — exactly what DuckDB
        # does when it reads the same file (its TIMESTAMP is µs).
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
