"""pro_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL tool
(``mullweisser/pro-etl``, analyzed in SURVEY.md), generalized into a
complete DataFrame-based operator library plus LLM-training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Design rules (SURVEY.md §2.10, §4):
- declarative DataFrame/SQL plans — let Catalyst/AQE pick physical strategy
- native ``pyspark.sql.functions`` first; Arrow-vectorized pandas UDFs
  only where column expressions genuinely cannot express the semantics
- no driver-side materialization in any operator (100 TB posture)
"""

from pro_etl_spark.registry import QUERIES, ORACLES, register  # noqa: F401


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from pro_etl_spark.ops import (  # noqa: F401
        relational,
        relational_ext,
        scalars,
        nested,
        migration,
        sources,
        streaming,
        udfs,
        dedup,
        similarity,
        text,
        multimodal,
    )


def get_queries():
    load_all()
    return dict(QUERIES)


def get_oracles():
    load_all()
    return dict(ORACLES)
