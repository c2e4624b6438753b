"""Query/oracle registry.

Every operator from SURVEY.md §2 registers a ``(spark, sf_dir) ->
DataFrame`` callable under its stable query key, optionally paired with
an ANSI-SQL oracle string that DuckDB can evaluate over the same
parquet tables. The driver compares row count + schema +
order-insensitive value hash, so:

- every computed column is explicitly aliased identically on both sides
- float aggregations go through DECIMAL casts (order-independent exact
  sums) and are cast back to DOUBLE at the end, so Spark and DuckDB
  produce bit-identical values regardless of partition/summation order
- session timezone is pinned to UTC so timestamp rendering matches
  DuckDB's naive parquet timestamps
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

#: exactness baselines: query key -> its scale-safe production twin.
#: These operators are correct but intentionally quadratic (blocked
#: all-pairs) — kept to certify the LSH/IVF twins' recall, never to run
#: on a real corpus. Surfaced by ``query_cli list`` so nobody picks a
#: quadratic plan by accident.
BASELINE_TWINS: Dict[str, str] = {}

#: runtime-settable confs applied before every registered query runs.
#: (The driver owns the SparkSession, so session-level tuning must be
#: applied at call time; all of these are runtime-mutable.)
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # static local-regime value. Scale-out headroom is expressed through
    # AQE instead (r13, guide §2.2): tune() sets
    # coalescePartitions.initialPartitionNum = max(64, 2×defaultParallelism)
    # when the session exposes a SparkContext, and parallelismFirst=false
    # below makes AQE size the post-shuffle partitions by BYTES
    # (advisoryPartitionSizeInBytes), so a real cluster gets thousands of
    # initial reduce partitions while tiny local shuffles coalesce to a
    # handful of tasks. The r12 form (shuffle.partitions itself =
    # 2×parallelism) kept 64 reduce TASKS alive for kilobyte shuffles at
    # local[32] — measured ~5% suite / up to 25% per-key of pure
    # scheduling overhead (VERDICT_r12 item 1).
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # restore the default broadcast threshold before every query:
    # join_bloom_runtime disables broadcasting for its own plan, and
    # re-tuning here guarantees the -1 never leaks into the next
    # query's planning
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    # same leak-guard for sink_partition_overwrite's dynamic mode
    "spark.sql.sources.partitionOverwriteMode": "static",
    # leak-guard for scan_agg_pushdown: it switches parquet to the v2
    # DataSource (aggregate pushdown is v2-only) for its own plan;
    # every other query plans against the v1 defaults
    "spark.sql.sources.useV1SourceList": "avro,csv,json,kafka,orc,parquet,text",
    "spark.sql.parquet.aggregatePushdown": "false",
    # same leak-guard for join_bloom_runtime: it zeroes the
    # application-side scan threshold to force the rewrite at test
    # scale; without restoring the defaults (enabled=true, 10GB)
    # every later shuffle join could get a bloom filter injected,
    # perturbing plan-shape tests and bench timings
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": str(10 * 1024 * 1024 * 1024),
}


def _ship_package(spark: SparkSession) -> None:
    """Distribute this package to executor Python workers.

    UDF closures (pandas_udf / applyInPandas / mapInPandas) are
    cloudpickled **by reference** to ``pro_etl_spark.ops.*``, so the
    worker interpreter must be able to ``import pro_etl_spark`` — true
    neither on a multi-node cluster where the package isn't pip-installed
    on workers, nor in local mode when the driver process was launched
    from a different cwd. ``addPyFile`` with a zip of the package is the
    standard cluster-deployment answer and covers both.
    """
    sc = spark.sparkContext
    if getattr(sc, "_pro_etl_spark_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(prefix="pro_etl_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._pro_etl_spark_shipped = True


#: conf keys whose set() already failed once this process — so the
#: immutable-conf fallback stays quiet but a typo'd/renamed conf key
#: is VISIBLE (one warning per key per session, never silent)
_CONF_WARNED: set = set()


def tune(spark: SparkSession) -> SparkSession:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            if k not in _CONF_WARNED:
                _CONF_WARNED.add(k)
                import logging

                logging.getLogger(__name__).warning(
                    "tune(): conf %s=%s not applied (%s) — immutable "
                    "in this deployment or unknown key", k, v, exc
                )
    # Scale-adaptive shuffle parallelism via AQE (r13, guide §2.2,
    # VERDICT_r12 item 1): AQE partition coalescing only SHRINKS the
    # initial count, so a constant 32 would cap every reduce stage at
    # 32 tasks on a real cluster. Express the headroom through
    # initialPartitionNum — the pre-coalesce partition count — instead
    # of spark.sql.shuffle.partitions itself: with
    # parallelismFirst=false (RUNTIME_CONFS) AQE then coalesces every
    # shuffle down to advisoryPartitionSizeInBytes-sized partitions, so
    # the kilobyte-scale shuffles of the local bench run a handful of
    # reduce tasks while a 1000-core cluster still fans out to 2000+
    # initial partitions. The r12 form (shuffle.partitions =
    # 2×parallelism) paid 64 scheduled reduce tasks per tiny shuffle at
    # local[32]: the driver's full-suite A/B measured it ~5% total /
    # up to 25% per-key slower than local[8] running the same code.
    # Parameterised by the live session (not an env constant), so the
    # driver's lower-core bench runs inherit the right value
    # automatically. Static shuffle.partitions=32 remains the fallback
    # for AQE-off deployments and SparkContext-less sessions (Connect).
    try:
        par = spark.sparkContext.defaultParallelism
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(64, 2 * par)),
        )
    except Exception:
        pass  # no SparkContext (e.g. Connect) — static floor stands
    try:
        _ship_package(spark)
    except Exception:
        pass  # read-only SparkContext (e.g. Connect) — rely on installed pkg
    return spark


def register(
    name: str,
    oracle: Optional[str] = None,
    baseline_twin: Optional[str] = None,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as query
    ``name`` with an optional DuckDB oracle SQL string.

    Oracle SQL may reference the pre-registered views ``region nation
    customer supplier part orders lineitem events documents
    embeddings``.

    ``baseline_twin`` marks the query as an exactness baseline whose
    production-path replacement is the named twin (see BASELINE_TWINS).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # extra kwargs pass through so variant parameters beyond the
        # driver contract (e.g. profile_columns(approx=True)) stay
        # callable on the registered name; the driver always calls
        # (spark, sf_dir) and hits the defaults
        def wrapped(
            spark: SparkSession, sf_dir: str, **kwargs
        ) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir, **kwargs)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        if baseline_twin is not None:
            BASELINE_TWINS[name] = baseline_twin
        return wrapped

    return deco
