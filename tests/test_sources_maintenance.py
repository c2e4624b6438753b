"""Maintenance-operator properties that the value oracle can't see:
compaction actually reduces the file count, and partition pruning
actually prunes."""

import glob
import os

from pro_etl_spark.ops import sources as S


def test_compaction_reduces_file_count(spark):
    d = "/root/testdata/sf0.001"
    S.compact_small_files(spark, d).count()
    small = glob.glob(
        os.path.join(S._tmp(f"small_events_{S.dataset_suffix(d)}"), "*.parquet")
    )
    compacted = glob.glob(
        os.path.join(S._tmp(f"compacted_events_{S.dataset_suffix(d)}"), "*.parquet")
    )
    assert len(small) == 64
    assert len(compacted) == S.COMPACT_FILES
    assert spark.read.parquet(
        S._tmp(f"compacted_events_{S.dataset_suffix(d)}")
    ).count() == spark.read.parquet(
        S._tmp(f"small_events_{S.dataset_suffix(d)}")
    ).count()


def test_partition_pruning_in_plan(spark):
    """The physical plan must show partition-filter pruning (the scan's
    partition count equals the one selected date directory), not a
    post-scan filter over every partition."""
    d = "/root/testdata/sf0.001"
    df = S.scan_partition_pruned(spark, d)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan
