"""Cell-prefix table partitioning -> source-level partition pruning
(SURVEY.md §4: the bbox crop P4 becomes partition pruning)."""

import os

import numpy as np
from pyspark.sql import functions as F

from geo_inference_spark.grid import hexgrid
from geo_inference_spark.sources.pages import (
    pages_cell_predicate,
    write_pages_partitioned,
)


def test_cell_partition_pruning_raw(spark, tmp_path):
    path = str(tmp_path / "pages_part")
    col = write_pages_partitioned(
        spark, 3000, path, part_res=3, partitions=8, n_buckets=None
    )
    df = spark.read.parquet(path)
    # query one hotspot cell (NYC) at the partition resolution
    target = int(hexgrid.latlng_to_cell(np.array([40.71]), np.array([-74.0]), 3)[0])
    q = df.filter(F.col(col) == target).select("page_id", "lat", "lon")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the scan as a partition filter, not a
    # post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert col in line and "[]" not in line.split("PartitionFilters:")[1][:40]
    n = q.count()
    assert n > 0
    # and the result is exactly the rows whose cell matches
    full = spark.read.parquet(path).withColumn("_chk", F.col(col) == target)
    assert n == full.filter("_chk").count()


def test_cell_partition_pruning_bucketed(spark, tmp_path):
    """bucket(N, cell) layout: bounded dir count AND pruning intact."""
    path = str(tmp_path / "pages_bkt")
    col = write_pages_partitioned(
        spark, 3000, path, part_res=3, partitions=8, n_buckets=16
    )
    # directory count is bounded by N, not by distinct cell values
    dirs = [d for d in os.listdir(path) if d.startswith(f"{col}_bkt=")]
    assert 0 < len(dirs) <= 16
    df = spark.read.parquet(path)
    target = int(hexgrid.latlng_to_cell(np.array([40.71]), np.array([-74.0]), 3)[0])
    q = df.filter(pages_cell_predicate(col, target, 16)).select(
        "page_id", "lat", "lon"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert f"{col}_bkt" in line
    assert "[]" not in line.split("PartitionFilters:")[1][:40]
    # the cell predicate reaches the parquet scan as a pushed filter
    assert "PushedFilters" in plan
    n = q.count()
    assert n > 0
    assert n == df.filter(F.col(col) == target).count()
