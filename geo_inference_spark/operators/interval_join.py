"""Bucketized range/interval join.

A naive ``points.ts BETWEEN iv.start AND iv.end`` join is a
BroadcastNestedLoopJoin in Spark — O(points x intervals) compares.
This operator turns it into a hash equi-join: intervals explode into
the fixed-width time buckets they overlap, points map to their single
bucket, the join runs on bucket id, and the exact BETWEEN predicate
refines the survivors. Cost: O(points + intervals x span/bucket)
rows through one hash join — the classic bucketized range-join shape
(cf. Spark's own range-join hints in Databricks runtime; built here
from first principles).

Bucket width trades replication vs selectivity: ~median interval
length is a good default; skewed giant intervals replicate more but
AQE splits the hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """points ⋈ intervals ON start <= ts < end, as bucket equi-join +
    exact refine. Interval columns ride along on the output.

    Inner-join only: the post-join BETWEEN refine would silently drop
    the NULL-padded rows of any outer variant, so outer semantics are
    not offered rather than offered wrongly.
    """
    b = F.lit(int(bucket_seconds)).cast("long")
    ivb = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col).cast("long") / b).cast("long"),
                # end is exclusive, but a point in the same bucket as
                # `end` can still be < end, so cover end's bucket too
                (F.unix_timestamp(end_col).cast("long") / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bkt", (F.unix_timestamp(point_ts).cast("long") / b).cast("long")
    )
    j = pts.join(ivb, on="_bkt", how="inner")
    return j.filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    ).drop("_bkt")
