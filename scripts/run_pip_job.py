"""spark-submit entry point: the north-star PIP job.

    spark-submit --master <cluster> \
        --py-files dist/geo_inference_spark.zip \
        scripts/run_pip_job.py \
        --pages <parquet/iceberg path or synth:N> \
        --out <output parquet> [--res 8] [--areas 64] \
        [--ledger <ledger path>] [--units 8] [--unit-col cell_h4_bkt]

The script imports the engine ONLY from the shipped zip (no repo on
the executors), runs geocode -> adaptive-cover PIP join -> per-area
counts, and commits ONE LEDGER ROW PER UNIT (a hash slice of the
input, or the table's physical bucket when --unit-col names one), so
a crashed run resumes exactly the unfinished units via the ledger
anti-join (north rule: per-partition lineage). --units 1 reproduces
the old whole-input commit.
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages parquet path, or synth:<n_rows>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=8)
    ap.add_argument("--areas", type=int, default=64)
    ap.add_argument("--ledger", default=None)
    ap.add_argument("--units", type=int, default=8,
                    help="ledger units (one commit per unit)")
    ap.add_argument("--unit-col", default=None,
                    help="0..units-1 int column that is the table's "
                         "physical partition column (partition-pruned "
                         "units); default: xxhash64(page_id) slices")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pip-job").getOrCreate()

    # engine imports resolve from --py-files on the executors/driver
    from geo_inference_spark.operators.pip_join import pages_per_area
    from geo_inference_spark.plans.ledger import CheckpointLedger
    from geo_inference_spark.plans.pip_job import (
        finalize_pip_job,
        resumable_pip_job,
        unit_keys,
    )
    from geo_inference_spark.sources.pages import pages_df, synth_admin_polygons

    if args.pages.startswith("synth:"):
        pages = pages_df(spark, int(args.pages.split(":")[1]))
    else:
        pages = spark.read.parquet(args.pages)
    polys = synth_admin_polygons(n_areas=args.areas)
    tag = f"{args.pages}@res{args.res}"

    t0 = time.perf_counter()
    if args.ledger is None:
        # no ledger: single straight-through run, no resume
        out = pages_per_area(spark, pages, polys, res=args.res)
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).agg({"cnt": "sum"}).collect()[0][0]
        dt = time.perf_counter() - t0
        print(f"DONE {tag}: {n} matched pages in {dt:.1f}s -> {args.out}")
        return

    ledger = CheckpointLedger(spark, args.ledger)
    done_before = {r.part_key for r in ledger.done("pip_job").collect()}
    keys = unit_keys(tag, args.units)
    todo = [k for k in keys if k not in done_before]
    if not todo:
        print(f"SKIP {tag}: all {args.units} units already committed")
        return
    if len(todo) < len(keys):
        print(f"RESUME {tag}: {len(todo)}/{len(keys)} units remaining")
    ran = resumable_pip_job(
        spark, pages, polys, args.out, args.res, ledger, tag,
        n_units=args.units, unit_col=args.unit_col,
    )
    final = finalize_pip_job(spark, args.out, n_units=args.units)
    n = final.agg({"cnt": "sum"}).collect()[0][0]
    dt = time.perf_counter() - t0
    # "resumed" = THIS run's unit keys that were already in the ledger;
    # done_before also holds other tags/unit counts in a shared ledger
    # (ADVICE r4)
    resumed = len(set(keys) & done_before)
    print(
        f"DONE {tag}: {n} matched pages in {dt:.1f}s "
        f"({len(ran)} units run, {resumed} resumed) -> {args.out}"
    )


if __name__ == "__main__":
    main()
