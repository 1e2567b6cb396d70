"""spark-submit entry point: the north-star PIP job.

    spark-submit --master <cluster> \
        --py-files dist/geo_inference_spark.zip \
        scripts/run_pip_job.py \
        --pages <parquet/iceberg path or synth:N> \
        --out <output parquet> [--res 8] [--areas 64] \
        [--ledger <ledger path>]

The script imports the engine ONLY from the shipped zip (no repo on
the executors), runs geocode -> adaptive-cover PIP join -> per-area
counts, writes the result, and commits a ledger entry so a rerun
skips completed work (resumable-from-checkpoint requirement).
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
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pip-job").getOrCreate()

    # engine imports resolve from --py-files on the executors/driver
    from geo_inference_spark.operators.pip_join import pages_per_area
    from geo_inference_spark.plans.ledger import CheckpointLedger
    from geo_inference_spark.sources.pages import pages_df, synth_admin_polygons

    if args.pages.startswith("synth:"):
        pages = pages_df(spark, int(args.pages.split(":")[1]))
    else:
        pages = spark.read.parquet(args.pages)
    polys = synth_admin_polygons(n_areas=args.areas)

    part_key = f"{args.pages}@res{args.res}"
    ledger = CheckpointLedger(spark, args.ledger) if args.ledger else None
    if ledger is not None:
        done = {r.part_key for r in ledger.done("pip_job").collect()}
        if part_key in done:
            print(f"SKIP {part_key}: already committed")
            return

    t0 = time.perf_counter()
    out = pages_per_area(spark, pages, polys, res=args.res)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).agg({"cnt": "sum"}).collect()[0][0]
    dt = time.perf_counter() - t0
    print(f"DONE {part_key}: {n} matched pages in {dt:.1f}s -> {args.out}")
    if ledger is not None:
        ledger.commit("pip_job", [(part_key, int(n), int(dt * 1000))])


if __name__ == "__main__":
    main()
