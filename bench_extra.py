"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times each __spark_entry__.queries() entry with either the noop sink
(full evaluation of every column — defeats count()'s column pruning)
or the frozen bench's count() semantics, labels jobs, and optionally
writes .explain("formatted") output per query.

Usage:
  python bench_extra.py [--mode noop|count] [--queries a,b,c]
      [--repeat N] [--explain-dir plans/r06] [--suffix _before]

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from geo_inference_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["noop", "count"], default="count")
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("bench_extra", cores=cores)
    spark.range(1000).count()  # warm JVM + workers

    sel = [q.strip() for q in args.queries.split(",") if q.strip()]
    qs = entrymod.queries()
    if sel:
        qs = {k: qs[k] for k in sel}

    timings: dict[str, list[float]] = {}
    for name, fn in qs.items():
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [{args.mode} r{i}]")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            timings.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            spark.catalog.clearCache()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(
                os.path.join(
                    args.explain_dir, f"{name}{args.suffix}.txt"
                ),
                "w",
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps({"query": name, "mode": args.mode,
                        "secs": timings[name]}),
            flush=True,
        )
    print(json.dumps({
        "total_min": round(sum(min(v) for v in timings.values()), 3),
        "mode": args.mode, "sf_dir": sf_dir, "cores": cores,
    }))


if __name__ == "__main__":
    main()
