"""Benchmark harness — prints ONE JSON line for the driver.

Runs every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
north-star workload (synthetic pages -> geocode -> PIP join -> agg)
at a fixed page count. value = total wall seconds across queries
(lower is better); per-query seconds in "queries"; pages/sec
throughput and core count in "extra".

Scaling evidence (north rule): run with SPARK_GRAFT_CPUS=8 and =32 on
the same inputs and compare extra.pages_pip_join_pages_per_sec —
scripts/bench_scaling.py automates the pair and writes BENCH/
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from geo_inference_spark.operators.pip_join import pages_per_area  # noqa: E402
from geo_inference_spark.session import get_spark  # noqa: E402
from geo_inference_spark.sources.pages import pages_df, synth_admin_polygons  # noqa: E402

N_PAGES = int(os.environ.get("BENCH_PAGES", "300000"))


def loadavg_1m() -> float:
    """Host 1-minute load — recorded so regressions are attributable:
    BASELINE.md documents 2-3x per-query swings from concurrent load
    on this shared VM; never time two jobs at once."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # pragma: no cover - non-Linux
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    load_start = loadavg_1m()
    if load_start > 4.0:
        print(
            f"# WARNING: host 1-min load {load_start:.1f} before bench — "
            "timings will be inflated by external contention",
            file=sys.stderr,
        )
    spark = get_spark("bench", cores=cores)
    timings: dict[str, float] = {}

    # warm the JVM + python workers once
    spark.range(1000).count()

    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
        # isolate queries: drop persisted frames (dedup signatures,
        # polygonize facts) so storage pressure can't bleed across
        spark.catalog.clearCache()

    # north-star workload: pages table (materialized once, untimed —
    # at 10^12 rows the table already exists in Iceberg) -> geocode ->
    # PIP join -> agg
    pages_path = f"/tmp/bench_pages_{N_PAGES}"
    if not os.path.isdir(pages_path):
        pages_df(spark, N_PAGES, partitions=cores * 2).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    polys = synth_admin_polygons(n_areas=64)
    # first run warms codegen/JIT (untimed); the throughput claim is
    # steady state — at 10^12 rows the compile cost amortizes to zero.
    # MEDIAN of 3 timed runs: this shared host's minute-scale load
    # swings otherwise dominate the headline number
    pages_per_area(spark, pages, polys, res=8).count()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        pages_per_area(spark, pages, polys, res=8).count()
        runs.append(time.perf_counter() - t0)
    pip_sec = sorted(runs)[1]
    timings["pages_pip_join"] = round(pip_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "pages_pip_join_pages_per_sec": round(N_PAGES / pip_sec),
                    "cores": cores,
                    "n_pages": N_PAGES,
                    "load_1m_start": load_start,
                    "load_1m_end": loadavg_1m(),
                    "load_contended": load_start > 4.0,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
