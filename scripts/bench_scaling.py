"""Two-parallelism scaling evidence (north rule, sandbox protocol).

Runs the SAME north-star job (synthetic pages -> H3 geocode -> PIP
join -> per-area agg) on identical input at local[N_LO] and
local[N_HI] in separate JVMs (subprocess per level so executors don't
share), reports throughput at both plus scaling efficiency
  eff = (thr_hi / thr_lo) / (N_HI / N_LO)
and appends the table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_LO = int(os.environ.get("SCALE_LO", "8"))
N_HI = int(os.environ.get("SCALE_HI", "32"))
N_PAGES = int(os.environ.get("SCALE_PAGES", "1200000"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from geo_inference_spark.session import get_spark
from geo_inference_spark.operators.pip_join import pages_per_area
from geo_inference_spark.sources.pages import pages_df, synth_admin_polygons

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark("scaling", cores=cores)
spark.range(1000).count()  # warm
pages = pages_df(spark, n, partitions=cores * 2)
polys = synth_admin_polygons(n_areas=64)
# one untimed run to warm python workers, then the measured run
pages_per_area(spark, pages.limit(10000), polys, res=8).count()
t0 = time.perf_counter()
pages_per_area(spark, pages, polys, res=8).count()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({"cores": cores, "sec": dt, "pages_per_sec": n / dt}))
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_PAGES)],
        capture_output=True, text=True, timeout=1800,
        cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result at {cores} cores:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    lo = run_level(N_LO)
    hi = run_level(N_HI)
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / (N_HI / N_LO)
    report = {
        "n_pages": N_PAGES,
        "lo": lo,
        "hi": hi,
        "core_ratio": N_HI / N_LO,
        "throughput_ratio": hi["pages_per_sec"] / lo["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open("/root/repo/BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"North-star job: {N_PAGES:,} synthetic pages -> hex-cell geocode "
            f"(res 8) -> broadcast PIP join vs 64 admin polygons -> per-area count.\n\n"
            "| cores | wall sec | pages/sec |\n|---|---|---|\n"
            f"| {N_LO} | {lo['sec']:.2f} | {lo['pages_per_sec']:,.0f} |\n"
            f"| {N_HI} | {hi['sec']:.2f} | {hi['pages_per_sec']:,.0f} |\n\n"
            f"core ratio {N_HI / N_LO:.0f}x, throughput ratio "
            f"{report['throughput_ratio']:.2f}x, **scaling efficiency "
            f"{eff:.2f}** (north-rule target >= 0.8; single-host local mode "
            f"shares memory bandwidth/GC across all task slots, a real "
            f"multi-executor cluster isolates them).\n"
        )


if __name__ == "__main__":
    main()
