"""WARC-ingest throughput at non-trivial archive sizes (VERDICT r5 #5).

Forges a .warc.gz of N synthetic pages (executor-side forge), then
times `resumable_warc_ingest` end to end (distributed range scan ->
html->text extraction -> n-gram lang-id -> parquet units + ledger).
Run with two sizes to show the per-unit fixed overhead amortizing and
the extraction-bound asymptote:

    python scripts/bench_ingest.py 200000 1000000

Prints one JSON line per size: records, archive bytes, wall seconds,
rec/s, MB/s compressed, plus a one-off per-stage split (scan-only vs
scan+extract) at the largest size.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geo_inference_spark.plans.ingest_job import (  # noqa: E402
    finalize_warc_ingest,
    resumable_warc_ingest,
)
from geo_inference_spark.plans.ledger import CheckpointLedger  # noqa: E402
from geo_inference_spark.session import get_spark  # noqa: E402
from geo_inference_spark.sources.pages import pages_df  # noqa: E402
from geo_inference_spark.sources.warc import (  # noqa: E402
    forge_warc_distributed,
    read_warc,
)


def forge(spark, n: int, path: str) -> int:
    if not os.path.exists(path):
        pages = pages_df(spark, n).select(
            "url", F.col("html").alias("payload")
        )
        forge_warc_distributed(
            pages, path, ts=datetime(2024, 3, 1, tzinfo=timezone.utc)
        )
    return os.path.getsize(path)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("bench-ingest", cores=cores)
    for n in sizes:
        path = f"/tmp/graft_ingest_bench_{n}.warc.gz"
        nbytes = forge(spark, n, path)
        out = f"/tmp/graft_ingest_bench_out_{n}"
        led = CheckpointLedger(spark, f"/tmp/graft_ingest_ledger_{n}")
        t0 = time.perf_counter()
        resumable_warc_ingest(
            spark, path, out, led, tag=f"bench{n}-{time.time_ns()}",
            n_units=4, splits_per_unit=max(8, cores),
        )
        rows = finalize_warc_ingest(spark, out, 4).count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "records": rows, "archive_mb": round(nbytes / 1e6, 1),
            "wall_s": round(dt, 1), "rec_per_s": round(rows / dt),
            "mb_per_s_compressed": round(nbytes / 1e6 / dt, 1),
            "cores": cores,
        }), flush=True)
    # stage split at the largest size: scan-only vs scan+extract
    n = sizes[-1]
    path = f"/tmp/graft_ingest_bench_{n}.warc.gz"
    t0 = time.perf_counter()
    read_warc(spark, path).select(F.count(F.lit(1))).collect()
    scan_s = time.perf_counter() - t0
    from geo_inference_spark.sources.pages import extract_text_bytes
    import pandas as pd

    def ext(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "n": [sum(len(extract_text_bytes(bytes(h)))
                          for h in pdf["html"])]
            })

    t0 = time.perf_counter()
    read_warc(spark, path).mapInPandas(ext, "n long").select(
        F.sum("n")
    ).collect()
    scan_extract_s = time.perf_counter() - t0
    print(json.dumps({
        "stage_split_records": n,
        "scan_only_s": round(scan_s, 1),
        "scan_plus_extract_s": round(scan_extract_s, 1),
    }))


if __name__ == "__main__":
    main()
