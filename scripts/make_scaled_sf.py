"""Build a synthetic scaled test dir from sf0.1 for TIMING ONLY.

The driver's round-end bench runs at a driver-generated sf1.0 we do
not have; this replicates each sf0.1 table K times with consistent
key offsets (and slight text/vector mutation so dedup/ANN bucket
statistics stay realistic instead of becoming 100% exact-dup
families). NEVER used for correctness — the oracle gate stays on the
driver's own sf dirs.

Usage: python scripts/make_scaled_sf.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/sfscaled"
    os.makedirs(out, exist_ok=True)
    for name, keys in KEY_COLS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if not keys:  # dimension tables: copy as-is
            pq.write_table(t, f"{out}/{name}.parquet")
            continue
        copies = []
        for i in range(k):
            cols = {}
            for c in t.column_names:
                arr = t[c]
                if c in keys:
                    arr = pa.chunked_array([
                        pa.compute.add(ch, i * OFF) for ch in arr.chunks
                    ])
                elif name == "documents" and c == "text" and i > 0:
                    arr = pa.compute.binary_join_element_wise(
                        arr.combine_chunks(), f" v{i}", "")
                elif name == "embeddings" and c == "embedding" and i > 0:
                    v = arr.combine_chunks()
                    flat = v.values.to_numpy(zero_copy_only=False).copy()
                    rng = np.random.RandomState(1000 + i)
                    flat += rng.uniform(-0.02, 0.02, flat.shape)
                    arr = pa.ListArray.from_arrays(v.offsets, pa.array(flat))
                cols[c] = arr
            copies.append(pa.table(cols))
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{out}/{name}.parquet")
        print(name, big.num_rows)


if __name__ == "__main__":
    main()
