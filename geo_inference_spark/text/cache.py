"""Persisted-projection lifecycle for lazy operator results.

Operators like the LSH pair joins persist an intermediate projection
(the minhash signature, the SRP bucket keys) because their plan reads
it from several branches. The returned DataFrame is lazy, so the
operator cannot unpersist before the caller's action — instead it
attaches the persisted frames to the result (``_cached_deps``) and the
caller releases them once done (ADVICE r2: long-lived sessions
otherwise accumulate cached storage):

    out = lsh_candidate_pairs(docs)
    pairs = out.collect()
    release(out)

``release`` is a safe no-op on frames without attached deps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach(out: DataFrame, *deps: DataFrame) -> DataFrame:
    existing = list(getattr(out, "_cached_deps", []))
    out._cached_deps = existing + list(deps)
    return out


def release(df: DataFrame) -> None:
    for dep in getattr(df, "_cached_deps", []):
        dep.unpersist()
    df._cached_deps = []
