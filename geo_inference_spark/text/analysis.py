"""Text analysis over the documents table: language-ID, quality
scoring, token counting, winnowing fingerprints.

All operators are portable SQL (JVM-side in Spark, no Python), each
with a DuckDB oracle generator for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import portable as P

# marker stopwords per language for the n-gram/stopword heuristic.
# Deterministic toy lists — language ID here is a pipeline operator
# contract, not a linguistics claim.
LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "in", "for", "with", "on"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "von"],
    "es": ["el", "la", "de", "que", "los", "las", "por", "con"],
}


def _arr(d: str, words: list[str]) -> str:
    lit = ", ".join(f"'{w}'" for w in words)
    return f"array({lit})" if d == P.SPARK else f"[{lit}]"


def _isect_size(d: str, a: str, b: str) -> str:
    if d == P.SPARK:
        return f"size(array_intersect({a}, {b}))"
    return f"len(list_intersect({a}, {b}))"


def langid_exprs(d: str, col: str = "text") -> dict[str, str]:
    """score_<lang> columns + predicted language (argmax, fixed
    tie-break order en > fr > de > es)."""
    t = P.tokens(d, col)
    scores = {
        lang: _isect_size(d, t, _arr(d, words))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = "case "
    for i, lang in enumerate(langs):
        conds = [f"{scores[lang]} >= {scores[o]}" for o in langs[i + 1 :]]
        cond = " and ".join(conds) if conds else "true"
        pred += f"when {cond} then '{lang}' "
    pred += "else 'und' end"
    return {**{f"score_{k}": v for k, v in scores.items()}, "pred_lang": pred}


def quality_exprs(d: str, col: str = "text") -> dict[str, str]:
    """Quality features: token count, mean token length, stopword
    ratio, type-token ratio, composite score (rounded)."""
    t = P.tokens(d, col)
    n = f"size({t})" if d == P.SPARK else f"len({t})"
    if d == P.SPARK:
        distinct_n = f"size(array_distinct({t}))"
        sumlen = f"aggregate(transform({t}, w -> length(w)), 0, (a, v) -> a + v)"
    else:
        distinct_n = f"len(list_distinct({t}))"
        sumlen = f"list_aggregate(list_transform({t}, w -> length(w)), 'sum')"
    stop = _isect_size(d, t, _arr(d, LANG_MARKERS["en"]))
    n_tokens = f"cast({n} as bigint)"
    mean_len = f"round(cast({sumlen} as double) / {n}, 6)"
    stop_ratio = f"round(cast({stop} as double) / {n}, 6)"
    ttr = f"round(cast({distinct_n} as double) / {n}, 6)"
    score = (
        f"round(0.3 * least(cast({n} as double) / 50.0, 1.0)"
        f" + 0.3 * (cast({stop} as double) / {n})"
        f" + 0.4 * (cast({distinct_n} as double) / {n}), 6)"
    )
    return {
        "n_tokens": n_tokens,
        "mean_token_len": mean_len,
        "stopword_ratio": stop_ratio,
        "type_token_ratio": ttr,
        "quality_score": score,
    }


def token_count_exprs(d: str, col: str = "text") -> dict[str, str]:
    """Whitespace tokens + BPE-ish subword proxy (alpha runs + digit
    runs + punctuation marks counted separately)."""
    t = P.tokens(d, col)
    ws = f"cast(size({t}) as bigint)" if d == P.SPARK else f"cast(len({t}) as bigint)"
    if d == P.SPARK:
        sub = f"cast(size(regexp_extract_all({col}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as bigint)"
    else:
        sub = f"cast(len(regexp_extract_all({col}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) as bigint)"
    return {"ws_tokens": ws, "subword_tokens": sub}


def fingerprint_expr(d: str, col: str = "text", k: int = 3, window: int = 4) -> str:
    """Winnowing-style document fingerprints: md5 each k-shingle, take
    the min hash of every ``window`` consecutive shingles, distinct.
    Returns the count of distinct fingerprints (the sketch size)."""
    sh = P.shingles(d, col, k)
    if d == P.SPARK:
        hashed = f"transform({sh}, s -> md5(s))"
        n = f"size({hashed})"
        wins = (
            f"transform(sequence(1, greatest({n} - {window - 1}, 1)),"
            f" i -> array_min(slice({hashed}, i, {window})))"
        )
        return f"cast(size(array_distinct({wins})) as bigint)"
    hashed = f"list_transform({sh}, s -> md5(s))"
    n = f"len({hashed})"
    wins = (
        f"list_transform(range(1, greatest({n} - {window - 1}, 1) + 1),"
        f" i -> list_aggregate(list_slice({hashed}, i, i + {window - 1}), 'min'))"
    )
    return f"cast(len(list_distinct({wins})) as bigint)"


# ------------------------------------------------------------ Spark side

def with_langid(df: DataFrame, col: str = "text") -> DataFrame:
    for name, e in langid_exprs(P.SPARK, col).items():
        df = df.withColumn(name, F.expr(e))
    return df


def with_quality(df: DataFrame, col: str = "text") -> DataFrame:
    for name, e in quality_exprs(P.SPARK, col).items():
        df = df.withColumn(name, F.expr(e))
    return df


def with_token_counts(df: DataFrame, col: str = "text") -> DataFrame:
    for name, e in token_count_exprs(P.SPARK, col).items():
        df = df.withColumn(name, F.expr(e))
    return df


def with_fingerprint_count(
    df: DataFrame, col: str = "text", k: int = 3, window: int = 4
) -> DataFrame:
    """Spark side of fingerprint_expr with the md5-hashed shingle
    array materialized as a COLUMN (VERDICT r5 #1): the single-
    expression form inlines ``transform(shingles, md5)`` into the
    per-window lambda, re-evaluating the whole shingle+hash tree per
    window position — O(L^2) per document (477 s at sf0.1). As a
    column referenced twice, CollapseProject keeps the projection
    boundary and each window slices an already-computed array. Values
    are identical to the oracle's fingerprint_expr(DUCK)."""
    sh = P.shingles(P.SPARK, col, k)
    df = df.withColumn("_fp_h", F.expr(f"transform({sh}, s -> md5(s))"))
    n = "size(_fp_h)"
    wins = (
        f"transform(sequence(1, greatest({n} - {window - 1}, 1)),"
        f" i -> array_min(slice(_fp_h, i, {window})))"
    )
    return df.withColumn(
        "n_fingerprints",
        F.expr(f"cast(size(array_distinct({wins})) as bigint)"),
    ).drop("_fp_h")
