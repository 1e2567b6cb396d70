"""As-of join — a temporal operator Spark has no native form for
(SURVEY.md §2.3 notes the reference has none either; the engine adds
it for event-stream payloads, with DuckDB's native ASOF JOIN as the
correctness oracle).

Semantics: for every left row, attach the single right row with the
same key and the greatest right.ts <= left.ts (ties on ts resolved by
the largest right id, matching DuckDB).

Implementation is the union + ordered-window pattern, NOT a range
join: both sides are tagged and unioned, then one window partitioned
by key and ordered by (ts, side, id) carries the last-seen right
payload forward onto each left row via last_value(ignorenulls). Cost
is a single shuffle on the key — no range-explosion, no skew beyond
the key's own distribution, and the window is streaming-friendly
(rows between unbounded preceding and current row), so it scales to
arbitrarily long histories per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    right_id: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: left rows + latest right payload at-or-before
    left_ts. Left rows with no prior right row keep NULL payload.
    """
    lcols = left.columns
    # The whole right payload rides in ONE struct so last(ignorenulls)
    # carries the matched row atomically: a right row whose payload
    # column is genuinely NULL still supplies that NULL (no stale value
    # from an older row, no torn tuple mixing columns across rows).
    pay_type = (
        "struct<"
        + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_payload
        )
        + ">"
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.lit(None).cast("long").alias("_rid"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(pay_type).alias("_r_pay"),
    )
    rid = F.col(right_id).cast("long") if right_id else F.monotonically_increasing_id()
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rid.alias("_rid"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
        F.struct(*[F.col(c) for c in right_payload]).alias("_r_pay"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last("_r_pay", ignorenulls=True).over(w).alias("_c_pay")
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_c_pay")[c].alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
