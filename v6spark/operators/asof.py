"""As-of join — latest right-side row at or before each left row.

Spark has no native ASOF JOIN.  The naive emulation (non-equi range
join + row_number) materializes O(|L| x |R|) intermediate pairs per
key and dies at scale.  This implementation uses the union+window
trick instead:

1. tag left (probe) and right (quote) rows, union them by name;
2. one window per key ordered by (ts, side, tie-break) computes
   ``last(right_payload, ignorenulls=True)`` over an unbounded-
   preceding frame — each probe row sees the most recent quote;
3. keep probe rows.

Cost: exactly ONE shuffle (the window partition), linear in rows —
the same shape Flink/kdb use for as-of.  Ordering places quotes
before probes at equal timestamps, so the match condition is
``quote.ts <= probe.ts`` (inclusive).

Reference parity: variation6 has no as-of operator; this is part of
the engine's extension surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: str,
    payload_order: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest ``right.payload`` with
    ``right.ts <= left.ts`` (same ``key``); NULL when no quote precedes.

    ``payload_order``: column ordering quotes that share a timestamp —
    the largest wins (deterministic tie-break).  Defaults to payload.
    """
    payload_order = payload_order or payload
    l_cols = left.columns
    # The payload rides inside a STRUCT marker: last(_m, ignorenulls)
    # then finds the latest QUOTE ROW even when the payload value
    # itself is NULL (a bare last(payload, ignorenulls) would skip
    # past NULL-payload quotes to an older one — wrong as-of answer).
    marker_type = (
        f"struct<p:{dict(right.dtypes)[payload]},po:{dict(right.dtypes)[payload_order]}>"
    )
    probe = left.withColumn("_side", F.lit(1)).withColumn(
        "_m", F.lit(None).cast(marker_type)
    )
    quote = right.select(
        key,
        ts,
        F.struct(
            F.col(payload).alias("p"), F.col(payload_order).alias("po")
        ).alias("_m"),
    ).withColumn("_side", F.lit(0))
    for c in l_cols:
        if c not in quote.columns:
            quote = quote.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = probe.unionByName(quote.select(probe.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_m")["po"].asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "asof_" + payload, F.last("_m", ignorenulls=True).over(w)["p"]
    )
    return matched.filter(F.col("_side") == 1).select(
        *l_cols, "asof_" + payload
    )


def asof_condition(quote_ts: Column, probe_ts: Column) -> Column:
    """The inclusive as-of predicate, for the range-join fallback path."""
    return quote_ts <= probe_ts
