"""Sessionization — gaps-and-islands over an event stream (batch form).

Extension surface (SURVEY.md §2.2, streaming analog).  The batch
implementation is the classic lag -> gap-flag -> running-sum island
id: two window passes over ONE shuffle (both windows share the
user_id partitioning, so Spark reuses the exchange).  The Structured
Streaming twin lives in ``v6spark.streaming.events`` (session_window +
watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS_PER_MIN = 60 * 1_000_000_000


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    gap_minutes: int = 30,
    gap_units_per_min: int = NS_PER_MIN,
    tie_breaker: str | None = "event_id",
) -> DataFrame:
    """Assign a session id per (user, burst-of-activity).

    A new session starts when the gap since the user's previous event
    exceeds ``gap_minutes``.  Timestamps are exact integers (default
    nanoseconds; pass ``gap_units_per_min`` to match a µs column) —
    no timezone or float hazards in the gap arithmetic.

    ``tie_breaker`` totally orders equal timestamps; referencing a
    missing column fails loudly at plan time (pass None explicitly to
    accept nondeterministic ordering among exact ts ties).
    """
    tie = [tie_breaker] if tie_breaker is not None else []
    order = Window.partitionBy(user_col).orderBy(ts_ns_col, *tie)
    gap = gap_minutes * gap_units_per_min
    prev = F.lag(ts_ns_col).over(order)
    is_start = F.when(
        prev.isNull() | ((F.col(ts_ns_col) - prev) > gap), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_ns_col, *tie).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_start", is_start).withColumn(
        "session_id", F.sum("_start").over(running)
    ).drop("_start")


def session_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    gap_minutes: int = 30,
    gap_units_per_min: int = NS_PER_MIN,
    tie_breaker: str | None = "event_id",
) -> DataFrame:
    """Per-user session count under the gap rule.

    Counting session *starts* avoids materializing session ids: a
    single window pass + hash-agg.  ``tie_breaker`` as in sessionize().
    """
    tie = [tie_breaker] if tie_breaker is not None else []
    order = Window.partitionBy(user_col).orderBy(ts_ns_col, *tie)
    gap = gap_minutes * gap_units_per_min
    prev = F.lag(ts_ns_col).over(order)
    is_start = F.when(
        prev.isNull() | ((F.col(ts_ns_col) - prev) > gap), 1
    ).otherwise(0)
    return (
        df.withColumn("_start", is_start)
        .groupBy(user_col)
        .agg(F.sum("_start").cast("bigint").alias("n_sessions"))
    )
