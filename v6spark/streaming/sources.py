"""Streaming source factory — Kafka-shaped configs with local fallbacks.

A production deployment reads ``format("kafka")`` with bootstrap
servers; this container has no broker, so the factory exposes the
sources that exist everywhere (rate, socket, file) behind ONE
entry point, normalized to the events-table schema where possible.
Every downstream transformation (streaming/events.py) is
source-agnostic — swapping rate → kafka is a config change, not a
code change, which is the property the factory exists to pin.

- ``file``: parquet directory micro-batched by ``maxFilesPerTrigger``
  (the deterministic test source).
- ``rate``: Spark's built-in synthetic source (``timestamp, value``),
  mapped to event-shaped rows — unbounded, for soak/throughput tests.
- ``socket``: line text from a TCP socket (the classic demo source) —
  each line parsed as an ``event_id,user_id,event_type,value`` CSV
  record with the arrival timestamp as event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def rate_events(
    spark: SparkSession,
    rows_per_second: int = 100,
    n_users: int = 50,
) -> DataFrame:
    """Unbounded event-shaped stream from the built-in rate source.

    Deterministic given the row counter: user, type, value, and props
    are pure functions of ``value`` (the rate source's monotonically
    increasing long), so two runs produce identical event content —
    only arrival timestamps differ.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    v = F.col("value")
    type_arr = F.array(*[F.lit(t) for t in EVENT_TYPES])
    return rate.select(
        v.alias("event_id"),
        F.col("timestamp").alias("ts"),
        (v % n_users).alias("user_id"),
        F.element_at(type_arr, (v % len(EVENT_TYPES) + 1).cast("int")).alias(
            "event_type"
        ),
        ((v % 1000).cast("double") / 1000.0).alias("value"),
        F.to_json(F.struct((v % 7).cast("int").alias("k"))).alias("props"),
    )


def socket_events(
    spark: SparkSession, host: str = "localhost", port: int = 9999
) -> DataFrame:
    """Event-shaped stream parsed from socket CSV lines.

    Line format: ``event_id,user_id,event_type,value``; malformed
    fields become NULL (try_cast) — a bad line must not kill an
    unbounded job.  Event time is the arrival timestamp, so windows
    and watermarks work identically to the file/rate sources.
    """
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    c = F.split("value", ",")
    return lines.select(
        c[0].try_cast("long").alias("event_id"),
        F.current_timestamp().alias("ts"),
        c[1].try_cast("long").alias("user_id"),
        c[2].alias("event_type"),
        c[3].try_cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def read_stream_source(
    spark: SparkSession, kind: str = "file", **options
) -> DataFrame:
    """One entry point for every supported streaming source kind."""
    if kind == "file":
        from v6spark.streaming.events import read_events_stream

        return read_events_stream(
            spark, options.pop("path"), options.pop("max_files", 1)
        )
    if kind == "rate":
        return rate_events(spark, **options)
    if kind == "socket":
        return socket_events(spark, **options)
    raise ValueError(f"unknown stream source kind: {kind} (file, rate, socket)")
