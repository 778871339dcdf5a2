"""Skew mitigation: salting for hot keys (SURVEY.md §2.2 scale posture).

AQE's skew-join splitting handles most runtime skew; these operators
are the explicit form for the cases AQE cannot see in advance — a
known-hot grouping key, or a join where one side's key histogram is
wildly non-uniform.

``salted_agg`` is the classic two-phase aggregate: append a salt to
the key, partially aggregate on (key, salt) — spreading each hot key
over ``n_salts`` reducers — then finish on the key.  Works for any
algebraic aggregate (here: count + decimal-exact sum, the engine's
standard pair).

``salted_broadcast_left`` handles a skewed LEFT side joining a
moderate right side: replicate the right side ``n_salts`` times (one
per salt value) and give each left row a salt, so one hot left key
fans across ``n_salts`` tasks instead of one straggler.

Two salt modes (``salt_mode``): ``content`` (default) hashes the row's
values, so the row->salt assignment survives task retries and stage
recomputation unchanged — but cannot spread a hot key whose rows are
byte-identical; ``random`` (``rand(seed)``) spreads even identical
rows at the cost of retry-dependent row-to-task layout (results are
still identical for the algebraic aggregates here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v6spark.functions.determinism import dsum


def _content_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts) from row CONTENT.

    ``xxhash64`` over every column: the salt depends only on the row's
    values, never on partition layout — so a task retry, a stage
    recomputation, or a different input partitioning always reproduces
    the same row->salt assignment (the earlier
    ``xxhash64(monotonically_increasing_id())`` form was
    partition-layout dependent and could re-deal rows across tasks on
    retry).  LIMITATION, stated plainly: byte-identical rows share a
    salt, so a hot key whose rows are ALL identical still lands on one
    reducer — use ``salt_mode="random"`` for that shape.
    """
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).cast("int")


def _salt(df: DataFrame, n_salts: int, salt_mode: str, seed: int) -> Column:
    """Salt column for the chosen mode.

    - ``content`` (default): retry-deterministic (see _content_salt),
      cannot spread byte-identical hot rows.
    - ``random``: ``rand(seed)`` — spreads even identical rows, but a
      task retry may re-deal rows across salts (rand is seeded per
      partition attempt).  SAFE for the algebraic aggregates here —
      any salt assignment yields the identical final result — but a
      join's row-to-task layout can differ between attempts.
    """
    if salt_mode == "content":
        return _content_salt(df, n_salts)
    if salt_mode == "random":
        return F.floor(F.rand(seed) * n_salts).cast("int")
    raise ValueError(f"unknown salt_mode: {salt_mode!r} (content, random)")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    salt_mode: str = "content",
    seed: int = 42,
) -> DataFrame:
    """Two-phase (salted) count+sum per key.

    Phase 1 shuffles on (keys, salt) — hot keys spread over n_salts
    partial groups; phase 2 shuffles the tiny partial relation on keys.
    Result is identical to a direct groupBy (decimal sums are
    order-independent) under EITHER salt mode, verified by tests; see
    ``_salt`` for the content-vs-random trade-off (byte-identical hot
    rows need ``salt_mode="random"``).
    """
    partial = (
        df.withColumn("_salt", _salt(df, n_salts, salt_mode, seed))
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(value).cast("decimal(18,6)")).alias("_s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s").cast("double"), 6).alias(sum_alias),
    )


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_mode: str = "content",
    seed: int = 42,
) -> DataFrame:
    """Skewed-left equi-join: replicate right x n_salts, salt left rows.

    Right must be broadcast-sized x n_salts.  Each hot left key's rows
    land in n_salts different tasks, each holding a replica of the
    matching right rows.  See ``_salt`` for the content-vs-random
    trade-off.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    right_rep = right.select("*", salts)
    left_salted = left.withColumn("_salt", _salt(left, n_salts, salt_mode, seed))
    out = left_salted.join(F.broadcast(right_rep), [on, "_salt"])
    return out.drop("_salt")
