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

Salts are DETERMINISTIC (a content hash, ``_content_salt``) — the
row->salt assignment survives task retries and stage recomputation
unchanged, unlike rand()/monotonically_increasing_id()-based salts
whose value depends on the partition layout the retry happens to see.
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
    retry).  Fully identical rows share a salt; that only matters for
    a hot key whose rows are ALSO byte-identical, in which case no
    row-level salt can separate them anyway (they are
    indistinguishable) — aggregate results are unaffected either way.
    """
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
) -> DataFrame:
    """Two-phase (salted) count+sum per key.

    Phase 1 shuffles on (keys, salt) — hot keys spread over n_salts
    partial groups; phase 2 shuffles the tiny partial relation on keys.
    Result is identical to a direct groupBy (decimal sums are
    order-independent), verified by tests.
    """
    partial = (
        df.withColumn("_salt", _content_salt(df, n_salts))
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
) -> DataFrame:
    """Skewed-left equi-join: replicate right x n_salts, salt left rows.

    Right must be broadcast-sized x n_salts.  Each hot left key's rows
    land in n_salts different tasks, each holding a replica of the
    matching right rows.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    right_rep = right.select("*", salts)
    left_salted = left.withColumn("_salt", _content_salt(left, n_salts))
    out = left_salted.join(F.broadcast(right_rep), [on, "_salt"])
    return out.drop("_salt")
