"""Mergeable data sketches, pure Catalyst (§2.2 corpus monitoring at scale).

The 100 TB monitoring problem: "distinct URLs per crawl day",
"p99 document length per source", "how often does this n-gram
appear" — exact answers need a full-corpus shuffle per question.
Sketches answer them from KILOBYTES of mergeable state: sketch each
ingest partition once (map-side, embarrassingly parallel), persist
the tiny register/bucket tables, and answer any question over any
partition subset by merging registers — no rescan of the 100 TB.

Three classic sketches, each implemented as a REGISTER TABLE a
DataFrame can carry, merge, and persist (sources/sketch_store.py
adds the txlog-committed incremental store):

- **HyperLogLog** (Flajolet et al. 2007, + the HLL++ bias-free
  small-range correction): distinct counting.  Registers merge by
  element-wise MAX — so ``sketch(A ∪ B) == merge(sketch(A),
  sketch(B))`` holds EXACTLY, the property every test here pins.
- **DDSketch** (Masson, Rim, Lee — VLDB 2019): quantiles with a
  RELATIVE-error guarantee (α), log-γ buckets.  Merges by counter
  SUM.  Unlike ``percentile_approx``'s rank error, the α guarantee
  survives merging — the right contract for per-partition rollups.
- **Count-Min** (Cormode & Muthukrishnan 2005): frequency estimates
  with one-sided error (never undercounts; overshoot ≤ εN with
  probability 1-δ).  Merges by cell SUM.

Everything is built-in-function Catalyst — the hash is the portable
md5-based :func:`~v6spark.operators.dedup.portable_hash60` (so a
DuckDB oracle reproduces the EXACT register state, see
plans/m5_extensions.py), the leading-zero count is the integer-exact
``length(bin(w))`` trick (both engines render ``bin`` without
padding), and rho/bucket/cell arithmetic never touches a UDF.  The
only doubles are in the final estimators; the persisted state is all
integers.

Scale shape: one partial-aggregate shuffle keyed on (group, register)
to build; register tables are O(m) = a few KB per group; merges and
estimates run on the registers alone.  Nothing here is proportional
to corpus size except the initial map pass.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v6spark.operators.dedup import portable_hash60

HASH_BITS = 60  # portable_hash60 yields values in [0, 2^60)

# ---------------------------------------------------------------- HLL


def _hll_alpha(m: int) -> float:
    """The standard HLL bias constant for m >= 128 registers."""
    if m < 128:
        raise ValueError("hll precision below p=7 is not supported")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    col: Column | str,
    group_cols: tuple[str, ...] | list[str] = (),
    p: int = 12,
) -> DataFrame:
    """Sparse HLL register table: (group..., idx int, rho int).

    idx = low ``p`` hash bits; rho = 1 + leading-zero count of the
    remaining ``60-p`` bits (the value HLL stores is the MAX rho seen
    per register).  Registers never observed are simply absent —
    the estimator accounts for them as zeros, so the sparse layout
    loses nothing and keeps per-group state at ``count <= m`` rows.

    rho is integer-exact: ``length(bin(w))`` = floor(log2(w)) + 1
    (Spark and DuckDB both render bin() without leading zeros), so no
    floating point touches the persisted state.

    One shuffle, keyed (group..., idx), with map-side partial MAX —
    the partial aggregate IS the per-partition sketch, so executors
    ship at most m register rows each regardless of input size.
    """
    m = 1 << p
    nbits = HASH_BITS - p
    groups = list(group_cols)
    h = portable_hash60(F.col(col) if isinstance(col, str) else col)
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(nbits + 1)).otherwise(
        F.lit(nbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *groups,
            h.bitwiseAND(m - 1).cast("int").alias("idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    sketch_df: DataFrame, group_cols: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """Merge register rows (from any union of sketches / partitions /
    generations) down to one register set per group: element-wise MAX.

    ``hll_merge(sketch(A).union(sketch(B))) == hll_sketch(A ∪ B)``
    EXACTLY — max is associative, commutative, idempotent, so
    re-merges and replayed partitions are harmless.
    """
    groups = list(group_cols)
    return sketch_df.groupBy(*groups, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch_df: DataFrame,
    group_cols: tuple[str, ...] | list[str] = (),
    p: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    Implicitly merges first (groupBy MAX tolerates unmerged unions).
    Estimator: E = α_m · m² / (V + Σ 2^-ρ) with the linear-counting
    small-range correction (E ≤ 2.5m and V > 0 → m·ln(m/V)); the
    2^60 hash space needs no large-range correction.  Relative error
    ≈ 1.04/√m (~1.6% at p=12).

    The only stage proportional to anything is a groupBy over
    register rows — at most m per group, i.e. the estimate over a
    year of persisted daily sketches reads MBs, not the corpus.
    """
    m = 1 << p
    alpha = _hll_alpha(m)
    groups = list(group_cols)
    merged = hll_merge(sketch_df, groups)
    agg = merged.groupBy(*groups).agg(
        F.count("idx").alias("_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_zsum"),
    )
    v = F.lit(m) - F.col("_present")
    raw = F.lit(alpha * m * m) / (v.cast("double") + F.col("_zsum"))
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*groups, F.round(est).cast("long").alias(out_col))


# ------------------------------------------------------------ DDSketch


def _dds_log_gamma(alpha: float) -> float:
    """ln(γ) for γ=(1+α)/(1-α) as a Python float: embedded as a
    LITERAL in both the Spark plan and any SQL oracle, so the bucket
    boundaries are bit-identical everywhere (computing ln(γ) engine-
    side could differ by 1 ulp and shift EVERY boundary)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError("dds alpha must be in (0, 1)")
    return math.log((1.0 + alpha) / (1.0 - alpha))


def dds_sketch(
    df: DataFrame,
    col: Column | str,
    group_cols: tuple[str, ...] | list[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch bucket table: (group..., sign tinyint, bucket int,
    cnt long).

    bucket = ceil(ln|x| / ln γ) over the absolute value, sign ∈
    {-1,0,1} (sign 0 holds the exact zero count, the paper's special
    bin).  Bucket count for data spanning [1e-9, 1e9] at α=1% is
    ~2100 per sign — the per-group state stays in the KBs while the
    α relative-error guarantee holds at ANY quantile, after ANY
    sequence of merges.

    Same one-shuffle shape as :func:`hll_sketch` (map-side partial
    SUM per bucket).
    """
    log_gamma = _dds_log_gamma(alpha)
    groups = list(group_cols)
    x = (F.col(col) if isinstance(col, str) else col).cast("double")
    sign = F.when(x > 0, 1).when(x < 0, -1).otherwise(0)
    bucket = F.when(
        x == 0, F.lit(0)
    ).otherwise(F.ceil(F.log(F.abs(x)) / F.lit(log_gamma)).cast("int"))
    return (
        df.where(x.isNotNull())
        .select(
            *groups,
            sign.cast("tinyint").alias("sign"),
            bucket.cast("int").alias("bucket"),
        )
        .groupBy(*groups, "sign", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dds_merge(
    sketch_df: DataFrame, group_cols: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """Merge bucket rows by SUM — ``merge(sketch(A), sketch(B)) ==
    sketch(A ∪ B)`` exactly (integer counters)."""
    groups = list(group_cols)
    return sketch_df.groupBy(*groups, "sign", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def dds_quantiles(
    sketch_df: DataFrame,
    qs: list[float],
    group_cols: tuple[str, ...] | list[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates per group: (group..., q double, value double).

    Walks the buckets in value order (sign, sign·bucket) with a
    cumulative-count window, picks the bucket holding rank
    ⌊1 + q·(n-1)⌋, and returns the bucket midpoint estimate
    sign · 2γ^b/(γ+1) — within α relative error of the true quantile
    by the DDSketch guarantee.

    Runs entirely on the bucket table: the window partitions by
    group over ≤ a few thousand bucket rows, then a small explode of
    the q literals — nothing touches the original data.
    """
    log_gamma = _dds_log_gamma(alpha)
    gamma = math.exp(log_gamma)
    groups = list(group_cols)
    from pyspark.sql.window import Window

    merged = dds_merge(sketch_df, groups)
    part = Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    order = part.orderBy("sign", F.col("sign") * F.col("bucket"))
    cum = merged.withColumn(
        "_cum", F.sum("cnt").over(order.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("_n", F.sum("cnt").over(part))
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame(
                [(float(q),) for q in qs], "q double"
            )
        )
    )
    rank = F.floor(F.lit(1) + F.col("q") * (F.col("_n") - 1)).cast("long")
    hit = qdf.where(F.col("_cum") >= rank).groupBy(*groups, "q").agg(
        F.min_by(F.struct("sign", "bucket"), F.struct("sign", F.col("sign") * F.col("bucket"))).alias("_b")
    )
    b = F.col("_b.bucket").cast("double")
    val = F.when(F.col("_b.sign") == 0, F.lit(0.0)).otherwise(
        F.col("_b.sign").cast("double")
        * (2.0 * F.pow(F.lit(gamma), b) / F.lit(gamma + 1.0))
    )
    return hit.select(*groups, "q", val.alias("value"))


# ----------------------------------------------------------- Count-Min


def _cm_cell(item: Column, k: int, width: int) -> Column:
    """Row k's cell index for an item: an independent md5 hash per
    row via a distinct salt prefix, mod width."""
    return (
        portable_hash60(F.concat(F.lit(f"cm{k}:"), item.cast("string"))) % width
    ).cast("int")


def cm_sketch(
    df: DataFrame,
    col: Column | str,
    group_cols: tuple[str, ...] | list[str] = (),
    depth: int = 4,
    width: int = 2048,
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min cell table: (group..., depth int, idx int, cnt long).

    Each input row increments one cell per hash row (``depth`` salted
    md5 hashes, the standard pairwise-independent family stand-in).
    ``weight`` makes it a weighted frequency sketch (token counts,
    bytes) instead of an occurrence counter.

    State is depth·width cells (4·2048 = 8K rows) per group — the
    explode is depth rows per input row but collapses immediately in
    the map-side partial SUM, so the shuffle carries at most the cell
    table per executor.
    """
    groups = list(group_cols)
    item = F.col(col) if isinstance(col, str) else col
    wcol = F.lit(1).cast("long") if weight is None else weight.cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(k).alias("depth"), _cm_cell(item, k, width).alias("idx")
            )
            for k in range(depth)
        ]
    )
    return (
        df.select(*groups, F.explode(cells).alias("_c"), wcol.alias("_w"))
        .groupBy(*groups, F.col("_c.depth").alias("depth"), F.col("_c.idx").alias("idx"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cm_merge(
    sketch_df: DataFrame, group_cols: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """Merge cell rows by SUM — exact-merge property as dds."""
    groups = list(group_cols)
    return sketch_df.groupBy(*groups, "depth", "idx").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_estimate(
    sketch_df: DataFrame,
    items: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
    depth: int = 4,
    width: int = 2048,
    out_col: str = "approx_count",
) -> DataFrame:
    """Frequency estimate for each row of ``items``: min over the
    depth cells the item hashes to.  Never undercounts; overshoot ≤
    ε·N (ε = e/width) with probability 1 - e^-depth.

    The sketch side is KBs → broadcast; the probe is a narrow map +
    broadcast join per hash row.  Cells the sketch never touched are
    absent from the sparse table and read as 0.
    """
    groups = list(group_cols)
    merged = cm_merge(sketch_df, groups)
    probes = items.select(
        *groups,
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("depth"),
                        _cm_cell(F.col(item_col), k, width).alias("idx"),
                    )
                    for k in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(*groups, item_col, "_c.depth", "_c.idx")
    joined = probes.join(
        F.broadcast(merged), on=[*groups, "depth", "idx"], how="left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
    return joined.groupBy(*groups, item_col).agg(
        F.min("cnt").alias(out_col)
    )


# ------------------------------------------------- HLL set estimates


def hll_union_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: tuple[str, ...] | list[str] = (),
    p: int = 12,
    out_col: str = "approx_distinct_union",
) -> DataFrame:
    """|A ∪ B| from two register tables: union the rows, merge by
    MAX — EXACTLY the sketch of the concatenated inputs, so the union
    estimate carries the plain HLL error (1.04/√m), not a compounded
    one.  Inputs must share ``p``."""
    return hll_estimate(a.unionByName(b), group_cols, p=p, out_col=out_col)


def hll_intersect_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: tuple[str, ...] | list[str] = (),
    p: int = 12,
) -> DataFrame:
    """|A ∩ B| by inclusion-exclusion: |A| + |B| - |A ∪ B|, per group:
    (group..., approx_a, approx_b, approx_union, approx_intersect).

    Error caveat (stated, not hidden): the three estimates' absolute
    errors ADD, so the intersection error is relative to the UNION
    size — small intersections of large sets are noise (the same
    limitation theta-sketch intersections quantify; use the exact
    pair join from operators/dedup.py when the intersection itself
    is the product).  Intersections comparable to the set sizes —
    overlap audits between crawl snapshots — are well estimated.
    """
    groups = list(group_cols)
    ea = hll_estimate(a, groups, p=p, out_col="approx_a")
    eb = hll_estimate(b, groups, p=p, out_col="approx_b")
    eu = hll_union_estimate(a, b, groups, p=p, out_col="approx_union")
    if groups:
        joined = ea.join(eb, groups, "inner").join(eu, groups, "inner")
    else:
        joined = ea.crossJoin(eb).crossJoin(eu)
    inter = F.greatest(
        F.lit(0).cast("long"),
        F.col("approx_a") + F.col("approx_b") - F.col("approx_union"),
    )
    return joined.select(
        *groups, "approx_a", "approx_b", "approx_union",
        inter.alias("approx_intersect"),
    )
