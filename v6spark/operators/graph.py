"""Crawl-graph operators: degree census + PageRank as DataFrame
iteration.

The link graph from ``html.extract_links`` drives two corpus
decisions: PageRank-style authority as a document-quality prior
(high-rank pages are disproportionately worth keeping), and degree
censuses for spam heuristics (link farms have pathological
in/out-degree shapes).

PageRank here is the standard power iteration expressed as Spark
joins — the pattern every iterative graph algorithm on DataFrames
follows (same discipline as ``dedup.connected_keepers``):

- state per round is ONLY the (vertex, rank) relation — edges are
  computed once, repartitioned on src, and persisted, so each
  round's join co-locates without a new edge shuffle;
- every round ends in an EAGER ``localCheckpoint``: iterative
  self-joins grow the logical plan multiplicatively and defeat
  cache-plan matching; the checkpoint truncates lineage to the
  materialized blocks (the measured cliff is documented at
  connected_keepers);
- dangling mass (vertices with no out-links) is redistributed
  uniformly each round — without it rank leaks and the vector no
  longer sums to 1 (asserted in tests);
- convergence is an L1 delta check every ``check_every`` rounds,
  not per round, so the driver blocks O(iters / check_every) times.

Scale: each round is one shuffle-light join (edges pre-partitioned
by src, ranks shuffle 16 bytes/vertex) + one aggregation.  100 TB of
documents is ~10^10 vertices — the (vertex, rank) relation is
~160 GB, comfortably a distributed frame, never driver-side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from v6spark.operators.dedup import _free_checkpoint_blocks


def degree_census(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex (vertex, out_degree, in_degree) in two aggs + one
    outer join on the already-small degree relations."""
    out_deg = edges.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = edges.groupBy(F.col(dst).alias("vertex")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_deg.join(in_deg, "vertex", "full")
        .select(
            "vertex",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float = 1e-6,
    check_every: int = 5,
    pin_conf: bool = True,
) -> DataFrame:
    """(vertex, rank) with ranks summing to 1.

    Duplicate edges are weighted (a page linking twice transfers
    twice the share — drop duplicates upstream for the unweighted
    variant).  Stops when the L1 delta between checked snapshots is
    below ``tol`` or at ``max_iters``.  ``pagerank.last_rounds``
    records the round count.

    Driver-latency design (the r4 finding: per-round sync dominated
    small-graph wall clock): each round is ONE Spark job — the
    dangling-mass scalar rides inside the round's plan as a 1-row
    broadcast cross join over the previous round's CHECKPOINTED
    ranks (cheap block scan), instead of a separate per-round
    ``collect``.  Convergence checks start at ``check_every`` and
    then ADAPT: power-iteration deltas decay geometrically
    (asymptotically by the damping factor), so each check fits the
    observed per-round decay rate and schedules the next check at
    the predicted crossing of ``tol`` (gap clamped to
    [1, check_every] — it only shrinks) so the loop stops within a
    round or two of actual convergence instead of running out the
    fixed cadence.  The tol bar is window-equivalent to the fixed
    scheme's: a delta measured over a shorter-than-``check_every``
    gap is scaled up by the geometric-sum factor before the
    comparison, so adaptive checking never stops EARLIER in
    convergence terms than fixed checking would.

    ``pin_conf`` (default True): the loop pins
    ``spark.sql.shuffle.partitions`` to the state-scaled width and
    pauses AQE for its duration — session-global conf, so pass
    ``pin_conf=False`` when other queries share the SparkSession
    concurrently.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        return verts.select("vertex", F.lit(0.0).alias("rank"))
    # iteration width scales with the state: rank state is 16
    # bytes/vertex, so a partition comfortably holds ~50k vertices —
    # a 5k-vertex graph iterating at the session's 32 shuffle
    # partitions pays 3 stages x 32 near-empty tasks of pure
    # scheduling latency EVERY round (the r4 STRESS_GRAPH finding).
    # Conf-capped, so a 10^10-vertex graph still gets full width.
    n_part = min(n_part, max(1, -(-n // 50_000)))
    verts_w = verts.repartition(n_part, "vertex").persist()
    verts_w.count()
    verts.unpersist()
    verts = verts_w
    # per-src transfer shares, co-located for every round's join
    out_counts = e.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    shares = (
        e.join(out_counts, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out")).alias("share"))
        .repartition(n_part, "src")
        .persist()
    )
    shares.count()
    # dangling vertex set computed ONCE and persisted: the per-round
    # dangling-mass scalar otherwise re-executes the whole upstream
    # edge plan (HTML parsing of the corpus, say) every iteration
    dangling_verts = verts.join(
        out_counts.withColumnRenamed("src", "vertex"), "vertex", "left_anti"
    ).persist()
    dangling_verts.count()

    ranks = verts.select("vertex", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    if not pin_conf:
        return _pagerank_loop(
            verts, shares, dangling_verts, ranks,
            n, damping, max_iters, tol, check_every,
        )
    # pin the per-round groupBy/join shuffles to the iteration width
    # (restored below) — otherwise every round's aggregation exchange
    # still fans out to the session's full shuffle width.  AQE is
    # also paused for the loop: its per-stage driver re-planning is
    # the wrong trade for a long sequence of tiny, identically-shaped
    # rounds (the width is already matched to the state size above).
    # CAVEAT: session conf is SESSION-GLOBAL — a concurrent query on
    # the same SparkSession (another thread, a streaming batch) would
    # plan at this width with AQE off for the loop's duration.  Pass
    # ``pin_conf=False`` on a shared session; the loop then runs at
    # the session's own width (correct, just slower on tiny graphs).
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    }
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_loop(
            verts, shares, dangling_verts, ranks,
            n, damping, max_iters, tol, check_every,
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _pagerank_loop(
    verts, shares, dangling_verts, ranks,
    n, damping, max_iters, tol, check_every,
):
    snapshot = ranks
    base = (1.0 - damping) / n
    next_check = min(check_every, max_iters)
    last_delta: float | None = None
    last_check_round = 0
    rounds = 0
    while rounds < max_iters:
        contrib = (
            shares.join(ranks.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("in_rank"))
        )
        # dangling mass: rank parked on vertices with no out-edges.
        # Rides the round's plan as a 1-row broadcast (ranks is
        # checkpointed, dangling_verts persisted, so this subplan
        # scans only materialized blocks) — no per-round collect.
        dangling_mass = (
            ranks.join(dangling_verts, "vertex")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        new_ranks = (
            verts.join(contrib, "vertex", "left")
            .crossJoin(F.broadcast(dangling_mass))
            .select(
                "vertex",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_rank", F.lit(0.0))
                        + F.col("_dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if ranks is not snapshot:
            _free_checkpoint_blocks(ranks)
        ranks = new_ranks
        rounds += 1
        if rounds >= next_check or rounds == max_iters:
            delta = (
                ranks.withColumnRenamed("rank", "_new")
                .join(snapshot, "vertex")
                .agg(F.sum(F.abs(F.col("_new") - F.col("rank"))))
            ).collect()[0][0]
            if snapshot is not ranks:
                _free_checkpoint_blocks(snapshot)
            snapshot = ranks
            gap = rounds - last_check_round
            if last_delta is not None and delta is not None and 0 < delta < last_delta:
                rho = (delta / last_delta) ** (1.0 / gap)
            else:
                rho = damping  # the asymptotic power-iteration rate
            # window-equivalent stop bar: the fixed-cadence scheme
            # measured L1 deltas over check_every-round windows; a
            # delta over a SHORTER gap understates that (geometric
            # sum), so scale it to the equivalent check_every window
            # before comparing with tol — the adaptive scheduler is
            # therefore AT LEAST as strict as the fixed one, never a
            # relaxation of the tol bar.
            if delta is not None and gap < check_every and 0.0 < rho < 1.0:
                eff_delta = (
                    delta * (1.0 - rho ** check_every) / (1.0 - rho ** gap)
                )
            else:
                eff_delta = delta
            if delta is None or eff_delta < tol:
                break
            # adaptive cadence: fit the observed geometric decay and
            # aim the next check at the predicted tol crossing.
            # Clamped to [1, check_every] — the gap only SHRINKS as
            # convergence nears (each skipped-check round is a whole
            # extra job, so late checks cost more than extra checks;
            # the snapshot-window delta also overestimates the decay
            # rate over long gaps, which once made this scheduler
            # defer checks and burn ~50 extra rounds — capped at the
            # base cadence it can never do worse than fixed checks)
            if rho < 1.0:
                predicted = math.log(tol / delta) / math.log(rho)
                next_gap = min(max(1, math.ceil(predicted)), check_every)
            else:
                next_gap = check_every
            last_delta = delta
            last_check_round = rounds
            next_check = rounds + next_gap
    verts.unpersist()
    shares.unpersist()
    dangling_verts.unpersist()
    pagerank.last_rounds = rounds
    return ranks
