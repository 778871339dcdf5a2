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
) -> DataFrame:
    """(vertex, rank) with ranks summing to 1.

    Duplicate edges are weighted (a page linking twice transfers
    twice the share — drop duplicates upstream for the unweighted
    variant).  Stops when the L1 delta between checked snapshots is
    below ``tol`` (checked every ``check_every`` rounds) or at
    ``max_iters``.  ``pagerank.last_rounds`` records the round count.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(n_part, "vertex")
        .persist()
    )
    n = verts.count()
    if n == 0:
        return verts.select("vertex", F.lit(0.0).alias("rank"))
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
    snapshot = ranks
    rounds = 0
    base = (1.0 - damping) / n
    while rounds < max_iters:
        contrib = (
            shares.join(ranks.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("in_rank"))
        )
        # dangling mass: rank parked on vertices with no out-edges
        # (ranks is checkpointed, dangling_verts persisted — this
        # scalar agg touches only materialized frames)
        dangling = (
            ranks.join(dangling_verts, "vertex")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
        ).collect()[0][0]
        new_ranks = (
            verts.join(contrib, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("in_rank", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if ranks is not snapshot:
            _free_checkpoint_blocks(ranks)
        ranks = new_ranks
        rounds += 1
        if rounds % check_every == 0 or rounds == max_iters:
            delta = (
                ranks.withColumnRenamed("rank", "_new")
                .join(snapshot, "vertex")
                .agg(F.sum(F.abs(F.col("_new") - F.col("rank"))))
            ).collect()[0][0]
            if snapshot is not ranks:
                _free_checkpoint_blocks(snapshot)
            snapshot = ranks
            if delta is not None and delta < tol:
                break
    verts.unpersist()
    shares.unpersist()
    dangling_verts.unpersist()
    pagerank.last_rounds = rounds
    return ranks
