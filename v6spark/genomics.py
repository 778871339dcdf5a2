"""Variations — the reference's user-facing API over the Spark engine.

``variation6/variations.py::Variations`` is a dict-like container of
per-field Dask arrays keyed by HDF5-style paths, with module-level
``calc_*`` stats and ``filter_*`` operators around it (SURVEY.md §1.1,
§2.1).  This module reproduces that surface 1:1 in names and result
shapes so a reference user can migrate scripts, while the storage
model underneath is the engine's long format (§1.2):

- ``variants`` DataFrame: one row per variant
  (variant_id, chrom, pos, vcf_id, ref, alt, qual, filter)
- ``calls`` DataFrame: one row per (variant, sample)
  (variant_id, chrom, sample_id, gt array<int>, dp int, gq int)

Field-path access (``vs[GT_FIELD]``) returns the relevant columns as
a DataFrame.  Genotype-call conventions (matching the reference):
a call is *called* when no allele in GT is missing; *het* when its
called alleles are not all equal.  The reference's -1 / '.' missing
sentinels are normalized to NULL at ingest (§1.1).

Every filter returns the reference's result-dict contract
``{FLT_VARS, N_KEPT, N_FILTERED_OUT}`` (``variation6/filters.py``
throughout; constants from ``variation6/__init__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Reference constants (variation6/__init__.py)
FLT_VARS = "flt_vars"
N_KEPT = "n_kept"
N_FILTERED_OUT = "n_filtered_out"
FLT_STATS = "flt_stats"
EDGES = "edges"
COUNTS = "counts"

CHROM_FIELD = "/variations/chrom"
POS_FIELD = "/variations/pos"
ID_FIELD = "/variations/id"
REF_FIELD = "/variations/ref"
ALT_FIELD = "/variations/alt"
QUAL_FIELD = "/variations/qual"
GT_FIELD = "/calls/GT"
DP_FIELD = "/calls/DP"
GQ_FIELD = "/calls/GQ"

_VARIANT_FIELDS = {
    CHROM_FIELD: "chrom",
    POS_FIELD: "pos",
    ID_FIELD: "vcf_id",
    REF_FIELD: "ref",
    ALT_FIELD: "alt",
    QUAL_FIELD: "qual",
}
_CALL_FIELDS = {GT_FIELD: "gt", DP_FIELD: "dp", GQ_FIELD: "gq"}


def _is_called() -> F.Column:
    """No missing allele in GT (reference is_called convention)."""
    return F.size(F.filter("gt", lambda a: a.isNull())) == 0


def _is_het() -> F.Column:
    """Called and alleles not all equal."""
    return _is_called() & (F.size(F.array_distinct("gt")) > 1)


class Variations:
    """Dict-like dataset facade (``variation6/variations.py::Variations``)."""

    def __init__(
        self,
        variants: DataFrame,
        calls: DataFrame,
        metadata: dict | None = None,
    ):
        self.variants = variants
        self.calls = calls
        self.metadata = metadata or {}

    # -- container surface (B1/B2) --------------------------------

    @classmethod
    def from_vcf(cls, spark: SparkSession, path: str) -> "Variations":
        from v6spark.sources.vcf import read_vcf

        variants, calls = read_vcf(spark, path)
        return cls(variants, calls, {"source": path})

    @classmethod
    def load(cls, spark: SparkSession, dir_path: str) -> "Variations":
        """Zarr-store analog: a parquet pair directory (A1: load_zarr)."""
        return cls(
            spark.read.parquet(f"{dir_path}/variants.parquet"),
            spark.read.parquet(f"{dir_path}/calls.parquet"),
        )

    @classmethod
    def from_zarr(cls, spark: SparkSession, store: str) -> "Variations":
        """A1 for REAL Zarr v2 stores (the reference's native format —
        ``variation6/in_out/zarr.py::load_zarr``): distributed
        chunk-per-task read via sources/zarr_store.py, so a reference
        user's existing store loads without conversion."""
        from v6spark.sources.zarr_store import load_zarr

        variants, calls = load_zarr(spark, store)
        return cls(variants, calls, {"source": store})

    def save_zarr(self, store: str, row_chunk: int = 1000) -> None:
        """A2 interop EXPORTER to a real Zarr v2 store (driver-side,
        hard-capped — see sources/zarr_store.py::write_zarr_store;
        parquet via :meth:`save` is the at-scale store)."""
        from v6spark.sources.zarr_store import write_zarr_store

        write_zarr_store(self.variants, self.calls, store, row_chunk)

    def save(self, dir_path: str, mode: str = "overwrite") -> None:
        """A2: save_zarr analog.

        Both tables are directory-partitioned by chromosome when the
        column is present (calls carry chrom from ingest), so region
        filters prune whole directories at scan time.  Partition
        columns read back as strings — the engine disables partition-
        column type inference (session.py) so numeric-looking contig
        names like '01' survive the roundtrip.
        """
        from v6spark.sources.vcf import write_tables

        write_tables(self.variants, self.calls, dir_path, mode)

    def save_committed(
        self, dir_path: str, commit_mode: str = "rename"
    ) -> int:
        """A2 with the versioned-manifest commit (:mod:`v6spark.txlog`
        — the same transaction both corpus publishing and streaming
        dedup use): both tables land in a version-private
        ``v=<n>/`` directory and become visible to
        :meth:`load_committed` only when ONE manifest commits them —
        a crash between the variants and calls writes can never
        expose a cohort whose two tables disagree.  Returns the
        committed version."""
        from v6spark import txlog
        from v6spark.sources.vcf import write_tables

        spark = self.variants.sparkSession
        log_dir = f"{dir_path}/_commits"
        version, _doc = txlog.read_latest(spark, log_dir)
        vdir = f"v={version + 1:06d}"
        # an existing target is our own crashed attempt (single-writer)
        fs, jroot, _jvm = txlog._jfs(spark, f"{dir_path}/{vdir}")
        if fs.exists(jroot):
            fs.delete(jroot, True)
        write_tables(self.variants, self.calls, f"{dir_path}/{vdir}")
        txlog.publish(
            spark, log_dir, version + 1, {"live": vdir},
            commit_mode=commit_mode,
        )
        return version + 1

    @classmethod
    def load_committed(
        cls, spark: SparkSession, dir_path: str, version: int | None = None
    ) -> "Variations":
        """Committed-only (optionally version-pinned) counterpart of
        :meth:`load`; raises before the first commit / on a vacuumed
        version."""
        from v6spark import txlog

        if version is None:
            _v, doc = txlog.read_latest(spark, f"{dir_path}/_commits")
        else:
            doc = txlog.read_version(spark, f"{dir_path}/_commits", version)
        if doc is None:
            raise ValueError(
                f"{dir_path} has no committed Variations store"
                + (f" at version {version}" if version is not None else "")
            )
        return cls.load(spark, f"{dir_path}/{doc['live']}")

    @staticmethod
    def vacuum_committed(spark: SparkSession, dir_path: str, keep_last: int = 1) -> int:
        """Retention sweep for :meth:`save_committed` stores."""
        from v6spark import txlog

        return txlog.vacuum_versions(
            spark, dir_path, f"{dir_path}/_commits", "v=", keep_last=keep_last
        )

    def __getitem__(self, field: str) -> DataFrame:
        if field in _VARIANT_FIELDS and _VARIANT_FIELDS[field] in self.variants.columns:
            return self.variants.select("variant_id", _VARIANT_FIELDS[field])
        if field in _CALL_FIELDS and _CALL_FIELDS[field] in self.calls.columns:
            return self.calls.select(
                "variant_id", "sample_id", _CALL_FIELDS[field]
            )
        name = field.rsplit("/", 1)[-1]
        if field.startswith("/variations/") and name in self.variants.columns:
            return self.variants.select("variant_id", name)
        if field.startswith("/calls/") and name in self.calls.columns:
            return self.calls.select("variant_id", "sample_id", name)
        raise KeyError(field)

    def __setitem__(self, field: str, df: DataFrame) -> None:
        """Field assignment with shape conformance (B2:
        ``Variations.__setitem__``): a ``/variations/*`` field must be
        keyed by variant_id, a ``/calls/*`` field by (variant_id,
        sample_id), carrying exactly one value column; the reference's
        (n_variants, n_samples) array-shape check becomes a key-schema
        check plus a join-assign.
        """
        name = field.rsplit("/", 1)[-1]
        if field.startswith("/variations/"):
            keys = ["variant_id"]
        elif field.startswith("/calls/"):
            keys = ["variant_id", "sample_id"]
        else:
            raise KeyError(f"field path must start /variations/ or /calls/: {field}")
        value_cols = [c for c in df.columns if c not in keys]
        if sorted(set(keys) & set(df.columns)) != sorted(keys) or len(value_cols) != 1:
            raise ValueError(
                f"assigning {field} requires columns {keys} + exactly one "
                f"value column, got {df.columns}"
            )
        payload = df.select(*keys, F.col(value_cols[0]).alias(name))
        if keys == ["variant_id"]:
            self.variants = self.variants.drop(name).join(payload, keys, "left")
        else:
            self.calls = self.calls.drop(name).join(payload, keys, "left")

    def keys(self) -> list[str]:
        known = [*_VARIANT_FIELDS, *_CALL_FIELDS]
        std_variant = set(_VARIANT_FIELDS.values()) | {"variant_id"}
        std_call = set(_CALL_FIELDS.values()) | {"variant_id", "sample_id", "chrom"}
        extra = [
            f"/variations/{c}" for c in self.variants.columns if c not in std_variant
        ] + [f"/calls/{c}" for c in self.calls.columns if c not in std_call]
        return known + extra

    # cohorts are 10^2-10^3 samples, so collecting the distinct ids is
    # a driver-bounded list like the reference's samples attribute —
    # but a caller pointing this at a billion-entity long table would
    # OOM the driver, so the collect is capped and over-cap errors out
    MAX_SAMPLES = 1_000_000

    @property
    def samples(self) -> list[str]:
        rows = (
            self.calls.select("sample_id")
            .distinct()
            .orderBy("sample_id")
            .limit(self.MAX_SAMPLES + 1)
            .collect()
        )
        if len(rows) > self.MAX_SAMPLES:
            raise ValueError(
                f"more than {self.MAX_SAMPLES} distinct sample ids: "
                "Variations.samples materializes the cohort on the driver "
                "and is not meant for arbitrary-cardinality entity tables; "
                "aggregate with calls.select('sample_id').distinct() instead"
            )
        return [r["sample_id"] for r in rows]

    @property
    def num_variations(self) -> int:
        return self.variants.count()

    # -- internal: keep calls consistent with a filtered variants --

    def _with_variants(self, kept_variants: DataFrame) -> "Variations":
        kept_calls = self.calls.join(
            kept_variants.select("variant_id"), "variant_id", "left_semi"
        )
        return Variations(kept_variants, kept_calls, self.metadata)

    @property
    def _n_total(self) -> int:
        # cached: chained filters (the reference's normal usage, §3.2)
        # would otherwise re-count the same variants frame per filter
        if not hasattr(self, "_n_total_cache"):
            self._n_total_cache = self.variants.count()
        return self._n_total_cache

    def _filter_result(self, kept_variants: DataFrame) -> dict:
        n_kept = kept_variants.count()
        result = self._with_variants(kept_variants)
        result._n_total_cache = n_kept  # free seed for chained filters
        return {
            FLT_VARS: result,
            N_KEPT: n_kept,
            N_FILTERED_OUT: self._n_total - n_kept,
        }


# ---- stats (SURVEY.md §2.1 C) — module functions like the reference


def calc_missing_gt(vs: Variations, rates: bool = True) -> DataFrame:
    """C1: per-variant missing-call count or rate
    (``variation6/stats::calc_missing_gt``)."""
    ind = F.when(~_is_called(), 1).otherwise(0)
    agg = (
        F.round(F.avg(ind), 6).alias("missing_rate")
        if rates
        else F.sum(ind).alias("n_missing")
    )
    return vs.calls.groupBy("variant_id").agg(agg)


def calc_called_gt(vs: Variations, rates: bool = True) -> DataFrame:
    """C1 dual: per-variant called count/rate."""
    ind = F.when(_is_called(), 1).otherwise(0)
    agg = (
        F.round(F.avg(ind), 6).alias("call_rate")
        if rates
        else F.sum(ind).alias("n_called")
    )
    return vs.calls.groupBy("variant_id").agg(agg)


def count_alleles(vs: Variations, count_missing: bool = False) -> DataFrame:
    """C2: (variant, allele) -> count over all called allele slots
    (``variation6/stats::count_alleles``), long-format."""
    exploded = vs.calls.select(
        "variant_id", F.explode("gt").alias("allele")
    )
    if not count_missing:
        exploded = exploded.filter(F.col("allele").isNotNull())
    return exploded.groupBy("variant_id", "allele").agg(
        F.count(F.lit(1)).alias("n")
    )


def calc_allele_freq(vs: Variations) -> DataFrame:
    """C3: per-variant allele frequencies."""
    counts = count_alleles(vs)
    total = F.sum("n").over(Window.partitionBy("variant_id"))
    return counts.select(
        "variant_id", "allele", F.round(F.col("n") / total, 6).alias("freq")
    )


def calc_maf_by_gt(vs: Variations) -> DataFrame:
    """C4: per-variant major-allele frequency from genotype calls."""
    counts = count_alleles(vs)
    return counts.groupBy("variant_id").agg(
        F.round(F.max("n") / F.sum("n"), 6).alias("maf")
    )


def calc_mac(vs: Variations) -> DataFrame:
    """C6: per-variant minor-allele count (total - major)."""
    counts = count_alleles(vs)
    return counts.groupBy("variant_id").agg(
        (F.sum("n") - F.max("n")).alias("mac")
    )


def calc_obs_het(vs: Variations) -> DataFrame:
    """C7: fraction of called genotypes that are heterozygous."""
    called = vs.calls.filter(_is_called())
    return called.groupBy("variant_id").agg(
        F.round(F.avg(F.when(_is_het(), 1.0).otherwise(0.0)), 6).alias("obs_het")
    )


def calc_unbiased_exp_het(vs: Variations) -> DataFrame:
    """C8: Nei's unbiased expected heterozygosity from allele counts."""
    counts = count_alleles(vs)
    per_var = counts.groupBy("variant_id").agg(
        F.sum("n").alias("n_total"), F.sum(F.col("n") * F.col("n")).alias("sum_sq")
    )
    p2 = F.col("sum_sq").cast("double") / (
        F.col("n_total").cast("double") * F.col("n_total").cast("double")
    )
    h = (F.lit(1.0) - p2) * (
        F.col("n_total").cast("double") / (F.col("n_total") - 1).cast("double")
    )
    # n=1 has no unbiased estimate: NULL, not the NaN 0*inf would give
    h = F.when(F.col("n_total") > 1, h)
    return per_var.select("variant_id", F.round(h, 6).alias("exp_het"))


def calc_depth(vs: Variations, per_sample: bool = False) -> DataFrame:
    """C9: depth distribution stats per variant (or per sample)."""
    key = "sample_id" if per_sample else "variant_id"
    return vs.calls.groupBy(key).agg(
        F.round(F.avg("dp"), 6).alias("avg_dp"),
        F.min("dp").alias("min_dp"),
        F.max("dp").alias("max_dp"),
    )


def calc_called_gt_per_sample(vs: Variations) -> DataFrame:
    """C11: per-sample call rate across variants (the other axis)."""
    ind = F.when(_is_called(), 1.0).otherwise(0.0)
    return vs.calls.groupBy("sample_id").agg(
        F.round(F.avg(ind), 6).alias("call_rate")
    )


def histogram(df: DataFrame, col: str, n_bins: int, limits: tuple) -> DataFrame:
    """C10: fixed-range histogram of any stat column."""
    from v6spark.operators.stats import histogram as _hist

    return _hist(df, col, limits[0], limits[1], n_bins)


# ---- transforms (B3-B6)


def min_depth_gt_to_missing(vs: Variations, min_depth: int) -> Variations:
    """B4: set GT to missing where DP < min_depth
    (``variation6/filters.py::min_depth_gt_to_missing``)."""
    masked = vs.calls.withColumn(
        "gt",
        F.when(
            F.col("dp").isNull() | (F.col("dp") < min_depth),
            F.transform("gt", lambda a: F.lit(None).cast("int")),
        ).otherwise(F.col("gt")),
    )
    return Variations(vs.variants, masked, vs.metadata)


def min_qual_gt_to_missing(vs: Variations, min_qual: int) -> Variations:
    """B5: set GT to missing where GQ < min_qual."""
    masked = vs.calls.withColumn(
        "gt",
        F.when(
            F.col("gq").isNull() | (F.col("gq") < min_qual),
            F.transform("gt", lambda a: F.lit(None).cast("int")),
        ).otherwise(F.col("gt")),
    )
    return Variations(vs.variants, masked, vs.metadata)


def gts_as_mat012(vs: Variations) -> DataFrame:
    """B6: alt-allele dosage {0,1,2}, NULL when not called."""
    dosage = F.when(
        _is_called(), F.size(F.filter("gt", lambda a: a != 0))
    ).otherwise(F.lit(None))
    return vs.calls.select(
        "variant_id", "sample_id", dosage.cast("int").alias("dosage")
    )


def filter_samples(vs: Variations, samples: list[str], reverse: bool = False) -> Variations:
    """B3: keep (or drop) samples — a long-format filter, no array
    re-slicing (``variation6/filters.py::filter_samples``)."""
    cond = F.col("sample_id").isin(samples)
    return Variations(
        vs.variants, vs.calls.filter(~cond if reverse else cond), vs.metadata
    )


# ---- filters (D1-D8) — reference result-dict contract


def remove_low_call_rate_vars(
    vs: Variations,
    min_call_rate: float,
    rates: bool = True,
    calc_histogram: bool = False,
    n_bins: int = 20,
    limits: tuple = (0.0, 1.0),
) -> dict:
    """D1: keep variants with call rate >= min
    (``variation6/filters.py::remove_low_call_rate_vars``).

    ``rates=False`` interprets the threshold as an absolute CALLED
    COUNT per variant instead of a fraction (the reference's
    count-based mode); the histogram limits then default to a count
    range, so pass explicit ``limits`` for count histograms.

    With ``calc_histogram=True`` the result dict gains ``FLT_STATS`` —
    the distribution of the PRE-FILTER per-variant call stat as
    ``{EDGES: [n_bins+1 floats], COUNTS: [n_bins ints]}`` (the
    reference returns np.histogram of the stat vector; the last bin is
    closed so stat == limits[1] is counted, matching numpy).  The
    histogram aggregates the already-reduced per-variant relation —
    one extra small hash-agg, not a second pass over calls.
    """
    stat_col = "call_rate" if rates else "n_called"
    stat = calc_called_gt(vs, rates=rates)
    if calc_histogram:
        from v6spark.operators.filters import rate_histogram

        hist = rate_histogram(stat, stat_col, n_bins, limits)
    kept = vs.variants.join(
        stat.filter(F.col(stat_col) >= min_call_rate).select("variant_id"),
        "variant_id",
        "left_semi",
    )
    result = vs._filter_result(kept)
    if calc_histogram:
        lo, hi = float(limits[0]), float(limits[1])
        width = (hi - lo) / n_bins
        counts = {r["bucket"]: r["n"] for r in hist.collect()}
        result[FLT_STATS] = {
            EDGES: [lo + i * width for i in range(n_bins)] + [hi],
            COUNTS: [int(counts.get(i, 0)) for i in range(n_bins)],
        }
    return result


def _band_filter(vs: Variations, stat: DataFrame, col: str, lo, hi) -> dict:
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= lo)
    if hi is not None:
        cond = cond & (F.col(col) <= hi)
    kept = vs.variants.join(
        stat.filter(cond).select("variant_id"), "variant_id", "left_semi"
    )
    return vs._filter_result(kept)


def filter_by_maf(
    vs: Variations,
    max_allowable_maf: float | None = None,
    min_allowable_maf: float | None = None,
) -> dict:
    """D2: major-allele-frequency band filter."""
    return _band_filter(
        vs, calc_maf_by_gt(vs), "maf", min_allowable_maf, max_allowable_maf
    )


def filter_by_mac(
    vs: Variations, max_allowable_mac=None, min_allowable_mac=None
) -> dict:
    """D4: minor-allele-count band filter."""
    return _band_filter(vs, calc_mac(vs), "mac", min_allowable_mac, max_allowable_mac)


def filter_by_obs_het(
    vs: Variations, max_allowable_het=None, min_allowable_het=None
) -> dict:
    """D5: observed-heterozygosity band filter."""
    return _band_filter(
        vs, calc_obs_het(vs), "obs_het", min_allowable_het, max_allowable_het
    )


def filter_by_snp_qual(vs: Variations, min_qual: float) -> dict:
    """D6: variant QUAL threshold (plain pushed-down predicate)."""
    kept = vs.variants.filter(F.col("qual") >= min_qual)
    return vs._filter_result(kept)


def filter_variations_in_regions(
    vs: Variations, regions: list[tuple[str, int, int]], reverse: bool = False
) -> dict:
    """D7: keep variants inside [start, end) chrom regions.

    Regions broadcast; predicate is chrom equality + pos range — on a
    chrom-partitioned store this prunes partitions before reading.
    """
    spark = vs.variants.sparkSession
    rdf = spark.createDataFrame(
        regions, "r_chrom string, r_start long, r_end long"
    )
    cond = (
        (F.col("chrom") == F.col("r_chrom"))
        & (F.col("pos") >= F.col("r_start"))
        & (F.col("pos") < F.col("r_end"))
    )
    inside = vs.variants.join(F.broadcast(rdf), cond, "left_semi")
    if reverse:
        kept = vs.variants.join(
            inside.select("variant_id"), "variant_id", "left_anti"
        )
    else:
        kept = inside
    return vs._filter_result(kept)


def keep_variable_variations(vs: Variations) -> dict:
    """D8: drop invariant sites (one observed allele)."""
    counts = count_alleles(vs)
    variable = (
        counts.groupBy("variant_id")
        .agg(F.countDistinct("allele").alias("k"))
        .filter(F.col("k") > 1)
    )
    kept = vs.variants.join(variable.select("variant_id"), "variant_id", "left_semi")
    return vs._filter_result(kept)


def keep_biallelic(vs: Variations) -> dict:
    """D8: keep sites with exactly two observed alleles."""
    counts = count_alleles(vs)
    bi = (
        counts.groupBy("variant_id")
        .agg(F.countDistinct("allele").alias("k"))
        .filter(F.col("k") == 2)
    )
    kept = vs.variants.join(bi.select("variant_id"), "variant_id", "left_semi")
    return vs._filter_result(kept)
