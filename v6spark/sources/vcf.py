"""VCF ingest — the reference's genomic entry point, DataFrame-native.

``variation6/in_out/vcf.py::vcf_to_zarr`` (SURVEY.md §2.1 A3) parses
VCF into per-field chunked arrays via scikit-allel.  Here the parser
is a Spark text scan + Catalyst expressions producing the engine's
long-format data model (SURVEY.md §1.2):

- ``variants(variant_id, chrom, pos, vcf_id, ref, alt array<string>,
  qual double, filter string)``
- ``calls(variant_id, chrom, sample_id, gt array<int>, dp int,
  gq int)`` — one row per (variant, sample); GT allele codes with the
  reference's ``.`` missing sentinel normalized to NULL (§1.1).
  ``chrom`` is carried on calls so chrom-partitioned stores prune
  without joining back to variants.

Everything after the text scan is whole-stage-codegen expressions
(split / transform / try_cast); per-sample fan-out is an inline-array
explode, so a 10k-sample VCF becomes 10k rows per variant without any
Python in the loop.  Gzipped VCFs work through Spark's text codec
handling, though a .gz file is a single split — for 100 TB ingest use
bgzip'd shards or re-shard the text first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXED_COLS = ["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]


def vcf_sample_names(spark: SparkSession, path: str) -> list[str]:
    """Sample names from the #CHROM header line (one tiny filtered scan)."""
    header = (
        spark.read.text(path)
        .filter(F.col("value").startswith("#CHROM"))
        .head()
    )
    if header is None:
        raise ValueError(f"not a VCF (no #CHROM header line): {path}")
    fields = header["value"].split("\t")
    return fields[9:]  # after the FORMAT column


def read_vcf(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse a VCF file into (variants, calls) DataFrames.

    variant_id = 'chrom:pos:ref:alt[,alt...]' — materialized row
    identity (the reference relies on positional array indices, which
    have no Spark equivalent; SURVEY.md §1.1).  chrom:pos alone is not
    unique: split multi-allelic records share a position.
    """
    samples = vcf_sample_names(spark, path)
    data = spark.read.text(path).filter(~F.col("value").startswith("#"))
    # Split the line ONCE into an intermediate projection, then index
    # it.  Referencing `split(value)[i]` per column would state the
    # split 9+n_samples times; CollapseProject declines to merge the
    # two projects because the non-cheap split is multiply referenced,
    # so the physical plan evaluates one split per line (verified:
    # `split(value` appears once in the executed plan, was 25).
    data = data.select(F.split("value", "\t").alias("_f"))
    c = F.col("_f")

    base = data.select(
        c[0].alias("chrom"),
        c[1].cast("long").alias("pos"),
        F.nullif(c[2], F.lit(".")).alias("vcf_id"),
        c[3].alias("ref"),
        F.split(c[4], ",").alias("alt"),
        F.nullif(c[5], F.lit(".")).try_cast("double").alias("qual"),
        c[6].alias("filter"),
        c[7].alias("info"),
        F.split(c[8], ":").alias("fmt"),
        *[c[9 + i].alias(f"_s{i}") for i in range(len(samples))],
    ).withColumn(
        # chrom:pos alone is NOT unique — split multi-allelic records
        # and SNP+indel at one locus share a position — so the key
        # includes ref and the alt list
        "variant_id",
        F.concat_ws(":", "chrom", "pos", "ref", F.concat_ws(",", "alt")),
    )

    variants = base.select(
        "variant_id", "chrom", "pos", "vcf_id", "ref", "alt", "qual", "filter"
    )

    sample_structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("sample_id"),
                F.split(F.col(f"_s{i}"), ":").alias("vals"),
            )
            for i, name in enumerate(samples)
        ]
    )

    def fmt_field(key: str):
        # position of `key` in this row's FORMAT; 0 = absent.
        # try_element_at: VCF permits samples to DROP trailing FORMAT
        # fields, so vals may be shorter than fmt — plain element_at
        # would abort the job under ANSI mode (default in Spark 4).
        pos = F.array_position("fmt", key)
        return F.when(
            pos > 0, F.try_element_at(F.col("s.vals"), pos.cast("int"))
        )

    gt_raw = fmt_field("GT")
    gt = F.transform(
        F.split(gt_raw, r"[/|]"),
        lambda a: F.nullif(a, F.lit(".")).try_cast("int"),
    )

    calls = (
        base.select(
            "variant_id", "chrom", "fmt", F.explode(sample_structs).alias("s")
        )
        .select(
            "variant_id",
            "chrom",
            F.col("s.sample_id").alias("sample_id"),
            gt.alias("gt"),
            F.nullif(fmt_field("DP"), F.lit(".")).try_cast("int").alias("dp"),
            F.nullif(fmt_field("GQ"), F.lit(".")).try_cast("int").alias("gq"),
        )
    )
    return variants, calls


def write_tables(
    variants: DataFrame, calls: DataFrame, out_dir: str, mode: str = "overwrite"
) -> None:
    """Persist the pair as parquet — the Zarr-store analog (A2:
    ``save_zarr``), chrom-partitioned when the column is present so
    region queries prune directories (delegates to
    sources/layout.py::write_partitioned — one write path)."""
    from v6spark.sources.layout import write_partitioned

    for df, name in ((variants, "variants"), (calls, "calls")):
        if "chrom" in df.columns:
            write_partitioned(df, f"{out_dir}/{name}.parquet", "chrom", mode)
        else:
            df.write.mode(mode).parquet(f"{out_dir}/{name}.parquet")
