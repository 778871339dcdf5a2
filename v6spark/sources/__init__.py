"""Data sources: parquet table loader and the VCF-style text ingest.

The reference loads Zarr stores / VCF files
(``variation6/in_out/zarr.py::load_zarr``, ``vcf_to_zarr`` — SURVEY.md
§2.1 A1-A3); here the corpus is parquet and the VCF path is a
DataFrame-native text parser (sources/vcf.py).
"""

from v6spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
