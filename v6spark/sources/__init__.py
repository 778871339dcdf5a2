"""Data sources: parquet tables, VCF text ingest, real Zarr v2 stores.

The reference loads Zarr stores / VCF files
(``variation6/in_out/zarr.py::load_zarr``, ``vcf_to_zarr`` — SURVEY.md
§2.1 A1-A3); here the at-scale corpus is parquet, the VCF path is a
DataFrame-native text parser (sources/vcf.py), and existing reference
Zarr stores load directly via the distributed chunk-per-task reader
(sources/zarr_store.py) — no out-of-band conversion.
"""

from v6spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables",
           "register_idempotent"]


def register_idempotent(spark, cls) -> None:
    """``spark.dataSource.register`` that tolerates both re-register
    shapes: the SAME session replaces (a WARN), while a sibling
    ``spark.newSession()`` sharing the registry raises
    DATA_SOURCE_ALREADY_EXISTS — both mean "registered".  One shared
    helper so the five source modules can't drift on the idempotency
    rule."""
    try:
        spark.dataSource.register(cls)
    except Exception as exc:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise
