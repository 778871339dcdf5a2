"""Explicit schema registry for the corpus tables (SURVEY.md §1.1).

The reference declares its field layout as constants
(``variation6/__init__.py``: GT_FIELD, DP_FIELD, ...); the engine's
analog is one DDL per corpus table, declared ONCE here.  Parquet is
self-describing so the parquet loader never consults this — the
registry exists for the schemaless ecosystem formats (CSV, JSON,
streaming file sources), where schema inference in a production path
would re-type columns per-file and corrupt the contract.

``events.ts`` is declared TIMESTAMP_NTZ here (µs): the parquet
corpus carries TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark
surfaces as timestamp_ntz, and CSV/JSON copies carry offset-free ISO
strings — so a format copy round-trips schema-identical.  The loader
synthesizes ``ts_ns``/``ts_us`` from the parsed timestamp.  The TPC-H date
columns are TIMESTAMP_NTZ, matching how Spark surfaces the parquet
ms-timestamps (no timezone) so format copies round-trip
schema-identical.
"""

from __future__ import annotations

TABLE_DDL: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    "part": (
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz"
    ),
    "events": (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    ),
    "documents": "doc_id long, text string, lang string, source string, n_chars long",
    "embeddings": "vec_id long, embedding array<float>, label int",
}
