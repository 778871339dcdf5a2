"""v6spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``pziarsolo/variation6``.

variation6 is a Dask/Zarr population-genomics toolkit structured as
scan -> elementwise transform -> axis reduction -> predicate filter ->
materialize (see SURVEY.md §0.5).  v6spark re-expresses that operator
inventory (SURVEY.md §2) on the Spark DataFrame/SQL stack — Catalyst
plans, parquet pushdown, whole-stage codegen — and extends it with the
relational, windowed, streaming and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB training-data pipeline needs.

Layout
------
- ``v6spark.session``    SparkSession factory (config posture, SURVEY §4.2)
- ``v6spark.sources``    parquet/VCF-style ingest, schema registry
- ``v6spark.functions``  deterministic aggregation & array/text helpers
- ``v6spark.operators``  the library surface mirroring variation6
  (stats C1-C11, filters D1-D9, transforms B3-B6) plus extensions
  (dedup, similarity, text, multimodal, as-of join, sessionize)
- ``v6spark.plans``      the declared-query registry judged against a
  DuckDB oracle (SURVEY.md §2.3)
- ``v6spark.streaming``  Structured Streaming variants of the event ops
- ``v6spark.txlog``      versioned-manifest transaction log (the shared
  exactly-once commit kernel: rename + S3 conditional-put modes,
  optimistic concurrency, time travel, grace-window vacuum)
- ``v6spark.genomics``   the ``Variations`` facade — variation6's
  user-facing API (``from v6spark import Variations``)
- ``v6spark.pipeline``   end-to-end corpus preparation + the ACID
  table format (``prepare_training_corpus``,
  ``publish_corpus_committed``, ``read_published_corpus``; DML:
  retract/upsert/compact/reshard; readers: ``read_published_where``
  data skipping, ``read_published_keys`` Bloom-indexed point lookups;
  time travel, named tags, change feed, WAP staging)
"""

from v6spark.genomics import Variations
from v6spark.session import get_spark
from v6spark.sources.tables import load_table, load_tables

__all__ = ["Variations", "get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
