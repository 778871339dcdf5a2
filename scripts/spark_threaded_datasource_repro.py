"""Minimal repro: Spark 4.1 Python DataSource WRITES fail from
non-main Python threads.

A Python data source registered via ``spark.dataSource.register``
resolves fine for READS from any thread, but a WRITE
(``df.write.format(...).save()``) from any non-main Python thread —
plain ``threading.Thread`` or ``pyspark.InheritableThread``, with or
without re-registering inside the thread — fails name resolution:

    DATA_SOURCE_NOT_FOUND ... Caused by:
    ClassNotFoundException: <name>.DefaultSource

i.e. the write path's ``lookupDataSourceV2`` never consults the
Python data source registry when invoked from a secondary thread,
while the read path does.  Only public PySpark APIs involved.

Until fixed upstream, drive Python-source writes from the main
thread (or a process pool); v6spark stages its writer-concurrency
coverage at the writer-object level for this reason
(tests/test_pubcorpus_writer.py::test_occ_recomputes_against_complete_winner).

Run:  python scripts/spark_threaded_datasource_repro.py
Expected: main-thread read+write OK; threaded reads OK; every
threaded write attempt FAILED with DATA_SOURCE_NOT_FOUND.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
)


class TinyReader(DataSourceReader):
    def read(self, partition):
        yield (1,)


class TinyWriter(DataSourceWriter):
    def write(self, iterator):
        for _row in iterator:
            pass
        return WriterCommitMessage()

    def commit(self, messages):
        pass


class TinySource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tinysrc"

    def schema(self) -> str:
        return "a int"

    def reader(self, schema) -> TinyReader:
        return TinyReader()

    def writer(self, schema, overwrite: bool) -> TinyWriter:
        return TinyWriter()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(TinySource)

    df = spark.range(3).selectExpr("cast(id as int) as a")
    print("main read :",
          spark.read.format("tinysrc").load().count(), "row(s) [OK]")
    df.write.format("tinysrc").mode("append").save()
    print("main write: OK")

    results: list[str] = []

    def attempt(label: str, re_register: bool) -> None:
        try:
            if re_register:
                spark.dataSource.register(TinySource)
            n = spark.read.format("tinysrc").load().count()
            results.append(f"{label} read : OK ({n})")
        except Exception as exc:
            results.append(f"{label} read : FAILED — {str(exc)[:90]}")
        try:
            df.write.format("tinysrc").mode("append").save()
            results.append(f"{label} write: OK")
        except Exception as exc:
            results.append(f"{label} write: FAILED — {str(exc)[:90]}")

    for label, re_reg in (("thread", False),
                          ("thread+re-register", True)):
        t = threading.Thread(target=attempt, args=(label, re_reg))
        t.start()
        t.join()
    try:
        from pyspark import InheritableThread

        t = InheritableThread(
            target=attempt, args=("InheritableThread", False)
        )
        t.start()
        t.join()
    except ImportError:
        results.append("InheritableThread: not available")

    for r in results:
        print(r)
    spark.stop()


if __name__ == "__main__":
    main()
