#!/usr/bin/env python
"""Minimal repro: Spark 4.1 Python-DataSource filter pushdown poisons
shared relations.

A reader implementing ``pushFilters`` plans its partitions per query;
Spark caches the pushdown-planned partitions on the relation node, and
a LATER query on the same DataFrame (or temp view) WITHOUT pushable
filters reuses the previous query's pruned partitions — a plain
count() after a filtered count() returns the filtered result.

This is why v6spark's pubcorpus/publog sources key their pruning on
OPTIONS (relation identity) instead of pushFilters — see
``v6spark/sources/pubcorpus.py``.  Expected output on a FIXED Spark:
every line True.  Observed on 4.1.2: plain-after-filtered is False.

Usage: python scripts/spark_pushdown_bug_repro.py
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)


class TinyReader(DataSourceReader):
    """Ten single-row partitions; pushFilters prunes partitions whose
    value cannot match an EqualTo — per the documented contract, all
    filters are returned for Spark to re-apply."""

    def __init__(self):
        self.eq = None

    def pushFilters(self, filters):
        self.eq = None
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("v",):
                self.eq = f.value
        return filters  # nothing fully handled: Spark re-applies

    def partitions(self):
        vals = range(10)
        if self.eq is not None:
            vals = [v for v in vals if v == self.eq]
        return [InputPartition(v) for v in vals]

    def read(self, part):
        yield (part.value,)


class TinySource(DataSource):
    @classmethod
    def name(cls):
        return "tinysrc"

    def schema(self):
        return "v int"

    def reader(self, schema):
        return TinyReader()


def main():
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .getOrCreate()
    )
    spark.dataSource.register(TinySource)

    df = spark.read.format("tinysrc").load()
    print("fresh plain count == 10:", df.count() == 10)
    print("filtered count == 1:", df.filter("v = 3").count() == 1)
    n = df.count()
    print(f"plain count AFTER filtered == 10: {n == 10}  (got {n})")

    df.createOrReplaceTempView("tiny_v")
    m = spark.sql("SELECT count(*) AS c FROM tiny_v").collect()[0]["c"]
    print(f"temp-view plain count == 10: {m == 10}  (got {m})")
    spark.stop()


if __name__ == "__main__":
    main()
