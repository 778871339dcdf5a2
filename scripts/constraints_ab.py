#!/usr/bin/env python
"""A/B: CHECK-constraint enforcement cost on the SQL append path.

The claim under test: per-Arrow-batch DuckDB evaluation (the JVM-free
writer's enforcement) costs a bounded fraction of the append wall and
scales with the APPENDED rows, not the corpus — so constraints are
safe to leave on in a production ingest.

Corpus: N docs, 64 shards x 3 splits; appends of N/10 rows through
df.write.format("pubcorpus") with 0 vs 3 constraints set.
Row-exactness asserted; a violating append is also timed (fail-fast
wall) to show refusal happens at batch granularity, not after a full
write.

Usage: python scripts/constraints_ab.py
Writes AB_CONSTRAINTS.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v6spark.pipeline import (
    publish_corpus_committed,
    read_published_corpus,
    set_published_constraint,
)
from v6spark.session import get_spark
from v6spark.sources.pubcorpus import register_pubcorpus_source

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "AB_CONSTRAINTS.json",
)

N_SHARDS = 64
CONSTRAINTS = {
    "day_ok": "day >= 0 AND day < 7",
    "text_nonempty": "length(text) > 0",
    "id_positive": "doc_id >= 0",
}


def corpus(spark, n: int, root: str):
    prepared = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 == 0, "valid").otherwise("train")
        .alias("split"),
    )
    content = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id"), F.lit(" "),
                 F.repeat(F.lit("x"), 200)).alias("text"),
        (F.col("id") % 7).cast("long").alias("day"),
    )
    publish_corpus_committed(prepared, content, root, n_shards=N_SHARDS)


def appender(spark, n: int, lo: int, bad: bool = False):
    day = "cast(42 as long)" if bad else "cast(id % 7 as long)"
    return spark.range(lo, lo + n).selectExpr(
        "id as doc_id",
        "concat('appended ', id, ' ', repeat('y', 200)) as text",
        f"{day} as day",
        "'train' as split",
    )


def run_scale(spark, n: int) -> dict:
    out = {"rows": n, "append_rows": n // 10}
    register_pubcorpus_source(spark)
    for label, with_cons in (("plain", False), ("constrained", True)):
        root = tempfile.mkdtemp(prefix=f"cab_{label}_{n}_")
        try:
            corpus(spark, n, root)
            if with_cons:
                t0 = time.monotonic()
                for name, expr in CONSTRAINTS.items():
                    set_published_constraint(spark, root, name, expr)
                out["wall_set_3_constraints"] = round(
                    time.monotonic() - t0, 2
                )
            # untimed warm-up: the first append pays one-off Python
            # DataSource planning costs that would swamp the A/B
            appender(spark, n // 100, 30 * n).write.format(
                "pubcorpus"
            ).mode("append").save(root)
            walls = []
            for rep in range(3):
                t0 = time.monotonic()
                appender(
                    spark, n // 10, (10 + rep) * n
                ).write.format("pubcorpus").mode("append").save(root)
                walls.append(time.monotonic() - t0)
            out[f"wall_append_{label}"] = round(sorted(walls)[1], 2)
            assert read_published_corpus(spark, root).count() \
                == n + n // 100 + 3 * (n // 10)
            if with_cons:
                t0 = time.monotonic()
                try:
                    appender(spark, n // 10, 20 * n, bad=True).write \
                        .format("pubcorpus").mode("append").save(root)
                    raise AssertionError("violating append must fail")
                except AssertionError:
                    raise
                except Exception:
                    out["wall_violating_append_refused"] = round(
                        time.monotonic() - t0, 2
                    )
                assert read_published_corpus(spark, root).count() \
                    == n + n // 100 + 3 * (n // 10)  # nothing landed
        finally:
            shutil.rmtree(root, ignore_errors=True)
    out["enforcement_overhead_pct"] = round(
        100.0 * (out["wall_append_constrained"]
                 - out["wall_append_plain"])
        / max(out["wall_append_plain"], 1e-9), 1,
    )
    return out


def main():
    spark = get_spark("constraints-ab")
    out = {
        "scale_1x": run_scale(spark, 200_000),
        "scale_10x": run_scale(spark, 2_000_000),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
