"""Measured Z-order benefit: files whose parquet footer min/max
ranges intersect a small 2-D rectangle predicate, Z-ordered layout
vs single-column linear sort.

This is the planning-time arithmetic Spark's parquet reader applies
(row-group stats pruning): fewer intersecting files = fewer tasks
and bytes.  Measured directly from the footers via pyarrow, so the
number is the actual pruning bound, not a wall-clock proxy.
Writes AB_ZORDER.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v6spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "AB_ZORDER.json")


def files_intersecting(path: str, x_rng, y_rng) -> tuple[int, int]:
    import pyarrow.parquet as pq

    total = hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        fx_min = fy_min = float("inf")
        fx_max = fy_max = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "x":
                    fx_min, fx_max = min(fx_min, st.min), max(fx_max, st.max)
                elif name == "y":
                    fy_min, fy_max = min(fy_min, st.min), max(fy_max, st.max)
        total += 1
        if not (fx_max < x_rng[0] or fx_min > x_rng[1]
                or fy_max < y_rng[0] or fy_min > y_rng[1]):
            hit += 1
    return hit, total


def main() -> None:
    import numpy as np

    from v6spark.sources.layout import write_zordered

    spark = get_spark("zorder-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    rng = np.random.default_rng(11)
    n = 400_000
    rows = list(zip(
        range(n),
        rng.uniform(0, 1000, n).tolist(),
        rng.uniform(0, 1000, n).tolist(),
    ))
    df = spark.createDataFrame(rows, "id long, x double, y double")
    root = tempfile.mkdtemp(prefix="zorder_ab_")
    linear, zorder = f"{root}/linear", f"{root}/zorder"
    # baseline: the standard single-column range layout
    df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.parquet(linear)
    write_zordered(df, zorder, ["x", "y"], n_files=16)

    FULL = (-1e18, 1e18)
    queries = {
        "x_only_5pct": ((200.0, 250.0), FULL),
        "y_only_5pct": (FULL, (700.0, 750.0)),
        "both_5pct": ((200.0, 250.0), (700.0, 750.0)),
    }
    results = {}
    for name, (x_rng, y_rng) in queries.items():
        lin_hit, lin_total = files_intersecting(linear, x_rng, y_rng)
        z_hit, z_total = files_intersecting(zorder, x_rng, y_rng)
        q = (f"x BETWEEN {x_rng[0]} AND {x_rng[1]} AND "
             f"y BETWEEN {y_rng[0]} AND {y_rng[1]}")
        a = {r["id"] for r in spark.read.parquet(linear).filter(q).collect()}
        b = {r["id"] for r in spark.read.parquet(zorder).filter(q).collect()}
        assert a == b, f"layouts disagree on {name}"
        results[name] = {
            "linear_files_hit": f"{lin_hit}/{lin_total}",
            "zorder_files_hit": f"{z_hit}/{z_total}",
            "rows_returned": len(a),
        }
    doc = {
        "rows": n,
        "queries": results,
        "note": "the linear x-sort serves x-only queries and nothing else "
                "(every file spans all of y); z-order files hold compact "
                "curve rectangles, so x-only, y-only, and combined "
                "predicates ALL prune; counts come from parquet footers - "
                "the exact bound Spark's row-group pruning applies",
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
