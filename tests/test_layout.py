"""Physical-layout tests: bucketed joins elide exchanges; partitioned
stores prune directories at scan time."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from v6spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)
from v6spark.sources.tables import load_table


def formatted_plan(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "t_orders_b", "o_custkey", n_buckets=8)
    write_bucketed(customer, "t_customer_b", "o_custkey", n_buckets=8)
    joined = bucketed_join(spark, "t_orders_b", "t_customer_b", "o_custkey")
    plan = formatted_plan(joined)
    # co-located layout: a merge join with ZERO shuffle exchanges —
    # exchange absence checked on the SIMPLE plan, which inlines
    # "Exchange hashpartitioning(...)" (formatted mode splits node
    # names from arguments, so the substring never appears there and
    # the assertion would be vacuous)
    assert "SortMergeJoin" in plan
    simple = formatted_plan(joined, "simple")
    assert "Exchange hashpartitioning" not in simple
    assert "Exchange" not in simple
    assert "Bucketed: true" in plan
    # and it computes the same result as the plain join
    plain = orders.join(customer, "o_custkey").count()
    assert joined.count() == plain


def test_forced_smj_parity_declared_joins(spark, sf_dir):
    """The non-broadcast join path, in evidence: with every broadcast
    threshold disabled, q_join_multi and q_join_left plan
    SortMergeJoins (the strategy they take at 100 TB where orders and
    customer exceed any broadcast threshold) and produce EXACTLY the
    rows the default broadcast-happy plan produces.  q_join_multi's
    hinted nation/region broadcasts survive — tiny at any scale
    factor, they must never shuffle the fact side."""
    from v6spark.plans import REGISTRY

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    for name in ("q_join_multi", "q_join_left"):
        fn = REGISTRY[name].spark_fn
        # r12: declared queries no longer carry a presentation ORDER BY
        # (the driver comparison is an order-insensitive multiset), so
        # parity here is row-multiset parity too
        want = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        try:
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            forced = fn(spark, sf_dir)
            plan = formatted_plan(forced)
            assert "SortMergeJoin" in plan, name
            if name == "q_join_left":
                # no hints here: with broadcasts off, NO broadcast join
                assert "BroadcastHashJoin" not in plan
            else:
                # the two fact-side joins are merge joins; the hinted
                # nation/region chain stays broadcast
                assert plan.count("SortMergeJoin") >= 2
            got = sorted(tuple(r) for r in forced.collect())
        finally:
            for k, v in saved.items():
                conf.set(k, v) if v is not None else conf.unset(k)
        assert got == want, name


def test_partitioned_store_prunes(spark, sf_dir, tmp_path_factory):
    # engine posture: partition columns are STRINGS (type inference is
    # disabled so values like chrom '01' survive the roundtrip) — so
    # write and filter the partition key as a string
    out = str(tmp_path_factory.mktemp("part_store"))
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("string")
    )
    write_partitioned(li, out, "ship_year")
    back = spark.read.parquet(out).filter(F.col("ship_year") == "1997")
    plan = formatted_plan(back)
    assert re.search(
        r"PartitionFilters: \[isnotnull\(ship_year#\d+\), \(ship_year#\d+ = 1997\)\]",
        plan,
    )
    assert dict(back.dtypes)["ship_year"] == "string"
    want = li.filter(F.col("ship_year") == "1997").count()
    assert back.count() == want


def test_csv_json_ingest_parity(spark, sf_dir, tmp_path_factory):
    """CSV/JSON copies of a table read back semantically identical to
    the parquet original via the registered schemas (no inference)."""
    from v6spark.sources.tables import (
        load_table,
        load_table_format,
        write_table_format,
    )

    tmp = tmp_path_factory.mktemp("fmt")

    li = load_table(spark, sf_dir, "lineitem")
    write_table_format(li, str(tmp / "li_csv"), "csv")
    li_csv = load_table_format(spark, str(tmp / "li_csv"), "lineitem", "csv")
    assert li_csv.schema == li.schema
    assert sorted(map(tuple, li_csv.collect())) == sorted(map(tuple, li.collect()))

    ev = load_table(spark, sf_dir, "events")
    write_table_format(ev, str(tmp / "ev_json"), "json")
    ev_json = load_table_format(spark, str(tmp / "ev_json"), "events", "json")
    # event-time contract re-derived on read (µs precision: JSON carries
    # ISO strings, so ns-precision ts_ns differs from the parquet source)
    assert {"ts_ns", "ts_us"} <= set(ev_json.columns)
    a = sorted(map(tuple, ev_json.select("event_id", "user_id", "ts_us").collect()))
    b = sorted(map(tuple, ev.select("event_id", "user_id", "ts_us").collect()))
    assert a == b

    emb = load_table(spark, sf_dir, "embeddings")
    write_table_format(emb, str(tmp / "emb_json"), "json")
    emb_json = load_table_format(spark, str(tmp / "emb_json"), "embeddings", "json")
    assert sorted(map(tuple, emb_json.select("vec_id", "label").collect())) == sorted(
        map(tuple, emb.select("vec_id", "label").collect())
    )
    assert emb_json.schema["embedding"].dataType.simpleString() == "array<float>"


def test_rollup_view_incremental_refresh(spark, sf_dir, tmp_path_factory):
    """Materialized rollup: full build, no-op refresh when fresh,
    partition-wise refresh after one partition's source changes."""
    from pyspark.sql import functions as F

    from v6spark.sources.layout import write_partitioned
    from v6spark.sources.rollup import (
        is_fresh,
        read_rollup,
        refresh_rollup,
    )
    from v6spark.sources.tables import load_table

    tmp = tmp_path_factory.mktemp("rollup")
    src_dir = str(tmp / "orders_by_status")
    view_dir = str(tmp / "rollup_view")

    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, src_dir, "o_orderstatus")

    def agg_fn(df):
        return df.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 6).alias("sum_price"),
        )

    refreshed = refresh_rollup(spark, src_dir, view_dir, "o_orderstatus", agg_fn)
    assert sorted(refreshed) == ["F", "O", "P"]
    assert is_fresh(src_dir, view_dir, "o_orderstatus")

    # the view answers the aggregate exactly
    want = sorted(map(tuple, agg_fn(orders).collect()))
    got = sorted(
        map(
            tuple,
            read_rollup(spark, view_dir)
            .select("o_orderstatus", "o_orderpriority", "n", "sum_price")
            .collect(),
        )
    )
    assert got == want

    # fresh -> refresh is a no-op
    assert refresh_rollup(spark, src_dir, view_dir, "o_orderstatus", agg_fn) == []

    # mutate ONE source partition: only that partition refreshes
    f_rows = orders.filter(F.col("o_orderstatus") == "F").limit(100)
    f_rows.write.mode("overwrite").parquet(src_dir + "/o_orderstatus=F")
    assert not is_fresh(src_dir, view_dir, "o_orderstatus")
    refreshed = refresh_rollup(spark, src_dir, view_dir, "o_orderstatus", agg_fn)
    assert refreshed == ["F"]
    # untouched partitions still serve the original totals; F reflects
    # the new (truncated) source
    view = read_rollup(spark, view_dir)
    n_f = view.filter(F.col("o_orderstatus") == "F").agg(F.sum("n")).collect()[0][0]
    assert n_f == 100
    n_o_view = view.filter(F.col("o_orderstatus") == "O").agg(F.sum("n")).collect()[0][0]
    n_o_src = orders.filter(F.col("o_orderstatus") == "O").count()
    assert n_o_view == n_o_src


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """write_zordered: identical query results to a linear layout,
    and file-footer ranges that prune on BOTH columns (the linear
    x-sort leaves every file spanning all of y)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from v6spark.sources.layout import write_zordered

    rng = np.random.default_rng(5)
    n = 40_000
    df = spark.createDataFrame(
        list(zip(range(n), rng.uniform(0, 100, n).tolist(),
                 rng.uniform(0, 100, n).tolist())),
        "id long, x double, y double",
    )
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    df.repartitionByRange(8, "x").write.parquet(lin)
    write_zordered(df, zo, ["x", "y"], n_files=8)

    def y_spans(path):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = float("inf"), float("-inf")
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    if col.path_in_schema == "y" and col.statistics:
                        lo = min(lo, col.statistics.min)
                        hi = max(hi, col.statistics.max)
            spans.append(hi - lo)
        return spans

    # linear files each span ~the full y range; z-order files don't
    assert min(y_spans(lin)) > 90
    assert sorted(y_spans(zo))[len(y_spans(zo)) // 2] < 60  # median file
    # identical answers for a rectangle query
    q = "x BETWEEN 10 AND 20 AND y BETWEEN 70 AND 80"
    a = {r["id"] for r in spark.read.parquet(lin).filter(q).collect()}
    b = {r["id"] for r in spark.read.parquet(zo).filter(q).collect()}
    assert a == b and len(a) > 0


def test_zorder_minmax_bounds_mode(spark, tmp_path):
    """bounds='minmax': no global window in the plan (the 100 TB
    mode), same pruning shape on uniform keys."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from v6spark.sources.layout import write_zordered

    rng = np.random.default_rng(6)
    n = 20_000
    df = spark.createDataFrame(
        list(zip(range(n), rng.uniform(0, 100, n).tolist(),
                 rng.uniform(0, 100, n).tolist())),
        "id long, x double, y double",
    )
    zo = str(tmp_path / "zo_mm")
    write_zordered(df, zo, ["x", "y"], n_files=8, bounds="minmax")
    spans = []
    for f in glob.glob(f"{zo}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = float("inf"), float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                if col.path_in_schema == "y" and col.statistics:
                    lo = min(lo, col.statistics.min)
                    hi = max(hi, col.statistics.max)
        spans.append(hi - lo)
    assert sorted(spans)[len(spans) // 2] < 60
    assert spark.read.parquet(zo).count() == n


def test_zorder_key_clamps_bits_to_long_budget(spark):
    # 6 columns x 16 bits would shift past bit 63 and wrap (JVM shift
    # is mod 64), colliding bit planes; the clamp keeps every shift
    # inside one signed long and the key strictly monotone per column
    from v6spark.sources.layout import zorder_key

    cols = [f"c{i}" for i in range(6)]
    df = spark.createDataFrame(
        [tuple(float(v) for _ in cols) for v in (0, 1, 2, 3)],
        ", ".join(f"{c} double" for c in cols),
    )
    bounds = {c: (0.0, 3.0) for c in cols}
    rows = (
        df.withColumn("z", zorder_key(cols, bits=16, bounds=bounds))
        .orderBy(*cols)
        .collect()
    )
    zs = [r["z"] for r in rows]
    assert all(z >= 0 for z in zs)
    assert zs == sorted(zs) and len(set(zs)) == len(zs)
