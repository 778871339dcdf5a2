"""HTML extraction (boilerplate removal, links) and crawl-graph
operators (degree census, PageRank vs a numpy reference)."""

from __future__ import annotations

import numpy as np
import pytest

from v6spark.operators import graph as G
from v6spark.operators import html as H

PAGE = """<!doctype html>
<html><head><title> The  Article Title </title>
<style>body { color: red }</style>
<script>var x = "script junk must not leak";</script>
</head><body>
<nav><a href="/home">Home</a> <a href="/about">About</a></nav>
<article>
<h1>Real Heading</h1>
<p>This is the first real paragraph with enough plain text to keep,
and an inline <a href="https://example.org/ref">reference link</a>
inside flowing prose.</p>
<p><a href="/t/1">tag1</a> <a href="/t/2">tag2</a> <a href="/t/3">tag3</a></p>
<p>Second real paragraph, also mostly text.</p>
</article>
<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a></footer>
</body></html>"""


def test_extract_text_boilerplate_removal(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    row = H.extract_text(df).collect()[0]
    assert row["title"] == "The Article Title"
    text = row["text"]
    assert "first real paragraph" in text
    assert "Second real paragraph" in text
    assert "reference link" in text  # inline link inside prose survives
    # nav / footer / tag-cloud blocks are link-dense -> dropped
    assert "Home" not in text and "Privacy" not in text
    assert "tag1" not in text
    # script/style subtrees never contribute
    assert "script junk" not in text and "color: red" not in text


def test_extract_links_and_url_host(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    links = H.extract_links(df).collect()
    hrefs = {r["href"] for r in links}
    assert "https://example.org/ref" in hrefs and "/home" in hrefs
    anchor = {r["href"]: r["anchor"] for r in links}["https://example.org/ref"]
    assert anchor == "reference link"
    hosts = spark.createDataFrame(
        [("https://WWW.Example.org/x?q=1",), ("http://sub.site.com/a/b",)],
        "u string",
    ).select(H.url_host(F.col("u")).alias("h")).collect()
    assert [r["h"] for r in hosts] == ["example.org", "sub.site.com"]


def test_degree_census(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (3, 1)], "src long, dst long"
    )
    rows = {r["vertex"]: r for r in G.degree_census(edges).collect()}
    assert (rows[1]["out_degree"], rows[1]["in_degree"]) == (2, 2)
    assert (rows[2]["out_degree"], rows[2]["in_degree"]) == (1, 1)
    assert (rows[3]["out_degree"], rows[3]["in_degree"]) == (2, 2)


def _numpy_pagerank(edges, n, damping=0.85, iters=60):
    out = np.zeros(n)
    for s, _d in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - damping) / n)
        dangling = r[out == 0].sum()
        nr += damping * dangling / n
        for s, d in edges:
            nr[d] += damping * r[s] / out[s]
        r = nr
    return r


@pytest.mark.parametrize(
    "edge_list",
    [
        [(0, 1), (0, 2), (1, 2), (2, 0)],          # classic 3-cycle-ish
        [(0, 1), (1, 2)],                          # chain with dangling tail
        [(0, 1), (0, 1), (1, 0), (2, 0)],          # weighted duplicate edge
    ],
)
def test_pagerank_matches_numpy_reference(spark, edge_list):
    n = max(max(s, d) for s, d in edge_list) + 1
    ref = _numpy_pagerank(edge_list, n)
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["vertex"]: r["rank"] for r in
           G.pagerank(edges, max_iters=60, tol=1e-12, check_every=10).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9  # dangling mass conserved
    for v in range(n):
        assert got[v] == pytest.approx(ref[v], abs=1e-6), (v, got, ref)


def test_pagerank_converges_early(spark):
    # a symmetric cycle converges immediately: uniform is the fixed point
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {r["vertex"]: r["rank"] for r in
           G.pagerank(edges, max_iters=50, tol=1e-9, check_every=2).collect()}
    assert all(v == pytest.approx(1 / 3, abs=1e-9) for v in got.values())
    assert G.pagerank.last_rounds <= 4  # stopped at the first check


def test_html_to_graph_to_rank_composition(spark):
    """Crawl composition: pages -> links -> id-joined edges -> rank.
    The hub page pointed to by everyone outranks the leaves."""
    from pyspark.sql import functions as F

    pages = [
        (i, f'<html><body><p>doc {i} text</p><a href="/page/0">hub</a>'
            + (f'<a href="/page/{i+1}">next</a>' if i < 4 else "")
            + "</body></html>")
        for i in range(5)
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    links = H.extract_links(df)
    # resolve hrefs to ids: /page/N -> N (toy resolver for the test)
    edges = links.select(
        F.col("src_id").alias("src"),
        F.regexp_extract("href", r"/page/(\d+)", 1).cast("long").alias("dst"),
    ).filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    ranks = {r["vertex"]: r["rank"] for r in G.pagerank(edges).collect()}
    assert ranks[0] == max(ranks.values())  # the hub wins
