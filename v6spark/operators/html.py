"""HTML -> training text: tag stripping, boilerplate removal, link
extraction — the front end of a web-crawl corpus pipeline.

A crawl corpus arrives as HTML; everything downstream (quality
gates, dedup, packing) wants clean text.  The extraction kernel is
stdlib ``html.parser`` inside an Arrow-batched ``mapInPandas`` —
HTML is not a regular language, so this is one of the places where
a Python kernel is the honest choice over a Catalyst regexp chain
(documents never shuffle; the pass is embarrassingly parallel).

Boilerplate removal is the classic link-density heuristic
(Arc90-readability / jusText family): text is accumulated per BLOCK
(paragraph-level elements), and a block whose characters are mostly
inside ``<a>`` tags (navigation, footers, tag clouds) is dropped;
``script``/``style``/``nav``/``header``/``footer``/``aside``
subtrees never contribute.  This is deliberately a transparent,
deterministic heuristic — the goal is the 95% cleanup that feeds
the statistical gates, not a DOM-rendering engine.

``extract_links`` emits the (src, dst, anchor) edge list — the
input to the crawl-graph operators (``operators/graph.py``).
"""

from __future__ import annotations

import html
import html.parser
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SKIP_SUBTREES = {"script", "style", "noscript", "svg", "template",
                  "nav", "header", "footer", "aside", "form"}
_NONCONTENT = {"script", "style", "noscript", "svg", "template"}
_BLOCK_TAGS = {"p", "div", "section", "article", "li", "td", "th",
               "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
               "pre", "br", "tr", "ul", "ol", "table", "main", "body"}


class _Extractor(html.parser.HTMLParser):
    """One pass: per-block text + link-character accounting + links."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
        self._buf: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._skip_depth = 0
        self._noncontent_depth = 0
        self._a_depth = 0
        self._a_buf: list[str] = []
        self._a_href: str | None = None
        self.title = ""
        self._in_title = False
        self.links: list[tuple[str, str]] = []  # (href, anchor)

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, self._chars, self._link_chars))
        self._buf, self._chars, self._link_chars = [], 0, 0

    def handle_starttag(self, tag, attrs):
        # anchors are recorded EVERYWHERE except non-content subtrees
        # (script/style/svg/template): a nav/footer link contributes
        # no text, but it is still a crawl-graph edge
        if tag == "a" and not self._in_noncontent:
            self._a_depth += 1
            if self._a_depth == 1:
                self._a_buf = []
                self._a_href = dict(attrs).get("href")
            return
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            if tag in _NONCONTENT:
                self._noncontent_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
        elif tag in _BLOCK_TAGS:
            self._flush()

    @property
    def _in_noncontent(self) -> bool:
        return self._noncontent_depth > 0

    def handle_endtag(self, tag):
        if tag == "a" and self._a_depth:
            self._a_depth -= 1
            if self._a_depth == 0 and self._a_href:
                self.links.append(
                    (self._a_href, " ".join("".join(self._a_buf).split()))
                )
            return
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            if tag in _NONCONTENT:
                self._noncontent_depth = max(0, self._noncontent_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._a_depth and not self._in_noncontent:
            self._a_buf.append(data)
        if self._skip_depth:
            return
        if self._in_title:
            self.title += data
            return
        self._buf.append(data)
        n = len(data.strip())
        self._chars += n
        if self._a_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def _extract(raw: str, max_link_density: float) -> tuple[str, str]:
    p = _Extractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        # html.parser is tolerant, but a pathological document should
        # yield what was parsed so far, not kill the batch
        p._flush()
    kept = [
        text for text, chars, link_chars in p.blocks
        if chars == 0 or link_chars / chars <= max_link_density
    ]
    return " ".join(p.title.split()), "\n".join(kept)


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
) -> DataFrame:
    """(id, title, text): block-level extraction with the
    link-density boilerplate gate.  Blocks whose stripped characters
    are more than ``max_link_density`` inside anchors (menus,
    footers, tag clouds) are dropped; script/style/nav/... subtrees
    never contribute."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            titles, texts = [], []
            for raw in pdf[html_col]:
                t, x = _extract(raw or "", max_link_density)
                titles.append(t)
                texts.append(x)
            yield pd.DataFrame({
                "doc_id": pdf[id_col], "title": titles, "text": texts,
            })

    return df.mapInPandas(
        batches, schema="doc_id long, title string, text string"
    )


def extract_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(src_id, href, anchor) edge list — one row per anchor with an
    href; feeds the crawl-graph operators."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"src_id": [], "href": [], "anchor": []}
            for sid, raw in zip(pdf[id_col], pdf[html_col]):
                p = _Extractor()
                try:
                    p.feed(raw or "")
                    p.close()
                except Exception:
                    pass
                for href, anchor in p.links:
                    out["src_id"].append(sid)
                    out["href"].append(href)
                    out["anchor"].append(anchor)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches, schema="src_id long, href string, anchor string"
    )


def url_host(col) -> Column:
    """Registrable host of a URL column, pure Catalyst
    (``parse_url``), lower-cased, leading www. stripped — the
    domain-mix key for `sampling.rebalance_mix`."""
    host = F.lower(F.parse_url(col, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")
