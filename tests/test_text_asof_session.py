"""Unit tests: text analysis, as-of join edge cases, sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from v6spark.operators import text
from v6spark.operators.asof import asof_join_latest
from v6spark.operators.sessionize import NS_PER_MIN, session_counts, sessionize


def test_lang_id_handmade(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house of the king"),
            (2, "el perro y la casa de los reyes que viven por una calle"),
            (3, "der hund und die katze ist nicht ein problem mit der zeit"),
            (4, "le chat et les chiens dans une maison est grande"),
            (5, "这是 一个 中文 文档 测试"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r["pred_lang"] for r in df.select("id", text.lang_id("text")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh"}


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox, and the dog. really!")], "id int, text string"
    )
    row = text.quality_features(df).collect()[0]
    assert row["n_tokens"] == 7
    assert row["punct_ratio"] == pytest.approx(3 / 35, abs=1e-6)
    # hits: "the" x2 + "and" ("fox," and "dog." carry punctuation)
    assert row["stopword_ratio"] == pytest.approx(3 / 7, abs=1e-6)
    assert 0.0 < row["quality_score"] <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, foo-bar 123")], "id int, text string")
    row = text.token_counts(df).collect()[0]
    assert row["ws_tokens"] == 4
    assert row["bpe_ish_tokens"] > 4  # subword proxy >= word count


def test_doc_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "id int, text string"
    )
    got = {r["id"]: r["fp"] for r in df.select("id", text.doc_fingerprint("text", "fp")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


@pytest.fixture(scope="module")
def quotes_and_probes(spark):
    quotes = spark.createDataFrame(
        [(101, 1, 100), (102, 1, 200), (103, 1, 200), (201, 2, 500)],
        "event_id long, user_id long, ts_ns long",
    )
    probes = spark.createDataFrame(
        [(1, 1, 150), (2, 1, 200), (3, 1, 50), (4, 2, 400), (5, 3, 999)],
        "p_id long, user_id long, ts_ns long",
    )
    return quotes, probes


def test_asof_join_semantics(quotes_and_probes):
    quotes, probes = quotes_and_probes
    out = asof_join_latest(
        probes.withColumnRenamed("p_id", "pid"),
        quotes.withColumnRenamed("event_id", "qid"),
        key="user_id",
        ts="ts_ns",
        payload="qid",
    )
    got = {r["pid"]: r["asof_qid"] for r in out.collect()}
    assert got[1] == 101  # latest quote at ts<=150
    assert got[2] == 103  # inclusive ts=200; tie on ts -> max qid
    assert got[3] is None  # no quote before ts=50
    assert got[4] is None  # user 2's quote is later (500 > 400)
    assert got[5] is None  # user with no quotes at all


def test_sessionize_gap_rule(spark):
    t0 = 1_700_000_000_000_000_000
    rows = [
        (1, 10, t0),
        (1, 11, t0 + 10 * NS_PER_MIN),   # 10 min gap -> same session
        (1, 12, t0 + 40 * NS_PER_MIN),   # exactly 30 min gap -> same (strict >)
        (1, 13, t0 + 71 * NS_PER_MIN),   # 31 min gap -> new session
        (2, 20, t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_ns long")
    counts = {r["user_id"]: r["n_sessions"] for r in session_counts(df).collect()}
    assert counts == {1: 2, 2: 1}
    sess = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert sess[10] == sess[11] == sess[12]
    assert sess[13] == sess[10] + 1


def test_lang_id_zero_signal_is_und(spark):
    df = spark.createDataFrame(
        [(1, "qwerty zxcvb asdfgh"), (2, "")], "id int, text string"
    )
    got = {r["id"]: r["pred_lang"] for r in df.select("id", text.lang_id("text")).collect()}
    assert got == {1: "und", 2: "und"}


def test_asof_latest_quote_with_null_payload_wins(spark):
    """The as-of contract returns the LATEST quote's payload even when
    that payload is NULL — it must not skip back to an older quote."""
    quotes = spark.createDataFrame(
        [(5, 1, 100), (None, 1, 200)], "qid long, user_id long, ts_ns long"
    )
    probes = spark.createDataFrame([(1, 1, 300)], "pid long, user_id long, ts_ns long")
    out = asof_join_latest(probes, quotes, key="user_id", ts="ts_ns", payload="qid")
    assert out.collect()[0]["asof_qid"] is None
