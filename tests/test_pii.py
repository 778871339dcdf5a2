"""PII redaction (operators/text.py::redact_pii)."""

from __future__ import annotations

from v6spark.operators import text
from v6spark.sources.tables import load_table


def _run(spark, rows, **kwargs):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in text.redact_pii(df, **kwargs).collect()}


def test_each_kind_redacts_and_counts(spark):
    got = _run(
        spark,
        [
            (1, "contact me at jane.doe+spam@example.co.uk or 555-867-5309"),
            (2, "server at 192.168.1.254 responded"),
            (3, "ssn 123-45-6789 on file"),
            (4, "call +1 (415) 555-0132 today"),
        ],
    )
    assert got[1]["text"] == "contact me at <EMAIL> or <PHONE>"
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[2]["text"] == "server at <IPV4> responded"
    assert got[3]["text"] == "ssn <SSN> on file"
    assert got[4]["text"] == "call <PHONE> today"


def test_precision_non_pii_survives(spark):
    got = _run(
        spark,
        [
            (1, "999.999.999.999 is not an ip nor a phone"),
            (2, "version 1.2.3-45 stays as is"),
            (3, "clean text with no pii at all"),
        ],
    )
    assert got[1]["text"] == "999.999.999.999 is not an ip nor a phone"
    assert got[2]["text"] == "version 1.2.3-45 stays as is"
    assert got[3]["text"] == "clean text with no pii at all"
    assert all(
        got[i][c] == 0
        for i in (1, 2, 3)
        for c in ("n_email", "n_phone", "n_ipv4", "n_ssn")
    )


def test_out_col_and_no_counts(spark):
    got = _run(
        spark,
        [(1, "mail me at a@b.io")],
        count_redactions=False,
        out_col="clean",
    )
    assert got[1]["text"] == "mail me at a@b.io"
    assert got[1]["clean"] == "mail me at <EMAIL>"
    assert "n_email" not in got[1].asDict()


def test_redaction_is_narrow_and_python_free(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = text.redact_pii(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert out.count() == docs.count()
