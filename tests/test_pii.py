"""PII detection/redaction operator (operators/pii.py) — a designed
LLM-pipeline extension (the reference validates schemas, not content)."""

from pyspark.sql import functions as F

from dataprofiler_spark.operators.pii import (
    PII_PATTERNS,
    pii_scan,
    pii_summary,
    redact,
)

ROWS = [
    (1, "contact me at bob.smith+x@example.co.uk or 192.168.1.1", "a"),
    (2, "ssn 123-45-6789 phone 555-123-4567 card 4111-1111-1111-1111", "a"),
    (3, "clean text nothing here 1.2 about 3.4.5 and v10.2", "b"),
    (4, None, "b"),
]
SCHEMA = "doc_id long, text string, source string"


def test_pii_scan_counts(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r.doc_id: r for r in pii_scan(df).collect()}
    assert out[1].email_count == 1 and out[1].ipv4_count == 1
    assert out[2].ssn_count == out[2].phone_count == out[2].credit_card_count == 1
    assert out[3].has_pii is False  # decimals/versions are not IPs
    # NULL text: zero counts and has_pii False, never NULL
    assert out[4].email_count == 0 and out[4].has_pii is False


def test_redact_replaces_every_category(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r.doc_id: r.text_redacted for r in redact(df).collect()}
    assert out[1] == "contact me at [EMAIL] or [IP]"
    # card redacted as ONE [CARD], not chewed into phone fragments
    assert out[2] == "ssn [SSN] phone [PHONE] card [CARD]"
    assert out[3] == ROWS[2][1]  # clean text untouched
    assert out[4] is None


def test_pii_summary_by_source(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r.source: r for r in pii_summary(df).collect()}
    assert out["a"].n_docs == 2 and out["a"].docs_with_pii == 2
    assert out["a"].total_email == out["a"].total_ssn == 1
    assert out["b"].docs_with_pii == 0 and out["b"].n_docs == 2


def test_pii_expression_only_plan(spark):
    """The scan is map-side regex expressions: no shuffle, no Python UDF —
    at corpus scale the table scan is the entire cost."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = pii_scan(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert set(c for c in pii_scan(df).columns if c.endswith("_count")) == {
        f"{n}_count" for n in PII_PATTERNS
    }
