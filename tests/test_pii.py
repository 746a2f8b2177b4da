"""Unit tests for the PII scrub operator (operators/pii.py)."""

from __future__ import annotations

from ambient_sound_analysis_api_spark.operators.pii import pii_scrub


def _run(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_scrub(df).collect()[0].asDict()


def test_email_redaction_and_count(spark):
    r = _run(spark, "mail me at First.Last+tag@sub.example.org or not")
    assert r["n_emails"] == 1 and r["n_ips"] == 0
    assert r["scrubbed"] == "mail me at <EMAIL> or not"


def test_ipv4_and_long_number(spark):
    r = _run(spark, "host 192.168.100.1 acct 123456789012 port 80")
    assert r["n_ips"] == 1 and r["n_long_numbers"] == 1
    assert r["scrubbed"] == "host <IP> acct <NUM> port 80"
    # short digit runs survive
    assert "80" in r["scrubbed"]


def test_redaction_order_email_digits_not_double_counted(spark):
    """An email containing a long digit run is consumed by the email rule
    before the number rule sees it — fixed order, no <NUM> inside <EMAIL>."""
    r = _run(spark, "write 123456789x@example.com now")
    assert r["n_emails"] == 1
    assert r["scrubbed"] == "write <EMAIL> now"


def test_clean_text_untouched(spark):
    text = "just ordinary words and a 4.2 number"
    r = _run(spark, text)
    assert (r["n_emails"], r["n_ips"], r["n_long_numbers"]) == (0, 0, 0)
    assert r["scrubbed"] == text


def test_multiple_hits_counted(spark):
    r = _run(spark, "a@b.co c@d.io 1.2.3.4 5.6.7.8")
    assert r["n_emails"] == 2 and r["n_ips"] == 2
    assert r["scrubbed"] == "<EMAIL> <EMAIL> <IP> <IP>"
