"""PII detection/redaction: Spark expressions vs an independent Python
``re`` twin (same pattern strings run under a third regex engine), the
redaction-order contract, and the zero-shuffle plan."""
from __future__ import annotations

import re

import pytest

from vrtility_spark import pii

DOCS = [
    (0, "plain text with no pii at all"),
    (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
    (2, "two mails a@b.io c.d@e-f.org and ip 10.0.0.1 here"),
    (3, "call (555) 123-4567 or (555) 000-1111 now"),
    (4, "server at 192.168.001.255 port"),
    (5, "mixed bob@x.yz then (123) 456-7890 then 1.2.3.4 end"),
    (6, ""),
    (7, "not-an-ip 1234.5.6.7 half (55) 123-4567 no@tld a@b"),
    (8, "dashed 555-123-4567 dotted 555.123.4567 end"),
    (9, "trunk +1 555-123-4567 or 1-555-123-4567 ok"),
    (10, "date 2026-08-19 zip 12345-6789 agent 41 555-123-4567"),
]


def _py_counts(text):
    out = {}
    for name, pat, _tok in pii.PII_PATTERNS:
        out[name] = len(re.findall(pat, text))
    return out


def _py_scrub(text):
    for _name, pat, tok in pii.PII_PATTERNS:
        text = re.sub(pat, tok, text)
    return text


def _py_strip(text):
    for _name, pat, _tok in pii.PII_PATTERNS:
        text = re.sub(pat, "", text)
    return text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_report_matches_python_re(spark, docs):
    got = {r.doc_id: r for r in pii.pii_report(docs).collect()}
    assert len(got) == len(DOCS)
    for doc_id, text in DOCS:
        r = got[doc_id]
        exp = _py_counts(text)
        assert (r.n_email, r.n_phone, r.n_ipv4) == (
            exp["email"], exp["phone"], exp["ipv4"]), (doc_id, text)
        assert r.n_pii == sum(exp.values())
        assert r.redacted == _py_scrub(text), (doc_id, text)
        assert r.pii_chars == len(text) - len(_py_strip(text))
        if len(text) == 0:
            assert r.pii_char_frac == 0.0
        else:
            assert r.pii_char_frac == pytest.approx(
                r.pii_chars / len(text))


def test_negative_cases_stay_clean():
    """The doc-7 traps: 4-octet-too-long IP, 2-digit area code,
    TLD-less mails — none may match under any of the three engines."""
    exp = _py_counts(DOCS[7][1])
    assert exp == {"email": 0, "phone": 0, "ipv4": 0}


def test_phone_forms_and_traps(spark, docs):
    """Fixed expectations (not just three-engine parity, which could
    share one wrong pattern): dashed/dotted/trunk-prefixed NANP forms
    all redact; dates, ZIP+4 and a digit-adjacent trunk digit do not."""
    got = {r.doc_id: r for r in pii.pii_report(docs).collect()}
    assert got[8].n_phone == 2
    assert got[8].redacted == "dashed <PHONE> dotted <PHONE> end"
    assert got[9].n_phone == 2
    assert got[9].redacted == "trunk <PHONE> or <PHONE> ok"
    assert got[10].n_phone == 1
    assert got[10].redacted == (
        "date 2026-08-19 zip 12345-6789 agent 41 <PHONE>")


def test_scrub_in_place_and_out_col(spark, docs):
    red = {r.doc_id: r.text for r in pii.scrub(docs).collect()}
    assert red[5] == "mixed <EMAIL> then <PHONE> then <IP> end"
    aside = pii.scrub(docs, out_col="clean").collect()[0]
    assert set(["text", "clean"]) <= set(aside.asDict())


def test_redaction_order_email_before_ip(spark):
    """A digit-heavy mail host must be consumed by the email pass so
    the IPv4 pass can't double-redact inside it."""
    df = spark.createDataFrame([(1, "x a@12.34.56.78.example.com y")],
                               "doc_id long, text string")
    r = pii.pii_report(df).collect()[0]
    assert r.redacted == "x <EMAIL> y"
    assert (r.n_email, r.n_ipv4) == (1, 1)  # counts scan the ORIGINAL


def test_zero_shuffle_plan(spark, docs):
    plan = pii.pii_report(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
