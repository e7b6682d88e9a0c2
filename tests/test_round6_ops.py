"""Round-6 operator semantics: the PII redaction audit and the
quality x duplication correlation."""

from __future__ import annotations

import pytest

from xboard_spark.operators.curation import quality_dup_correlation
from xboard_spark.operators.text import pii_redact_stats, redact_pii

DOC_SCHEMA = "doc_id long, lang string, source string, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_pii_redact_stats_counts_and_char_accounting(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "web", "contact bob@example.com or 415-555-1234 today"),
            (2, "en", "web", "totally clean text"),
            (3, "en", "mail", "a@b.io c@d.io"),
        ],
    )
    out = {r.source: r for r in pii_redact_stats(docs).collect()}
    web, mail = out["web"], out["mail"]
    assert web.n_docs == 2 and web.docs_redacted == 1
    assert web.emails_redacted == 1 and web.phones_redacted == 1
    assert mail.emails_redacted == 2 and mail.phones_redacted == 0
    # char accounting must equal what the actual transform produces
    redacted = {r.doc_id: r.text for r in redact_pii(docs).collect()}
    assert redacted[1] == "contact [EMAIL] or [PHONE] today"
    expected_after = sum(len(redacted[i]) for i in (1, 2))
    assert web.chars_after == expected_after
    assert web.chars_before == sum(
        len(t)
        for t in (
            "contact bob@example.com or 415-555-1234 today",
            "totally clean text",
        )
    )


def test_pii_redact_stats_phone_counted_after_email_redaction(spark):
    # a phone-shaped digit run INSIDE an email must not double-count:
    # the email is replaced first, so the phone matcher never sees it
    docs = _docs(spark, [(1, "en", "web", "mail 415-555-1234@example.com")])
    r = pii_redact_stats(docs).collect()[0]
    assert r.emails_redacted == 1
    assert r.phones_redacted == 0


def test_quality_dup_correlation_planted_bands(spark):
    # low-alpha docs duplicated, high-alpha docs unique
    junk = "!!! 1234 ??? 5678 ###"  # alpha_ratio = 0 -> band 0
    prose = "entirely alphabetic words here"  # high alpha -> band 8/9
    rows = (
        [(i, "en", "web", junk) for i in range(4)]
        + [(10 + i, "en", "web", f"{prose} variant {i}") for i in range(4)]
    )
    out = {r.alpha_band: r for r in quality_dup_correlation(_docs(spark, rows)).collect()}
    low = out[0]
    assert low.n_docs == 4 and low.n_dup_docs == 4 and low.dup_rate == 1.0
    high_bands = [b for b in out if b != 0]
    assert sum(out[b].n_docs for b in high_bands) == 4
    assert all(out[b].n_dup_docs == 0 for b in high_bands)


def test_quality_dup_correlation_band_is_capped_at_9(spark):
    # alpha_ratio exactly 1.0 would floor to band 10 without the cap
    docs = _docs(spark, [(1, "en", "web", "onlyletters")])
    r = quality_dup_correlation(docs).collect()
    assert [x.alpha_band for x in r] == [9]
