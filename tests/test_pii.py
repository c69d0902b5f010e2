"""PII detection/redaction unit tests on realistic fixtures.

The registered query (``ns_pii_scrub``) proves cross-engine regex
parity on the synthetic corpus; these tests pin the semantics on
hand-written realistic strings — including the cases the corpus can't
exercise (multiple hits per row, no hits, pattern adjacency).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_app_etl_spark.functions import pii

ROWS = [
    # (text, n_emails, n_ips, n_phones)
    ("reach me at jane.doe+spam@sub.example.org today", 1, 0, 0),
    ("two mails a@b.io and c_d%x@y-z.co.uk in one line", 2, 0, 0),
    ("server at 192.168.0.1 and fallback 10.0.0.254", 0, 2, 0),
    ("call +1 555 12345678 or +358 040 9876", 0, 0, 2),
    ("mixed: bob@corp.example, 172.16.4.20, +44 207 94600", 1, 1, 1),
    ("nothing sensitive here, just version v1.2 of the doc", 0, 0, 0),
    ("", 0, 0, 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t, e, ip, p) for i, (t, e, ip, p) in enumerate(ROWS)],
        "id long, text string, want_emails long, want_ips long, want_phones long",
    )


def test_counts(spark):
    got = (
        _df(spark)
        .select(
            "id", "want_emails", "want_ips", "want_phones",
            pii.count_matches("text", pii.EMAIL).alias("n_emails"),
            pii.count_matches("text", pii.IPV4).alias("n_ips"),
            pii.count_matches("text", pii.PHONE).alias("n_phones"),
        )
        .collect()
    )
    for r in got:
        assert (r.n_emails, r.n_ips, r.n_phones) == (
            r.want_emails, r.want_ips, r.want_phones,
        ), f"row {r.id}"


def test_redact_removes_every_match(spark):
    red = _df(spark).select(
        "id", pii.redact("text").alias("redacted")
    ).collect()
    for r in red:
        for pat in (pii.EMAIL, pii.IPV4, pii.PHONE):
            import re

            assert not re.search(pat, r.redacted), f"row {r.id}: {r.redacted}"


def test_redact_preserves_clean_text(spark):
    out = (
        _df(spark)
        .filter(F.col("id") == 5)
        .select(pii.redact("text").alias("r"))
        .first()
        .r
    )
    assert out == ROWS[5][0]


def test_redaction_tokens_present(spark):
    out = (
        _df(spark)
        .filter(F.col("id") == 4)
        .select(pii.redact("text").alias("r"))
        .first()
        .r
    )
    assert pii.EMAIL_TOKEN in out and pii.IP_TOKEN in out and pii.PHONE_TOKEN in out
