"""PII detection / redaction as JVM-side column expressions.

Reference parity: none — LLM-data-pipeline surface (training corpora
are scrubbed of emails/phones/IPs before use). The reference ETL
(/root/reference/spotify-etl.py) stores raw API payloads untouched.

Design: every detector is a single regex evaluated inside whole-stage
codegen (``regexp_extract_all`` / ``regexp_replace``), so scrubbing a
100 TB corpus is a map-only pass — no shuffle, no Python. Patterns are
deliberately conservative RE2-compatible subsets (no lookaround, no
backreferences) so the same literal runs on Spark (java.util.regex),
DuckDB (RE2), and most other engines — which is also what makes the
driver's oracle comparison possible.

False-positive/negative tradeoffs are the usual ones for regex PII
(e.g. version strings can look like IPs); a production pipeline would
layer allowlists on top. The *shape* — pure column expression, one
pass, counts + redacted text emitted together — is the part that must
hold at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: RE2-and-Java-compatible patterns (single-line, no lookaround).
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE = r"\+[0-9]{1,3} [0-9]{3} [0-9]{4,10}"

#: Redaction tokens (stable, greppable downstream).
EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def _col(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def count_matches(text: str | Column, pattern: str) -> Column:
    """Number of non-overlapping matches (BIGINT on both engines)."""
    # idx=0 = whole match (Spark defaults to capture group 1; these
    # patterns have no groups — DuckDB's default is already group 0).
    return F.size(F.regexp_extract_all(_col(text), F.lit(pattern), 0)).cast("bigint")


def redact(text: str | Column) -> Column:
    """Replace every email, then IP, then phone with its token.

    Order matters only in that emails are consumed before the broader
    numeric patterns get a chance to match inside them.
    """
    out = F.regexp_replace(_col(text), EMAIL, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4, IP_TOKEN)
    return F.regexp_replace(out, PHONE, PHONE_TOKEN)


# --- DuckDB mirrors (same pattern literals, 'g' = replace-all) --------------


def sql_count(text_sql: str, pattern: str) -> str:
    return f"CAST(len(regexp_extract_all({text_sql}, '{pattern}')) AS BIGINT)"


def sql_redact(text_sql: str) -> str:
    out = f"regexp_replace({text_sql}, '{EMAIL}', '{EMAIL_TOKEN}', 'g')"
    out = f"regexp_replace({out}, '{IPV4}', '{IP_TOKEN}', 'g')"
    return f"regexp_replace({out}, '{PHONE}', '{PHONE_TOKEN}', 'g')"
