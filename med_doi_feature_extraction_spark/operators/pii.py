"""PII detection and redaction for training-corpus curation.

Pattern-based detection of the three high-volume PII classes in web
text — email addresses, phone numbers, IPv4 addresses — as pure
Column regexp algebra: counts for filtering/reporting, and a
redacted text column with typed placeholders for the keep-but-clean
path. No UDF, rides the scan stage, whole-stage codegen.

The regexes are deliberately written in the Java∩RE2 common subset
(no backrefs, no lookaround) so the DuckDB oracle runs the identical
patterns — detection is engine-portable, like the sampling hash.
Pattern-based PII detection is a recall floor, not a guarantee;
anything beyond (names, addresses, NER) needs a model pass and slots
in as another mapInPandas kernel.

Precision tradeoff (ADVICE r3): IPV4_RE accepts only in-range octets
(0-255), and PHONE_RE requires phone-shaped separator structure —
either an international ``+CC`` prefix, or ≥3 dash/space-separated
groups of 3-4 digits — so plain digit runs ("123456789"), ID lists
and out-of-range dotted quads ("999.999.999.999") are NOT matched.
What still false-positives: sequences of 4-digit numbers separated
by single spaces ("1999 2000 2001") look exactly like European
phone grouping and WILL be redacted — callers of ``--redact`` on
numeric-table-heavy corpora should count first (``pii_count``) and
inspect before rewriting. Without lookaround there is no regex-only
fix for that class; disambiguating it needs context (a model pass).

Redaction order is fixed (email → ip → phone): emails can contain
digit runs and IPv4s are digit-dot sequences, so the more specific
patterns must consume their text before the phone pattern scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"
PHONE_RE = r"\+\d{1,3}(?:[ -]\d{2,4}){1,4}|\(?\d{2,4}\)?(?:[ -]\d{3,4}){2,3}"

_REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def pii_counts(text: F.Column) -> dict[str, F.Column]:
    """Counts follow the SAME sequential-consumption order as
    ``redact``: emails are counted on the raw text, IPs on the
    email-redacted text, phones on the email+IP-redacted text. A span
    inside an already-matched class (the digit run of an email local
    part, say) therefore counts ONCE — counts always agree with the
    number of placeholders redaction emits."""
    t1 = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    return {
        "email_count": F.regexp_count(text, F.lit(EMAIL_RE)),
        "ip_count": F.regexp_count(t1, F.lit(IPV4_RE)),
        "phone_count": F.regexp_count(t2, F.lit(PHONE_RE)),
    }


def redact(text: F.Column) -> F.Column:
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_features(
    df: DataFrame, text_col: str, redacted_col: str | None = "text_redacted"
) -> DataFrame:
    """Add email/ip/phone counts, a total, and (unless
    ``redacted_col=None``) the redacted text."""
    text = F.col(text_col)
    counts = pii_counts(text)
    out = df.withColumns(counts)
    out = out.withColumn(
        "pii_count",
        sum(F.col(c) for c in counts).cast("int"),
    )
    if redacted_col:
        out = out.withColumn(redacted_col, redact(text))
    return out
