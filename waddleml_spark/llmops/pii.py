"""PII detection / redaction operators (SURVEY.md §2.12 extension).

Every production training-data pipeline scrubs personally identifiable
information before a corpus ships; the reference has no analog (its text
columns are run names and notes, `/root/reference/waddle/_schema.py:30,35`),
so this is pure north-star surface (BASELINE.json: text analysis at 100 TB).

Design: pattern detection and redaction are chained JVM-side regexes
(`regexp_count` / `regexp_replace`) — whole-stage codegen, zero Python,
linear in bytes scanned, embarrassingly parallel.  At 100 TB this is a
map-only pass: no shuffle, no skew surface, and the scan prunes to the
`text` column only.

The regex dialect is the Java/RE2 COMMON SUBSET (no backreferences, no
lookaround) so the same pattern string runs identically in Spark (java.util
.regex) and the DuckDB oracle (RE2) — the cross-engine parity trick used
throughout textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Detection patterns — deliberately conservative (high precision) and
# dialect-portable.  \b word boundaries exist in both Java regex and RE2.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# NNN-NNN-NNNN / NNN.NNN.NNNN / (NNN) NNN-NNNN — North-American shape.
PHONE_RE = r"\(?\d{3}\)?[-. ]\d{3}[-.]\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Redaction replacement tokens (stable vocabulary the downstream tokenizer
# can learn; length differences are what pii_scrub_report accounts for).
REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>")]


def count_matches(text: Column, pattern: str) -> Column:
    """Occurrences of `pattern` in `text` (JVM regexp_count; DuckDB twin:
    len(regexp_extract_all(text, pattern)))."""
    return F.regexp_count(text, F.lit(pattern))


def redact(text: Column) -> Column:
    """Replace every email/phone/IPv4 with its redaction token.

    Order matters: emails first, so an IP-looking segment INSIDE an
    email's domain (`user@10.0.0.1.example.com` — EMAIL_RE matches it,
    digits/dots are legal domain chars) is consumed whole instead of
    being split around an `<IP>` token.  A true IP-literal domain
    (`user@10.0.0.1`, no alphabetic TLD) is NOT an EMAIL_RE match by
    design (conservative, high-precision patterns): its host becomes
    `<IP>` and the local part survives — callers needing that scrubbed
    too should add an explicit `local@<ip>` pattern rather than loosen
    the shared one.  Each regexp_replace is global (Spark default;
    DuckDB needs the 'g' flag — see catalog oracle).
    """
    out = text
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
