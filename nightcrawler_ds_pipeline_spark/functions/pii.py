"""PII scrubbing for training-data text: emails, IPv4 addresses and
phone-number-shaped digit runs are replaced with typed placeholder tokens
(<EMAIL>/<IP>/<PHONE>) — the standard pre-training redaction pass (e.g.
the BigScience ROOTS / StarCoder pipelines publish exactly this
email/IP/phone regex family).

Everything is JVM-side ``regexp_replace`` (whole-stage codegen, zero UDF,
zero shuffle), with a DuckDB twin built from the SAME pattern constants so
the oracle can't drift. Patterns are restricted to syntax with identical
semantics in Java regex and RE2 (no backrefs, no lookaround): character
classes, bounded repeats, \\b anchors, leftmost-first greedy matching.

Masking order matters and is fixed: email → IPv4 → phone (an IPv4 inside
an email-like token must not be half-eaten by the phone rule; after the
first two passes the placeholders contain no digits, so the phone rule
cannot touch them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# user@<raw IPv4> has no alphabetic TLD, so the generic rule misses it —
# and the local-part alone still identifies a person; mask the whole token
PII_EMAIL_IP = r"[A-Za-z0-9._%+-]+@\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-ish digit run: 9+ chars of digits/separators between the
# first and last digit (too short to catch years/prices, long enough for
# any real subscriber number)
PII_PHONE = r"\+?\d[\d\s().-]{7,}\d"

_MASKS = [
    (PII_EMAIL, "<EMAIL>"),
    (PII_EMAIL_IP, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
]


def mask_pii_col(col: Column | str) -> Column:
    """Masked copy of a text column; order email → IP → phone."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in _MASKS:
        c = F.regexp_replace(c, pat, token)
    return c


def mask_pii_sql(expr: str) -> str:
    """DuckDB twin of ``mask_pii_col`` over the SQL expression ``expr`` —
    built from the same pattern constants (RE2 needs the 'g' flag for
    replace-all; Java's regexp_replace is replace-all by default)."""
    out = expr
    for pat, token in _MASKS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
