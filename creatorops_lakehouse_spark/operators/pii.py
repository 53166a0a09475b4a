"""PII detection and redaction for training-data curation.

Reference scope: extends the lakehouse's silver-tier quality/quarantine
gates (/root/reference/pipelines/silver/transform_local.py) with the
privacy scrub every LLM corpus pipeline runs before training.

Pure regexp expressions (JVM-side, whole-stage codegen — no UDFs): the
pattern set is deliberately engine-portable (works identically under
Java's regex and RE2/DuckDB) so detection counts are oracle-checkable.
Semantics are detection-grade, not validation-grade: an over-match on a
weird string costs a spurious redaction token; an under-match leaks PII —
patterns therefore lean permissive.

Scale: one projection per document, no shuffle; counts aggregate with
map-side partials. Redaction is a chained regexp_replace — same cost
class as the reference's normalization expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: pattern → replacement token. Order matters for redact() ONLY: emails
#: are replaced before id-number so digits inside an already-redacted
#: email can't then match as an id. pii_counts() evaluates every pattern
#: independently on the RAW text, so there a 9-16-digit email local part
#: counts as both email and id_number — overlapping counts by design
#: (both engines compute the same, so oracle parity holds).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,14}\d", "<PHONE>"),
    ("id_number", r"\b\d{9,16}\b", "<ID>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (column map, integers)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def redact(text: Column) -> Column:
    """Replace every PII match with its placeholder token, in the fixed
    PII_PATTERNS order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_sql_exprs(text_sql: str) -> dict[str, str]:
    """DuckDB SQL for the same counts (len(regexp_extract_all(...)))."""
    return {
        kind: f"len(regexp_extract_all({text_sql}, '{pat}'))"
        for kind, pat, _ in PII_PATTERNS
    }


def redact_sql(text_sql: str) -> str:
    """DuckDB SQL for the same chained global redaction."""
    out = text_sql
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
