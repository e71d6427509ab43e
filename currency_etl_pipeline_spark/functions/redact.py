"""PII redaction: email / phone / numeric-ID masking, fully codegen.

A standard LLM-training-data hygiene step alongside the quality gate
(queries/text.quality_filter) and the contamination scan
(queries/llm_prep.ngram_contamination): personally identifying strings
must not reach a training shard. The reference has no analog (its
currency payloads carry no PII); this is part of the
training-data-pipeline extension surface (SURVEY.md §7 Phase 6).

Everything here is `regexp_replace` / `regexp_extract_all` chains —
JVM-side whole-stage codegen, no UDFs — and every pattern is written
in the regex subset Java (Spark) and RE2 (DuckDB) interpret
identically (character classes + bounded quantifiers; no backrefs, no
lookaround), so the oracle twins replay the exact transformation.

Redaction order is load-bearing: emails first (their local parts can
contain digit runs), then phones (their digit runs would otherwise be
eaten by the ID pattern), then bare numeric IDs. Counts are computed
on the PROGRESSIVELY redacted text (emails on raw, phones on
email-redacted, ids on phone-redacted) so the three counts are
disjoint — a phone number is never double-counted as an ID.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9][0-9 -]{6,}[0-9]"
ID_RE = "[0-9]{6,}"

EMAIL_TOKEN, PHONE_TOKEN, ID_TOKEN = "[EMAIL]", "[PHONE]", "[ID]"


def redact_pii(col: Column) -> Column:
    """Text with emails, then phones, then >=6-digit runs masked."""
    no_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    no_phone = F.regexp_replace(no_email, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(no_phone, ID_RE, ID_TOKEN)


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ids) — disjoint by the staged-count rule."""
    no_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    no_phone = F.regexp_replace(no_email, PHONE_RE, PHONE_TOKEN)
    return (
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0))),
        F.size(F.regexp_extract_all(no_phone, F.lit(ID_RE), F.lit(0))),
    )


def redact_pii_duck(expr: str) -> str:
    """DuckDB SQL twin of ``redact_pii`` over the text expression."""
    no_email = f"regexp_replace({expr}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g')"
    no_phone = f"regexp_replace({no_email}, '{PHONE_RE}', '{PHONE_TOKEN}', 'g')"
    return f"regexp_replace({no_phone}, '{ID_RE}', '{ID_TOKEN}', 'g')"


def pii_counts_duck(expr: str) -> tuple[str, str, str]:
    """DuckDB SQL twins of ``pii_counts``."""
    no_email = f"regexp_replace({expr}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g')"
    no_phone = f"regexp_replace({no_email}, '{PHONE_RE}', '{PHONE_TOKEN}', 'g')"
    return (
        f"len(regexp_extract_all({expr}, '{EMAIL_RE}'))",
        f"len(regexp_extract_all({no_email}, '{PHONE_RE}'))",
        f"len(regexp_extract_all({no_phone}, '{ID_RE}'))",
    )
