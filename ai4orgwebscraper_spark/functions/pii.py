"""PII detection / redaction over text columns — the scrub pass a
crawled corpus goes through before training (emails, phone numbers,
IP addresses are the classes the public pipelines mask; e.g. the
BigScience ROOTS / Dolma preprocessing stages).

All JVM-side built-ins (`regexp_replace` / `regexp_count`) — no
Python in the hot path; one scan computes both the masked text and
the per-class counts. The patterns are deliberately conservative
(precision over recall): a training-data scrub that eats ordinary
prose does more harm than a missed rare pattern, and anything
higher-recall (NER-grade names/addresses) needs a model pass, which
plugs in as a pandas UDF downstream of this exact scrub.

The synthetic `documents` fixture contains no digit shapes at all, so
there is no oracled query over it (the result would pin twenty zero
rows — no evidence). The semantics are pinned on planted frames in
tests/test_pii.py instead, and `scrub_pii` composes into any text
pipeline (it is plain DataFrame → DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# precision-first patterns; each must be valid in BOTH Spark (Java
# regex) and RE2-ish engines: no backrefs, no lookbehind.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# phone: optional +CC, then an area code that is either parenthesized
# or followed by -/., then NNN[-.]NN..NNNN. Requiring at least one
# structural separator ((...), '-', '.') is the precision-first
# choice: a pattern that also accepted bare-space triples would mask
# measurement rows like "120 450 330 mm" — all-space formats such as
# "+1 415 555 0123" are deliberately NOT matched (word-boundary \b
# misbehaves around '+', so the digit groups themselves anchor).
PHONE_RE = r"(\+?\d{1,3}[-. ]{1,2})?(\(\d{3}\)[-. ]{0,2}|\d{3}[-.])\d{3}[-.]\d{2,4}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"

PII_CLASSES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + masked text + per-class counts, one scan.

    Returns all input columns, with `text_col` REPLACED by its masked
    form, plus `n_email` / `n_phone` / `n_ipv4` audit counts. Each
    class is counted on the text AFTER the higher-precedence classes
    are masked — the count is exactly the number of replacements that
    class performed (counting every class on the raw text would
    double-book: the phone pattern also matches inside a dotted IPv4).
    Scale: pure column exprs — whole-stage codegen, no shuffle; the
    audit rollup (sum counts per source) is the caller's one
    groupBy."""
    raw = F.col(text_col)
    after_email = F.regexp_replace(raw, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    masked = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    keep = [c for c in df.columns if c != text_col]
    return df.select(
        *keep,
        F.regexp_count(raw, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).alias("n_ipv4"),
        masked.alias(text_col),
    )
