"""URL canonicalization and keying (SURVEY.md P1-P3, F5-F11).

Two implementations of the SAME semantics:

- Column expressions (``canonicalize_col`` etc.) — the engine path.
  Pure JVM-side built-ins (trim/regexp_replace/concat/parse_url/md5),
  whole-stage-codegen'd, no Python in the hot loop.
- Pure-Python twins (``canonicalize_py`` etc.) — used only by the
  normative oracle (tests/golden generation) so engine and oracle
  share one definition of "canonical URL".

Normalization semantics mirror the reference's normalize_url
(reference: app_wrapper.py:13-22): strip whitespace; rewrite
``http://`` to ``https://``; prefix ``https://`` when no scheme;
empty input -> null (dropped by caller). The URL key is md5 of the
canonical URL (the reference's own '.works' variant hashes URLs with
md5 — app_wrapper.py.works:29 — and md5 exists identically in Spark,
DuckDB and hashlib, which makes oracle parity trivial; xxhash64 is
used only engine-internally where cross-language parity is not
needed).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlparse

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Spark column expressions (engine path — JVM-side, codegen)
# ---------------------------------------------------------------------------


def canonicalize_col(url: Column) -> Column:
    """Canonical URL per reference normalize_url semantics; null if empty."""
    trimmed = F.trim(url)
    https = F.regexp_replace(trimmed, "^http://", "https://")
    with_scheme = F.when(https.rlike("^https://"), https).otherwise(
        F.concat(F.lit("https://"), https)
    )
    return F.when(trimmed == "", F.lit(None).cast("string")).otherwise(with_scheme)


def url_hash_col(canonical_url: Column) -> Column:
    """Stable URL key: md5 hex of the canonical URL."""
    return F.md5(canonical_url)


def host_col(canonical_url: Column) -> Column:
    """Registrable host, lower-cased (reference netloc extraction:
    app.py:200, app.py:503)."""
    return F.lower(F.parse_url(canonical_url, F.lit("HOST")))


def path_col(canonical_url: Column) -> Column:
    return F.parse_url(canonical_url, F.lit("PATH"))


def is_valid_url_col(canonical_url: Column) -> Column:
    """Scheme+netloc required (reference: web_scraper_js.py:107-110)."""
    return (
        canonical_url.isNotNull()
        & canonical_url.rlike("^https?://")
        & host_col(canonical_url).isNotNull()
        & (host_col(canonical_url) != "")
    )


def resolve_outlink_col(base_host: Column, href: Column) -> Column:
    """Resolve an href against the fetching page's host.

    Absolute http(s) hrefs pass through; host-relative ('/x') and
    bare-relative hrefs join onto the base host. (The reference's
    relative resolution is buggy string concat — app.py:347-352; we
    resolve correctly, as documented in SURVEY.md H13.)
    """
    absolute = href.rlike("^https?://")
    rooted = F.concat(F.lit("https://"), base_host, F.lit("/"), F.regexp_replace(href, "^/+", ""))
    return F.when(absolute, F.regexp_replace(href, "^http://", "https://")).otherwise(rooted)


# ---------------------------------------------------------------------------
# Pure-Python twins (oracle path only — NEVER inside Spark jobs)
# ---------------------------------------------------------------------------


def canonicalize_py(url: str | None) -> str | None:
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    if u.startswith("http://"):
        u = "https://" + u[len("http://") :]
    elif not u.startswith("https://"):
        u = "https://" + u
    return u


def url_hash_py(canonical_url: str) -> str:
    return hashlib.md5(canonical_url.encode("utf-8")).hexdigest()


def host_py(canonical_url: str) -> str:
    return (urlparse(canonical_url).netloc or "").lower()


def path_py(canonical_url: str) -> str:
    return urlparse(canonical_url).path or ""


def resolve_outlink_py(base_host: str, href: str) -> str:
    if href.startswith("http://"):
        return "https://" + href[len("http://") :]
    if href.startswith("https://"):
        return href
    return f"https://{base_host}/{href.lstrip('/')}"
