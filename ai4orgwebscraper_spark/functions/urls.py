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
from urllib.parse import quote, urlparse

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Spark column expressions (engine path — JVM-side, codegen)
# ---------------------------------------------------------------------------


def canonicalize_col(url: Column) -> Column:
    """Canonical URL per reference normalize_url semantics; null if empty.

    Steps (identical in canonicalize_py — parity-tested in test_urls):
    1. strip LEADING/TRAILING ASCII whitespace [ \\t\\n\\r\\f\\x0B] —
       btrim with the explicit set, not F.trim, which strips only ' '
       and would disagree with the Python twin on a '\\thttp://a.com'
       seed (ADVICE r01; btrim is a plain JVM char-set loop — the
       regexp_replace version costs ~4x on the 2M-row bench);
    2. http:// -> https://; prefix https:// when no scheme;
    3. percent-encode every char outside printable ASCII (plus the
       space) as UTF-8 %XX — the reference quote()s non-ASCII titles
       into URL paths (reference MakeURLs.py:19-21, urllib.parse.quote)
       and an unencoded unicode seed would break url_hash parity with
       any real fetcher. '%' stays safe, so already-encoded URLs are
       NOT double-encoded and the canonicalizer is idempotent
       (outlinks re-enter it every round).
    """
    trimmed = F.btrim(url, F.lit(" \t\n\r\f\x0b"))
    https = F.regexp_replace(trimmed, "^http://", "https://")
    with_scheme = F.when(https.rlike("^https://"), https).otherwise(
        F.concat(F.lit("https://"), https)
    )
    encoded = F.when(
        with_scheme.rlike("[^!-~]"),  # rare path: something to encode
        F.array_join(
            F.transform(
                # regexp (not split('', ...)): matches whole code points,
                # so astral-plane chars keep their surrogate pairs intact
                F.regexp_extract_all(with_scheme, F.lit(r"([\s\S])"), 1),
                lambda c: F.when(c.rlike("^[!-~]$"), c).otherwise(
                    # url_encode is form-encoding; space comes back '+',
                    # quote() wants %20 (a literal '+' encodes to %2B
                    # first, so this replace only ever hits spaces)
                    F.regexp_replace(F.url_encode(c), r"\+", "%20")
                ),
            ),
            "",
        ),
    ).otherwise(with_scheme)
    return F.when(trimmed == "", F.lit(None).cast("string")).otherwise(encoded)


def url_hash_col(canonical_url: Column) -> Column:
    """Stable URL key: md5 hex of the canonical URL."""
    return F.md5(canonical_url)


def host_col(canonical_url: Column) -> Column:
    """Registrable host, lower-cased, PORT DROPPED (parse_url HOST
    semantics; host_py mirrors via urlparse().hostname — ADVICE r01
    flagged the twin keeping the port, which made politeness/robots
    lookups diverge for ported URLs). Reference netloc extraction:
    app.py:200, app.py:503."""
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


# quote() treats alphanumerics + '_.-~' as always-safe; adding the
# rest of printable ASCII means ONLY the space, control chars and
# non-ASCII get %-encoded — the exact complement of the engine's
# [!-~] passthrough class, and idempotent ('%' is safe)
_QUOTE_SAFE = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
# ASCII whitespace only — str.strip() with no args also strips unicode
# whitespace, which the JVM regexp twin does not (ADVICE r01)
_ASCII_WS = " \t\n\r\f\x0b"


def canonicalize_py(url: str | None) -> str | None:
    if url is None:
        return None
    u = url.strip(_ASCII_WS)
    if not u:
        return None
    if u.startswith("http://"):
        u = "https://" + u[len("http://") :]
    elif not u.startswith("https://"):
        u = "https://" + u
    return quote(u, safe=_QUOTE_SAFE)


def url_hash_py(canonical_url: str) -> str:
    return hashlib.md5(canonical_url.encode("utf-8")).hexdigest()


def host_py(canonical_url: str) -> str:
    # hostname (not netloc): lower-cased, port dropped — matches
    # parse_url(..., 'HOST') in host_col (ADVICE r01). Canonical URLs
    # are pure ASCII (percent-encoded), so the one remaining divergence
    # is a '%' inside the authority: the JVM parser rejects it (null);
    # mirror that as "" (invalid — dropped by the validity predicate).
    host = urlparse(canonical_url).hostname or ""
    return "" if "%" in host else host


def path_py(canonical_url: str) -> str:
    return urlparse(canonical_url).path or ""


def resolve_outlink_py(base_host: str, href: str) -> str:
    if href.startswith("http://"):
        return "https://" + href[len("http://") :]
    if href.startswith("https://"):
        return href
    return f"https://{base_host}/{href.lstrip('/')}"
