"""Deterministic synthetic web — the network replaced by pure hash math.

Pattern from the reference's index-keyed mock generator (reference:
linkedin_api.py:69-115: ``mock-job-{i+1}``, ``company {i%5+1}``) with
its nondeterminism fixed: the reference keys off ``Date.now()``
(linkedin_api.py:71); here every byte of every page is a pure
function of md5(canonical_url), so any process — the pure-Python
oracle, a Spark executor, a different machine — regenerates the
identical web. No RNG, no wall clock (north-rule resumability
requires bit-identical replay).

``page_for(url)`` is THE shared definition: the oracle calls it
directly; the engine calls it inside the vectorized fetch UDF
(frontier/fetch.py). Interleaved text + media spans in document
order implement BASELINE.json:input_hint.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ai4orgwebscraper_spark.functions.urls import canonicalize_py, host_py, url_hash_py

_VOCAB = (
    "spark frontier crawl fetch parse span media queue host token bucket "
    "bloom filter shuffle partition skew salt broadcast join window "
    "iceberg snapshot resume lineage metric order seed depth priority"
).split()

N_HOSTS = 20
SKEW_HOST = "host0.example.com"


def _h64(s: str, salt: str = "") -> int:
    """Deterministic 64-bit hash of a string (md5-based, seed-free)."""
    return int.from_bytes(hashlib.md5(f"{salt}|{s}".encode()).digest()[:8], "big")


_M64 = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer: cheap deterministic 64-bit stream expander
    (public-domain constant set). Lets page_for derive a whole page
    from ONE md5 digest instead of one hash call per field — the fetch
    worker's per-URL cost budget matters at 10^10 scale."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


@dataclass
class SyntheticPage:
    url: str
    url_hash: str
    host: str
    status: int
    latency_ms: int
    title: str | None
    # document-order interleaved spans: (kind, text, media_ref, offset)
    spans: list[tuple[str, str | None, str | None, int]] = field(default_factory=list)
    outlinks: list[str] = field(default_factory=list)
    error: str | None = None


def host_for_index(i: int) -> str:
    """Skewed host assignment: ~40% of URLs land on one hot host
    (FIXTURES.md §1: exercises salting / AQE skew handling)."""
    h = _h64(str(i), "hostpick") % 100
    if h < 40:
        return SKEW_HOST
    return f"host{h % N_HOSTS}.example.com"


# unicode article titles (reference MakeURLs.py:4-26 builds Wikipedia
# URLs from titles and percent-encodes them, MakeURLs.py:19-21) —
# every canonicalizer must produce the same %XX bytes for these
_UNICODE_TITLES = [
    "Café", "München", "Les_Misérables", "中文条目", "Škoda",
    "Андрей", "🎓_emoji_title", "São_Paulo",
]


def seed_urls(n: int) -> list[str]:
    """Raw (pre-normalization) seed list: mixes http://, https://,
    schemeless and whitespace-padded forms plus periodic duplicates —
    the shapes normalize_url must handle (reference app_wrapper.py:13-22).
    Every 13th seed carries a unicode title slug (reference
    MakeURLs.py percent-encoding contract), so crawl goldens exercise
    the canonicalizer's %XX path end-to-end."""
    out: list[str] = []
    for i in range(n):
        host = host_for_index(i)
        if i % 13 == 5:
            slug = _UNICODE_TITLES[_h64(str(i), "uslug") % len(_UNICODE_TITLES)]
        else:
            slug = hashlib.md5(f"seed|{i}".encode()).hexdigest()[:10]
        url = f"{host}/p/{slug}"
        form = _h64(str(i), "form") % 4
        if form == 0:
            url = "http://" + url
        elif form == 1:
            url = "https://" + url
        elif form == 2:
            pass  # schemeless
        else:
            url = "  https://" + url + "  "  # whitespace-padded
        if i > 0 and i % 17 == 0:
            out.append(out[i - 1])  # duplicate (reference fetches dups twice)
        else:
            out.append(url)
    return out


def _build_phrases(n: int = 1024) -> list[str]:
    """Deterministic phrase pool built once at import: paragraph text
    is a pool lookup instead of per-word hashing (the fetch worker's
    per-URL budget matters at 10^10 scale; pool size keeps content
    varied enough for the dedup operators)."""
    out = []
    s = 0x5EEDF00D
    for _ in range(n):
        s = _mix(s)
        k = 5 + s % 12
        words = []
        for _ in range(k):
            s = _mix(s)
            words.append(_VOCAB[s % len(_VOCAB)])
        out.append(" ".join(words))
    return out


_PHRASES = _build_phrases()


def page_for(raw_url: str, js: bool = False) -> SyntheticPage:
    """Generate the page behind a URL. Pure; identical everywhere.

    One md5 of the canonical URL seeds a splitmix64 stream; every field
    (status, latency, paragraphs, interleaved media refs, outlinks)
    derives from that stream — the same mock-data idea as the
    reference's index-keyed generator (linkedin_api.py:69-115) with its
    Date.now() nondeterminism (linkedin_api.py:71) removed.
    """
    canon = canonicalize_py(raw_url)
    assert canon is not None
    return page_from_parts(canon, url_hash_py(canon), host_py(canon), js=js)


# JS-rendered fetch costs ~3x the plain fetch (headless browser vs
# socket read) — the modeled S5 latency envelope
JS_LATENCY_FACTOR = 3


def page_from_parts(canon: str, uh: str, host: str, js: bool = False) -> SyntheticPage:
    """Fast path when the caller already has the canonical URL, its
    md5 key and host (the frontier row carries all three — the fetch
    stage must not re-derive them per row).

    ``js=True`` models the reference's alternate Selenium fetcher
    (reference web_scraper.py:46-48: a 403 from the plain fetcher is
    retried through the JS fetcher): a bot-blocked 403 page renders as
    a full 200 (same deterministic content stream) at JS_LATENCY_FACTOR
    x the latency; 404/500 stay what they are — the origin is missing
    or broken regardless of fetcher."""
    h = int(uh[:16], 16)  # first 8 bytes of the md5 already computed

    status_roll = h % 100
    if status_roll < 80:
        status = 200
    elif status_roll < 88:
        status = 403
    elif status_roll < 94:
        status = 404
    else:
        status = 500
    latency_ms = 20 + (h >> 8) % 480
    if js:
        latency_ms *= JS_LATENCY_FACTOR
        if status == 403:
            status = 200  # bot-block bypassed; content identical

    page = SyntheticPage(
        url=canon, url_hash=uh, host=host, status=status, latency_ms=latency_ms, title=None
    )
    if status != 200:
        # error-as-row (reference web_scraper.py:51,54): no spans/outlinks
        page.error = f"HTTP {status}"
        return page

    page.title = f"Page {uh[:8]}"
    n_paras = 1 + (h >> 16) % 6
    offset = 0
    s = _mix(h)
    spans: list[tuple[str, str | None, str | None, int]] = []
    for _p in range(n_paras):
        s = _mix(s)
        ph = s
        text = _PHRASES[ph % len(_PHRASES)]
        spans.append(("text", text, None, offset))
        offset += 1
        if (ph >> 4) % 3 == 0:  # interleave a media_ref after ~1/3 of paras
            s = _mix(s)
            img = f"/img/{s:016x}"[:13] + ".png"
            alt = _VOCAB[(ph >> 8) % len(_VOCAB)]
            spans.append(("media_ref", alt, img, offset))
            offset += 1
    page.spans = spans

    n_links = (h >> 24) % 5
    links: list[str] = []
    for _k in range(n_links):
        s = _mix(s)
        lh = s
        target_host = SKEW_HOST if lh % 100 < 40 else f"host{lh % N_HOSTS}.example.com"
        s = _mix(s)
        slug = f"{s:016x}"[:10]
        if lh % 3 == 0:
            links.append(f"/p/{slug}")  # relative — resolved against page host
        else:
            links.append(f"https://{target_host}/p/{slug}")
    page.outlinks = links
    return page


def distributed_seed_urls(spark, n: int):
    """Bench-scale seed generation as pure column expressions —
    spark.range + hash math, no driver-side list (the Spark analog of
    the reference's index-keyed generator, linkedin_api.py:69-115).
    Same skew profile as seed_urls (~40% on the hot host)."""
    from pyspark.sql import functions as F

    pick = F.pmod(F.xxhash64(F.concat(F.lit("hostpick|"), F.col("id"))), F.lit(100))
    host = F.when(pick < 40, F.lit(SKEW_HOST)).otherwise(
        F.concat(F.lit("host"), F.pmod(pick, F.lit(N_HOSTS)), F.lit(".example.com"))
    )
    return spark.range(n).select(
        F.col("id").alias("seed_rank"),
        F.concat(
            F.lit("https://"), host, F.lit("/p/"),
            F.substring(F.md5(F.concat(F.lit("dseed|"), F.col("id"))), 1, 12),
        ).alias("url"),
    )


def default_hosts() -> list[dict]:
    """Per-host politeness state (FIXTURES.md §1 `hosts`): 3.0 rps
    default — the reference's global rate (web_scraper.py:18-19)
    applied per host; the hot host gets a synthetic robots entry.

    C7 session/auth fixtures: host7 requires a session AND holds a
    valid token (fetches behave normally — the session is "logged
    in"); host13 requires a session but has NO token, so every fetch
    of it is a 401 error row (engine and oracle in lockstep)."""
    rows = []
    for i in range(N_HOSTS):
        host = f"host{i}.example.com"
        rows.append(
            {
                "host": host,
                "rate_limit_rps": 3.0,
                "crawl_delay_s": 1.0 if host == SKEW_HOST else None,
                "robots_disallow": ["/private/"] if host == SKEW_HOST else [],
                "token_capacity": 30.0,
                "auth_required": i in (7, 13),
                "session_token": "sess-host7" if i == 7 else None,
            }
        )
    return rows
