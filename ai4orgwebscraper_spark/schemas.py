"""Fixed schemas — the engine's contract with tests and the oracle.

The reference infers schema from dict keys and appends mismatched row
shapes to one CSV (reference: web_scraper.py:57-62 — content rows
{URL,Title,FullContent} vs error rows {URL,Error} silently misalign).
We replace that with one declared StructType per table; errors are
nullable columns of the same row, never a different shape
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- interleaved span payload (BASELINE.json:input_hint) -------------------
# kind in {'text', 'media_ref'}; offset = document-order index. Per-row
# span-sequence equality (kind, text, media_ref, order) vs the normative
# oracle is THE correctness invariant.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)
SPANS = T.ArrayType(SPAN)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS, True),
    ]
)

# --- seeds (reference seed list: app_wrapper.py:118-148, MakeURLs.py:4-26) --
SEEDS = T.StructType(
    [
        T.StructField("seed_rank", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
    ]
)

# --- frontier: the distributed work queue (replaces the in-order Python
# list iterated at reference app_wrapper.py:165-168) ------------------------
FRONTIER = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("seed_rank", T.LongType(), False),
        T.StructField("state", T.StringType(), False),  # pending|done
        T.StructField("attempts", T.IntegerType(), False),
    ]
)

# --- per-host politeness state (replaces the process-global rate gate,
# reference web_scraper.py:14-20, and the per-minute window counter,
# reference linkedin_api.py:46-67) ------------------------------------------
HOSTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rate_limit_rps", T.DoubleType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), True),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("token_capacity", T.DoubleType(), False),
        # C7 session/auth state (reference web_scraper_js.py:26,155:
        # requests.Session cookie reuse; :319-393 basic/form auth).
        # Network auth itself is out of engine scope (SURVEY §7.4); the
        # STATE is modeled: a host may require a session and carries an
        # opaque token. Fetches of an auth-required host without a token
        # are 401 error rows — deterministically, on engine and oracle.
        T.StructField("auth_required", T.BooleanType(), True),
        T.StructField("session_token", T.StringType(), True),
    ]
)

# --- fetch log: crawl-order record; one schema for content AND error rows
# (unifies reference web_scraper.py:44 vs web_scraper.py:51,54) --------------
FETCH_LOG = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("fetched_at_ms", T.LongType(), False),
        # C6 retry/fallback (reference web_scraper.py:46-48 contract:
        # 403 -> retry with the JS fetcher): attempt number and which
        # fetcher served the row
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("fetcher", T.StringType(), False),  # plain|js
    ]
)

# --- URL-seen set (absent in the reference — duplicates fetched twice,
# app_wrapper.py:150-168 has no set membership; multiplicity column lets
# the duplicate-fetch behavior be replayed when required) --------------------
SEEN = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("first_seen_round", T.IntegerType(), False),
        T.StructField("multiplicity", T.LongType(), False),
    ]
)

# --- raw fetch+parse output of one round (pre-split into log/docs/links) ---
# seq/fetched_at_ms are assigned BEFORE the fetch on the slim frontier
# (order is a pure function of explicit keys — SURVEY.md §3.4) and pass
# through the UDF, so no global operation ever touches fat span rows.
FETCH_RESULT = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seed_rank", T.LongType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("latency_ms", T.IntegerType(), False),
        T.StructField("fetched_at_ms", T.LongType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("fetcher", T.StringType(), False),  # plain|js
        T.StructField("spans", SPANS, True),
        T.StructField("outlinks", T.ArrayType(T.StringType()), True),
    ]
)

# --- multimodal: opaque binary payload + typed metadata (decode stubbed;
# Spark-side plumbing real) ---------------------------------------------------
MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)
