"""Cross-process determinism guards (north rule: bit-identical replay).

The synthetic corpus and URL keying must be pure functions — no RNG,
no wall clock, no process state. A hash of generated artifacts is
compared against a fresh subprocess."""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys

SNIPPET = """
import hashlib, json
from ai4orgwebscraper_spark.sources.corpus import page_for, seed_urls
from ai4orgwebscraper_spark.functions.urls import canonicalize_py, url_hash_py

h = hashlib.md5()
for u in seed_urls(50):
    p = page_for(u)
    h.update(json.dumps([p.url, p.url_hash, p.status, p.title, p.spans, p.outlinks],
                        sort_keys=True).encode())
print(h.hexdigest())
"""


def _digest_inproc() -> str:
    from ai4orgwebscraper_spark.sources.corpus import page_for, seed_urls

    h = hashlib.md5()
    for u in seed_urls(50):
        p = page_for(u)
        h.update(
            json.dumps(
                [p.url, p.url_hash, p.status, p.title, p.spans, p.outlinks], sort_keys=True
            ).encode()
        )
    return h.hexdigest()


def test_corpus_identical_across_processes():
    sub = subprocess.run(
        [sys.executable, "-c", SNIPPET], capture_output=True, text=True, check=True,
        cwd="/root/repo",
    )
    assert sub.stdout.strip() == _digest_inproc()


def test_no_wallclock_or_rng_in_engine_paths():
    """Static guard: engine modules must not import random or call
    time.time()/now() outside the explicitly-allowed spots."""
    import pathlib

    allowed_time = {"engine.py"}  # debug-timing prints only, gated by env
    root = pathlib.Path("/root/repo/ai4orgwebscraper_spark")
    for py in root.rglob("*.py"):
        text = py.read_text()
        assert "import random" not in text, py
        assert "np.random" not in text, py
        if py.name not in allowed_time and "frontier" in str(py) or py.name in (
            "corpus.py", "urls.py",
        ):
            if py.name not in allowed_time:
                assert "time.time()" not in text, py
                assert "datetime.now" not in text, py
