#!/usr/bin/env python
"""Dump .explain("formatted") for the r6-optimization target queries
into plans/r06/<query>_<suffix>.txt (before/after evidence for
OPTIMIZATION_r06.md). Iterative operators (kmeans, pagerank, cc, BPE)
show the FINAL plan only — their per-iteration plans are driver-side
loops; the loop structure is described in the round doc.

Usage: python scripts/dump_r06_plans.py before|after [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q_top_customers",
    "q_supplier_part_join",
    "q_events_by_type",
    "q_events_sessionized",
    "q_word_topk",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_clusters",
    "q_knn_bruteforce",
    "q_knn_ivf",
    "q_knn_ivf_multiprobe",
    "q_knn_lsh",
    "q_knn_lsh_multiprobe",
    "q_embedding_neardup",
    "kmeans_embeddings",
    "q_pagerank",
    "q_bm25_search",
    "q_inverted_index",
    "q_tfidf_lang_terms",
    "q_dedup_segments",
    "q_bpe_merges",
    "q_bpe_encode",
    "q_user_retention",
    "q_semantic_dedup",
    "q_dedup_lsh_verified",
    "q_doc_contamination",
    "q_dedup_dupspans",
    "q_dedup_simhash",
    "q_dedup_exact",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ai4orgwebscraper_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name=f"dump_r06_plans_{suffix}")
    qs = entrymod.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in TARGETS:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(f"# {name} — explain('formatted') @ {sf_dir} [{suffix}]\n")
            f.write(buf.getvalue())
        print(f"wrote plans/r06/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
