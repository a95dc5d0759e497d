"""Planted-frame semantics for the PII scrub (functions/pii.py) —
the synthetic documents fixture carries no digit shapes, so the
masking rules are pinned here on constructed rows instead of an
oracled query (see the module docstring)."""

from __future__ import annotations

from ai4orgwebscraper_spark.functions.pii import scrub_pii


def _rows(spark, texts):
    return spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )


def test_scrub_masks_each_class(spark):
    df = _rows(
        spark,
        [
            "contact alice.smith+spam@sub.example.co.uk today",
            "call +1 (415) 555-0123 or 415-555-0123",
            "server at 192.168.10.1 responded",
        ],
    )
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[0]["text"] == "contact <EMAIL> today"
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"]) == (1, 0, 0)
    assert got[1]["text"] == "call <PHONE> or <PHONE>"
    assert got[1]["n_phone"] == 2 and got[1]["n_email"] == 0
    assert got[2]["text"] == "server at <IP> responded"
    assert (got[2]["n_ipv4"], got[2]["n_phone"]) == (1, 0)


def test_scrub_precedence_email_over_phone_ip_over_phone(spark):
    # an email whose local part is a digit run must mask as ONE email,
    # and a dotted IP must never be half-eaten by the phone pattern
    df = _rows(spark, ["mail 4155550123@example.com or ping 10.20.30.40"])
    row = scrub_pii(df).collect()[0]
    assert row["text"] == "mail <EMAIL> or ping <IP>"
    assert row["n_email"] == 1 and row["n_ipv4"] == 1


def test_scrub_leaves_prose_alone(spark):
    texts = [
        "no pii here just words",
        "version 2.1 released in 2024",  # short digit runs: not phone/IP
        "",
    ]
    df = _rows(spark, texts)
    for r, t in zip(scrub_pii(df).orderBy("doc_id").collect(), texts):
        assert r["text"] == t
        assert r["n_email"] == r["n_phone"] == r["n_ipv4"] == 0


def test_scrub_keeps_other_columns_and_fixture_is_clean(spark):
    out = scrub_pii(_rows(spark, ["a b c"]))
    assert set(out.columns) == {"doc_id", "source", "text", "n_email", "n_phone", "n_ipv4"}
    # the real fixture is digit-free => scrub is an exact no-op on it
    from ai4orgwebscraper_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    agg = scrub_pii(docs).agg(
        F.sum("n_email").alias("e"), F.sum("n_phone").alias("p"), F.sum("n_ipv4").alias("i")
    ).collect()[0]
    assert (agg["e"], agg["p"], agg["i"]) == (0, 0, 0)


def test_scrub_spares_spaced_number_triples(spark):
    # precision-first: bare-space digit triples are prose (measurement
    # rows, ID lists), not phones — the pattern requires a structural
    # separator ((...), '-', '.'); all-space phone formats are
    # documented as out of scope
    texts = [
        "dimensions 120 450 330 mm",
        "pages 123 456 78",
        "+1 415 555 0123",  # all-space format: deliberately unmatched
    ]
    df = _rows(spark, texts)
    for r, t in zip(scrub_pii(df).orderBy("doc_id").collect(), texts):
        assert r["text"] == t, t
        assert r["n_phone"] == 0
