"""Multimodal plumbing: real Spark path, stubbed codecs."""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.operators import multimodal as mm


def test_fake_decode_schema_and_determinism(spark):
    media = mm.synthetic_media(spark, n=48)
    out = mm.decode_media(media, fake=True)
    rows = {r["media_ref"]: r for r in out.collect()}
    assert len(rows) == 48
    assert set(out.columns) == {
        "media_ref", "media_type", "n_bytes", "feat_mean", "feat_std", "width", "height",
    }
    # deterministic: second run identical
    rows2 = {r["media_ref"]: r for r in mm.decode_media(media, fake=True).collect()}
    assert rows == rows2
    # images carry dimensions; audio/video don't
    for r in rows.values():
        if r["media_type"] == "image":
            assert r["width"] is not None and r["height"] is not None
        else:
            assert r["width"] is None


def test_real_decode_is_stubbed(spark):
    media = mm.synthetic_media(spark, n=4)
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_counts(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.frame_sample(media, every_ms=5000, fake=True).collect()
    # only video rows produce frames; counts follow duration
    vids = {r["media_ref"]: r for r in media.filter("media_type = 'video'").collect()}
    from collections import Counter

    per_ref = Counter(r["media_ref"] for r in frames)
    assert set(per_ref) <= set(vids)
    for ref, n in per_ref.items():
        dur = vids[ref]["meta_duration_ms"]
        expected = max(dur - 1, 0) // 5000 + 1
        assert n == expected
    # frame ids deterministic
    ids = sorted(r["frame_id"] for r in frames)
    ids2 = sorted(r["frame_id"] for r in mm.frame_sample(media, every_ms=5000, fake=True).collect())
    assert ids == ids2
