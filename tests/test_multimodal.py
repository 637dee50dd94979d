"""Multimodal codec tests: the fake path is oracle-checked elsewhere
(test_oracle_parity); here we cover the dispatch contract and the real
Pillow branch (skipped where Pillow is absent, as in this container)."""

from __future__ import annotations

import pytest

from mapreduce_sm_spark.operators.multimodal import (
    decode_meta,
    have_pil,
    image_meta_over,
)


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_meta(b"x", codec="webp2000")


def test_auto_falls_back_to_fake_without_pil():
    if have_pil():
        pytest.skip("Pillow present — auto resolves to pil here")
    # auto must not crash without Pillow; equals the deterministic fake
    assert decode_meta(b"payload", "auto") == decode_meta(b"payload", "fake")


@pytest.mark.skipif(not have_pil(), reason="Pillow not installed")
def test_pil_branch_decodes_real_png(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (320, 200), (255, 0, 0)).save(buf, format="PNG")
    payload = buf.getvalue()

    w, h, c, phash = decode_meta(payload, "pil")
    assert (w, h, c) == (320, 200, 3)
    assert 0 <= phash < 1_000_000_007

    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    row = image_meta_over(df, codec="pil").collect()[0]
    assert (row.width, row.height, row.channels) == (320, 200, 3)
    assert row.n_bytes == len(payload)
