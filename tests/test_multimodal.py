"""Multimodal plumbing tests: decoder selection by availability, feature
extraction batch shape, and the import-guarded real decoder (conditionally
exercised when PIL is installed)."""

import numpy as np
import pytest

from fsst_spark.pipeline.multimodal import (
    FakeMediaDecoder,
    RealMediaDecoder,
    default_decoder,
    extract_features,
    pil_available,
)


def test_default_decoder_selected_by_availability():
    dec = default_decoder()
    if pil_available():
        assert isinstance(dec, RealMediaDecoder)
    else:
        assert isinstance(dec, FakeMediaDecoder)


@pytest.mark.skipif(pil_available(), reason="PIL installed: guard not reachable")
def test_real_decoder_raises_without_pil():
    with pytest.raises(NotImplementedError):
        RealMediaDecoder()


def test_real_decoder_roundtrip_with_pil():
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    img = Image.fromarray(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = RealMediaDecoder().decode(buf.getvalue())
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    assert (out == np.arange(48, dtype=np.uint8).reshape(4, 4, 3)).all()


def test_fake_decoder_deterministic():
    d = FakeMediaDecoder(h=8, w=8)
    a, b = d.decode(b"payload"), d.decode(b"payload")
    assert (a == b).all() and a.shape == (8, 8, 3)
    assert not (a == d.decode(b"other")).all()


def test_extract_features_shape(spark):
    df = spark.createDataFrame(
        [(i, f"payload {i}".encode()) for i in range(10)],
        "doc_id long, payload binary",
    )
    feats = extract_features(df, "payload", "doc_id", decoder=FakeMediaDecoder(),
                             feat_dim=8)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(len(r["feat"]) == 8 and r["feat_dim"] == 8 for r in rows)
    assert {r["payload_bytes"] for r in rows} == {len(f"payload {i}") for i in range(10)}
