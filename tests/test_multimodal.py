"""Multimodal payload plumbing: schema, actor signature, stubbed decode."""

from __future__ import annotations

import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages import multimodal


def test_featurizer_deterministic_and_schema():
    f = multimodal.PayloadFeaturizer()
    t = pa.table({"url": ["a", "b", "c"],
                  "html": pa.array([b"\x00\x01", b"", None], pa.binary())})
    out1, out2 = f(t), f(t)
    assert out1.equals(out2)
    assert out1.column_names == ["url", "n_bytes", "payload_sha1", "features"]
    assert out1["n_bytes"].to_pylist() == [2, 0, 0]
    feats = out1["features"].to_pylist()
    assert all(len(v) == multimodal.FEATURE_DIM for v in feats)
    assert all(-1.0 <= x < 1.0 for v in feats for x in v)
    # empty and null payloads share the empty-content feature
    assert feats[1] == feats[2]


def test_decode_stub_raises_without_decoder():
    if multimodal._try_import_decoder() is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")


def test_distributed_featurize(ray_session, tiny_corpus):
    import ray

    pages = ray.data.read_parquet(f"{tiny_corpus}/pages",
                                  columns=["url", "html"])
    out = multimodal.apply(pages, batch_size=32, concurrency=(1, 2)).to_pandas()
    assert len(out) == 240
    assert out["payload_sha1"].str.len().eq(40).all()
    # payload column dropped from the output
    assert "html" not in out.columns
