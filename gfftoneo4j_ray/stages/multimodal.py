"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The image/audio codec libraries are NOT in
this container, so the decode kernels are STUBBED (clearly marked):
:func:`decode_image` raises ``NotImplementedError`` unless a decoder
is importable, and :class:`PayloadFeaturizer` uses a deterministic
content-hash fake feature so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested.

Scale notes: binary payloads dominate block size — use small
``batch_size`` (payload-count, not bytes) and let the pool autoscale;
drop the payload column as soon as features are extracted (the same
rule as dropping ``html`` after text extraction, SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8


def _try_import_decoder():
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401
        return PIL.Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """STUB: real decode requires an image library not present here."""
    dec = _try_import_decoder()
    if dec is None:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "use PayloadFeaturizer's deterministic fake features instead")
    return dec.open(payload)  # pragma: no cover


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: blake2b bytes → floats in
    [-1, 1). Stable across runs/platforms; replaces the model forward
    pass while keeping the data layout identical."""
    h = hashlib.blake2b(payload or b"", digest_size=dim).digest()
    return (np.frombuffer(h, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0


class PayloadFeaturizer:
    """Actor-pool worker: (key_col, payload_col) → metadata + features.

    The actor shape mirrors a GPU featurizer (weights loaded once in
    __init__, batched forward in __call__); here the "model" is the
    deterministic fake above."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.key_col = key_col
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        n_bytes = [len(p or b"") for p in payloads]
        sha = [hashlib.sha1(p or b"").hexdigest() for p in payloads]
        feats = [fake_features(p, self.dim).tolist() for p in payloads]
        return pa.table({
            self.key_col: t[self.key_col],
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "payload_sha1": pa.array(sha, pa.string()),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


def apply(ds, payload_col: str = "html", key_col: str = "url",
          batch_size: int = 256, concurrency=(1, 4)):
    """binary-payload Dataset → feature Dataset (payload dropped)."""
    return ds.map_batches(
        PayloadFeaturizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"payload_col": payload_col, "key_col": key_col})
