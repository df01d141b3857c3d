"""Stable content-derived identifiers.

Design rule carried from the reference (SURVEY.md §1.3): IDs are
semantic, never positional. The reference keys groups on
attribute-derived IDs with equality overridden to the ID alone
(reference: src/main/scala/corwur/genereader/GeneReader.scala:19-37);
its Neo4j-assigned insertion-counter node ids
(neo4j/Neo4JUtils.scala:35-39) are exactly what we must NOT reproduce.
Every node id here is a pure function of content, so output is
identical across partition counts, task order, and cluster size.
"""

from __future__ import annotations

import hashlib

import numpy as np


def content_id(*parts: str) -> str:
    """sha1 hex of '\\x1f'-joined parts — the canonical node-id function."""
    return hashlib.sha1("\x1f".join(parts).encode("utf-8")).hexdigest()


def entity_node_id(canonical_key: str) -> str:
    return content_id("entity", canonical_key)


def page_node_id(url: str) -> str:
    return content_id("page", url)


def alias_node_id(surface: str) -> str:
    return content_id("alias", surface)


def stable_hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized stable 64-bit hash of a list/array of strings.

    Used for salting / bucketing shuffle keys; stable across processes
    (unlike Python's builtin ``hash``, which is PYTHONHASHSEED-salted).
    Implemented with pandas' siphash (fixed key → deterministic),
    vectorized in C — no per-row Python in hot stages.
    """
    import pandas as pd

    s = pd.Series(values, dtype="object")
    h = pd.util.hash_pandas_object(s, index=False, hash_key="raykg-stable-64b")
    out = h.to_numpy(dtype=np.uint64, copy=True)
    if seed:
        out ^= np.uint64(0x9E3779B97F4A7C15 * (seed & 0xFFFF) & 0xFFFFFFFFFFFFFFFF)
    return out


def fingerprint64(text: str, window: int = 8) -> int:
    """Deterministic rolling-hash document fingerprint (FIXTURES: doc
    fingerprinting). Polynomial rolling hash over byte windows, XOR-folded —
    a cheap content signature, stable across runs/platforms."""
    data = text.encode("utf-8")
    if not data:
        return 0
    B, M = 131, (1 << 61) - 1
    acc = 0
    h = 0
    powB = pow(B, window - 1, M)
    for i, b in enumerate(data):
        h = (h * B + b) % M
        if i >= window - 1:
            acc ^= h
            h = (h - data[i - window + 1] * powB) % M
    return acc & 0x7FFF_FFFF_FFFF_FFFF


# --- fixed-width binary node ids for the graph-sink exchanges -------------
# The public parquet contract keeps 40-char hex ids (FIXTURES.md §3), but
# the edge dedup shuffle and the final sorts move fixed_size_binary(20)
# instead — half the exchange bytes per id, same sort order (lowercase hex
# encoding is order-preserving byte-for-byte).

_HEX_LUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_UNHEX_LUT = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _UNHEX_LUT[_c] = _i


def content_id_bin(*parts: str) -> bytes:
    """sha1 digest bytes of the canonical id function (hex == content_id)."""
    return hashlib.sha1("\x1f".join(parts).encode("utf-8")).digest()


def page_node_id_bin(url: str) -> bytes:
    return content_id_bin("page", url)


def alias_node_id_bin(surface: str) -> bytes:
    return content_id_bin("alias", surface)


def _fixed_bytes_view(arr) -> np.ndarray:
    """FixedSizeBinaryArray/ChunkedArray(binary(20)) → (n, 20) uint8 view."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = arr.buffers()[1]
    v = np.frombuffer(buf, dtype=np.uint8)
    return v[arr.offset * 20:(arr.offset + len(arr)) * 20].reshape(-1, 20)


def hex_encode_ids(arr) -> "pa.Array":
    """fixed_size_binary(20) column → 40-char lowercase hex strings
    (fully vectorized: LUT nibble expansion, no per-row Python)."""
    import pyarrow as pa

    v = _fixed_bytes_view(arr)
    out = np.empty((len(v), 40), dtype=np.uint8)
    out[:, 0::2] = _HEX_LUT[v >> 4]
    out[:, 1::2] = _HEX_LUT[v & 0x0F]
    return pa.array(out.view("S40").ravel().astype("U40"), pa.string())


def hex_decode_ids(arr) -> "pa.Array":
    """40-char hex string column → fixed_size_binary(20) (vectorized)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.binary(20))
    s = arr.to_numpy(zero_copy_only=False).astype("U40")
    chars = s.view(np.uint32).reshape(n, 40).astype(np.uint8)
    v = (_UNHEX_LUT[chars[:, 0::2]] << 4) | _UNHEX_LUT[chars[:, 1::2]]
    return pa.Array.from_buffers(pa.binary(20), n,
                                 [None, pa.py_buffer(v.tobytes(order="C"))])
