"""Deduplication operators over a documents table: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Reference anchor for exact dedup: Cypher ``CREATE UNIQUE``
(reference: src/main/scala/corwur/neo4j/Neo4JUtils.scala:43) —
hash-partition on the content key, keep the per-group representative
(D1, SURVEY.md §2.6). The near-dup family is new capability required
by the training-data-pipeline scope.

Scale design:
  * exact: content hash computed map-side (vectorized), groupby on the
    hash (shuffle moves (hash, id) pairs, not text), min-id winner.
  * MinHash-LSH: per-batch shingle→minhash (numpy, vectorized over the
    hash matrix), explode to (band_id, band_hash) rows, groupby bands →
    candidate pairs, verify exact Jaccard per pair, then min-label
    connected components. Only candidate pairs (not all pairs) are
    verified — the standard web-dedup layout.
  * SimHash: 64-bit projection per doc; buckets on 4×16-bit chunks.
  * n-gram Jaccard: exact pairwise via an inverted token index —
    bounded inputs only (the oracle-checkable exact path); LSH is the
    scale path.
  * embedding cosine: blocked matmul against a broadcast matrix.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_TOKEN = re.compile(r"[\w'-]+")

# deterministic 64-bit mix constants for minhash permutations
_MERSENNE = (1 << 61) - 1


def _token_set(text: str) -> list[str]:
    return sorted(set(_TOKEN.findall(text.lower())))


def _shingles(text: str, k: int = 3) -> list[int]:
    """k-token shingles → stable 64-bit ints."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["_"] * (k - len(toks))
    out = set()
    for i in range(len(toks) - k + 1):
        h = hashlib.blake2b(" ".join(toks[i:i + k]).encode("utf-8"),
                            digest_size=8).digest()
        out.add(int.from_bytes(h, "little"))
    return sorted(out)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=num_perm, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: list[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Universal-hash min over uint64 shingles (wrap-around mod 2^64 —
    deterministic; odd multipliers keep the map bijective)."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    s = np.asarray(shingles, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        hashed = s * a[None, :] + b[None, :]
    return hashed.min(axis=0)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id = min id per identical text, n_dups). Shuffle key:
    sha1(text); only (hash, id) rows move."""
    def hash_batch(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha1((x or "").encode("utf-8")).hexdigest()
              for x in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col],
                         "text_hash": pa.array(hs, pa.string())})

    hashed = docs_ds.map_batches(hash_batch, batch_format="pyarrow")

    from ..ops.hashagg import hash_aggregate

    return hash_aggregate(hashed, "text_hash",
                          [(id_col, "min", id_col),
                           (id_col, "count", "n_dups")],
                          num_buckets=32) \
        .select_columns([id_col, "n_dups"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool worker: docs → LSH band rows (band_id, band_hash, doc_id).

    Permutation params built once per actor (T1 stateful pattern)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.a, self.b = _perm_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(_shingles(text or "", self.k), self.a, self.b)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows_per_band:(bi + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                ids.append(did)
                band_ids.append(bi)
                band_hashes.append(int.from_bytes(bh, "little") >> 1)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        })


def minhash_candidates(docs_ds, num_perm: int = 64, bands: int = 16,
                       concurrency=(1, 4)):
    """docs → candidate pairs (doc_a < doc_b) sharing ≥1 LSH bucket."""
    band_rows = docs_ds.map_batches(
        MinHasher, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands})

    # bucket the bucket-space: groupby on a small int, per-(band,hash)
    # pair generation via a pandas groupby INSIDE each bucket — avoids
    # Ray's per-group Python dispatch over tens of thousands of groups
    from ..ops.hashagg import _bucket_column, hash_aggregate

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", _bucket_column(t, ["band_id", "band_hash"], 64))

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        a, b = [], []
        for _, grp in df.groupby(["band_id", "band_hash"], sort=True):
            ids = sorted(set(grp["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    cand = band_rows.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda g: pairs_in_bucket(g.drop_columns(["bucket"])),
            batch_format="pyarrow")
    # dedup pairs found in multiple bands (bucketed distinct)
    return hash_aggregate(cand, ["doc_a", "doc_b"],
                          [("doc_a", "count", "_n")], num_buckets=32) \
        .select_columns(["doc_a", "doc_b"])


def jaccard(a: str, b: str) -> float:
    sa, sb = set(_token_set(a)), set(_token_set(b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_groups(docs_ds, threshold: float = 0.8, num_perm: int = 64,
                         bands: int = 16, concurrency=(1, 4)) -> dict:
    """Full near-dup flow → {doc_id: group_rep_id} for verified dup sets.

    Candidate pairs are Jaccard-verified against the broadcast text of
    ONLY candidate docs (bounded: docs that share a bucket), then
    min-label connected components via union-find. At 100 TB the
    verify step reads candidate texts via a shuffle join instead of a
    broadcast; the candidate volume stays LSH-bounded either way."""
    import ray

    from ..state.unionfind import UnionFind

    cand = minhash_candidates(docs_ds, num_perm, bands, concurrency).to_pandas()
    if len(cand) == 0:
        return {}
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    need_set = set(need)

    def grab(t: pa.Table) -> pa.Table:
        mask = pa.array([d in need_set for d in t["doc_id"].to_pylist()],
                        pa.bool_())
        return t.filter(mask).select(["doc_id", "text"])

    texts = {}
    for b in docs_ds.map_batches(grab, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=4096):
        for d, x in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            texts[d] = x or ""
    uf = UnionFind()
    for da, db in cand.itertuples(index=False):
        if jaccard(texts.get(da, ""), texts.get(db, "")) >= threshold:
            uf.union(int(da), int(db))
    return dict(uf.mapping())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Deterministic 64-bit SimHash over token hashes."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in _TOKEN.findall((text or "").lower()):
        h = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
            "little")
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += np.where(bits > 0, 1, -1)
    val = 0
    for i, v in enumerate(acc):
        if v > 0:
            val |= (1 << i)
    return val >> 1  # keep it inside signed int64


def simhash_batch(t: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": t["doc_id"],
        "simhash": pa.array([simhash64(x) for x in t["text"].to_pylist()],
                            pa.int64()),
    })


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (oracle-checkable path; LSH is the scale path)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs_ds, max_doc_id: int, scale: int = 10000):
    """All-pairs token-set Jaccard for doc_id < max_doc_id via an
    inverted index: explode (token, doc_id), groupby token → per-token
    co-occurrence counts, aggregate pair intersections, compute
    |A∩B| / (|A|+|B|-|A∩B|). Returns (doc_a, doc_b, jaccard_c scaled).

    Bounded by construction (max_doc_id); the SQL oracle runs the same
    definition with unnest+join."""
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        mask = pa.array([d < max_doc_id for d in t["doc_id"].to_pylist()],
                        pa.bool_())
        t = t.filter(mask)
        ids, toks = [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ts = _token_set(x or "")
            for w in ts:
                ids.append(d)
                toks.append(w)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    tok_rows = docs_ds.map_batches(explode, batch_format="pyarrow")

    def per_token_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(set(g["doc_id"].to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "one": pa.array([1] * len(a), pa.int64())})

    inter = tok_rows.groupby("token").map_groups(per_token_pairs,
                                                 batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]).aggregate(Sum("one", alias_name="n_inter"))

    # token-set sizes (small, driver-side)
    sizes = {}
    for b in tok_rows.groupby("doc_id").count() \
            .iter_batches(batch_format="pyarrow", batch_size=65536):
        cname = [c for c in b.column_names if c != "doc_id"][0]
        for d, n in zip(b["doc_id"].to_pylist(), b[cname].to_pylist()):
            sizes[d] = int(n)

    def finalize(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_pylist()
        db = t["doc_b"].to_pylist()
        ni = np.asarray(t["n_inter"].to_pylist(), dtype=np.float64)
        union = np.array([sizes[a] + sizes[b] for a, b in zip(da, db)],
                         dtype=np.float64) - ni
        jc = np.floor(ni / np.maximum(union, 1.0) * scale + 0.5).astype(np.int64)
        return pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                         "jaccard_c": pa.array(jc, pa.int64())})

    return inter.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(emb_ds, threshold_c: int = 9500, scale: int = 10000):
    """Pairs of embeddings with cosine ≥ threshold via blocked matmul
    against the broadcast (normalized) matrix — O(n·d) per batch row,
    vectorized; the IVF/LSH variant in similarity.py is the scale path."""
    import ray

    mat, ids = _normalized_matrix(emb_ds)
    ref = ray.put((mat, ids))

    class Block:
        def __init__(self, r):
            import ray as _r
            self.mat, self.ids = _r.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            q = _normalize_rows(np.array(t["embedding"].to_pylist(),
                                         dtype=np.float64))
            qids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
            sims = q @ self.mat.T  # (b, n)
            simc = np.floor(sims * scale + 0.5).astype(np.int64)
            aa, bb, ss = [], [], []
            for r in range(simc.shape[0]):
                hits = np.where(simc[r] >= threshold_c)[0]
                for h in hits:
                    if qids[r] < self.ids[h]:  # each pair once, no self
                        aa.append(int(qids[r]))
                        bb.append(int(self.ids[h]))
                        ss.append(int(simc[r, h]))
            return pa.table({"vec_a": pa.array(aa, pa.int64()),
                             "vec_b": pa.array(bb, pa.int64()),
                             "cos_c": pa.array(ss, pa.int64())})

    return emb_ds.map_batches(Block, batch_format="pyarrow",
                              concurrency=(1, 4),
                              fn_constructor_kwargs={"r": ref})


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _normalized_matrix(emb_ds):
    df = emb_ds.to_pandas()
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    mat = _normalize_rows(np.array(df["embedding"].to_list(), dtype=np.float64))
    order = np.argsort(ids)
    return mat[order], ids[order]

