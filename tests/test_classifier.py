"""Distributed logistic-regression quality classifier (ops/classifier).

The pin is the repo-wide exactness convention: distributed full-batch
GD must be BIT-IDENTICAL to an independent sequential reference (plain
dict/loop numpy below — no engine code in the gradient path) at every
block/bucket layout, because each doc's gradient contribution is
quantized to int64 before any cross-doc sum.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
import ray

from gfftoneo4j_ray.functions.hashing import stable_hash64
from gfftoneo4j_ray.ops import classifier as C

SF = "/root/testdata/sf0.001"
DIM = 64


# --------------------------------------------------------------------------
# Independent sequential reference (per-doc Python loops, dict counts)
# --------------------------------------------------------------------------

def seq_featurize(texts: list[str], dim: int):
    """[(idx, val)] per doc — hashed BoW, L2-normalized, bias at dim."""
    out = []
    for text in texts:
        toks = [w for w in re.split(r"[^a-z0-9_'-]+", text.lower()) if w]
        counts: dict[int, float] = {}
        for tok in toks:
            # NB int() BEFORE the mod: np.uint64 % python-int promotes
            # to float64 and garbles the result
            h = int(stable_hash64([tok])[0]) % dim
            counts[h] = counts.get(h, 0.0) + 1.0
        norm = np.sqrt(sum(v * v for v in counts.values())) or 1.0
        pairs = sorted((k, v / norm) for k, v in counts.items())
        pairs.append((dim, 1.0))
        out.append(pairs)
    return out

def seq_train(feats, y, dim, iters, lr, momentum=0.9, l2=0.0):
    w = np.zeros(dim + 1)
    vel = np.zeros(dim + 1)
    n = len(feats)
    for _ in range(iters):
        grad = np.zeros(dim + 1, np.int64)
        for pairs, yi in zip(feats, y):
            z = sum(v * w[k] for k, v in pairs)
            r = 1.0 / (1.0 + np.exp(-z)) - yi
            for k, v in pairs:
                grad[k] += np.int64(np.floor(v * r * C.GRAD_SCALE + 0.5))
        gf = grad.astype(np.float64) / C.GRAD_SCALE / n + l2 * w
        vel = momentum * vel - lr * gf
        w = w + vel
    return w


@pytest.fixture(scope="module")
def docs_pd(ray_session):
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .sort_by("doc_id").to_pandas()


def test_featurize_matches_sequential(ray_session, docs_pd):
    ds = ray.data.from_pandas(docs_pd).repartition(7)
    got = C.featurize(ds, DIM).to_pandas().sort_values("doc_id")
    ref = seq_featurize(docs_pd["text"].tolist(), DIM)
    assert len(got) == len(ref)
    for (_, row), pairs in zip(got.iterrows(), ref):
        assert [int(i) for i in row["idx"]] == [k for k, _ in pairs]
        assert np.array_equal(np.asarray(row["val"]),
                              np.asarray([v for _, v in pairs]))


def test_featurize_empty_and_punct_docs(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", "?!... .. !", "word word tok"])})
    out = C.featurize_batch(t, DIM)
    rows = out.to_pylist()
    # empty/punct docs carry only the bias feature
    assert rows[0]["idx"] == [DIM] and rows[0]["val"] == [1.0]
    assert rows[1]["idx"] == [DIM] and rows[1]["val"] == [1.0]
    # counts 2,1 → l2 norm sqrt(5)
    v = np.asarray(rows[2]["val"][:-1])
    assert np.allclose(np.sort(v), np.sort(
        np.array([2.0, 1.0]) / np.sqrt(5.0)))
    assert rows[2]["idx"][-1] == DIM and rows[2]["val"][-1] == 1.0


def test_train_bitexact_vs_sequential_any_layout(ray_session, docs_pd):
    texts = docs_pd["text"].tolist()
    feats = seq_featurize(texts, DIM)
    wstar = C.planted_weights(DIM)
    y = [1 if sum(v * wstar[k] for k, v in pairs) > 0 else 0
         for pairs in feats]
    w_ref = seq_train(feats, y, DIM, iters=7, lr=4.0)

    for blocks, buckets in [(3, 4), (11, 2), (1, 16)]:
        ds = ray.data.from_pandas(docs_pd).repartition(blocks)
        fds = C.plant_labels(C.featurize(ds, DIM), DIM)
        w, hist = C.train_logreg(fds, DIM, iters=7, lr=4.0,
                                 num_buckets=buckets)
        assert np.array_equal(w, w_ref), (blocks, buckets)
        assert hist[0]["n"] == len(texts)
    # the planted labels agree with the distributed plant
    got_y = fds.to_pandas().sort_values("doc_id")["y"].tolist()
    assert got_y == y


def test_learns_planted_task_and_scores(ray_session):
    scored = C.q_quality_classifier(SF).to_pandas()
    assert len(scored) == 500
    acc = (scored["pred"] == scored["y"]).mean()
    base = max(scored["y"].mean(), 1 - scored["y"].mean())
    assert acc >= 0.95 and acc > base + 0.05, (acc, base)
    # scaled-int scores in range, deterministic across a re-run
    assert scored["score_c"].between(0, C.SCORE_SCALE).all()
    again = C.q_quality_classifier(SF).to_pandas()
    pd_sorted = scored.sort_values("doc_id").reset_index(drop=True)
    again = again.sort_values("doc_id").reset_index(drop=True)
    assert pd_sorted.equals(again)


def test_loss_decreases(ray_session, docs_pd):
    ds = ray.data.from_pandas(docs_pd)
    fds = C.plant_labels(C.featurize(ds, DIM), DIM)
    _, hist = C.train_logreg(fds, DIM, iters=30, lr=1.0, momentum=0.0,
                             num_buckets=4)
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0] * 0.9
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
