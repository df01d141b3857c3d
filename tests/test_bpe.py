"""Distributed BPE trainer vs the sequential dict/Counter reference."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from gfftoneo4j_ray.compat.seqref import sequential_bpe
from gfftoneo4j_ray.stages.bpe import train_bpe


def _as_tuples(t: pa.Table) -> list[tuple]:
    return [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in t.to_pylist()]


def test_bpe_matches_sequential_reference_sf0001(ray_session):
    """40 merges over the real sf0.001 documents table, distributed ==
    sequential, and invariant to the input partitioning."""
    import ray

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    want = sequential_bpe(docs["text"].to_pylist(), 40)
    assert len(want) == 40
    for nparts in (1, 5):
        ds = ray.data.from_arrow(docs).repartition(nparts)
        got = _as_tuples(train_bpe(ds, n_merges=40, num_buckets=4))
        assert got == want


def test_bpe_greedy_overlap_and_ties(ray_session):
    """Same-symbol runs (the l == r overlap case) and count ties are
    resolved exactly like the sequential left-to-right scan."""
    import ray

    texts = ["aaaa aaaa aaa baba bab", "aaaa abab abab zz zz zz"]
    want = sequential_bpe(texts, 12)
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})).repartition(2)
    got = _as_tuples(train_bpe(ds, n_merges=12, num_buckets=2))
    assert got == want
    # the run case actually exercised: first merge is (a, a)
    assert (want[0][1], want[0][2]) == ("a", "a")


def test_bpe_early_stop_when_pairs_exhaust(ray_session):
    """A corpus whose vocabulary collapses to single symbols stops
    early with fewer than n_merges rows."""
    import ray

    texts = ["ab ab ab", "ab"]
    want = sequential_bpe(texts, 50)
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())}))
    got = _as_tuples(train_bpe(ds, n_merges=50))
    assert got == want
    assert len(got) < 50
    # nulls/empties are dropped by the tokenizer
    ds2 = ray.data.from_arrow(
        pa.table({"text": pa.array(["", None], pa.string())}))
    assert train_bpe(ds2, n_merges=5).num_rows == 0


# ---------------------------------------------------------------------------
# encode_corpus / token_frequencies — applying a trained merge table
# ---------------------------------------------------------------------------

def test_bpe_encode_reproduces_training_segmentation(ray_session):
    """Greedy lowest-rank encode == rank-order replay (the trainer's
    own segmentation) on every distinct training word, driven through
    the real actor-pool stage at two partitionings; n_tokens ==
    len(tokens) row-for-row."""
    import re

    import ray

    from gfftoneo4j_ray.compat.seqref import bpe_replay_segment
    from gfftoneo4j_ray.stages.bpe import encode_corpus

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).slice(0, 400)
    texts = docs["text"].to_pylist()
    merges = sequential_bpe(texts, 60)
    tok = re.compile(r"[\w'-]+")
    want_tokens = {}
    want_n = {}
    for did, t in zip(docs["doc_id"].to_pylist(), texts):
        toks: list = []
        for w in tok.findall((t or "").lower()):
            toks.extend(bpe_replay_segment(w, merges))
        want_tokens[did] = toks
        want_n[did] = len(toks)

    for nparts in (1, 4):
        ds = ray.data.from_arrow(docs).repartition(nparts)
        got_n = encode_corpus(ds, merges, concurrency=(1, 2),
                              batch_size=64).to_pandas()
        assert dict(zip(got_n["doc_id"], got_n["n_bpe_tokens"])) == want_n
    got_t = encode_corpus(
        ray.data.from_arrow(docs), merges, emit="tokens",
        concurrency=(1, 2), batch_size=64).to_pandas()
    assert {d: list(v) for d, v in
            zip(got_t["doc_id"], got_t["bpe_tokens"])} == want_tokens


def test_bpe_encode_unseen_words_and_merge_recreation():
    """Hand-worked greedy lowest-rank cases, incl. a word where a
    later-rank merge creates an occurrence of an earlier-rank pair —
    the case where greedy (canonical subword-nmt apply order) differs
    from one-pass rank replay."""
    from gfftoneo4j_ray.stages.bpe import BPEEncoder

    enc = BPEEncoder([("a", "b"), ("ab", "c"), ("x", "y")])
    assert enc._encode("abc") == ("abc", "</w>")
    assert enc._encode("zq") == ("z", "q", "</w>")       # no merges apply
    assert enc._encode("xyab") == ("xy", "ab", "</w>")
    assert enc._encode("") == ("</w>",)
    # recreation: ranks [(b,c)=0, (a,b)=1]; "abc": lowest present rank
    # first → merge (b,c)@0 → a,bc — (a,b) gone. Replay order would
    # first do nothing for... (b,c) is rank 0 so both agree here; make
    # the asymmetric case: ranks [(a,bc)=0, (b,c)=1]
    enc2 = BPEEncoder([("a", "bc"), ("b", "c")])
    # greedy: (a,bc) absent, (b,c) present → a,bc → now (a,bc) rank 0
    # present → abc. One-pass replay would stop at a,bc.
    assert enc2._encode("abc") == ("abc", "</w>")


def test_bpe_token_frequencies_consistent_with_encode(ray_session):
    """Corpus unigram table: per-token counts sum to the corpus token
    total from encode_corpus, and each token's count matches a direct
    sequential recount."""
    from collections import Counter
    import re

    import ray

    from gfftoneo4j_ray.compat.seqref import bpe_replay_segment
    from gfftoneo4j_ray.stages.bpe import encode_corpus, token_frequencies

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).slice(0, 300)
    texts = docs["text"].to_pylist()
    merges = sequential_bpe(texts, 40)
    tok = re.compile(r"[\w'-]+")
    want = Counter()
    for t in texts:
        for w in tok.findall((t or "").lower()):
            want.update(bpe_replay_segment(w, merges))

    ds = ray.data.from_arrow(docs).repartition(3)
    freq = token_frequencies(ds, merges, num_buckets=4,
                             concurrency=(1, 2)).to_pandas()
    assert dict(zip(freq["token"], freq["cnt"])) == dict(want)
    n_total = encode_corpus(
        ray.data.from_arrow(docs), merges).to_pandas()
    assert int(n_total["n_bpe_tokens"].sum()) == sum(want.values())
