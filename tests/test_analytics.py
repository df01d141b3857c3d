"""New analytics / stats / graph operators vs their DuckDB oracles at
sf0.001, plus unit tests for the graph-algorithm kernels."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


NEW_ORACLE_QUERIES = [
    "q_pivot", "q_grouping_sets", "q_count_distinct", "q_quantiles",
    "q_arg_max", "q_numeric_stats", "q_sample_hash", "q_dim_rollups",
    "q_heavy_hitters", "q_tfidf", "q_redact",
    "q_quality_filter", "q_repetition_filter", "q_window_funcs",
    "q_dsir_select",
]


@pytest.mark.parametrize("name", NEW_ORACLE_QUERIES)
def test_new_query_matches_oracle(entrymod, oracle_con, name):
    res = entrymod.queries()[name](SF)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    want = oracle_con.execute(entrymod.oracle_sql()[name]).fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_quality_filter_is_selective(entrymod, ray_session):
    """The gates must actually drop rows (else the thresholds are
    vacuous) without emptying the corpus."""
    n_kept = entrymod.queries()["q_quality_filter"](SF).count()
    import ray

    n_all = ray.data.read_parquet(f"{SF}/documents.parquet").count()
    assert 0 < n_kept < n_all


def test_repetition_filter_crafted(ray_session):
    """Vectorized n-gram group stats vs a plain-Python reference on
    crafted edge cases: heavy repeats, count ties with different char
    lengths, 1-token / empty docs, duplicated 3-grams."""
    import collections
    import re
    import tempfile

    import pyarrow.parquet as pq
    import ray

    from gfftoneo4j_ray.ops import analytics as A

    docs = [
        "spam spam spam spam eggs",          # one dominant 2-gram
        "aa bb aa bb cc dd cc dd",           # tie on count, equal len
        "xxxx y xxxx y z longword longword z",  # tie, different lens
        "solo",                               # 1 token: all zero
        "",                                   # empty: all zero
        "a b c a b c a b c",                 # duplicated 3-grams
        "unique words only here now",        # no repeats at all
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})

    def ref(text):
        w = re.findall(r"[a-z0-9_'-]+", text.lower())
        total = max(sum(len(x) for x in w), 1)
        g2 = collections.Counter(zip(w, w[1:]))
        g3 = collections.Counter(zip(w, w[1:], w[2:]))
        top2 = max((c * sum(len(t) for t in g) for g, c in g2.items()),
                   default=0)
        dup3 = sum(c * sum(len(t) for t in g)
                   for g, c in g3.items() if c >= 2)
        import math
        return (len(w), math.floor(top2 / total * 10000 + 0.5),
                math.floor(dup3 / total * 10000 + 0.5))

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, f"{d}/documents.parquet")
        got = A.q_repetition_filter(f"{d}", top2_max_c=10**9,
                                    dup3_max_c=10**9) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(range(len(docs)))
    for i, text in enumerate(docs):
        n_tok, top2_c, dup3_c = ref(text)
        assert got.loc[i, "n_tokens"] == n_tok, (i, text)
        assert got.loc[i, "top2_frac_c"] == top2_c, (i, text)
        assert got.loc[i, "dup3_frac_c"] == dup3_c, (i, text)


def test_repetition_filter_is_selective(entrymod, ray_session):
    """Both repetition gates must actually drop rows at sf0.001."""
    n_kept = entrymod.queries()["q_repetition_filter"](SF).count()
    import ray

    n_all = ray.data.read_parquet(f"{SF}/documents.parquet").count()
    assert 0 < n_kept < n_all


def test_sample_hash_rate(entrymod, ray_session):
    """Deterministic sample lands near the nominal 10% rate."""
    n = entrymod.queries()["q_sample_hash"](SF).count()
    import ray

    total = ray.data.read_parquet(f"{SF}/events.parquet").count()
    assert 0.05 * total < n < 0.15 * total


def test_hll_users_accuracy(entrymod, oracle_con, ray_session):
    """The HLL estimate (q_sketches' kind='hll' est_n column) must land
    within 5% of the exact distinct count for every group — and the
    exact_n column (computed distributed) must equal SQL
    COUNT(DISTINCT)."""
    all_rows = entrymod.queries()["q_sketches"](SF).to_pandas()
    got = all_rows[all_rows["kind"] == "hll"]
    exact = dict(oracle_con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events "
        "GROUP BY event_type").fetchall())
    assert set(got["key"]) == set(exact)
    for et, est, ex in zip(got["key"], got["est_n"], got["exact_n"]):
        assert ex == exact[et], (et, ex, exact[et])
        assert abs(est - ex) / ex < 0.05, (et, est, ex)


def test_cms_never_underestimates(entrymod, oracle_con, ray_session):
    """Count-Min structural guarantees on the kind='cms' rows: exact_n
    equals the real SQL count for every word, est_n ≥ exact_n always
    (within one row collisions only ADD), and the sketch must actually
    collide at the demo width (else the artifact is vacuous)."""
    all_rows = entrymod.queries()["q_sketches"](SF).to_pandas()
    got = all_rows[all_rows["kind"] == "cms"]
    assert len(got) == 30
    exact = dict(oracle_con.execute("""
        SELECT w, COUNT(*) FROM (SELECT unnest(regexp_extract_all(
            lower(text), '[a-z0-9_''-]+')) AS w FROM documents)
        GROUP BY w""").fetchall())
    assert (got["est_n"] >= got["exact_n"]).all()
    assert (got["est_n"] > got["exact_n"]).any()
    for w, ex in zip(got["key"], got["exact_n"]):
        assert ex == exact[w], (w, ex)


def test_cms_merge_invariance(ray_session):
    """The sketch matrix must not depend on batching/partitioning —
    cell sums are add-associative."""
    import ray

    from gfftoneo4j_ray.ops.windowed import cms_sketch

    t = pa.table({"text": [f"w{i % 7} w{i % 13} common" for i in range(400)]})
    one = cms_sketch(ray.data.from_arrow(t), width=16)
    many = cms_sketch(ray.data.from_arrow(t).repartition(11), width=16)
    assert (one == many).all()


def test_hll_merge_invariance(ray_session):
    """Sketch estimates must not depend on how rows are batched —
    register merges are max-associative."""
    import ray

    from gfftoneo4j_ray.ops.windowed import hll_distinct

    t = pa.table({"g": ["a"] * 9000 + ["b"] * 1000,
                  "k": list(range(9000)) + list(range(500)) * 2})
    one = hll_distinct(ray.data.from_arrow(t), "k", "g").to_pandas()
    many = hll_distinct(
        ray.data.from_arrow(t).repartition(13), "k", "g").to_pandas()
    assert dict(zip(one["g"], one["n_approx"])) \
        == dict(zip(many["g"], many["n_approx"]))


# ---------------------------------------------------------------------------
# graph kernels
# ---------------------------------------------------------------------------

def test_hex_prefix_int64_order_and_value():
    from gfftoneo4j_ray.ops.graph_algos import hex_prefix_int64

    rng = np.random.default_rng(7)
    ids = ["".join(np.char.mod("%x", rng.integers(0, 16, 40)))
           for _ in range(200)]
    out = hex_prefix_int64(pa.array(ids)).to_pylist()
    assert out == [int(s[:16], 16) - (1 << 63) for s in ids]
    # order-preserving: sorting by the int64 sorts hex ids
    assert [i for _, i in sorted(zip(out, ids))] == sorted(ids)
    # large_string and sliced inputs
    assert hex_prefix_int64(
        pa.array(ids, pa.large_string())).to_pylist() == out
    assert hex_prefix_int64(
        pa.array(["f" * 40] + ids).slice(1)).to_pylist() == out


def test_hex_prefix_int64_rejects_bad_charset():
    """Uppercase/non-hex bytes would produce nibbles > 15 and silently
    corrupt the packed value's ORDER — must raise, not misorder."""
    from gfftoneo4j_ray.ops.graph_algos import hex_prefix_int64

    ok = "ab" * 20
    for bad in ["AB" + "ab" * 19, "zz" + "ab" * 19, "a-" + "ab" * 19]:
        with pytest.raises(ValueError, match="hex"):
            hex_prefix_int64(pa.array([ok, bad]))
    assert hex_prefix_int64(pa.array([ok])).to_pylist() == [
        int(ok[:16], 16) - (1 << 63)]


def _hexid(i: int) -> str:
    """Realistic (hash-distributed) 40-hex node id, like the KG's
    content-hash ids — components_hex documents that structured ids
    sharing a 64-bit prefix are rejected, not silently merged."""
    import hashlib

    return hashlib.sha1(f"node-{i}".encode()).hexdigest()


def test_components_hex_two_clusters(ray_session):
    import ray

    from gfftoneo4j_ray.ops.graph_algos import components_hex

    # cluster A: 0-1-2 chained; cluster B: 5-6; isolated pair 8->9
    edges = pa.table({
        "src": [_hexid(1), _hexid(2), _hexid(5), _hexid(8)],
        "dst": [_hexid(0), _hexid(1), _hexid(6), _hexid(9)],
    })
    out = components_hex(ray.data.from_arrow(edges)).to_pandas()
    comp = dict(zip(out["node_id"], out["component"]))
    assert len(out) == 7
    for cluster in [(0, 1, 2), (5, 6), (8, 9)]:
        rep = min(_hexid(i) for i in cluster)
        for i in cluster:
            assert comp[_hexid(i)] == rep


def test_components_hex_rejects_prefix_collisions(ray_session):
    import ray

    from gfftoneo4j_ray.ops.graph_algos import components_hex

    # two DISTINCT ids sharing the first 16 hex chars (all zeros)
    a, b = f"{1:040x}", f"{2:040x}"
    with pytest.raises(ValueError, match="prefix"):
        components_hex(ray.data.from_arrow(
            pa.table({"src": [a], "dst": [b]}))).to_pandas()


def test_pagerank_matches_dense_reference(ray_session):
    """Distributed PageRank equals a dense numpy fixed-iteration
    reference on a small random digraph."""
    import ray

    from gfftoneo4j_ray.ops.graph_algos import pagerank

    rng = np.random.default_rng(3)
    n = 12
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2))
             if a != b}
    src = [_hexid(a) for a, _ in sorted(pairs)]
    dst = [_hexid(b) for _, b in sorted(pairs)]
    got = pagerank(ray.data.from_arrow(pa.table({"src": src, "dst": dst})),
                   iters=3, damping=0.85).to_pandas()

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    nn = len(nodes)
    outdeg = np.zeros(nn)
    for a, _ in pairs:
        outdeg[idx[a]] += 1
    pr = np.full(nn, 1.0 / nn)
    for _ in range(3):
        nxt = np.full(nn, (1.0 - 0.85) / nn)
        for a, b in pairs:
            nxt[idx[b]] += 0.85 * pr[idx[a]] / outdeg[idx[a]]
        pr = nxt
    want = {_hexid(v): pr[idx[v]] for v in nodes}
    assert len(got) == nn
    for node, val in zip(got["node"], got["pr"]):
        assert abs(val - want[node]) < 1e-12


def test_graph_stats_matches_brute_force(ray_session):
    """Distributed degree-orientation triangle counting equals an
    all-pairs brute-force reference on a random graph with self-loops
    and duplicated reversed edges mixed in."""
    import itertools
    import random

    import ray

    from gfftoneo4j_ray.ops.graph_algos import graph_stats

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    pairs = set()
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        pairs.add((a, b))
    some = list(pairs)[:10]
    src = [a for a, b in pairs] + ["n00", "n05"] + [b for a, b in some]
    dst = [b for a, b in pairs] + ["n00", "n05"] + [a for a, b in some]
    got = graph_stats(
        ray.data.from_arrow(pa.table({"src": src, "dst": dst})),
        num_buckets=4).to_pandas().sort_values("node") \
        .reset_index(drop=True)

    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert list(got["node"]) == sorted(adj)
    for _, row in got.iterrows():
        nbrs = adj[row["node"]]
        d = len(nbrs)
        t = sum(1 for v, w in itertools.combinations(sorted(nbrs), 2)
                if (v, w) in und)
        dd = d * (d - 1)
        assert row["degree"] == d
        assert row["triangles"] == t
        assert row["lcc_c"] == ((2 * t * 1_000_000 + dd // 2) // dd
                                if dd else 0)
    # sanity: the graph actually has triangles to count
    assert got["triangles"].sum() > 0


def test_pagerank_checkpointed_equals_inmemory_and_resumes(
        ray_session, tmp_path):
    """checkpoint_dir mode returns the same ranks as the in-memory
    carry, and a re-invocation resumes from the committed rounds
    (bit-identical result with the final round already on disk)."""
    import os

    import ray

    from gfftoneo4j_ray.ops.graph_algos import pagerank

    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 9, (30, 2))
             if a != b}
    edges = pa.table({"src": [_hexid(a) for a, _ in sorted(pairs)],
                      "dst": [_hexid(b) for _, b in sorted(pairs)]})
    want = pagerank(ray.data.from_arrow(edges), iters=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    ckpt = str(tmp_path / "pr_ckpt")
    got = pagerank(ray.data.from_arrow(edges), iters=3,
                   checkpoint_dir=ckpt) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (got["node"] == want["node"]).all()
    assert np.allclose(got["pr"], want["pr"], atol=1e-15)
    # every round committed (rename = commit; no .tmp residue)
    names = sorted(os.listdir(ckpt))
    assert names == [f"pr_round_{i:03d}" for i in range(3)]
    # resume: drop the last round, re-invoke — rounds 0-1 are reused,
    # only round 2 recomputes, and the ranks are bit-identical
    import shutil

    shutil.rmtree(os.path.join(ckpt, "pr_round_002"))
    again = pagerank(ray.data.from_arrow(edges), iters=3,
                     checkpoint_dir=ckpt) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (again["pr"] == got["pr"]).all()


def test_contamination_flags(ray_session):
    """Docs containing any probe n-gram are flagged with exact hit
    counts; clean docs are 0; casing/punctuation normalize through the
    shared tokenizer."""
    import numpy as np
    import pyarrow as pa
    import ray

    from gfftoneo4j_ray.ops.analytics import (build_probe_set,
                                              contamination_flags)

    bench_q = "what is the capital of france paris is the capital"
    probe = [bench_q]
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # verbatim containment (different case + punctuation)
            "Quiz time! What is the CAPITAL of France? Paris is the capital.",
            "totally unrelated text about ray data exchanges and parquet",
            # partial overlap shorter than n -> clean
            "the capital of germany",
            "",
        ], pa.string()),
    })
    out = contamination_flags(ray.data.from_arrow(docs).repartition(2),
                              probe, n=8).to_pandas() \
        .set_index("doc_id")["n_hits"].to_dict()
    # doc 0 contains the probe's token stream (10 tokens) => 3 8-grams
    # of the probe all present consecutively
    assert out[0] == 3
    assert out[1] == 0 and out[2] == 0 and out[3] == 0
    assert len(build_probe_set(probe, n=8)) == 3


def test_pack_sequences_invariants(ray_session):
    """Every doc packed exactly once; per-pack totals within budget
    unless a single oversized doc; deterministic across partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray

    from gfftoneo4j_ray.ops.analytics import pack_sequences

    rng = np.random.default_rng(3)
    texts = ["tok " * int(n) for n in rng.integers(1, 900, 300)]
    texts.append("tok " * 5000)  # oversized: must land alone
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def run(parts):
        return pack_sequences(
            ray.data.from_arrow(t).repartition(parts),
            budget_tokens=2048).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    out = run(4)
    assert sorted(out["doc_id"]) == list(range(len(texts)))
    per_pack = out.groupby("pack_id").agg(total=("n_tokens", "sum"),
                                          n=("doc_id", "count"))
    over = per_pack[per_pack["total"] > 2048]
    assert (over["n"] == 1).all()  # only single-doc packs may overflow
    big = out[out["doc_id"] == len(texts) - 1]
    assert per_pack.loc[big["pack_id"].iloc[0], "n"] == 1
    # deterministic under a different partitioning
    assert run(9).equals(out)


def test_mixture_sample_rates_and_determinism(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from gfftoneo4j_ray.ops.analytics import mixture_sample

    n = 20000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "quality": pa.array(["hi" if i % 4 == 0 else "lo"
                             for i in range(n)], pa.string()),
    })
    rates = {"hi": 1.0, "lo": 0.25}
    out = mixture_sample(ray.data.from_arrow(t).repartition(5), rates,
                         key_col="quality", id_col="doc_id").to_pandas()
    hi = out[out["quality"] == "hi"]
    lo = out[out["quality"] == "lo"]
    assert len(hi) == n // 4                      # rate 1.0 keeps all
    assert abs(len(lo) / (0.75 * n) - 0.25) < 0.02
    # deterministic across partitioning
    out2 = mixture_sample(ray.data.from_arrow(t).repartition(11), rates,
                          key_col="quality", id_col="doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])
    # unknown keys drop
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "quality": pa.array(["??", "hi"], pa.string())})
    out3 = mixture_sample(ray.data.from_arrow(t2), rates,
                          key_col="quality", id_col="doc_id").to_pandas()
    assert list(out3["quality"]) == ["hi"]


def test_dsir_hashed_variant_deterministic(ray_session):
    from gfftoneo4j_ray.ops.analytics import q_dsir_select

    sf = "/root/testdata/sf0.001"
    a = q_dsir_select(sf, k=25, hash_buckets=512).to_pandas()
    b = q_dsir_select(sf, k=25, hash_buckets=512).to_pandas()
    assert len(a) == 25 and a.equals(b)
    # hashed features approximate the exact-word ranking: the top
    # selections overlap heavily (bucket collisions only perturb tails)
    exact = q_dsir_select(sf, k=25).to_pandas()
    assert len(set(a.doc_id) & set(exact.doc_id)) >= 15
    # target docs themselves score high under their own distribution:
    # selections are enriched in sub-target ids vs a uniform draw
    assert (exact.doc_id < 50).mean() > 0.2


def test_quantile_select_matches_numpy_reference(ray_session):
    """Unbounded-domain iterative selection == a numpy sort-based
    reference, on data with heavy ties, negatives, and a huge value
    range (forcing multiple refinement rounds at branch=16)."""
    import ray

    from gfftoneo4j_ray.ops.statsops import quantile_select

    rng = np.random.default_rng(9)
    keys = rng.choice(["a", "b", "c"], 5000)
    vc = np.where(rng.random(5000) < 0.3,
                  rng.integers(-5, 6, 5000),               # heavy ties
                  rng.integers(-10**12, 10**12, 5000))     # huge range
    t = pa.table({"k": pa.array(keys), "vc": pa.array(vc, pa.int64())})
    got = quantile_select(
        ray.data.from_arrow(t).repartition(7), "k",
        qs=(("p50", 1, 2), ("p95", 19, 20), ("p01", 1, 100)),
        branch=16).to_pandas()

    for k in ("a", "b", "c"):
        v = np.sort(vc[keys == k])
        n = len(v)
        for label, num, den in (("p50", 1, 2), ("p95", 19, 20),
                                ("p01", 1, 100)):
            want = int(v[max(1, (num * n + den - 1) // den) - 1])
            row = got[(got["k"] == k) & (got["q"] == label)]
            assert len(row) == 1
            assert int(row["value_c"].iloc[0]) == want, (k, label)


def test_perplexity_buckets_semantics(ray_session):
    """A document written in the target LM's language must score a
    strictly lower per-token nll than a document of tokens the target
    has never seen — and the tertile labels must follow nll order."""
    import tempfile

    import pyarrow.parquet as pq

    from gfftoneo4j_ray.ops import analytics as A

    target_sent = "the cat sat on the mat and the dog ran"
    docs = [f"{target_sent} variant {i % 3}" for i in range(50)]  # target
    docs.append(target_sent)                              # 50: in-domain
    docs.append("zqx vbn mlk pqr wxy zzz qqq nnn vvv kkk")  # 51: o.o.d.
    docs.append(target_sent + " " + target_sent)          # 52: in-domain
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                    "lang": pa.array(["en"] * len(docs), pa.string()),
                    "source": pa.array(["s"] * len(docs), pa.string()),
                    "n_chars": pa.array([len(d) for d in docs], pa.int64())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, f"{d}/documents.parquet")
        got = A.q_perplexity_buckets(d).to_pandas() \
            .set_index("doc_id")
    assert got.loc[50, "nll_c"] < got.loc[51, "nll_c"]
    assert got.loc[52, "nll_c"] < got.loc[51, "nll_c"]
    assert got.loc[51, "bucket"] == "tail"
    # labels are a monotone function of nll_c
    order = {"head": 0, "middle": 1, "tail": 2}
    s = got.sort_values("nll_c")
    lab = [order[b] for b in s["bucket"]]
    assert lab == sorted(lab)


def test_corpus_prep_urldedup_and_ppl_legs_vs_sql(entrymod, oracle_con,
                                                  ray_session):
    """The two round-5 q_corpus_prep legs (kind='urldedup', 'ppl')
    value-match inline SQL at sf0.001 — the pack/mixture legs are
    sf0.01-golden-pinned, so the whole-union check lives in the
    driver gate; this pins the two SQL-expressible new legs at the
    small scale too (incl. the ln-parity bigram LM)."""
    got = entrymod.queries()["q_corpus_prep"](SF).to_pandas()
    got = got[got["kind"].isin(["urldedup", "ppl"])]
    want = oracle_con.execute("""
        WITH toks AS (
            SELECT doc_id, list_prepend('<s>', list_filter(
                regexp_extract_all(lower(text), '[a-z0-9_''-]+'),
                x -> x <> '')) AS arr
            FROM documents),
        bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
               FROM toks, unnest(range(1, len(arr))) AS t(i)),
        dbg AS (SELECT doc_id, w1, w2, COUNT(*) AS n
                FROM bg GROUP BY doc_id, w1, w2),
        tbg AS (SELECT w1, w2, SUM(n) AS c12 FROM dbg
                WHERE doc_id < 50 GROUP BY w1, w2),
        ctx AS (SELECT w1, SUM(c12) AS c1 FROM tbg GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w2) AS vs FROM tbg),
        terms AS (
            SELECT dbg.doc_id, dbg.n,
                   CAST(FLOOR((ln(COALESCE(ctx.c1, 0) + vs)
                               - ln(COALESCE(tbg.c12, 0) + 1))
                              * 10000 + 0.5) AS BIGINT) AS term_c
            FROM dbg CROSS JOIN v
            LEFT JOIN tbg USING (w1, w2) LEFT JOIN ctx USING (w1)),
        nll AS (SELECT doc_id,
                       CAST((SUM(n * term_c) + SUM(n) // 2)
                            // SUM(n) AS BIGINT) AS nll_c
                FROM terms GROUP BY doc_id),
        th AS (SELECT
            MAX(CASE WHEN rn = (cnt + 2) // 3 THEN nll_c END) AS t33,
            MAX(CASE WHEN rn = (2*cnt + 2) // 3 THEN nll_c END) AS t67
            FROM (SELECT nll_c, ROW_NUMBER() OVER (ORDER BY nll_c) AS rn,
                         COUNT(*) OVER () AS cnt FROM nll))
        SELECT 'urldedup' AS kind, MAX(doc_id) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS val_i, canon AS val_s
        FROM (SELECT doc_id,
                     CASE WHEN doc_id % 5 = 4 THEN 'http' ELSE 'https'
                     END || '://site' || ((doc_id // 3) % 7)
                        || '.example.com/a/' || (doc_id // 3) AS canon
              FROM documents)
        GROUP BY canon
        UNION ALL
        SELECT 'ppl', n2.doc_id, n2.nll_c,
               CASE WHEN n2.nll_c <= th.t33 THEN 'head'
                    WHEN n2.nll_c <= th.t67 THEN 'middle'
                    ELSE 'tail' END
        FROM nll n2 CROSS JOIN th
    """).fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_core_numbers_matches_sequential_peel(ray_session):
    """Distributed h-index-fixpoint coreness equals an independent
    sequential Batagelj-Zaversnik peel on a random graph with a
    planted clique, self-loops and reversed duplicates mixed in — at
    two bucket layouts (integer values, so equality is exact)."""
    import random

    import ray

    from gfftoneo4j_ray.ops.graph_algos import core_numbers

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(40)]
    pairs = set()
    for _ in range(150):
        a, b = rng.sample(nodes, 2)
        pairs.add((a, b))
    clique = [f"c{i}" for i in range(6)]          # planted 6-clique
    for i in range(6):
        for j in range(i + 1, 6):
            pairs.add((clique[i], clique[j]))
    pairs.add((clique[0], nodes[0]))              # attach to the graph
    some = list(sorted(pairs))[:15]
    src = [a for a, b in pairs] + ["n00", "n07"] + [b for a, b in some]
    dst = [b for a, b in pairs] + ["n00", "n07"] + [a for a, b in some]

    # sequential peel (min-remaining-degree order; coreness = running
    # max of the removal degree — the degeneracy-ordering identity)
    adj: dict[str, set[str]] = {}
    for a, b in zip(src, dst):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    rem = {v: len(ns) for v, ns in adj.items()}
    core: dict[str, int] = {}
    peak = 0
    while rem:
        v = min(rem, key=lambda x: (rem[x], x))
        peak = max(peak, rem[v])
        core[v] = peak
        for u in adj[v]:
            if u in rem:
                rem[u] -= 1
        del rem[v]

    for buckets in (4, 16):
        got = core_numbers(
            ray.data.from_arrow(pa.table({"src": src, "dst": dst})),
            num_buckets=buckets).to_pandas()
        gm = dict(zip(got["node"], got["core"]))
        assert gm == core, buckets
    assert all(core[c] == 5 for c in clique)      # the planted 6-clique
