"""Entity linking: dictionary candidates + deterministic rerank.

Reference anchors: ID-index lookup GeneReader.scala:159-163 (T2),
ParentInfoNotFound handling :31-37 (NIL path)."""

from __future__ import annotations

import pyarrow as pa

from gfftoneo4j_ray.gen.pages import dictionary_table
from gfftoneo4j_ray.stages.linker import EntityLinker, build_alias_index


def _batch(subj, obj, sent):
    return pa.table({
        "url": ["u"], "sent_idx": pa.array([0], pa.int32()),
        "subj": [subj], "pred": ["founded"], "obj": [obj], "sent": [sent],
    })


def test_unambiguous_alias_links():
    lk = EntityLinker(dict_table=dictionary_table())
    out = lk(_batch("ada lovelace", "acme corp", "Ada Lovelace founded Acme Corp."))
    assert out.column("subj_key").to_pylist() == ["Ada Lovelace"]
    assert out.column("subj_type").to_pylist() == ["person"]
    assert out.column("obj_key").to_pylist() == ["Acme Corp"]
    assert out.column("subj_resolved").to_pylist() == [True]


def test_misspelling_and_initial_alias():
    lk = EntityLinker(dict_table=dictionary_table())
    out = lk(_batch("a lovelace", "ace corp", "A Lovelace founded Ace Corp."))
    assert out.column("subj_key").to_pylist() == ["Ada Lovelace"]
    assert out.column("obj_key").to_pylist() == ["Acme Corp"]  # 'Ace' = misspelled Acme


def test_nil_mention_kept_not_dropped():
    lk = EntityLinker(dict_table=dictionary_table())
    out = lk(_batch("zorblax the unknown", "acme corp", "Zorblax founded Acme Corp."))
    assert out.column("subj_resolved").to_pylist() == [False]
    assert out.column("subj_key").to_pylist() == ["zorblax the unknown"]
    assert out.column("subj_type").to_pylist() == [None]


def test_ambiguous_alias_deterministic():
    """An alias with >1 candidates must resolve deterministically
    (rerank score, ties → lexicographic-min entity_key)."""
    dt = pa.table({
        "alias": ["smith", "smith"],
        "entity_key": ["Bob Smith", "Alice Smith"],
        "entity_type": ["person", "person"],
        "prior": [0.5, 0.5],
    })
    lk = EntityLinker(dict_table=dt)
    out1 = lk(_batch("smith", "smith", "Smith met Smith."))
    out2 = lk(_batch("smith", "smith", "Smith met Smith."))
    assert out1.column("subj_key").to_pylist() == out2.column("subj_key").to_pylist()
    # identical context + equal priors → lexicographic-min wins
    assert out1.column("subj_key").to_pylist() == ["Alice Smith"]


def test_index_candidates_sorted():
    idx = build_alias_index(dictionary_table())
    assert "ada lovelace" in idx
    for cands in idx.values():
        keys = [c[0] for c in cands]
        assert keys == sorted(keys)
