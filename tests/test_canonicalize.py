"""Canonicalization: union-find merge semantics, salted aggregation,
cross-partition transitive merges (SURVEY.md §4.3, §7.5).

Reference anchors: recursive parent chase GeneReader.scala:165-178 (T3),
groupByParents G2-G5, monoid combine :44-45."""

from __future__ import annotations

import pyarrow as pa

from gfftoneo4j_ray.state.unionfind import UnionFind
from gfftoneo4j_ray.stages import canonicalize


def test_unionfind_deterministic_min_root():
    uf = UnionFind()
    uf.union("c", "b")
    uf.union("a", "b")
    assert uf.find("c") == "a"
    uf2 = UnionFind()  # different insertion order, same result
    uf2.union("a", "b")
    uf2.union("c", "b")
    assert {uf.find(x) for x in "abc"} == {uf2.find(x) for x in "abc"} == {"a"}


def _linked_table(rows):
    """rows: (surface_s, key_s, res_s, surface_o, key_o, res_o)"""
    return pa.table({
        "url": ["u"] * len(rows),
        "sent_idx": pa.array(range(len(rows)), pa.int32()),
        "subj": [r[0] for r in rows], "pred": ["founded"] * len(rows),
        "obj": [r[3] for r in rows],
        "subj_key": [r[1] for r in rows],
        "subj_type": ["person"] * len(rows),
        "subj_resolved": [r[2] for r in rows],
        "obj_key": [r[4] for r in rows],
        "obj_type": ["org"] * len(rows),
        "obj_resolved": [r[5] for r in rows],
    })


def test_cross_partition_transitive_merge(ray_session):
    """Aliases that only co-occur pairwise in DIFFERENT partitions must
    still merge: A~E1 in block 1, B~E1 in block 2, B~E2 in block 3 ⇒
    A, B, E1, E2 one component."""
    import ray

    t1 = _linked_table([("alias a", "E1", True, "x corp", "X Corp", True)])
    t2 = _linked_table([("alias b", "E1", True, "x corp", "X Corp", True)])
    t3 = _linked_table([("alias b", "E2", True, "x corp", "X Corp", True)])
    ds = ray.data.from_arrow([t1, t2, t3])  # three separate blocks
    mapping = canonicalize.build_canonical_mapping(ds)
    assert mapping["alias a"][0] == mapping["alias b"][0] == "E1"  # min key
    assert mapping["alias a"][1] == mapping["E2"][1]
    assert mapping["x corp"][0] == "X Corp"


def test_nil_not_in_mapping_and_self_canonical(ray_session):
    import ray

    t = _linked_table([("unknown thing", "unknown thing", False,
                        "x corp", "X Corp", True)])
    ds = ray.data.from_arrow(t)
    mapping = canonicalize.build_canonical_mapping(ds)
    assert "unknown thing" not in mapping
    canon = canonicalize.apply(ds, mapping, concurrency=1).to_pandas()
    assert canon["subj_canon"].iloc[0] == "unknown thing"
    from gfftoneo4j_ray.functions.hashing import entity_node_id
    assert canon["subj_node_id"].iloc[0] == entity_node_id("unknown thing")


def test_salted_equals_unsalted(ray_session):
    """Skew handling correctness: salted two-phase == plain groupby
    (count merge is associative — the monoid argument)."""
    import ray

    t = pa.table({"k": ["hot"] * 500 + ["a", "b"] * 10 + ["c"]})
    ds = ray.data.from_arrow(t).repartition(8)
    plain = canonicalize.aggregate_counts(ds, "k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    salted = canonicalize.aggregate_counts(ds, "k", salt_buckets=16).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    plain.columns = ["k", "n"]
    salted.columns = ["k", "n"]
    assert plain.astype({"n": "int64"}).equals(salted.astype({"n": "int64"}))
    assert int(plain.set_index("k").loc["hot", "n"]) == 500


def test_mapping_independent_of_partitioning(ray_session, tiny_corpus):
    import ray

    from gfftoneo4j_ray.gen.pages import dictionary_table
    from gfftoneo4j_ray.stages import extract_text, linker, triples

    pages = ray.data.read_parquet(f"{tiny_corpus}/pages")
    clean, _ = extract_text.split_quarantine(extract_text.apply(pages))
    tds = triples.apply(clean, concurrency=(1, 2))
    linked = linker.apply(tds, dict_table=dictionary_table(), concurrency=(1, 2))
    linked = linked.materialize()
    m1 = canonicalize.build_canonical_mapping(linked.repartition(2))
    m2 = canonicalize.build_canonical_mapping(linked.repartition(13))
    assert m1 == m2
