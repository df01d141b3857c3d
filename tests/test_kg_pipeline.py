"""End-to-end KG pipeline: assembly correctness, resume, determinism.

Reference anchors: the full importGffFile spine Application.scala:30-40;
assembly fixture GeneReaderSpec.scala:7-49 (here NOT pending);
edge dedup Neo4JUtils.scala:43; order chain GenesToNeo4j.scala:20-25."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from gfftoneo4j_ray.pipelines import kg


@pytest.fixture(scope="module")
def kg_run(ray_session, small_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg-out"))
    res = kg.run(f"{small_corpus}/pages", f"{small_corpus}/dictionary.parquet",
                 out, checkpointed=True)
    return res


def _read(dirpath):
    return pq.read_table(dirpath).to_pandas()


def test_all_edge_types_present(kg_run):
    edges = _read(kg_run["edges_dir"])
    assert set(edges["type"].unique()) == {"asserts", "mentions", "alias_of", "order"}


def test_entity_assembly_counts(kg_run, small_corpus):
    """The two-entity-assembly analogue: canonical entities == the
    dictionary entity universe actually mentioned; all alias spellings
    merged (no duplicate canonical keys)."""
    nodes = _read(kg_run["nodes_dir"])
    ents = nodes[nodes.label == "entity"]
    assert ents["node_id"].is_unique and ents["key"].is_unique
    # misspellings/initials must NOT survive as separate entities
    from gfftoneo4j_ray.gen.pages import entity_pool
    keys = set(ents["key"])
    canonical = {e.key for e in entity_pool()}
    non_canonical_aliases = {a for e in entity_pool() for a in e.aliases
                             if a not in canonical}
    assert "Ada Lovelace" in keys
    assert not (keys & non_canonical_aliases)
    # every resolved entity's surface_forms contain ≥2 spellings for
    # multi-alias entities
    ada = ents[ents.key == "Ada Lovelace"].iloc[0]
    assert len(ada["surface_forms"]) >= 2
    assert ada["entity_type"] == "person"
    assert ada["n_mentions"] > 0


def test_edges_exact_dedup_and_sorted(kg_run):
    edges = _read(kg_run["edges_dir"])
    key = edges[["src", "dst", "type", "pred"]].apply(tuple, axis=1)
    assert key.is_unique  # CREATE UNIQUE analogue
    assert (edges["weight"] >= 1).all()
    srt = edges.sort_values(["src", "type", "dst"]).reset_index(drop=True)
    assert (edges.reset_index(drop=True)[["src", "type", "dst"]]
            .equals(srt[["src", "type", "dst"]]))


def test_nodes_sorted_unique(kg_run):
    nodes = _read(kg_run["nodes_dir"])
    assert nodes["node_id"].is_monotonic_increasing
    assert nodes["node_id"].is_unique


def test_order_edges_chain(kg_run, small_corpus):
    """Hosts with k pages contribute exactly k-1 order edges (O1/O2)."""
    pages = pq.read_table(f"{small_corpus}/pages", columns=["url"]).to_pandas()
    quar = json.load(open(os.path.join(kg_run["out_root"], "_lineage",
                                       "text_quarantine.json")))
    pages = pages[~pages["url"].isin({q["url"] for q in quar})]
    hosts = pages["url"].str.extract(r"https://([^/]+)/")[0]
    sizes = hosts.value_counts()
    want = int((sizes - 1).clip(lower=0).sum())
    edges = _read(kg_run["edges_dir"])
    assert len(edges[edges.type == "order"]) == want


def test_asserts_match_expected_triples(kg_run, small_corpus):
    """Weighted asserts == golden triples rolled up through the
    dictionary's canonical keys (full-fidelity assembly check)."""
    from gfftoneo4j_ray.functions.hashing import entity_node_id
    from gfftoneo4j_ray.gen.pages import dictionary_table

    want = pq.read_table(f"{small_corpus}/triples_expected.parquet").to_pandas()
    d = dictionary_table().to_pandas()
    alias_to_key = dict(zip(d["alias"], d["entity_key"]))
    want["src"] = want["subj"].map(lambda s: entity_node_id(alias_to_key.get(s, s)))
    want["dst"] = want["obj"].map(lambda s: entity_node_id(alias_to_key.get(s, s)))
    grouped = want.groupby(["src", "dst", "pred"]).size().reset_index(name="weight")

    edges = _read(kg_run["edges_dir"])
    got = edges[edges.type == "asserts"][["src", "dst", "pred", "weight"]]
    merged = grouped.merge(got, on=["src", "dst", "pred"], how="outer",
                           suffixes=("_want", "_got"), indicator=True)
    assert (merged["_merge"] == "both").all()
    assert (merged["weight_want"] == merged["weight_got"]).all()


def test_lineage_manifests(kg_run):
    root = kg_run["out_root"]
    for stage in ["text", "triples", "linked", "canonical", "nodes", "edges"]:
        with open(os.path.join(root, stage, "_SUCCESS.json")) as f:
            m = json.load(f)
        assert m["rows"] >= 0 and len(m["partitions"]) >= 1
        for p in m["partitions"]:
            assert p["rows"] >= 0 and p["bytes"] > 0
    quar = json.load(open(os.path.join(root, "_lineage", "text_quarantine.json")))
    assert all("quarantine_reason" in q for q in quar)
    assert len(quar) >= 1  # the i%211 invalid-utf8 pages


def test_resume_skips_and_matches(kg_run, small_corpus, tmp_path_factory):
    """Resume-equals-fresh: delete the final stages, rerun with
    resume=True → byte-identical node/edge tables, earlier stages
    untouched (mtime unchanged)."""
    root = kg_run["out_root"]
    nodes_before = _read(kg_run["nodes_dir"])
    edges_before = _read(kg_run["edges_dir"])
    text_mtime = os.path.getmtime(os.path.join(root, "text", "_SUCCESS.json"))
    shutil.rmtree(os.path.join(root, "nodes"))
    shutil.rmtree(os.path.join(root, "edges"))
    res2 = kg.run(f"{small_corpus}/pages", f"{small_corpus}/dictionary.parquet",
                  root, checkpointed=True, resume=True)
    assert os.path.getmtime(os.path.join(root, "text", "_SUCCESS.json")) == text_mtime
    pd.testing.assert_frame_equal(_read(res2["nodes_dir"]), nodes_before)
    pd.testing.assert_frame_equal(_read(res2["edges_dir"]), edges_before)


def test_streaming_equals_checkpointed(kg_run, small_corpus, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("kg-stream"))
    res2 = kg.run(f"{small_corpus}/pages", f"{small_corpus}/dictionary.parquet",
                  out2, checkpointed=False)
    pd.testing.assert_frame_equal(_read(res2["nodes_dir"]), _read(kg_run["nodes_dir"]))
    pd.testing.assert_frame_equal(_read(res2["edges_dir"]), _read(kg_run["edges_dir"]))


def test_empty_input_produces_empty_graph(ray_session, tmp_path):
    """Zero pages → schema-correct empty node/edge tables, no crash."""
    import pyarrow.parquet as pq2

    from gfftoneo4j_ray.gen.pages import PAGES_SCHEMA, dictionary_table

    d = tmp_path / "pages"
    os.makedirs(d)
    pq2.write_table(PAGES_SCHEMA.empty_table(), str(d / "part-0.parquet"))
    dict_p = str(tmp_path / "dict.parquet")
    pq2.write_table(dictionary_table(), dict_p)
    for mode in (True, False):
        res = kg.run(str(d), dict_p, str(tmp_path / f"out{mode}"),
                     checkpointed=mode, resume=False)
        nodes = pq2.read_table(res["nodes_dir"])
        edges = pq2.read_table(res["edges_dir"])
        assert nodes.num_rows == 0 and edges.num_rows == 0
        assert "node_id" in nodes.schema.names
        assert "src" in edges.schema.names


def test_empty_input_clears_stale_output(ray_session, small_corpus, tmp_path):
    """A prior non-empty run's outputs must not leak through an
    empty-input rerun into the same out_root."""
    import pyarrow.parquet as pq2

    from gfftoneo4j_ray.gen.pages import PAGES_SCHEMA

    out = str(tmp_path / "out")
    kg.run(f"{small_corpus}/pages", f"{small_corpus}/dictionary.parquet",
           out, checkpointed=True)
    assert pq2.read_table(os.path.join(out, "nodes")).num_rows > 0
    d = tmp_path / "empty_pages"
    os.makedirs(d)
    pq2.write_table(PAGES_SCHEMA.empty_table(), str(d / "part-0.parquet"))
    res = kg.run(str(d), f"{small_corpus}/dictionary.parquet", out,
                 checkpointed=True, resume=True)
    assert pq2.read_table(res["nodes_dir"]).num_rows == 0
    assert pq2.read_table(res["edges_dir"]).num_rows == 0
    # the commit contract holds on the empty path too
    assert os.path.exists(os.path.join(out, "nodes", "_SUCCESS.json"))
