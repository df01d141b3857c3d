"""Distributed pipeline == sequential reference engine.

compat/seqref.py replays the reference's single-process execution
model (Application.scala:30-40) over the same per-record kernels; the
distributed pipeline — with all its shuffles, bucketed dedup
aggregates, cross-partition canonical merges and mention counting —
must reproduce it exactly. This is the strongest end-to-end assembly
oracle in the suite (and the generator of the sf0.01 kg goldens the
driver's DuckDB oracle reads — tools/make_goldens.py)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from gfftoneo4j_ray.compat.seqref import sequential_kg_build
from gfftoneo4j_ray.pipelines import kg


@pytest.fixture(scope="module")
def seq_vs_dist(ray_session, small_corpus, tmp_path_factory):
    import ray

    out = str(tmp_path_factory.mktemp("seqref-out"))
    res = kg.run(f"{small_corpus}/pages",
                 f"{small_corpus}/dictionary.parquet", out,
                 checkpointed=False, resume=False)
    nodes = pq.read_table(res["nodes_dir"]).to_pandas()
    edges = pq.read_table(res["edges_dir"]).to_pandas()
    pages = ray.data.read_parquet(
        f"{small_corpus}/pages",
        columns=["url", "warc_ts", "html", "lang"]).to_pandas() \
        .to_dict("records")
    import pyarrow.parquet as _pq

    dict_table = _pq.read_table(f"{small_corpus}/dictionary.parquet")
    gnodes, gedges = sequential_kg_build(pages, dict_table)
    return nodes, edges, gnodes.to_pandas(), gedges.to_pandas()


def _norm(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_nodes_match(seq_vs_dist):
    nodes, _, gnodes, _ = seq_vs_dist
    cols = ["node_id", "label", "key", "entity_type", "n_mentions"]
    pd.testing.assert_frame_equal(_norm(nodes, cols), _norm(gnodes, cols))


def test_surface_forms_match(seq_vs_dist):
    nodes, _, gnodes, _ = seq_vs_dist

    def forms(df):
        ent = df[df.label == "entity"].set_index("node_id")
        return ent["surface_forms"].map(
            lambda v: tuple(v) if v is not None else None).sort_index()

    pd.testing.assert_series_equal(forms(nodes), forms(gnodes))


def test_edges_match(seq_vs_dist):
    _, edges, _, gedges = seq_vs_dist
    cols = ["src", "dst", "type", "pred", "weight"]
    pd.testing.assert_frame_equal(_norm(edges, cols), _norm(gedges, cols))
