"""The driver contract: entry(), queries(), oracle_sql() — run a
representative oracle subset at sf0.001 exactly the way the driver
does (sorted columns, order-insensitive value compare via DuckDB)."""

from __future__ import annotations

import duckdb
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


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


ORACLE_SUBSET = ["q_lineitem_agg", "q_group_consistency", "q_adjacent_pairs",
                 "q_dedup_exact", "q_quality_filter",
                 "q_window_agg", "q_join_enrich", "q_range_join"]


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_query_matches_oracle(entrymod, oracle_con, name):
    got = _norm(_to_df(entrymod.queries()[name](SF)))
    want = _norm(oracle_con.execute(entrymod.oracle_sql()[name]).fetchdf())
    pd.testing.assert_frame_equal(got, want)


def test_every_oracle_key_has_query(entrymod):
    qs = entrymod.queries()
    for k in entrymod.oracle_sql():
        assert k in qs, k


def test_entry_runs_and_returns_rows(entrymod):
    res = entrymod.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    assert n > 0


def test_rows_only_queries_return_rows(entrymod):
    qs = entrymod.queries()
    # q_ann / q_neardup / q_semdedup carry sf0.01-pinned golden legs in
    # their union oracles, so at sf0.001 they are rows-only here; their
    # full value checks run at sf0.01 (tools/oracle_gate.py + driver)
    # and their kernels are value-tested in test_similarity /
    # test_dedup / test_semdedup.
    for name in ["q_doc_signatures", "kg_triples", "mm_features",
                 "q_ann", "q_neardup", "q_corpus_prep"]:
        df = _to_df(qs[name](SF))
        assert len(df) > 0, name

def test_dictionary_prep_crash_is_atomic(entrymod, monkeypatch):
    """Kill the dictionary write mid-stream (simulated crash between
    serialize and rename): no half-written dictionary.parquet may be
    left behind, and the next _ensure_kg_run must recover to a green
    kg_nodes (r3 verdict item 5)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    out = entrymod._kg_out_dir(SF)
    shutil.rmtree(out, ignore_errors=True)

    real_write = pq.write_table

    def boom(table, where, *a, **k):
        real_write(table, where, *a, **k)
        with open(where, "r+b") as f:          # truncate = torn write
            f.truncate(os.path.getsize(where) // 2)
        raise RuntimeError("simulated crash mid-write")

    monkeypatch.setattr(pq, "write_table", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        entrymod._ensure_kg_run(SF)
    monkeypatch.setattr(pq, "write_table", real_write)

    # the torn file must be the .tmp, never the live path
    assert not os.path.exists(os.path.join(out, "dictionary.parquet"))

    res = entrymod._ensure_kg_run(SF)
    import ray

    assert ray.data.read_parquet(res["nodes_dir"]).count() > 0
