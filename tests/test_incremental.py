"""Incremental KG update (pipelines/incremental.py): a delta run over
a modified snapshot must equal a fresh full run on that snapshot —
same node/edge tables — while reusing the expensive stages for
unchanged pages."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _graph_frames(res):
    n = pq.read_table(res["nodes_dir"]).to_pandas() \
        .sort_values(["node_id"]).reset_index(drop=True)
    e = pq.read_table(res["edges_dir"]).to_pandas() \
        .sort_values(["src", "type", "dst", "pred"]).reset_index(drop=True)
    return n, e


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory):
    """Snapshot A = pages 0..359; snapshot B = pages 0..399 with 20
    urls' content swapped (changed) and 12 urls dropped (removed);
    pages 360..399 are new. The generator is deterministic per page
    index, so A and B share their unchanged pages byte-for-byte."""
    from gfftoneo4j_ray.gen.pages import write_corpus

    base = tmp_path_factory.mktemp("incr")
    a_dir = write_corpus(str(base / "A"), n=360, shard_rows=90)
    b_src = write_corpus(str(base / "B_src"), n=400, shard_rows=100)

    t = pq.read_table(f"{b_src}/pages")
    df = t.to_pandas()
    # swap content between url pairs (urls keep their identity but the
    # html/text change) — 20 changed pages
    for i in range(0, 40, 4):
        j = i + 2
        for col in ("html", "text"):
            df.loc[i, col], df.loc[j, col] = df.loc[j, col], df.loc[i, col]
    # drop 12 urls entirely
    df = df.drop(index=range(100, 112)).reset_index(drop=True)
    import pyarrow as pa

    b_dir = base / "B"
    (b_dir / "pages").mkdir(parents=True)
    pq.write_table(pa.Table.from_pandas(df, schema=t.schema,
                                        preserve_index=False),
                   str(b_dir / "pages" / "part-0.parquet"))
    import shutil

    shutil.copy(f"{a_dir}/dictionary.parquet",
                str(b_dir / "dictionary.parquet"))
    return a_dir, str(b_dir)


def test_incremental_equals_fresh_full_run(ray_session, snapshots,
                                           tmp_path):
    from gfftoneo4j_ray.pipelines import kg
    from gfftoneo4j_ray.pipelines.incremental import run_incremental

    a_dir, b_dir = snapshots
    prev = kg.run(f"{a_dir}/pages", f"{a_dir}/dictionary.parquet",
                  str(tmp_path / "outA"), checkpointed=True)
    fresh = kg.run(f"{b_dir}/pages", f"{b_dir}/dictionary.parquet",
                   str(tmp_path / "outB_full"), checkpointed=True)
    inc = run_incremental(str(tmp_path / "outA"), f"{b_dir}/pages",
                          f"{b_dir}/dictionary.parquet",
                          str(tmp_path / "outB_inc"))

    # the reuse math: B has 388 pages; 360-12=348 urls survive from A,
    # of which 20-per-construction changed CONTENT — but only those
    # with index < 348 after the drop remain; compute from counters
    assert inc["n_changed"] + inc["n_reused"] == 388
    assert inc["n_reused"] >= 300, inc  # the overwhelming majority
    assert inc["n_changed"] <= 88, inc

    fn, fe = _graph_frames(fresh)
    inn, ine = _graph_frames(inc)
    pd.testing.assert_frame_equal(fn, inn)
    pd.testing.assert_frame_equal(fe, ine)
    assert inc["n_canonical_entities"] == fresh["n_canonical_entities"]


def test_incremental_noop_when_unchanged(ray_session, snapshots,
                                         tmp_path):
    """Same snapshot twice: everything reuses, nothing re-extracts,
    and the graph is unchanged."""
    from gfftoneo4j_ray.pipelines import kg
    from gfftoneo4j_ray.pipelines.incremental import run_incremental
    from gfftoneo4j_ray.state.checkpoint import CheckpointedRun

    a_dir, _ = snapshots
    prev = kg.run(f"{a_dir}/pages", f"{a_dir}/dictionary.parquet",
                  str(tmp_path / "outA"), checkpointed=True)
    inc = run_incremental(str(tmp_path / "outA"), f"{a_dir}/pages",
                          f"{a_dir}/dictionary.parquet",
                          str(tmp_path / "outA2"))
    assert inc["n_changed"] == 0
    assert inc["n_reused"] == 360
    m = CheckpointedRun(str(tmp_path / "outA2")).manifest("triples")
    assert m["counters"] == {"reused_urls": 360, "fresh_urls": 0}
    pn, pe = _graph_frames(prev)
    inn, ine = _graph_frames(inc)
    pd.testing.assert_frame_equal(pn, inn)
    pd.testing.assert_frame_equal(pe, ine)


def test_incremental_duplicate_urls_stay_consistent(ray_session,
                                                    tmp_path):
    """A url that appears in SEVERAL page rows must never be classified
    both changed and unchanged (the reused-plus-fresh double count):
    per-url aggregation before the diff classifies any multi-row url as
    changed, and the incremental graph still equals a fresh full run.
    Covers both shapes: a url duplicated with one row matching prev and
    one not, and a url duplicated identically in both snapshots."""
    import pyarrow as pa

    from gfftoneo4j_ray.gen.pages import write_corpus
    from gfftoneo4j_ray.pipelines import kg
    from gfftoneo4j_ray.pipelines.incremental import run_incremental

    src = write_corpus(str(tmp_path / "src"), n=40, shard_rows=40)
    t = pq.read_table(f"{src}/pages")
    df = t.to_pandas()

    def _write(frame, name):
        d = tmp_path / name / "pages"
        d.mkdir(parents=True)
        pq.write_table(pa.Table.from_pandas(frame, schema=t.schema,
                                            preserve_index=False),
                       str(d / "part-0.parquet"))
        return str(tmp_path / name / "pages")

    # snapshot A: url_5 appears twice with identical content
    dup5 = df.iloc[[5]].copy()
    a_df = pd.concat([df, dup5], ignore_index=True)
    a_pages = _write(a_df, "A")
    # snapshot B: url_5 still duplicated identically; url_3 now appears
    # twice — one row byte-identical to A's, one with changed html/text
    dup3 = df.iloc[[3]].copy()
    for col in ("html", "text"):
        dup3[col] = df.loc[7, col]
    b_df = pd.concat([df, dup5, dup3], ignore_index=True)
    b_pages = _write(b_df, "B")

    dict_path = f"{src}/dictionary.parquet"
    kg.run(a_pages, dict_path, str(tmp_path / "outA"), checkpointed=True)
    fresh = kg.run(b_pages, dict_path, str(tmp_path / "outB_full"),
                   checkpointed=True)
    inc = run_incremental(str(tmp_path / "outA"), b_pages, dict_path,
                          str(tmp_path / "outB_inc"))

    # counters are per URL: url_3 (mixed rows) and url_5 (multi-row on
    # both sides) are conservatively changed; the other 38 reuse
    assert inc["n_changed"] == 2, inc
    assert inc["n_reused"] == 38, inc
    fn, fe = _graph_frames(fresh)
    inn, ine = _graph_frames(inc)
    pd.testing.assert_frame_equal(fn, inn)
    pd.testing.assert_frame_equal(fe, ine)


def test_incremental_requires_checkpointed_prev(ray_session, snapshots,
                                                tmp_path):
    from gfftoneo4j_ray.pipelines.incremental import run_incremental

    a_dir, _ = snapshots
    with pytest.raises(ValueError, match="no committed"):
        run_incremental(str(tmp_path / "nowhere"), f"{a_dir}/pages",
                        f"{a_dir}/dictionary.parquet",
                        str(tmp_path / "out"))


def test_rolling_crawl_dedup_then_incremental(ray_session, tmp_path):
    """The rolling-crawl composition a production user runs: each new
    dump is first deduped against the running cross-snapshot content
    registry (snapshot_hashes / dedup_against_snapshot, chained by
    union), the surviving novel pages are appended to the corpus, and
    run_incremental applies the grown corpus reusing all committed
    model stages. The final KG must equal a fresh full build over the
    deduped union — including mirrors of an EARLIER dump's novel
    content (registry chaining), which must never reach the graph."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from gfftoneo4j_ray.gen.pages import (PAGES_SCHEMA, gen_pages,
                                          write_corpus)
    from gfftoneo4j_ray.pipelines import kg
    from gfftoneo4j_ray.pipelines.incremental import run_incremental
    from gfftoneo4j_ray.stages import dedup

    def mirror(src_tbl, rows, tag):
        """Re-publish src rows' content under new urls (exact dups)."""
        df = src_tbl.to_pandas().iloc[list(rows)].copy()
        df["url"] = [f"https://mirror.example/{tag}/{k}"
                     for k in range(len(df))]
        return pa.Table.from_pandas(df, schema=PAGES_SCHEMA,
                                    preserve_index=False)

    def rechurn(src_tbl, url_row, content_row_tbl):
        """Re-crawl where one url carries NOVEL content (donor page):
        returns src with that row's html/text REPLACED — one capture
        per url per dump, the crawl-dump shape dedup_against_snapshot
        assumes."""
        df = src_tbl.to_pandas().copy()
        donor = content_row_tbl.to_pandas().iloc[0]
        df.loc[url_row, "html"] = donor["html"]
        df.loc[url_row, "text"] = donor["text"]
        return pa.Table.from_pandas(df, schema=PAGES_SCHEMA,
                                    preserve_index=False)

    def write_pages(tbl, name):
        d = tmp_path / name / "pages"
        d.mkdir(parents=True)
        pq.write_table(tbl, str(d / "part-0.parquet"))
        return str(d)

    def ingest(dump_tbl, registry_ds, name):
        """dedup-across-dumps: dump → kept novel pages (+ registry)."""
        dump_path = write_pages(dump_tbl, f"dump_{name}")
        ds = ray.data.read_parquet(dump_path)
        kept = dedup.dedup_against_snapshot(ds, registry_ds,
                                            text_col="text",
                                            id_col="url")
        kept_dir = tmp_path / f"kept_{name}"
        kept.write_parquet(str(kept_dir))
        kept_tbl = pq.read_table(str(kept_dir)) \
            .select(PAGES_SCHEMA.names).cast(PAGES_SCHEMA)
        new_reg = registry_ds.union(
            dedup.snapshot_hashes(
                ray.data.read_parquet(str(kept_dir)), text_col="text",
                id_col="url"))
        return kept_tbl, new_reg

    # ---- dump 1 = corpus 1 (bootstrap) ------------------------------
    c1_dir = write_corpus(str(tmp_path / "c1"), n=120, shard_rows=60)
    dict_path = f"{c1_dir}/dictionary.parquet"
    p1 = pq.read_table(f"{c1_dir}/pages")
    reg1 = dedup.snapshot_hashes(
        ray.data.read_parquet(f"{c1_dir}/pages"), text_col="text",
        id_col="url")
    out1 = kg.run(f"{c1_dir}/pages", dict_path, str(tmp_path / "out1"),
                  checkpointed=True)

    donors, _ = gen_pages(4, start=900)  # novel content for churn
    # ---- dump 2: full re-crawl + 12 new + 1 churned + 3 mirrors -----
    p2_new, _ = gen_pages(12, start=120)
    dump2 = pa.concat_tables([
        rechurn(p1, 3, donors.slice(0, 1)),   # re-crawl; url_3 churned
        p2_new,                               # novel urls
        mirror(p1, [10, 11, 12], "d2"),       # dump-1 content, new urls
    ])
    kept2, reg2 = ingest(dump2, reg1, "2")
    # the 120 re-crawls and 3 mirrors are dropped; 12+1 novel survive
    assert kept2.num_rows == 13, kept2.num_rows
    corpus2 = pa.concat_tables([p1, kept2])
    c2_pages = write_pages(corpus2, "c2")
    inc2 = run_incremental(str(tmp_path / "out1"), c2_pages, dict_path,
                           str(tmp_path / "out2"))
    assert inc2["n_reused"] >= 119 and inc2["n_changed"] <= 15, inc2

    # ---- dump 3: re-crawl ∪ mirrors of DUMP-2 novel content ---------
    p3_new, _ = gen_pages(6, start=140)
    dump3 = pa.concat_tables([
        rechurn(corpus2, 5, donors.slice(1, 1)),  # re-crawl; url_5 churned
        p3_new,                               # novel urls
        mirror(p2_new, [0, 1], "d3"),         # DUMP-2 content: registry
        mirror(p1, [20], "d3b"),              # chaining must drop both
    ])
    kept3, _ = ingest(dump3, reg2, "3")
    assert kept3.num_rows == 7, kept3.num_rows  # 6 new + 1 churn
    corpus3 = pa.concat_tables([corpus2, kept3])
    c3_pages = write_pages(corpus3, "c3")
    inc3 = run_incremental(str(tmp_path / "out2"), c3_pages, dict_path,
                           str(tmp_path / "out3"))

    # ---- invariants --------------------------------------------------
    assert not any(u.startswith("https://mirror.example/")
                   for u in corpus3["url"].to_pylist())
    fresh = kg.run(c3_pages, dict_path, str(tmp_path / "out_fresh"),
                   checkpointed=True)
    fn, fe = _graph_frames(fresh)
    inn, ine = _graph_frames(inc3)
    pd.testing.assert_frame_equal(fn, inn)
    pd.testing.assert_frame_equal(fe, ine)
