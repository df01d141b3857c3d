"""Output determinism across partition counts and pool sizes
(SURVEY.md §7.5: content-derived IDs + explicit sorts ⇒ identical
output regardless of physical execution)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from gfftoneo4j_ray.pipelines import kg


def _run(corpus, out, blocks, pool):
    cfg = kg.KgConfig(override_num_blocks=blocks,
                      triples_concurrency=pool,
                      link_concurrency=pool,
                      canon_concurrency=pool)
    return kg.run(f"{corpus}/pages", f"{corpus}/dictionary.parquet",
                  str(out), cfg=cfg, checkpointed=False)


def test_output_invariant_to_partitioning(ray_session, tiny_corpus, tmp_path):
    r1 = _run(tiny_corpus, tmp_path / "a", blocks=3, pool=1)
    r2 = _run(tiny_corpus, tmp_path / "b", blocks=17, pool=(1, 3))
    for key in ("nodes_dir", "edges_dir"):
        t1 = pq.read_table(r1[key]).to_pandas()
        t2 = pq.read_table(r2[key]).to_pandas()
        pd.testing.assert_frame_equal(t1, t2)
