"""Session-scoped Ray for all tests (one init per pytest session)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    import gfftoneo4j_ray

    gfftoneo4j_ray.quiet_empty_schema_warnings()
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic ~80-page corpus (includes all edge-case indices ≤ 210)."""
    from gfftoneo4j_ray.gen.pages import write_corpus

    d = tmp_path_factory.mktemp("corpus-tiny")
    return write_corpus(str(d), n=240, shard_rows=60)


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """~1.2k-page corpus for correctness / P-R / determinism tests."""
    from gfftoneo4j_ray.gen.pages import write_corpus

    d = tmp_path_factory.mktemp("corpus-small")
    return write_corpus(str(d), n=1200, shard_rows=150)
