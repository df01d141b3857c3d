"""Job-submission smoke: the north rule's run mode (`ray job submit`).

The container lacks aiohttp, so Ray's HTTP job server (and therefore a
literal `ray job submit`) cannot start here. What the job server does
after upload is exec the entrypoint as a fresh driver process with
RAY_ADDRESS pointing at the running cluster — this test drives exactly
that contract: the CLI module launched in a clean subprocess, connecting
to the pytest session's already-running cluster via RAY_ADDRESS, running
the sf0.001-scale pipeline end-to-end and writing the graph tables.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_job_submit_smoke(ray_session, tiny_corpus, tmp_path):
    gcs = ray_session.get_runtime_context().gcs_address
    assert gcs, "session cluster must expose a GCS address"
    out = tmp_path / "job_out"
    env = {**os.environ, "RAY_ADDRESS": gcs,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    cmd = [sys.executable, "-m", "gfftoneo4j_ray.pipelines.cli",
           "--input", os.path.join(tiny_corpus, "pages"),
           "--output", str(out), "--profile", "webtext", "--streaming"]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=600, cwd=REPO)
    assert r.returncode == 0, f"stderr tail: {r.stderr[-3000:]}"
    res = json.loads(r.stdout.strip().splitlines()[-1])

    import pyarrow.dataset as pads

    nodes = pads.dataset(res["nodes_dir"], format="parquet")
    edges = pads.dataset(res["edges_dir"], format="parquet")
    assert nodes.count_rows() > 0 and edges.count_rows() > 0
    assert {"node_id", "label", "key"} <= set(nodes.schema.names)
    assert {"src", "dst", "type", "pred"} <= set(edges.schema.names)
    # the fresh driver must have JOINED the session cluster, not booted
    # a private one (the job-submit contract under test): the CLI
    # reports the GCS address it actually connected to
    assert res["ray_address"] == gcs, \
        f"driver booted its own cluster ({res['ray_address']} != {gcs})"


def test_cli_incremental_update(ray_session, tiny_corpus, tmp_path):
    """--incremental-from PREV updates a prior checkpointed CLI run:
    same snapshot → 100% reuse and counters in the result JSON."""
    gcs = ray_session.get_runtime_context().gcs_address
    env = {**os.environ, "RAY_ADDRESS": gcs,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    base = [sys.executable, "-m", "gfftoneo4j_ray.pipelines.cli",
            "--input", os.path.join(tiny_corpus, "pages"),
            "--dictionary", os.path.join(tiny_corpus, "dictionary.parquet"),
            "--profile", "webtext"]
    prev = tmp_path / "prev"
    r = subprocess.run(base + ["--output", str(prev)], env=env,
                       capture_output=True, text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, f"stderr tail: {r.stderr[-3000:]}"

    out = tmp_path / "next"
    r = subprocess.run(base + ["--output", str(out),
                               "--incremental-from", str(prev)],
                       env=env, capture_output=True, text=True,
                       timeout=600, cwd=REPO)
    assert r.returncode == 0, f"stderr tail: {r.stderr[-3000:]}"
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_changed"] == 0 and res["n_reused"] == 240

    import pyarrow.dataset as pads

    assert pads.dataset(res["nodes_dir"], format="parquet").count_rows() > 0


def test_cli_corpus_export(ray_session, tmp_path):
    """--corpus-export routes to the training-shard pipeline: fixed
    shard layout, every shard parquet, result JSON with counts."""
    gcs = ray_session.get_runtime_context().gcs_address
    env = {**os.environ, "RAY_ADDRESS": gcs,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    out = tmp_path / "shards"
    cmd = [sys.executable, "-m", "gfftoneo4j_ray.pipelines.cli",
           "--corpus-export",
           "--input", "/root/testdata/sf0.001/documents.parquet",
           "--output", str(out), "--shards", "5", "--seed", "3",
           "--n-merges", "10", "--budget-tokens", "512"]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=600, cwd=REPO)
    assert r.returncode == 0, f"stderr tail: {r.stderr[-3000:]}"
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ray_address"] == gcs
    assert res["n_exported"] > 0 and res["num_shards"] == 5

    import pyarrow.parquet as pq

    files = sorted(os.listdir(out))
    assert files == [f"shard-{b:05d}.parquet" for b in range(5)]
    total = sum(pq.read_metadata(os.path.join(out, f)).num_rows
                for f in files)
    assert total == res["n_exported"]
