"""GFF compatibility pipeline: the reference's own use case on this engine.

Fixtures mirror the reference test strategy: parser dialect corpus
(GffParserSpec.scala:9-77), a two-gene fpoae assembly fixture
(GeneReaderSpec.scala:7-49 — here NOT pending), and a smoke run over
the reference's own checked-in testdata file (read-only)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from gfftoneo4j_ray.compat.gff import (parse_attributes, parse_gff_line,
                                       run_gff)

REF_GFF = "/root/reference/testdata/GCA_000497325.2_ASM49732v2_genomic.gff"


def test_parse_dot_as_null():
    rec, err = parse_gff_line(
        "chr1\tsrc\tgene\t100\t200\t.\t.\t.\tID=g1")
    assert err is None
    assert rec["score"] is None and rec["strand"] is None and rec["frame"] is None
    rec, _ = parse_gff_line("chr1\tsrc\tgene\t100\t200\t0.9\t+\t2\tID=g1")
    assert rec["score"] == 0.9 and rec["strand"] == "+" and rec["frame"] == 2


def test_parse_attribute_dialects():
    # '=' optional, quoted values containing ';', bare opaque token
    _, kv = parse_attributes('gene_id "abc;def"; transcript_id "t1"')
    assert kv == {"gene_id": "abc;def", "transcript_id": "t1"}
    raw, kv = parse_attributes("FPOA_00001")
    assert raw == "FPOA_00001" and kv == {}
    _, kv = parse_attributes("ID=x;Parent=y;")  # trailing ;
    assert kv == {"ID": "x", "Parent": "y"}


def test_parse_headers_and_malformed():
    assert parse_gff_line("# a comment") == (None, None)
    assert parse_gff_line("##gff-version 3") == (None, None)
    rec, err = parse_gff_line("chr1\tsrc\tgene\tnot-a-number\t200\t.\t+\t.\tID=g")
    assert rec is None and "coordinates" in err
    rec, err = parse_gff_line("chr1\tsrc\tgene\t1\t2\t.\t*\t.\tID=g")
    assert rec is None and "strand" in err


FPOAE_FIXTURE = """\
##gff-version 3
chr1\tsrc\tgene\t100\t500\t.\t+\t.\tgene_id "G1"
chr1\tsrc\tCDS\t100\t200\t.\t+\t0\tgene_id "G1"; transcript_id "T1"
chr1\tsrc\tCDS\t300\t400\t.\t+\t0\tgene_id "G1"; transcript_id "T1"
chr1\tsrc\tCDS\t450\t500\t.\t+\t0\tgene_id "G1"; transcript_id "T2"
chr1\tsrc\tgene\t600\t900\t.\t-\t.\tgene_id "G2"
chr1\tsrc\tCDS\t600\t700\t.\t-\t0\tgene_id "G2"; transcript_id "T3"
chr1\tsrc\tCDS\t800\t900\t.\t-\t0\tgene_id "G2"; transcript_id "T3"
chr2\tsrc\tCDS\t10\t20\t.\t+\t0\tgene_id "G3"; transcript_id "T4"
chr1\tsrc\tCDS\t50\t60\t.\t+\t0\ttranscript_id "T9"
"""

GCF_FIXTURE = """\
##gff-version 3
chr1\tsrc\tgene\t100\t500\t.\t+\t.\tID=gene1
chr1\tsrc\tmRNA\t100\t500\t.\t+\t.\tID=rna1;Parent=gene1
chr1\tsrc\texon\t100\t200\t.\t+\t.\tID=e1;Parent=rna1
chr1\tsrc\texon\t300\t500\t.\t+\t.\tID=e2;Parent=rna1
chr1\tsrc\tgene\t600\t800\t.\t-\t.\tID=gene2
chr1\tsrc\tmRNA\t600\t800\t.\t-\t.\tID=rna2;Parent=gene2
chr1\tsrc\texon\t600\t800\t.\t-\t.\tID=e3;Parent=rna2
chr1\tsrc\texon\t900\t950\t.\t+\t.\tID=e4;Parent=missing
"""


@pytest.fixture()
def fpoae_file(tmp_path):
    p = tmp_path / "f.gff"
    p.write_text(FPOAE_FIXTURE)
    return str(p)


@pytest.fixture()
def gcf_file(tmp_path):
    p = tmp_path / "g.gff"
    p.write_text(GCF_FIXTURE)
    return str(p)


def test_fpoae_assembly(ray_session, fpoae_file, tmp_path):
    res = run_gff(fpoae_file, str(tmp_path / "out"), fmt="fpoae")
    nodes = pq.read_table(res["nodes_dir"]).to_pandas()
    edges = pq.read_table(res["edges_dir"]).to_pandas()
    by_label = nodes.groupby("label").size().to_dict()
    # G1 (T1: 2 cds + 1 intron, T2: 1 cds), G2 (T3: 2 cds + 1 intron),
    # G3 on chr2 (T4: 1 cds); T9 has no gene_id → splicing dropped
    assert by_label["gene"] == 3
    assert by_label["splicing"] == 4
    assert by_label["cds"] == 6
    assert by_label["intron"] == 2
    types = edges.groupby("type").size().to_dict()
    assert types["transcribes"] == 4
    assert types["codes"] == 6
    assert types["mRNA"] == 4
    assert types["in"] == 2
    assert types["links"] == 4  # chains: T1 c-i-c (2), T3 c-i-c (2)
    assert types["order"] == 1  # chr1: G1→G2; chr2 single gene
    assert res["n_dropped"] == 1  # T9: no parent gene
    # determinism: content-hash ids, sorted outputs
    assert nodes["node_id"].is_monotonic_increasing


def test_gcf_assembly_parent_chase(ray_session, gcf_file, tmp_path):
    res = run_gff(gcf_file, str(tmp_path / "out"), fmt="gcf")
    nodes = pq.read_table(res["nodes_dir"]).to_pandas()
    by_label = nodes.groupby("label").size().to_dict()
    assert by_label["gene"] == 2
    assert by_label["splicing"] == 2
    assert by_label["cds"] == 3
    assert by_label.get("intron", 0) == 1  # gap 201..299 in rna1
    assert res["n_dropped"] == 1  # e4: Parent=missing → ParentInfoNotFound


def test_unknown_format_rejected(ray_session, gcf_file, tmp_path):
    with pytest.raises(ValueError) as e:
        run_gff(gcf_file, str(tmp_path / "out"), fmt="nope")
    assert "gcf" in str(e.value)


@pytest.mark.skipif(not os.path.exists(REF_GFF),
                    reason="reference testdata not present")
def test_reference_testdata_smoke(ray_session, tmp_path):
    """The reference's own checked-in GFF parses clean end-to-end
    (this checkout only carries `region` rows → zero genes, but the
    full file-level path — parse, group, assemble, write — runs)."""
    res = run_gff(REF_GFF, str(tmp_path / "out"), fmt="gcf")
    assert res["n_quarantined"] == 0
    nodes = pq.read_table(res["nodes_dir"])
    assert nodes.num_rows == res["n_nodes"]
