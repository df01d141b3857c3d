"""Profile registry + CLI parsing (X1-X3 / S2-S3 analogues)."""

from __future__ import annotations

import pytest

from gfftoneo4j_ray.functions import normalize
from gfftoneo4j_ray.pipelines.cli import build_parser
from gfftoneo4j_ray.pipelines.profiles import (PipelineProfile, get_profile,
                                               register)


def test_known_profiles():
    p = get_profile("webtext")
    assert p.lang == "en"
    assert get_profile("webtext-multilingual").lang is None


def test_unknown_profile_lists_known():
    with pytest.raises(ValueError) as e:
        get_profile("nope")
    assert "webtext" in str(e.value)


def test_register_custom_profile():
    register(PipelineProfile(name="custom-x", lang="de"))
    assert get_profile("custom-x").lang == "de"


def test_key_combinators():
    fn = normalize.or_else(
        normalize.attribute_with_key("alias"),
        normalize.attributes_from_list("name", "title"),
    )
    assert fn({"alias": "  Ada   LOVELACE "}) == "ada lovelace"
    assert fn({"name": "Acme Corp"}) == "acme corp"
    assert fn({"title": "The Art"}) == "the art"
    assert fn({}) is None
    by = normalize.by_type({"person": normalize.attribute_with_key("full")})
    assert by({"entity_type": "person", "full": "X Y"}) == "x y"
    assert by({"entity_type": "org", "full": "X Y"}) is None


def test_cli_parser():
    p = build_parser()
    a = p.parse_args(["--input", "/x", "--dictionary", "/d", "--output", "/o",
                      "--profile", "webtext", "--no-resume", "--streaming"])
    assert a.resume is False and a.streaming is True
    with pytest.raises(SystemExit):
        p.parse_args(["--input", "/x"])  # missing required
