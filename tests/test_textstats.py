"""Text analysis kernels: counts, language ID, quality, fingerprint."""

from __future__ import annotations

import pyarrow as pa

from gfftoneo4j_ray.functions import textstats
from gfftoneo4j_ray.functions.hashing import fingerprint64


def test_text_stats_counts():
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["a bb  ccc", "", "one two three four"]})
    out = textstats.text_stats_batch(t).to_pydict()
    assert out["n_tokens"] == [3, 0, 4]
    assert out["n_chars"] == [9, 0, 18]
    assert out["n_spaces"] == [3, 0, 3]
    # alpha ratio: "a bb  ccc" → 6 alpha of 9 chars → 6667 scaled
    assert out["alpha_c"][0] == 6667


def test_lang_id():
    assert textstats.lang_id("the cat and the dog sat in the garden") == "en"
    assert textstats.lang_id("der hund und die katze ist ein tier") == "de"
    assert textstats.lang_id("le chat est dans la maison pour un moment") == "fr"
    assert textstats.lang_id("xyzzy plugh qwerty") == "und"
    assert textstats.lang_id("") == "und"


def test_quality_score_bands():
    assert textstats.quality_score("") == 0.0
    good = "This is a well formed sentence with reasonable words. " * 12
    assert textstats.quality_score(good) > 0.7
    junk = "%$#@! ^^ ~~ || ## !!"
    assert textstats.quality_score(junk) < 0.4


def test_fingerprint_stability_and_sensitivity():
    a = fingerprint64("some document text that is long enough to matter")
    b = fingerprint64("some document text that is long enough to matter")
    c = fingerprint64("some document text that is long enough to matterX")
    assert a == b
    assert a != c
    assert fingerprint64("") == 0
    assert 0 <= a < (1 << 63)
