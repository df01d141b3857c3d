"""Pipeline profiles — the user-extension surface.

The analogue of the reference's strategy triple (SURVEY.md §2.8):
`GeneReader` trait (4 members = one new file format,
reference: src/main/scala/corwur/genereader/GeneReader.scala:9-17),
the reader registry keyed by the CLI `-t` value (:229-252), and the
composable `FeatureIdReader` combinators (FeatureIdReader.scala:15-55).

Here: a profile bundles the text extractor, the triple-extractor
class, the surface normalizer (a functions.normalize combinator), the
language filter and the dictionary provider; the registry is a plain
dict keyed by the CLI ``--profile`` value. Unknown profile → ValueError
listing known names (the IllegalArgumentException analogue,
Application.scala:21-22).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from ..functions import normalize
from ..stages.triples import TripleExtractor


@dataclass(frozen=True)
class PipelineProfile:
    """One named pipeline configuration (X1 analogue: a handful of pure
    fns + one stateful class)."""

    name: str
    # html→text head; None = the spec extractor (functions.text
    # .extract_text_safe) — kept None rather than the function object
    # so default-profile checkpoint fingerprints stay extractor-free
    text_extractor: Callable | None = None
    triple_extractor_cls: type = TripleExtractor
    surface_key: normalize.KeyFn = field(
        default_factory=lambda: normalize.single_attribute("surface"))
    lang: str | None = "en"           # None = no language filter
    dictionary_builder: Callable | None = None  # () -> pa.Table


def _default_dictionary():
    from ..gen.pages import dictionary_table

    return dictionary_table()


PROFILES: dict[str, PipelineProfile] = {}


def register(profile: PipelineProfile) -> PipelineProfile:
    PROFILES[profile.name] = profile
    return profile


register(PipelineProfile(
    name="webtext",
    lang="en",
    dictionary_builder=_default_dictionary,
))

# multilingual variant: no language gate before extraction — the
# gcf/fpoae two-format analogue (same spine, different head strategy)
register(PipelineProfile(
    name="webtext-multilingual",
    lang=None,
    dictionary_builder=_default_dictionary,
))


def _main_content_extractor(html_bytes):
    from ..functions.boilerplate import extract_main_text_safe

    return extract_main_text_safe(html_bytes)


# real-web variant: no <article> contract — jusText-style boilerplate
# removal classifies content blocks (functions/boilerplate.py); same
# spine, different html→text head
register(PipelineProfile(
    name="webtext-main",
    lang="en",
    text_extractor=_main_content_extractor,
    dictionary_builder=_default_dictionary,
))


def get_profile(name: str) -> PipelineProfile:
    try:
        return PROFILES[name]
    except KeyError:
        raise ValueError(
            f"unknown profile {name!r}; known: {sorted(PROFILES)}") from None
