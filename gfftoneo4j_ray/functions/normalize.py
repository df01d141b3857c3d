"""Surface-form key extraction / normalization combinators.

The analogue of the reference's composable ID-strategy combinators
(reference: src/main/scala/corwur/genereader/FeatureIdReader.scala:15-55):
`singleAttribute`, `attributeWithKey`, `attributesFromList` (first
match wins, lowercased keys), `byFeatureType` (per-type dispatch),
composed with `orElse`. Here they are plain Python callables
``row_dict -> str | None`` composed with :func:`or_else`, applied
vectorized inside ``map_batches`` by the pipeline profile.
"""

from __future__ import annotations

import re
from collections.abc import Callable

KeyFn = Callable[[dict], "str | None"]

_WS = re.compile(r"\s+")


def normalize_surface(s: str) -> str:
    """Canonical surface-form normalization: lowercase + whitespace collapse.

    This is the groupby key of the canonicalization shuffle
    (SURVEY.md §7.4) — the seqname/parentId analogue
    (reference: src/main/scala/corwur/Application.scala:35)."""
    return _WS.sub(" ", s.strip().lower())


def single_attribute(field: str = "surface") -> KeyFn:
    """Use one field's value verbatim (singleAttribute analogue)."""
    def fn(row: dict):
        v = row.get(field)
        return normalize_surface(v) if v else None
    return fn


def attribute_with_key(field: str) -> KeyFn:
    """Use a named field, None when absent (attributeWithKey analogue)."""
    def fn(row: dict):
        v = row.get(field)
        return normalize_surface(v) if v else None
    return fn


def attributes_from_list(*fields: str) -> KeyFn:
    """First present field wins (attributesFromList analogue;
    reference lowercases keys — we lowercase values via normalize)."""
    def fn(row: dict):
        for f in fields:
            v = row.get(f)
            if v:
                return normalize_surface(v)
        return None
    return fn


def by_type(dispatch: dict[str, KeyFn], type_field: str = "entity_type") -> KeyFn:
    """Per-type dispatch (byFeatureType analogue)."""
    def fn(row: dict):
        sub = dispatch.get(row.get(type_field))
        return sub(row) if sub else None
    return fn


def or_else(*fns: KeyFn) -> KeyFn:
    """Left-biased fallback chain (orElse analogue)."""
    def fn(row: dict):
        for f in fns:
            v = f(row)
            if v is not None:
                return v
        return None
    return fn
