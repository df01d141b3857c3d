"""HTML → text extraction: the pure, deterministic byte-identity spec.

The analogue of the reference's parser-combinator line parse
(reference: src/main/scala/corwur/gffparser/GffParser.scala:102-122):
one pure function of the raw payload, with a fail-fast/quarantine
split (Application.scala:45-50 throws; we quarantine with a reason —
the Writer-log analogue, genereader/Writer.scala:3-19).

Spec (exact inverse of gen.pages.render_html on the template family):
  * decode UTF-8 strictly — undecodable bytes → QuarantineError
  * the FIRST <article ...>...</article> region carries the payload
  * each <p ...>...</p> inside it is one paragraph, HTML-unescaped
  * paragraphs joined with "\n\n"; no article or no <p> → ""
"""

from __future__ import annotations

import html as _html
import re

_ARTICLE_RE = re.compile(r"<article[^>]*>(.*?)</article>", re.S)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.S)


class QuarantineError(ValueError):
    """Raised for pages that cannot be extracted; .reason goes to lineage."""

    def __init__(self, reason: str) -> None:
        super().__init__(reason)
        self.reason = reason


def extract_text(html_bytes: bytes) -> str:
    """Extract article text from raw HTML bytes (byte-identical invariant)."""
    try:
        s = html_bytes.decode("utf-8")
    except UnicodeDecodeError as e:
        raise QuarantineError(f"undecodable utf-8 at byte {e.start}") from e
    m = _ARTICLE_RE.search(s)
    if m is None:
        return ""
    return "\n\n".join(_html.unescape(p) for p in _P_RE.findall(m.group(1)))


def extract_text_safe(html_bytes) -> tuple[str, str | None]:
    """(text, quarantine_reason) — reason is None on success."""
    if html_bytes is None:
        return "", "null html payload"
    try:
        return extract_text(html_bytes), None
    except QuarantineError as e:
        return "", e.reason
