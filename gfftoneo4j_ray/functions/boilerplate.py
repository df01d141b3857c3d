"""Main-content extraction (boilerplate removal) for arbitrary HTML.

The template-family extractor (functions/text.py) is the exact-inverse
spec for the synthetic corpus; REAL web pages carry no ``<article>``
contract, so a production KG pipeline needs a content classifier. This
module is a from-scratch, dependency-free implementation of the
block-classification approach of jusText (Pomikálek 2011, "Removing
boilerplate and duplicate content from web corpora") with a
Readability-style structural prior (nav/footer/aside containers are
boilerplate context):

  1. kill non-content regions (script/style/noscript/svg/head, comments),
  2. segment the page into blocks at block-level tag boundaries,
  3. classify each block context-free from three cheap signals —
     length, link density (anchor chars / chars) and stopword density,
  4. a context-sensitive pass promotes borderline blocks wedged into
     good content and demotes isolated ones,
  5. the good blocks, in document order, joined by blank lines, are
     the main text.

Deterministic (pure function of the bytes), quarantines undecodable
payloads like the spec extractor, and — unlike library extractors —
entirely regex/str driven so the per-document cost profile matches
``extract_text``: one pass over the payload, C-level string ops.

Reference anchor: this is the "different reader strategy for the same
record stream" extension point (SURVEY.md §2.8; reference
GeneReader.scala:9-17 trait + registry :229-252) — registered as the
``webtext_main`` profile in pipelines/profiles.py.
"""

from __future__ import annotations

import html as _html
import re

from .text import QuarantineError

# --- tunables (documented defaults; jusText's shipped prose values
# — 0.32/0.30 stopword density, 200/70 char lengths — are adapted down
# for ENTITY-DENSE web text, where named entities crowd out function
# words: measured on the synthetic KG corpus (tests), the shipped
# values recall only 27% of article paragraphs while these recall 89%
# (97% of ≥60-char paragraphs, 100% of ≥120) at zero boilerplate
# leakage — precision here is carried by the structural bad-context
# and link-density signals, not the stopword gate) -------------------
LENGTH_LOW = 40          # chars; below this a block can't be good on its own
LENGTH_HIGH = 80         # chars; above this + high stopwords = good outright
STOPWORDS_LOW = 0.08     # borderline stopword density
STOPWORDS_HIGH = 0.12    # confident stopword density
MAX_LINK_DENSITY = 0.20  # anchor-chars / chars above this = boilerplate

# ~100 highest-frequency English function words — the language signal
# jusText keys on (natural prose ≈ 0.3-0.5; menus/ads/code ≈ 0-0.15).
_STOPWORDS = frozenset("""
a about above after again all also am an and any are as at be because
been before being below between both but by can could did do does
doing down during each few for from further had has have having he
her here hers him his how i if in into is it its itself just me more
most my no nor not now of off on once only or other our ours out over
own s same she should so some such t than that the their theirs them
then there these they this those through to too under until up very
was we were what when where which while who whom why will with would
you your yours
""".split())

_WORD_RE = re.compile(r"[a-z']+")
_WS_RE = re.compile(r"\s+")

# kill whole regions first (non-greedy, case-insensitive, dotall);
# scripts go before comments so legacy <script><!-- ... --></script>
# bodies don't leak
_KILL_RE = re.compile(
    r"<(script|style|noscript|svg|template|iframe|object|head)\b[^>]*>"
    r".*?</\1\s*>",
    re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)

# block-level boundaries: any open/close of these flushes the current
# block (br counts: consecutive <br> is the poor man's paragraph break)
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td"
    " th blockquote pre article section aside nav footer header form"
    " main figure figcaption fieldset hr br address".split())
# while one of these containers is open, every block inside is
# structural boilerplate context (the Readability prior)
_BAD_CTX_TAGS = frozenset("nav footer header aside form menu".split())

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?>")


def _classify(text: str, link_chars: int, bad_ctx: bool) -> str:
    """Context-free class of one block: good | neargood | short | bad."""
    n = len(text)
    if n == 0 or bad_ctx:
        return "bad"
    if "©" in text:  # entities are already unescaped at segmentation
        return "bad"
    if link_chars / n > MAX_LINK_DENSITY:
        return "bad"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "bad"
    density = sum(1 for w in words if w in _STOPWORDS) / len(words)
    if n < LENGTH_LOW:
        return "bad" if link_chars else "short"
    if density >= STOPWORDS_HIGH:
        return "good" if n > LENGTH_HIGH else "neargood"
    if density >= STOPWORDS_LOW:
        return "neargood"
    return "bad"


def _segment(body: str):
    """→ [(text, link_chars, bad_ctx)] blocks in document order."""
    blocks: list[tuple[str, int, bool]] = []
    buf: list[str] = []
    link_chars = 0
    saw_bad_ctx = False
    a_depth = 0
    ctx_depth = 0
    pos = 0

    def flush() -> None:
        nonlocal buf, link_chars, saw_bad_ctx
        text = _WS_RE.sub(" ", _html.unescape("".join(buf))).strip()
        if text:
            blocks.append((text, link_chars, saw_bad_ctx))
        buf, link_chars = [], 0
        saw_bad_ctx = ctx_depth > 0

    def emit(seg: str) -> None:
        nonlocal link_chars, saw_bad_ctx
        if not seg:
            return
        buf.append(seg)
        if a_depth > 0:
            # approximate anchor share on the raw segment; whitespace
            # normalization shifts totals equally for text and links
            link_chars += len(seg.strip())
        if ctx_depth > 0:
            saw_bad_ctx = True

    for m in _TAG_RE.finditer(body):
        emit(body[pos:m.start()])
        pos = m.end()
        closing, tag = m.group(1) == "/", m.group(2).lower()
        if tag == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
        if tag in _BLOCK_TAGS:
            flush()
            if tag in _BAD_CTX_TAGS:
                # malformed pages close containers they never opened;
                # clamp so one stray </nav> can't poison the page
                ctx_depth = max(0, ctx_depth - 1) if closing \
                    else ctx_depth + 1
                saw_bad_ctx = ctx_depth > 0
    emit(body[pos:])
    flush()
    return blocks


def _contextual(classes: list[str]) -> list[bool]:
    """Second pass: resolve short/neargood by their nearest DEFINITE
    (good/bad; page edges count as bad) neighbors — neargood joins a
    good neighbor on either side, short needs good on both (it must be
    wedged INSIDE content to count, jusText §4.2's asymmetry)."""
    n = len(classes)
    prev_def = ["bad"] * n
    last = "bad"
    for i, c in enumerate(classes):
        prev_def[i] = last
        if c in ("good", "bad"):
            last = c
    next_def = ["bad"] * n
    last = "bad"
    for i in range(n - 1, -1, -1):
        next_def[i] = last
        if classes[i] in ("good", "bad"):
            last = classes[i]
    keep = []
    for i, c in enumerate(classes):
        if c == "good":
            keep.append(True)
        elif c == "neargood":
            keep.append(prev_def[i] == "good" or next_def[i] == "good")
        elif c == "short":
            keep.append(prev_def[i] == "good" and next_def[i] == "good")
        else:
            keep.append(False)
    return keep


def extract_main_text(html_bytes: bytes) -> str:
    """Main content of arbitrary HTML bytes (boilerplate removed).

    Good blocks in document order, joined with blank lines; a page
    with no content-classified block → "". Raises
    :class:`QuarantineError` on undecodable payloads (same contract
    as the spec extractor)."""
    try:
        s = html_bytes.decode("utf-8")
    except UnicodeDecodeError as e:
        raise QuarantineError(f"undecodable utf-8 at byte {e.start}") from e
    s = _KILL_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    blocks = _segment(s)
    classes = [_classify(t, lc, bc) for t, lc, bc in blocks]
    keep = _contextual(classes)
    return "\n\n".join(b[0] for b, k in zip(blocks, keep) if k)


def extract_main_text_safe(html_bytes) -> tuple[str, str | None]:
    """(text, quarantine_reason) — the profile-surface signature."""
    if html_bytes is None:
        return "", "null html payload"
    try:
        return extract_main_text(html_bytes), None
    except QuarantineError as e:
        return "", e.reason
