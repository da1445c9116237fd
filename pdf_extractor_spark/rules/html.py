"""HTML boilerplate strip via DOM-lite tokenization + text-density scoring.

The north-rule component the reference lacks (its inputs are PDFs/CSVs):
turns whose payload is an HTML page get readability-style main-content
extraction. Deterministic, pure-Python, regex-based (no parser libs), so it
lives in the same pandas-UDF tier as the other rules and is golden-testable
byte-for-byte.

Model (the boilerpipe/readability idea reduced to its decision core):
  1. DOM-lite tokenize: drop comments/script/style subtrees, convert
     block-level tag boundaries to line breaks, measure per-line ANCHOR text
     length BEFORE stripping inline tags;
  2. per-line features: text-density score (rules/boilerplate.py
     line_density_score: length, wordiness, digit/punct ratios) + link
     density (anchor chars / total chars);
  3. classify: content iff density >= DENSITY_MIN and link_density <=
     LINK_DENSITY_MAX — navigation chrome is short and link-dominated,
     body text is long and link-sparse.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .boilerplate import line_density_score

# subtrees removed wholesale (DOTALL: spans lines)
_DROP_SUBTREES = re.compile(
    r"<!--.*?-->|<script\b.*?</script\s*>|<style\b.*?</style\s*>",
    re.IGNORECASE | re.DOTALL,
)
# block-level boundaries -> newline (the DOM's visual line structure)
_BLOCK_BREAK = re.compile(
    r"</?(?:p|div|br|li|ul|ol|tr|table|h[1-6]|section|article|header|footer|nav|blockquote)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
# &amp; must unescape LAST: doing it first would double-unescape sequences
# like '&amp;lt;' (which renders as the literal '&lt;', not '<')
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

DENSITY_MIN = 0.35
LINK_DENSITY_MAX = 0.5


class HtmlLine(NamedTuple):
    text: str
    density: float
    link_density: float


def looks_like_html(text: str, lowered: str | None = None) -> bool:
    """Markers must appear near the START of the payload: a statement turn
    whose free text merely mentions '<body' deep inside (e.g. a description
    quoting markup) must not be rerouted to the html family and lose its
    transaction records. Only payloads that UNAMBIGUOUSLY start a document
    head — <head>, <meta, <?xml, <!-- or a <!doctype variant — get the
    deeper '<body' window (2048 chars) so a long head section (meta/style/
    script before body) still routes home. A bare leading '<' does NOT
    qualify: prose that merely opens with an angle bracket (quoted text,
    '<redacted>', a pasted diff) keeps the tight 256-char deep-mention
    guard, so a deep '<body' mention can't steal its transaction records.
    ``lowered``: the caller's
    already-lowercased copy of ``text`` (detect_family computes one anyway)
    — avoids a second full-string lower(); lstrip-after-lower equals
    lower-after-lstrip since lowercasing never touches whitespace."""
    low = (lowered if lowered is not None else text.lower()).lstrip()
    if low.startswith(("<!doctype html", "<html")):
        return True
    # deep window only for unambiguous document-head openers; a bare '<'
    # (quoted prose, '<redacted>', pasted diffs) is NOT enough
    window = 2048 if low.startswith(("<head", "<meta", "<?xml", "<!--", "<!doctype")) else 256
    return "<body" in low[:window]


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def html_lines(text: str) -> list[HtmlLine]:
    """DOM-lite tokenization -> per-line (text, density, link_density)."""
    cleaned = _DROP_SUBTREES.sub(" ", text)
    broken = _BLOCK_BREAK.sub("\n", cleaned)
    out: list[HtmlLine] = []
    for raw in broken.split("\n"):
        anchor_chars = sum(len(_TAG.sub("", m)) for m in _ANCHOR.findall(raw))
        stripped = _TAG.sub(" ", raw)
        textline = " ".join(_unescape(stripped).split())
        if not textline:
            continue
        ld = anchor_chars / len(textline) if textline else 0.0
        out.append(HtmlLine(textline, line_density_score(textline), min(ld, 1.0)))
    return out


def extract_main_content(text: str) -> tuple[list[str], dict[str, int]]:
    """The classifier: keep content lines, count what was dropped and why."""
    hits: dict[str, int] = {}
    kept: list[str] = []
    for ln in html_lines(text):
        if ln.link_density > LINK_DENSITY_MAX:
            hits["html_link_dense_dropped"] = hits.get("html_link_dense_dropped", 0) + 1
        elif ln.density < DENSITY_MIN:
            hits["html_low_density_dropped"] = hits.get("html_low_density_dropped", 0) + 1
        else:
            kept.append(ln.text)
    if kept:
        hits["html_content_lines"] = len(kept)
    return kept, hits
