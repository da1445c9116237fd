"""Boilerplate / footer suppression P6 + readability-style density scoring.

Reference semantics:
  P6 footer keyword list        -> first_republic_bank_parser.py:392-466
  section-marker strip          -> chase_checking.py:86-90, 106-110, 130-135
  text-density boilerplate model: the one genuinely new component
  (SURVEY.md §7.4) — a readability-style line scorer (length, digit ratio,
  punctuation ratio) deciding content vs chrome, kept a pure function so it
  stays inside the pandas UDF tier.
"""

from __future__ import annotations

import re

# P6: footer/boilerplate term list (first_republic_bank_parser.py:392-427),
# matched case-insensitively as substrings of the lowercased line.
FOOTER_TERMS: tuple[str, ...] = (
    "pine street",
    "san francisco",
    "member fdic",
    "page ",
    "balance your account",
    "statement period",
    "deposit products",
    "equal housing lender",
    "continued on next page",
    "beginning balance",
    "ending balance",
    "total for this period",
    "account summary",
    "customer service",
    "questions?",
    "visit us at",
    "www.",
    "p.o. box",
    "in case of errors",
    "annual percentage",
    "interest charged",
    "fees charged",
)

# single compiled alternation == `any(t in low for t in FOOTER_TERMS)` but
# one C-level scan instead of ~22 Python substring probes per line (the
# footer check runs once per line of every statement turn — it showed up as
# the single hottest call in the extraction profile)
_FOOTER_RE = re.compile("|".join(re.escape(t) for t in FOOTER_TERMS))

# chase_checking.py:86-90 section markers stripped before assembly
SECTION_MARKERS = re.compile(
    r"^\*start\*.*|^\*end\*.*|CHECKING SUMMARY|TRANSACTION DETAIL|SUMMARY OF"
)

_DIGITS = re.compile(r"\d")
_PUNCT = re.compile(r"[^\w\s]")
_WORD = re.compile(r"[A-Za-z]{2,}")


def is_footer_line(line: str) -> bool:
    """P6: line contains any footer term (case-insensitive substring)."""
    return _FOOTER_RE.search(line.lower()) is not None


def is_section_marker(line: str) -> bool:
    """chase_checking-style page-artifact marker lines."""
    return bool(SECTION_MARKERS.search(line))


def line_density_score(line: str) -> float:
    """Readability-style content score in [0,1]: long, wordy, low-digit,
    low-punctuation lines score high; short/number-dominated chrome scores low.

    Pure function -> identical in oracle and UDF tiers.
    """
    n = len(line)
    if n == 0:
        return 0.0
    words = len(_WORD.findall(line))
    digit_ratio = len(_DIGITS.findall(line)) / n
    punct_ratio = len(_PUNCT.findall(line)) / n
    length_factor = min(n, 80) / 80.0
    word_factor = min(words, 10) / 10.0
    score = 0.4 * length_factor + 0.4 * word_factor
    score += 0.2 * (1.0 - min(1.0, digit_ratio * 2 + punct_ratio))
    return round(score, 6)


def strip_boilerplate_lines(lines: list[str]) -> tuple[list[str], int]:
    """Apply P6 + marker strip in reference order (line level, pre-assembly).

    Returns (kept_lines, dropped_count)."""
    kept: list[str] = []
    dropped = 0
    for ln in lines:
        if is_footer_line(ln) or is_section_marker(ln):
            dropped += 1
        else:
            kept.append(ln)
    return kept, dropped
