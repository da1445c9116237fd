"""Text normalization rules R13-R15, T7, R14 (SURVEY.md §2.4).

Reference semantics:
  R13 description cleanup   -> transaction_normalizer.py:381-407
  R14 whitespace collapse   -> transaction_normalizer.py:405, chase_checking.py:335-337
  R15 trailing-artifact strip-> first_republic_bank_parser.py:430-432, 311
  T7  non-printable strip   -> capitalone_visa_print_parser.py:95-102
All regexes compiled once at module scope (C regex engine does the per-row
work; callers batch over pandas Series).
"""

from __future__ import annotations

import re

# R13: reference-number strip list, applied in this exact order
# (transaction_normalizer.py:390-399). IGNORECASE and \s+ separators like the
# reference (its patterns are r'POS\s+DEBIT\s+\d+' etc., so multi-space
# fragments from PDF text dumps are stripped too).
_REF_STRIP_PATTERNS: list[re.Pattern[str]] = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"POS\s+DEBIT\s+\d+",
        r"ACH\s+DEBIT\s+\d+",
        r"ACH\s+CREDIT\s+\d+",
        r"POS\s+CREDIT\s+\d+",
        r"\d{4}\*",  # masked card fragment
        r"REF\s*\d+",
        r"TRANS\s*\d+",
        r"PURCHASE\s+AUTH\s+\d+",
    )
]

# fast-path gate: one alternation that matches iff ANY strip pattern could;
# when it misses (the common case) the 8-sub chain is skipped entirely.
# Purely an optimization — results are identical (goldens + property tests).
_ANY_REF = re.compile(
    r"(?i)POS\s+DEBIT\s+\d|ACH\s+DEBIT\s+\d|ACH\s+CREDIT\s+\d|POS\s+CREDIT\s+\d"
    r"|\d{4}\*|REF\s*\d|TRANS\s*\d|PURCHASE\s+AUTH\s+\d"
)

# cheaper gate in front of the gate: every one of the 8 strip patterns
# requires at least one digit, so a digit-free description (the common case
# for clean merchant names) skips even the _ANY_REF alternation — a \d scan
# is a single-char-class pass vs the 8-branch ignorecase alternation
_HAS_DIGIT = re.compile(r"\d")

# R15: trailing artifacts (first_republic_bank_parser.py:430-432)
_TRAILING_REF = re.compile(r"\s+\d+\s*$")
_MASKED_CARD = re.compile(r"XXXXXXXXXXXX\d+")

# T7: keep printable ASCII range 0x20-0x7E (capitalone_visa_print_parser.py:95-102)
_NON_PRINTABLE = re.compile(r"[^\x20-\x7E]")

_WS = re.compile(r"\s+")


def strip_non_printable(s: str) -> str:
    """T7: drop non-printable / non-ASCII chars (after NBSP -> space)."""
    return _NON_PRINTABLE.sub("", s.replace("\xa0", " "))


def collapse_whitespace(s: str) -> str:
    """R14: ``" ".join(s.split())`` semantics incl. NBSP (chase_checking.py:
    335-337). Implemented AS join/split (C-speed, no regex, no copy for the
    NBSP pre-pass): str.split() with no separator splits on all Unicode
    whitespace including NBSP — identical output to the previous
    ``_WS.sub(" ", s.replace(NBSP, " ")).strip()`` formulation (property
    tests + goldens pin this)."""
    return " ".join(s.split())


def strip_trailing_artifacts(s: str) -> str:
    """R15: masked card then trailing ref-number run, same order as reference."""
    if "XXXXXXXXXXXX" in s:  # substring gate: memmem beats the regex scan
        s = _MASKED_CARD.sub("", s)
    s = _TRAILING_REF.sub("", s)
    return s


def normalize_description(s: str, strip_trailing: bool = False) -> str:
    """R13+R14 chained in reference order (transaction_normalizer.py:381-407):
    ref-number patterns removed, whitespace collapsed. The reference's GLOBAL
    chain contains no trailing-digit strip — R15 (masked cards + trailing ref
    runs, first_republic_bank_parser.py:430-432) is bank-specific, enabled
    via ``strip_trailing=True`` for the families whose reference parser
    applies it; elsewhere legitimate trailing numbers (store/check ids)
    survive, matching the reference byte-for-byte.
    """
    if not s:
        return ""
    if _HAS_DIGIT.search(s) and _ANY_REF.search(s):
        for pat in _REF_STRIP_PATTERNS:
            s = pat.sub("", s)
    if strip_trailing:
        s = strip_trailing_artifacts(s)
    return collapse_whitespace(s)
