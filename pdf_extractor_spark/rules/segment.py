"""Tokenization / segmentation primitives T1-T6 (SURVEY.md §2.2).

Reference semantics:
  T1 line split               -> chase_visa_parser.py:58, bofa_bank_parser.py:92
  T2 section state machine    -> bofa_bank_parser.py:91-150
  T3 multi-line block assembly-> chase_visa_parser.py:70-81,
                                 wellsfargo_bank_parser.py:204-221
  T5 capture-between-markers  -> amazon_parser.py:162-185
  T6 whitespace-geometry line profiler -> wellsfargo_bank_parser.py:41-126
"""

from __future__ import annotations

import re
from typing import Callable, NamedTuple


class Run(NamedTuple):
    """A (kind, length, text) run from the T6 line profiler."""

    kind: str
    length: int
    text: str


class Line(NamedTuple):
    """A source line with its char span in the original text (T1 keeps order
    AND offsets so spans survive to the output)."""

    no: int
    start: int
    end: int
    text: str


def split_lines(text: str) -> list[Line]:
    """T1: split on newline, strip, drop empties — offsets preserved."""
    out: list[Line] = []
    pos = 0
    for i, raw in enumerate(text.split("\n")):
        stripped = raw.strip()
        if stripped:
            # index of the first non-whitespace char == leading-ws length
            # (stripped[0] can't occur inside the leading run — it isn't
            # whitespace); avoids the second string copy lstrip() made
            lead = raw.index(stripped[0])
            start = pos + lead
            out.append(Line(i, start, start + len(stripped), stripped))
        pos += len(raw) + 1
    return out


def forward_fill_sections(
    lines: list[Line], headers: dict[str, str]
) -> list[tuple[Line, str | None]]:
    """T2: tag each line with the last-seen section header (forward fill).

    ``headers`` maps a header marker substring -> section tag
    (bofa_bank_parser.py:91-150 toggles booleans; this is the same state
    machine expressed as last(tag) OVER (ORDER BY line_no))."""
    current: str | None = None
    tagged: list[tuple[Line, str | None]] = []
    for ln in lines:
        matched = None
        for marker, tag in headers.items():
            if marker in ln.text:
                matched = tag
                break
        if matched is not None:
            current = matched
            continue  # header line itself is not data
        tagged.append((ln, current))
    return tagged


def assemble_blocks(
    lines: list[Line], is_start: Callable[[str], bool]
) -> list[list[Line]]:
    """T3: start a block on ``is_start`` lines; append continuations until the
    next start (chase_visa_parser.py:70-81). Lines before the first start are
    dropped, like the reference's loop."""
    blocks: list[list[Line]] = []
    cur: list[Line] | None = None
    for ln in lines:
        if is_start(ln.text):
            if cur:
                blocks.append(cur)
            cur = [ln]
        elif cur is not None:
            cur.append(ln)
    if cur:
        blocks.append(cur)
    return blocks


def capture_between(text: str, start_marker: str, end_marker: str) -> tuple[str, int]:
    """T5: substring between two markers (amazon_parser.py:162-185 /
    wellsfargo_visa_parser.py:117-124 find-based slicing).

    Returns (captured, start_offset); ('', -1) when absent."""
    i = text.find(start_marker)
    if i < 0:
        return "", -1
    j = text.find(end_marker, i + len(start_marker))
    if j < 0:
        j = len(text)
    s = i + len(start_marker)
    return text[s:j], s


_RUNS = re.compile(r"(\d[\d,.]*|[ ]+|[^\s\d]+[^\s]*)")


def analyze_line_elements(line: str) -> list[Run]:
    """T6: tokenize a line into (kind, length, text) runs, kind in
    {'number','spaces','text'} (wellsfargo_bank_parser.py:81-126)."""
    out: list[Run] = []
    for m in _RUNS.finditer(line):
        tok = m.group(0)
        if tok[0] == " ":
            kind = "spaces"
        elif tok[0].isdigit():
            kind = "number"
        else:
            kind = "text"
        out.append(Run(kind, len(tok), tok))
    return out


# decimal amount shape (two decimals) — the same test the extractors use to
# decide a trailing token is money rather than a check/store number
_AMOUNT_RUN = re.compile(r"^-?[\d,]+\.\d{2}$")


def classify_by_space_geometry(line: str) -> str | None:
    """T6: deposit vs withdrawal by the width of the space run separating the
    description from the amount (wellsfargo_bank_parser.py:41-78: wide run =
    deposit column, narrow = withdrawal column).

    Returns 'deposit' (run >= 4 spaces), 'withdrawal' (1-3 spaces), or None
    when the line has no trailing amount."""
    runs = analyze_line_elements(line)
    # need ... spaces number [spaces number] at the end
    kinds = [r.kind for r in runs]
    if len(runs) < 3 or kinds[-1] != "number":
        return None
    # the space run immediately before the AMOUNT. With a trailing balance
    # the tail is [..., spaces, amount, spaces, balance]: the run before the
    # last number separates amount from balance — step back one more
    # (number, spaces) pair to reach the run before the amount itself.
    # The stepped-over run must be a DECIMAL amount (same _AMOUNT_RUN test
    # the extractors use): a bare integer there is a check/store number in
    # the description ('CHECK 105      320.00'), not an amount+balance pair.
    idx = len(runs) - 2
    if (
        idx - 2 >= 0
        and kinds[idx] == "spaces"
        and kinds[idx - 1] == "number"
        and _AMOUNT_RUN.match(runs[idx - 1].text)
        and kinds[idx - 2] == "spaces"
    ):
        idx -= 2  # two trailing numbers (amount + balance)
    if kinds[idx] != "spaces":
        return None
    width = runs[idx].length
    return "deposit" if width >= 4 else "withdrawal"


# --- R18: name/address block composition (chase_checking.py:320-364) ---------

_STREET_LINE = re.compile(r"^\d+ .+")
_CITYZIP = re.compile(r"\d{5}(-\d{4})?")
_CAPS_RUN = re.compile(r"[A-Z][A-Z .,'-]{2,}")
_COUPON_ADDR = re.compile(r"\d+ [A-Z0-9 ]+")
_COUPON_ACCT = re.compile(r"Account Number\s*([\d ]{8,})")

R18_SKIP_PHRASES = frozenset(
    {"CUSTOMER SERVICE INFORMATION", "CHECKING SUMMARY", "TRANSACTION DETAIL"}
)
R18_SERVICE_PHRASES = (
    "We accept operator relay calls",
    "International Calls",
    "Service Center:",
    "Para Espanol:",
    "1-713-262-1679",
    "1-888-262-4273",
)


def find_name_address(text: str) -> tuple[str | None, str | None]:
    """R18 full composition (chase_checking.py:320-364): the FIRST adjacent
    (street, city/zip) line pair — street ``^\\d+ .+``, next line containing
    ``\\d{5}(-\\d{4})?`` — plus ALL-CAPS name runs collected from the 10 lines
    ABOVE the street line, with customer-service phrases stripped, skip-set
    headers excluded, and single-word runs rejected. Returns (name, address)."""
    from .textnorm import collapse_whitespace

    raw = [ln for ln in (s.strip() for s in text.split("\n")) if ln]
    cleaned = [collapse_whitespace(ln) for ln in raw]  # R14, chase_checking.py:335-337
    address = None
    address_idx = None
    for idx in range(len(cleaned) - 1):
        if _STREET_LINE.match(cleaned[idx]) and _CITYZIP.search(cleaned[idx + 1]):
            address = cleaned[idx] + " " + cleaned[idx + 1]
            address_idx = idx
            break
    names: list[str] = []
    if address_idx is not None:
        for ln in cleaned[max(0, address_idx - 10):address_idx]:
            for phrase in R18_SERVICE_PHRASES:
                ln = ln.replace(phrase, "")
            ln = ln.strip()
            for m in _CAPS_RUN.findall(ln):
                if m not in R18_SKIP_PHRASES and len(m.split()) >= 2:
                    names.append(m)
    return (" ".join(names) if names else None), address


def find_coupon_block(text: str) -> tuple[str | None, str | None, str | None]:
    """R18 coupon variant (wellsfargo_visa_parser.py:511-534): scan the LAST
    40 lines for the first ``\\d+ [A-Z0-9 ]+`` street line; name = preceding
    line, address = street + ', ' + following line; account number = first
    ``Account Number <digits/spaces>{8,}`` run with spaces stripped."""
    lines = [ln for ln in (s.strip() for s in text.split("\n")) if ln]
    coupon = lines[-40:]
    addr_idx = None
    for i, ln in enumerate(coupon):
        if _COUPON_ADDR.match(ln):
            addr_idx = i
            break
    name = address = None
    if addr_idx is not None and addr_idx > 0 and addr_idx + 1 < len(coupon):
        name = coupon[addr_idx - 1]
        address = coupon[addr_idx] + ", " + coupon[addr_idx + 1]
    acct = None
    for ln in coupon:
        m = _COUPON_ACCT.search(ln)
        if m:
            acct = m.group(1).replace(" ", "")
            break
    return name, address, acct
