"""Per-family extraction rules — the reference's parser bodies re-expressed
as pure functions over a single turn's text (SURVEY.md §2.2, §2.4, FIXTURES.md §3).

Each ``extract_<family>`` cites the reference parser whose regex/state-machine
semantics it re-implements. A family function returns ``ExtractResult``:
  records  — ordered TransactionRecord-like tuples with char spans
  hits     — rule-hit counters (become lineage metrics, SURVEY §2.6 A2)
  content  — kept content lines for non-record families (main-content path)
"""

from __future__ import annotations

import csv as _csv
import io as _io
import re
from typing import NamedTuple

from . import dates as D
from . import textnorm as TN
from .amounts import (
    clean_amount,
    clean_amount_or_zero,
    coerce_amount_commas_only,
    normalize_sign,
)
from .boilerplate import is_footer_line, is_section_marker, strip_boilerplate_lines
from .segment import (
    Line,
    capture_between,
    classify_by_space_geometry,
    find_coupon_block,
    find_name_address,
    split_lines,
)


class Record(NamedTuple):
    date: str | None  # ISO YYYY-MM-DD
    amount: float | None  # signed per R5 convention
    description: str
    # 'charge' | 'credit' | None — plus reference-literal passthroughs where
    # the mirrored parser emits its own enum (wf_bank_csv: 'Unknown',
    # wellsfargo_bank_csv_parser.py:124); renderers treat ttype as opaque
    ttype: str | None
    start: int  # char span in original turn text
    end: int


class ExtractResult(NamedTuple):
    records: list[Record]
    hits: dict[str, int]
    content: list[str] | None  # freeform/main-content lines (already normalized)


def _hit(hits: dict[str, int], key: str, n: int = 1) -> None:
    hits[key] = hits.get(key, 0) + n


# --- R1: chase visa (chase_visa_parser.py:50-92) -------------------------

_MMDD_TOKEN = re.compile(r"^\d{2}/\d{2}$")
_AMOUNT_TOKEN = re.compile(r"^-?[\d,]+\.\d{2}$")
_CLOSING = re.compile(r"Opening/Closing Date\s+\d{2}/\d{2}/\d{2}\s*-\s*(\d{2}/\d{2}/\d{2})")


def extract_chase_visa(text: str) -> ExtractResult:
    """R1 token match + T3 continuation assembly (chase_visa_parser.py:50-92),
    R8 year boundary vs the closing date (chase_visa_parser.py:101-110)."""
    hits: dict[str, int] = {}
    stmt_year, stmt_month = None, None
    m = _CLOSING.search(text)
    if m:
        iso = D.parse_date(m.group(1))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_date")
    records: list[Record] = []
    cur: list[str] | None = None
    cur_meta: tuple[str, float, int, int] | None = None

    def flush() -> None:
        nonlocal cur, cur_meta
        if cur is None or cur_meta is None:
            return
        mmdd, amt, start, end = cur_meta
        mm, dd = int(mmdd[:2]), int(mmdd[3:5])
        iso = (
            D.repair_year_boundary(mm, dd, stmt_year, stmt_month)
            if stmt_year is not None and stmt_month is not None
            else None
        )
        if iso and stmt_month == 1 and mm == 12:
            _hit(hits, "r8_year_boundary")
        desc = TN.normalize_description(" ".join(cur))
        ttype = "credit" if amt >= 0 else "charge"
        records.append(Record(iso, amt, desc, ttype, start, end))
        cur, cur_meta = None, None

    for ln in split_lines(text):
        toks = ln.text.split()
        if (
            len(toks) >= 3
            and _MMDD_TOKEN.match(toks[0])
            and _AMOUNT_TOKEN.match(toks[-1])
        ):
            flush()
            amt = clean_amount(toks[-1])
            cur = [" ".join(toks[1:-1])]
            cur_meta = (toks[0], amt if amt is not None else 0.0, ln.start, ln.end)
            _hit(hits, "r1_txn_line")
        elif (
            cur is not None
            and not _MMDD_TOKEN.match(toks[0] if toks else "")
            and (not toks or clean_amount(toks[-1]) is None)
        ):
            # continuation only while the line does NOT end in a number —
            # the reference stops assembly there (chase_visa_parser.py:71-79
            # `not self._is_number(lines[j].split()[-1])`)
            cur.append(ln.text)
            if cur_meta:
                cur_meta = (*cur_meta[:3], ln.end)
            _hit(hits, "t3_continuation")
        else:
            flush()
    flush()
    return ExtractResult(records, hits, None)


# --- chase checking (chase_checking.py:84-135) ----------------------------

_STMT_DATE = re.compile(r"Statement Date:\s*(\d{1,2}/\d{1,2}/\d{4}|\d{4}-\d{2}-\d{2})")


def extract_chase_checking(text: str) -> ExtractResult:
    """2-number lines (amount + balance) with section-marker strip
    (chase_checking.py:84-135); statement date line per :443-455."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    m = _STMT_DATE.search(text)
    if m:
        iso = D.parse_date(m.group(1))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_date")
    # R18 composed heuristic (chase_checking.py:320-364): street+zip pair
    # with the ALL-CAPS name scan of the 10 lines above
    name, address = find_name_address(text)
    if address:
        _hit(hits, "r18_address_found")
    if name:
        _hit(hits, "r18_name_runs")
    records: list[Record] = []
    for ln in split_lines(text):
        if is_section_marker(ln.text):
            _hit(hits, "p6_marker_dropped")
            continue
        toks = ln.text.split()
        if (
            len(toks) >= 4
            and _MMDD_TOKEN.match(toks[0])
            and _AMOUNT_TOKEN.match(toks[-1])
            and _AMOUNT_TOKEN.match(toks[-2])
        ):
            amt = clean_amount(toks[-2])
            mm, dd = int(toks[0][:2]), int(toks[0][3:5])
            iso = (
                D.repair_year_boundary(mm, dd, stmt_year, stmt_month)
                if stmt_year is not None and stmt_month is not None
                else None
            )
            desc = TN.normalize_description(" ".join(toks[1:-2]))
            ttype = "credit" if (amt or 0) >= 0 else "charge"
            records.append(Record(iso, amt, desc, ttype, ln.start, ln.end))
            _hit(hits, "r1_two_amount_line")
    return ExtractResult(records, hits, None)


# --- bofa sections (bofa_bank_parser.py:82-177, 240) ----------------------

_BOFA_SECTIONS = {
    "Deposits and other additions": "deposits",
    "Withdrawals and other subtractions": "withdrawals",
    "Checks": "checks",
}
_MMDDYY_TOKEN = re.compile(r"^\d{2}/\d{2}/\d{2}$")
_CHECK_ROW = re.compile(r"^(\d{2}/\d{2}/\d{2})\s+(\d+)\s+([\d,]+\.\d{2})$")


def extract_bofa_bank(text: str) -> ExtractResult:
    """T2 section state machine + per-section sign (bofa_bank_parser.py:82-177;
    withdrawal negate at :240; checks table at :122-126)."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    section: str | None = None
    for ln in split_lines(text):
        sec_hit = None
        for marker, tag in _BOFA_SECTIONS.items():
            if ln.text.startswith(marker):
                sec_hit = tag
                break
        if sec_hit:
            section = sec_hit
            _hit(hits, "t2_section_header")
            continue
        if section is None:
            continue
        if section == "checks":
            m = _CHECK_ROW.match(ln.text)
            if m:
                amt = clean_amount(m.group(3))
                amt = -amt if amt is not None else None
                iso = D.parse_date(m.group(1))
                records.append(
                    Record(iso, amt, f"CHECK {m.group(2)}", "charge", ln.start, ln.end)
                )
                _hit(hits, "r3_check_row")
            continue
        toks = ln.text.split()
        if len(toks) >= 3 and _MMDDYY_TOKEN.match(toks[0]) and _AMOUNT_TOKEN.match(toks[-1]):
            amt = clean_amount(toks[-1])
            if section == "withdrawals" and amt is not None:
                amt = -amt  # bofa_bank_parser.py:240 (amount * -1)
            iso = D.parse_date(toks[0])
            desc = TN.normalize_description(" ".join(toks[1:-1]))
            ttype = "deposit" if section == "deposits" else "withdrawal"
            amt = normalize_sign(amt, ttype)
            records.append(Record(iso, amt, desc, ttype, ln.start, ln.end))
            _hit(hits, f"r3_{section}_row")
    return ExtractResult(records, hits, None)


# --- wells fargo mastercard (wellsfargo_mastercard_parser.py:245-301) -----

_WFMC_HEADER = "TransPostReference Number Description Credits Charges"
_WFMC_ROW = re.compile(r"^(\d{2}/\d{2})(\d{2}/\d{2})([A-Z0-9]+)\s+(.+?)\s+([\d,]+\.\d{2})$")
_STMT_PERIOD_MDY = re.compile(
    r"Statement Period\s+(\d{2}/\d{2}/\d{4})\s+to\s+(\d{2}/\d{2}/\d{4})"
)


def extract_wf_mastercard(text: str) -> ExtractResult:
    """Header-anchored table + no-space dual-date regex
    (wellsfargo_mastercard_parser.py:245-255) + R6 payment classification
    (:286-290) + R5 sign (:592-599) + R8 boundary (:258-285)."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    m = _STMT_PERIOD_MDY.search(text)
    if m:
        iso = D.parse_date(m.group(2))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_period")
    records: list[Record] = []
    in_table = False
    for ln in split_lines(text):
        if ln.text.startswith(_WFMC_HEADER):
            in_table = True
            _hit(hits, "t2_table_header")
            continue
        if not in_table:
            continue
        m = _WFMC_ROW.match(ln.text)
        if not m:
            continue
        trans_mmdd, _post, _ref, desc_raw, amt_raw = m.groups()
        mm, dd = int(trans_mmdd[:2]), int(trans_mmdd[3:5])
        iso = (
            D.repair_year_boundary(mm, dd, stmt_year, stmt_month)
            if stmt_year is not None and stmt_month is not None
            else None
        )
        desc = TN.normalize_description(desc_raw)
        # R6 (wellsfargo_mastercard_parser.py:286-290)
        ttype = (
            "credit"
            if ("AUTOMATIC PAYMENT" in desc_raw or "ONLINE PAYMENT" in desc_raw)
            else "charge"
        )
        amt = normalize_sign(clean_amount(amt_raw), ttype)
        records.append(Record(iso, amt, desc, ttype, ln.start, ln.end))
        _hit(hits, "r2_dual_date_row")
        if ttype == "credit":
            _hit(hits, "r6_payment_classified")
    return ExtractResult(records, hits, None)


# --- wells fargo visa (wellsfargo_visa_parser.py:112-193) ------------------

_WFV_PAYMENT = re.compile(
    r"^(\d{2}/\d{2})\s+(\d{2}/\d{2})\s+([A-Z0-9]+)\s+(.+?)\s+([\d,]+\.\d{2})$"
)
_WFV_PURCHASE = re.compile(
    r"^(\d{4})\s+(\d{2}/\d{2})\s+(\d{2}/\d{2})\s+([A-Z0-9]+)\s+(.+?)\s+([\d,]+\.\d{2})$"
)


def extract_wf_visa(text: str) -> ExtractResult:
    """Find-based section slicing (wellsfargo_visa_parser.py:117-124) with the
    payments (:128) and card-prefixed purchases (:163) regexes."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    m = _STMT_PERIOD_MDY.search(text)
    if m:
        iso = D.parse_date(m.group(2))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_period")

    def _date(mmdd: str) -> str | None:
        if stmt_year is None or stmt_month is None:
            return None
        return D.repair_year_boundary(
            int(mmdd[:2]), int(mmdd[3:5]), stmt_year, stmt_month
        )

    records: list[Record] = []
    pay_text, pay_off = capture_between(text, "Payments", "TOTAL PAYMENTS FOR THIS PERIOD")
    if pay_off >= 0:
        _hit(hits, "t2_section_slice")
        for ln in split_lines(pay_text):
            mm_ = _WFV_PAYMENT.match(ln.text)
            if mm_:
                amt = normalize_sign(clean_amount(mm_.group(5)), "payment")
                desc = TN.normalize_description(mm_.group(4))
                records.append(
                    Record(
                        _date(mm_.group(1)), amt, desc, "credit",
                        pay_off + ln.start, pay_off + ln.end,
                    )
                )
                _hit(hits, "r2_payment_row")
    # R18 coupon-block variant (wellsfargo_visa_parser.py:511-534)
    c_name, c_addr, c_acct = find_coupon_block(text)
    if c_addr:
        _hit(hits, "r18_coupon_block")
    if c_acct:
        _hit(hits, "r12_account_number")
    pur_text, pur_off = capture_between(text, "Purchases", "TOTAL PURCHASES FOR THIS PERIOD")
    if pur_off >= 0:
        _hit(hits, "t2_section_slice")
        for ln in split_lines(pur_text):
            mm_ = _WFV_PURCHASE.match(ln.text)
            if mm_:
                amt = normalize_sign(clean_amount(mm_.group(6)), "purchase")
                desc = TN.normalize_description(mm_.group(5))
                records.append(
                    Record(
                        _date(mm_.group(2)), amt, desc, "charge",
                        pur_off + ln.start, pur_off + ln.end,
                    )
                )
                _hit(hits, "r2_purchase_row")
    records.sort(key=lambda r: r.start)
    return ExtractResult(records, hits, None)


# --- first republic (first_republic_bank_parser.py:51-480) -----------------

_FR_DEBIT = re.compile(r"^(\d{2}/\d{2})\s+(.*?)\s+\$([\d,]+\.\d{2})\s*-$")
_FR_CREDIT = re.compile(r"^(\d{2}/\d{2})\s+(.*?)\s+\$([\d,]+\.\d{2})$")
_FR_INTEREST = re.compile(r"^INTEREST CREDIT\s+\$([\d,]+\.\d{2})$")
_FR_HEADERS = ("Deposits", "Withdrawals", "Checks")


def extract_first_republic(text: str) -> ExtractResult:
    """P6 footer strip (line level, first_republic_bank_parser.py:392-427),
    trailing-minus debit vs credit rows (:285, :357), continuation-line
    assembly (:303-308), R24 INTEREST CREDIT statement-end date
    (:313-315 + transaction_normalizer.py:67-93), R15 artifact strip (:430-432)."""
    hits: dict[str, int] = {}
    start_iso, end_iso, _src = D.extract_statement_period(text)
    if end_iso:
        _hit(hits, "r9_statement_period")
    stmt_year = int(end_iso[:4]) if end_iso else None
    stmt_month = int(end_iso[5:7]) if end_iso else None
    lines = split_lines(text)
    kept: list[Line] = []
    dropped = 0
    for ln in lines:
        if is_footer_line(ln.text):
            dropped += 1
        else:
            kept.append(ln)
    if dropped:
        _hit(hits, "p6_footer_dropped", dropped)

    records: list[Record] = []
    sign = 1

    def _date(mmdd: str) -> str | None:
        if stmt_year is None or stmt_month is None:
            return None
        return D.repair_year_boundary(
            int(mmdd[:2]), int(mmdd[3:5]), stmt_year, stmt_month
        )

    for ln in kept:
        if ln.text in _FR_HEADERS:
            sign = 1 if ln.text == "Deposits" else -1
            _hit(hits, "t2_section_header")
            continue
        m = _FR_INTEREST.match(ln.text)
        if m:
            amt = clean_amount(m.group(1))
            iso = D.interest_credit_date("INTEREST CREDIT", None, end_iso)
            if iso:
                _hit(hits, "r24_interest_credit")
            records.append(Record(iso, amt, "INTEREST CREDIT", "credit", ln.start, ln.end))
            continue
        m = _FR_DEBIT.match(ln.text)
        if m:
            amt = clean_amount(m.group(3))
            amt = -amt if amt is not None else None
            desc = TN.collapse_whitespace(TN.strip_trailing_artifacts(m.group(2)))
            records.append(Record(_date(m.group(1)), amt, desc, "charge", ln.start, ln.end))
            _hit(hits, "r3_withdrawal_row")
            continue
        m = _FR_CREDIT.match(ln.text)
        if m:
            amt = clean_amount(m.group(3))
            if sign < 0 and amt is not None:
                amt = -amt
            desc = TN.collapse_whitespace(TN.strip_trailing_artifacts(m.group(2)))
            records.append(
                Record(
                    _date(m.group(1)), amt, desc,
                    "credit" if sign > 0 else "charge", ln.start, ln.end,
                )
            )
            _hit(hits, "r3_deposit_row" if sign > 0 else "r3_withdrawal_row")
            continue
        # continuation line -> append to previous record's description
        if records and not is_footer_line(ln.text):
            prev = records[-1]
            desc = TN.collapse_whitespace(
                TN.strip_trailing_artifacts(prev.description + " " + ln.text)
            )
            records[-1] = prev._replace(description=desc, end=ln.end)
            _hit(hits, "t3_continuation")
    return ExtractResult(records, hits, None)


# --- wells fargo bank layout (wellsfargo_bank_parser.py:41-126) -------------

_MD_TOKEN = re.compile(r"^\d{1,2}/\d{1,2}$")


def extract_wf_bank_layout(text: str) -> ExtractResult:
    """T6 whitespace-geometry classification: the width of the space run
    before the amount encodes the column, hence deposit vs withdrawal
    (wellsfargo_bank_parser.py:41-126); amount = deposit - withdrawal (:411-416)."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    m = _STMT_DATE.search(text)
    if m:
        iso = D.parse_date(m.group(1))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_date")
    records: list[Record] = []
    for ln in split_lines(text):
        toks = ln.text.split()
        if len(toks) < 3 or not _MD_TOKEN.match(toks[0]):
            continue
        if not _AMOUNT_TOKEN.match(toks[-1]):
            continue
        kind = classify_by_space_geometry(ln.text)
        if kind is None:
            continue
        # two trailing numbers = amount + running balance
        has_balance = len(toks) >= 4 and _AMOUNT_TOKEN.match(toks[-2])
        amt_tok = toks[-2] if has_balance else toks[-1]
        desc_end = -2 if has_balance else -1
        amt = clean_amount(amt_tok)
        if kind == "withdrawal" and amt is not None:
            amt = -amt
        md = toks[0].split("/")
        iso = (
            D.repair_year_boundary(int(md[0]), int(md[1]), stmt_year, stmt_month)
            if stmt_year is not None and stmt_month is not None
            else None
        )
        desc = TN.normalize_description(" ".join(toks[1:desc_end]))
        records.append(Record(iso, amt, desc, kind, ln.start, ln.end))
        _hit(hits, f"t6_{kind}_geometry")
    return ExtractResult(records, hits, None)


# --- amazon order (amazon_parser.py:36-246, amazon_invoice_pdf_parser.py) --

_AMZ_DATE = re.compile(r"(?i)Order Placed: (.*?)\n")
_AMZ_ITEM_SPLIT = re.compile(r"(?=\d+ of:)")
_AMZ_QTY = re.compile(r"(\d+) of:\s*(.*)")
_AMZ_PRICE = re.compile(r"\$([\d,]+\.\d+)")
_AMZ_GIFT = re.compile(r"Gift Card Amount:-\$(\d+\.\d+)")


def extract_amazon_order(text: str) -> ExtractResult:
    """R16 field regexes + T4/T5 item split between 'Items Ordered' and
    'Shipping Address:' (amazon_parser.py:135-202, 162-185), R17 price*qty
    (:331-336); all item charges negative (tests/test_parser_contracts.py:74-82)."""
    hits: dict[str, int] = {}
    m = _AMZ_DATE.search(text + "\n")
    order_date = D.parse_date(m.group(1).strip()) if m else None
    if order_date:
        _hit(hits, "r16_order_placed")
    records: list[Record] = []
    items_text, items_off = capture_between(text, "Items Ordered", "Shipping Address:")
    if items_off >= 0:
        parts = _AMZ_ITEM_SPLIT.split(items_text)
        pos = 0
        for part in parts:
            # zero-width-lookahead split: parts concatenate exactly to
            # items_text, so offsets accumulate — no re-scan needed
            part_off = pos
            pos += len(part)
            qm = _AMZ_QTY.search(part)
            if not qm:
                continue
            qty = int(qm.group(1))
            name = TN.collapse_whitespace(qm.group(2))
            pm = _AMZ_PRICE.search(part)
            price = clean_amount(pm.group(1)) if pm else None
            amount = (
                normalize_sign(round(price * qty, 2), "charge")
                if price is not None
                else None
            )
            records.append(
                Record(
                    order_date, amount, name, "charge",
                    items_off + part_off, items_off + part_off + len(part.rstrip()),
                )
            )
            _hit(hits, "r16_item")
            _hit(hits, "r17_price_times_qty")
    g = _AMZ_GIFT.search(text)
    if g:
        amt = clean_amount(g.group(1))
        records.append(
            Record(order_date, amt, "Gift Card Amount", "credit", g.start(), g.end())
        )
        _hit(hits, "r16_gift_card")
    return ExtractResult(records, hits, None)


# --- shared CSV-family scaffold ---------------------------------------------


def csv_header_cols(line: str, required: tuple[str, ...]) -> list[str] | None:
    """Header line iff every required name is a CELL of the csv-split line
    (matching pd.read_csv + header-set can_parse semantics). Substring-only
    acceptance would treat 'Amount USD' as satisfying 'Amount' and then
    silently zero every row's amount via the coerce path."""
    if not all(h in line for h in required):
        return None  # cheap substring pre-filter
    cols = [c.strip() for c in next(_csv.reader(_io.StringIO(line)), [])]
    return cols if set(required) <= set(cols) else None


def has_csv_header(text: str, required: tuple[str, ...]) -> bool:
    """Detector-side predicate: EXACTLY the extractor's header acceptance."""
    return any(csv_header_cols(ln, required) for ln in text.split("\n"))


def _csv_rows(text: str, required: tuple[str, ...]) -> list[tuple[Line, dict]] | None:
    """Shared header-detect + row-parse scaffold for header-named CSV
    families: None when no valid header line exists; else the data rows as
    (Line, column->value dict), rows with a mismatched cell count skipped
    (pd.read_csv alignment semantics)."""
    cols: list[str] | None = None
    out: list[tuple[Line, dict]] = []
    for ln in split_lines(text):
        if cols is None:
            cols = csv_header_cols(ln.text, required)
            continue
        vals = next(_csv.reader(_io.StringIO(ln.text)), [])
        if len(vals) != len(cols):
            continue
        out.append((ln, dict(zip(cols, vals))))
    return None if cols is None else out


# --- amazon invoice variant (amazon_invoice_pdf_parser.py:53-156) -----------

_INV_PAID_BY = re.compile(r"Paid By: (.+)")
_INV_PLACED_BY = re.compile(r"Placed By: (.+)")
_INV_ORDER_NO = re.compile(r"Amazon.com order number: ([\d-]+)")
_INV_TOTAL = re.compile(r"Order Total: \$([\d\.,]+)")
_INV_PLACED = re.compile(r"Order Placed: ([A-Za-z]+ \d{1,2}, \d{4})")
_INV_SHIPPED = re.compile(r"Shipped on ([A-Za-z]+ \d{1,2}, \d{4})")
_INV_SHIP_ADDR = re.compile(r"Shipping Address:\n([\s\S]+?)\nShipping Speed:")
_INV_PAY_BLOCK = re.compile(r"Payment information\n([\s\S]+?)To view the status")
_INV_PAY_LINE = re.compile(
    r"([A-Za-z ]+) ending in (\d+): ([A-Za-z]+ \d{1,2}, \d{4}): \$([\d\.,]+)"
)
_INV_SHIP_SPLIT = re.compile(r"(?=Shipped on [A-Za-z]+ \d{1,2}, \d{4})")
_INV_ITEMS = re.compile(
    r"Items Ordered\s*Price\n([\s\S]+?)(?=Shipping Address:|Shipped on|Payment information|$)"
)
_INV_ITEM_SPLIT = re.compile(r"(?=\d+ of:)")
_INV_QTY = re.compile(r"(\d+) of:")
_INV_PRICES = re.compile(r"\$([\d\.,]+)")
_INV_DESC_TAIL = re.compile(
    r"\n?(Sold by:.*|Supplied by:.*|Condition:.*)$", re.MULTILINE | re.DOTALL
)


def parse_invoice_fields(text: str) -> dict:
    """R16 invoice-variant field extraction (amazon_invoice_pdf_parser.py:
    53-106 parse_invoice_text): paid_by / placed_by / order_number /
    order_total / order_placed / shipped_date / shipping_address / payment
    block — the exact regexes, ISO dates via the '%B %d, %Y' parse (:19-31)."""
    out: dict = {}
    if m := _INV_PAID_BY.search(text):
        out["paid_by"] = m.group(1).strip()
    if m := _INV_PLACED_BY.search(text):
        out["placed_by"] = m.group(1).strip()
    if m := _INV_ORDER_NO.search(text):
        out["order_number"] = m.group(1).strip()
    if m := _INV_TOTAL.search(text):
        out["order_total"] = clean_amount(m.group(1))
    if m := _INV_PLACED.search(text):
        out["order_placed"] = D.parse_date(m.group(1).strip())
    if m := _INV_SHIPPED.search(text):
        out["shipped_date"] = D.parse_date(m.group(1).strip())
    if m := _INV_SHIP_ADDR.search(text):
        out["shipping_address"] = m.group(1).strip()
    if m := _INV_PAY_BLOCK.search(text):
        if m2 := _INV_PAY_LINE.search(m.group(1)):
            out["payment_method"] = m2.group(1).strip() + " " + m2.group(2)
            out["payment_date"] = D.parse_date(m2.group(3).strip())
            out["payment_amount"] = clean_amount(m2.group(4))
    return out


def _invoice_items(items_block: str) -> list[dict]:
    """Item sections: '(?=\\d+ of:)' split, LAST price anchors the amount,
    description = text before it minus trailing Sold by/Supplied by/Condition
    lines (amazon_invoice_pdf_parser.py:112-156)."""
    items: list[dict] = []
    for section in _INV_ITEM_SPLIT.split(items_block):
        if not section.strip():
            continue
        qm = _INV_QTY.match(section)
        if not qm:
            continue
        qty = int(qm.group(1))
        item_text = section[qm.end():].strip()
        prices = _INV_PRICES.findall(item_text)
        if not prices:
            continue
        price = float(prices[-1].replace(",", ""))
        desc_end = item_text.rfind(f"${prices[-1]}")
        desc = _INV_DESC_TAIL.sub("", item_text[:desc_end].strip()).strip()
        items.append({"quantity": qty, "description": desc, "price": price})
    return items


def extract_amazon_invoice(text: str) -> ExtractResult:
    """Invoice-variant order parsing (amazon_invoice_pdf_parser.py:159-256):
    one record per 'Shipped on'-delimited shipment block; amount = sum
    price*qty over its items (fallback order_total), sign-normalized as a
    debit; description = '; '-joined item descriptions; field inventory
    (paid_by / order_number / ...) surfaced as rule-hit flags."""
    hits: dict[str, int] = {}
    fields = parse_invoice_fields(text)
    for k in fields:
        _hit(hits, f"r16_{k}")
    order_placed = fields.get("order_placed")
    order_total = fields.get("order_total")
    records: list[Record] = []
    pos = 0
    for block in _INV_SHIP_SPLIT.split(text):
        # zero-width split: blocks concatenate to text, offsets accumulate
        block_off = pos
        pos += len(block)
        if "Items Ordered" not in block:
            continue
        im = _INV_ITEMS.search(block)
        if not im:
            continue
        items = _invoice_items(im.group(1).strip())
        if not items:
            continue
        total = round(sum(i["price"] * i["quantity"] for i in items), 2)
        final = total if total > 0 else order_total
        amount = normalize_sign(final, "debit")
        desc = "; ".join(i["description"] for i in items)
        if not order_placed:
            _hit(hits, "p7_skipped_no_date")
            continue
        records.append(
            Record(
                order_placed, amount, desc, "charge",
                block_off, block_off + len(block.rstrip()),
            )
        )
        _hit(hits, "r16_shipment_record")
        _hit(hits, "r17_price_times_qty", len(items))
    return ExtractResult(records, hits, None)


# --- bofa visa (bofa_visa_parser.py:27-53, 89-125, 156) ----------------------

_BOFA_VISA_ROW = re.compile(
    r"(\d{2}/\d{2})\s+(\d{2}/\d{2})?\s+(.*?)(\d{4})?\s+(\d{4})?\s+([\d,]+\.\d{2})?$"
)


def extract_bofa_visa(text: str) -> ExtractResult:
    """BofA Visa: 'Purchases and Adjustments' start flag (bofa_visa_parser.py:
    94-97), the 6-group optional row regex (:100-103), append_year Dec/Jan
    repair against the FILENAME statement date (:27-53 + the filename split at
    :74), and date-sorted output — the reference sorts the 'MM/DD/YYYY'
    STRING column (:156), i.e. by (month, day, year); reproduced verbatim."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    iso = D.date_from_filename(text.split("\n", 1)[0])
    if iso:
        stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
        _hit(hits, "r10_date_from_filename")
    started = False
    rows: list[tuple[str, Record]] = []
    # RAW lines, not split_lines: the reference matches unstripped lines
    # (bofa_visa_parser.py:98-103), and the row regex's optional amount
    # group only engages when trailing whitespace survives — stripping
    # would silently drop exactly the rows P5 is meant to quarantine
    pos = 0
    for raw in text.split("\n"):
        ln_start, ln_len = pos, len(raw)
        pos += ln_len + 1
        if "Purchases and Adjustments" in raw:
            started = True
            _hit(hits, "t2_section_flag")
            continue
        if not started:
            continue
        # anchored at column 0 like the reference's re.match on raw lines:
        # indented rows do NOT match there either (faithful, if lossy)
        rm = _BOFA_VISA_ROW.match(raw)
        if not rm:
            continue
        mmdd, _post, desc_raw, _ref, _acct, amt_raw = rm.groups()
        mm, dd = int(mmdd[:2]), int(mmdd[3:5])
        # append_year (bofa_visa_parser.py:44-49)
        if stmt_year is not None and stmt_month is not None:
            iso = D.repair_year_boundary(mm, dd, stmt_year, stmt_month)
            if stmt_month == 1 and mm == 12:
                _hit(hits, "r8_year_boundary")
        else:
            iso = None
        amt = clean_amount(amt_raw)
        desc = TN.normalize_description(desc_raw)
        rec = Record(iso, amt, desc, None, ln_start, ln_start + len(raw.rstrip()))
        rows.append((f"{mm:02d}/{dd:02d}/{iso[:4] if iso else '0000'}", rec))
        _hit(hits, "r2_bofa_visa_row")
        if amt is None:
            _hit(hits, "p5_missing_amount_row")
    # sort_values on the MM/DD/YYYY string column (bofa_visa_parser.py:156):
    # lexicographic on (month, day, year) — stable here, ties keep scan order
    rows.sort(key=lambda t: t[0])
    return ExtractResult([r for _, r in rows], hits, None)


# --- apple card CSV (apple_card_csv_parser.py:38-135) ------------------------

_APPLE_REQUIRED = ("Transaction Date", "Clearing Date", "Description", "Amount (USD)")


def extract_csv_apple_card(text: str) -> ExtractResult:
    """Apple Card CSV: header-set detection (apple_card_csv_parser.py:
    122-135), 'payment'-in-Type classification (:66-69), and the INVERTED
    sign source — is_charge_positive=True negates unconditionally
    (:71-79 + data_transformation.py:71-75): in-file charges are positive
    (-> negative) and payments negative (-> positive)."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    rows = _csv_rows(text, _APPLE_REQUIRED)
    if rows is None:
        return ExtractResult([], hits, None)
    _hit(hits, "s4_header_detected")
    for ln, row in rows:
        iso = D.parse_date(row.get("Transaction Date", ""))
        ttype = "credit" if "payment" in row.get("Type", "").lower() else "debit"
        amt = normalize_sign(
            clean_amount(row.get("Amount (USD)")), ttype, is_charge_positive=True
        )
        desc = TN.normalize_description(row.get("Description", ""))
        records.append(Record(iso, amt, desc, ttype, ln.start, ln.end))
        _hit(hits, "r5_inverted_sign")
    return ExtractResult(records, hits, None)


# --- capital one CSV (capitalone_csv_parser.py:74-134) ----------------------

_CAPONE_HEADER = "Transaction Date,Posted Date,Card No.,Description,Category,Debit,Credit"


def extract_csv_capitalone(text: str) -> ExtractResult:
    """S4 header-detected CSV; debit -> negative, credit -> positive via
    np.where (capitalone_csv_parser.py:119-134); coerce->0.0 (:119-120)."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    seen_header = False
    for ln in split_lines(text):
        if ln.text.startswith(_CAPONE_HEADER):
            seen_header = True
            _hit(hits, "s4_header_detected")
            continue
        if not seen_header:
            continue
        # csv.reader like the reference's pd.read_csv: quoted descriptions
        # may carry commas ('"AMAZON.COM, INC"') that a raw split would
        # explode into extra columns and silently drop
        cols = next(_csv.reader(_io.StringIO(ln.text)), [])
        if len(cols) != 7:
            continue
        tdate, _pdate, _card, desc, _cat, debit, credit = cols
        iso = D.parse_date(tdate)
        d = clean_amount(debit)
        # reference: np.where(Debit != 0, -abs(Debit), abs(Credit)) — an
        # explicit '0.00' debit takes the CREDIT branch, not string truthiness
        if d is not None and d != 0:
            amt = -abs(d)
            ttype = "charge"
        else:
            amt = abs(clean_amount(credit) or 0.0)
            ttype = "credit"
        records.append(
            Record(iso, amt, TN.normalize_description(desc), ttype, ln.start, ln.end)
        )
        _hit(hits, "r5_debit_credit_combined")
    return ExtractResult(records, hits, None)


# --- amazon order HISTORY page (amazon_pdf_parser.py:47-126) -----------------

_AMZ_HIST_SPLIT = "ORDER PLACED"
_AMZ_HIST_DATE_HEAD = re.compile(r"^([A-Za-z]+ \d{1,2}, \d{4})")
_AMZ_HIST_DATE_ANY = re.compile(r"([A-Za-z]+ \d{1,2}, \d{4})")
_AMZ_HIST_TOTAL = re.compile(r"TOTAL\s*\$([\d\.,]+)")
_AMZ_HIST_ORDERNUM = re.compile(r"ORDER # ([\d\-]+)")
_AMZ_HIST_SHIPTO = re.compile(r"SHIP TO\n([A-Za-z ]+)")
_AMZ_HIST_PROD_SPLIT = re.compile(r"View order details|View invoice")
_AMZ_HIST_SKIP_PREFIXES = (
    "Return", "Buy it again", "Get product support",
    "Write a product review", "Ask Product Question",
)
_AMZ_HIST_BOILER = frozenset(
    (
        "view invoice", "view your item", "replace item", "share gift receipt",
        "write a product review", "get product support", "ask product question",
        "buy it again",
    )
)


def extract_amazon_history(text: str) -> ExtractResult:
    """Amazon order-HISTORY page (amazon_pdf_parser.py:47-126): T4 block
    split on 'ORDER PLACED', per-block date (anchored then first-40-chars
    fallback), TOTAL amount coerced to 0.0, order number, SHIP TO, the
    FIRST-3 product lines after 'View order details|View invoice' with the
    boilerplate-prefix skip (O2 + P6 citations in SURVEY), and the
    description pick ladder with its 'Amazon Order' fallback."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    parts = text.split(_AMZ_HIST_SPLIT)
    pos = len(parts[0])
    for block in parts[1:]:
        block_off = pos + len(_AMZ_HIST_SPLIT)
        pos = block_off + len(block)
        dm = _AMZ_HIST_DATE_HEAD.search(block.lstrip())
        if not dm:
            dm = _AMZ_HIST_DATE_ANY.search(block[:40])
        order_date = D.parse_date(dm.group(1).strip()) if dm else None
        tm = _AMZ_HIST_TOTAL.search(block)
        amount = clean_amount_or_zero(tm.group(1)) if tm else 0.0
        if _AMZ_HIST_ORDERNUM.search(block):
            _hit(hits, "r16_order_number")
        if _AMZ_HIST_SHIPTO.search(block):
            _hit(hits, "r18_ship_to")
        product_lines: list[str] = []
        prod_section = _AMZ_HIST_PROD_SPLIT.split(block, maxsplit=1)
        if len(prod_section) > 1:
            for line in prod_section[1].split("\n"):
                s = line.strip()
                if s and not any(s.startswith(p) for p in _AMZ_HIST_SKIP_PREFIXES):
                    product_lines.append(s)
                if len(product_lines) >= 3:  # O2 first-3 (amazon_pdf_parser.py:88-89)
                    break
        description = None
        for pline in product_lines:
            if pline.lower() not in _AMZ_HIST_BOILER and not pline.lower().startswith("return"):
                description = pline
                break
        if not description:
            for pline in product_lines:
                if len(pline.strip()) > 10:
                    description = pline
                    break
        if not description:
            description = "Amazon Order"
            _hit(hits, "p6_description_fallback")
        records.append(
            Record(
                order_date, amount, TN.normalize_description(description), None,
                block_off, block_off + len(block.rstrip()),
            )
        )
        _hit(hits, "t4_order_block")
    return ExtractResult(records, hits, None)


# --- chase visa CSV (chase_visa_csv_parser.py:40-100) ------------------------

_CHASE_CSV_REQUIRED = ("Transaction Date", "Post Date", "Amount", "Description")


def extract_chase_visa_csv(text: str) -> ExtractResult:
    """Chase Visa CSV export (chase_visa_csv_parser.py:40-100): header-set
    detection {Transaction Date, Post Date, Amount, Description}, strict
    %m/%d/%Y date parse (anything else -> None), amount coerced to 0.0 on
    parse failure (:26-31), amounts carry their in-file sign (charges are
    already negative in Chase exports; the parser applies no normalization)."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    rows = _csv_rows(text, _CHASE_CSV_REQUIRED)
    if rows is None:
        return ExtractResult([], hits, None)
    _hit(hits, "s4_header_detected")
    for ln, row in rows:
        # strict single-format parse (parse_date, :33-38): %m/%d/%Y or None
        raw_date = (row.get("Transaction Date") or "").strip()
        iso = D.parse_date(raw_date) if _MMDDYYYY_SHAPE.match(raw_date) else None
        amt = clean_amount_or_zero(row.get("Amount"))  # coerce->0.0 (:26-31)
        ttype_raw = (row.get("Type") or "").lower()
        ttype = "credit" if "payment" in ttype_raw else ("charge" if ttype_raw else None)
        desc = TN.normalize_description(row.get("Description", ""))
        records.append(Record(iso, amt, desc, ttype, ln.start, ln.end))
        _hit(hits, "s4_csv_row")
    return ExtractResult(records, hits, None)


_MMDDYYYY_SHAPE = re.compile(r"^\d{1,2}/\d{1,2}/\d{4}$")


# --- capital one visa PRINT (capitalone_visa_print_parser.py:83-171) --------

_CAPONE_PRINT_HEADER = re.compile(
    r"DATE\s+DESC\s*RIPTION\s+CATEGORY\s+CARD\s+AMOUN\s*T", re.IGNORECASE
)
_MONTH_ABBREV_START = re.compile(
    r"^(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\b"
)
_CAPONE_PRINT_ROW = re.compile(
    r"^(?P<date>[A-Za-z]{3,}(?: \d{1,2})?)\s+(?P<desc>.+?)\s+(-?\$?\d*[\d,]*\.\d{2}|-?\$)\.?$"
)
_CAPONE_PRINT_AMT_TAIL = re.compile(r"(-?\$?\d*[\d,]*\.\d{2}|-?\$)\.?$")
_CAPONE_PRINT_DATE_HEAD = re.compile(
    r"^(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\b(?: \d{1,2})?"
)
_MONTH_ABBREVS = {
    m: i + 1
    for i, m in enumerate(
        ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    )
}


def _capone_print_clean(line: str) -> str:
    """T7 per the reference (capitalone_visa_print_parser.py:95-102):
    printable chars only, nulls dropped, stripped. NOTE: tabs are
    NON-printable, so the reference DELETES them — tab-separated tokens glue
    together; reproduced faithfully (the parity bar beats prettier output).
    The all-printable common case short-circuits to one C-level check
    instead of a per-char loop."""
    if line.isprintable():
        return line.strip()
    return "".join(c for c in line if c.isprintable() and c != "\x00").strip()


def extract_capitalone_print(text: str) -> ExtractResult:
    """Capital One print statement (capitalone_visa_print_parser.py:83-171):
    header-anchored table start (the regex tolerates in-word splits from PDF
    extraction: 'DESC RIPTION', 'AMOUN T'), T7 line cleaning, T3 buffering —
    a new transaction starts at a month-abbreviation line, continuations
    join the buffer — then the reference's date/desc/amount regex with its
    amount-at-end fallback; '-$'/empty amounts become None (quarantined by
    P5). DOCUMENTED EXTENSION: the reference leaves transaction_date as the
    raw 'Dec 5' string (its normalize_data is a TODO); our pipeline contract
    is ISO, so the month-abbrev date is resolved against the statement date
    with the R8 year-boundary repair."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    sm = _STMT_DATE.search(text)
    if sm:
        iso = D.parse_date(sm.group(1))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_date")
    hm = _CAPONE_PRINT_HEADER.search(text)
    if not hm:
        return ExtractResult([], hits, None)
    _hit(hits, "t2_table_header")
    table_off = hm.end()
    table = text[table_off:]

    # (cleaned_line, start_off, end_off) — offsets into the original text,
    # trimmed to the content like every other family's spans
    lines: list[tuple[str, int, int]] = []
    pos = 0
    for raw in table.split("\n"):
        cl = _capone_print_clean(raw)
        if cl:
            lead = len(raw) - len(raw.lstrip())
            lines.append(
                (cl, table_off + pos + lead, table_off + pos + len(raw.rstrip()))
            )
            if cl != raw.strip():
                _hit(hits, "t7_nonprintable_stripped")
        pos += len(raw) + 1

    records: list[Record] = []

    def flush(buf: list[tuple[str, int, int]]) -> None:
        if not buf:
            return
        joined = " ".join(cl for cl, _, _ in buf)
        m = _CAPONE_PRINT_ROW.match(joined)
        if m:
            date_raw, desc, amt_raw = m.group("date"), m.group("desc"), m.group(3)
        else:
            am = _CAPONE_PRINT_AMT_TAIL.search(joined)
            dm = _CAPONE_PRINT_DATE_HEAD.match(joined)
            if not (am and dm):
                _hit(hits, "p7_unparsed_buffer")
                return
            date_raw = dm.group(0).strip()
            amt_raw = am.group(1)
            desc = joined[len(date_raw):am.start()].strip()
            _hit(hits, "t3_fallback_parse")
        amt_s = amt_raw.replace("$", "").replace(",", "").strip()
        try:
            amount = float(amt_s) if amt_s not in ("-", "") else None
        except ValueError:
            amount = None
        parts = date_raw.split()
        iso = None
        if (
            len(parts) == 2
            and parts[0] in _MONTH_ABBREVS
            and stmt_year is not None
            and stmt_month is not None
        ):
            iso = D.repair_year_boundary(
                _MONTH_ABBREVS[parts[0]], int(parts[1]), stmt_year, stmt_month
            )
        records.append(
            Record(
                iso, amount, TN.normalize_description(desc), None,
                buf[0][1], buf[-1][2],
            )
        )
        _hit(hits, "t3_buffer_record")
        if len(buf) > 1:
            _hit(hits, "t3_continuation", len(buf) - 1)

    buf: list[tuple[str, int, int]] = []
    for item in lines:
        if _MONTH_ABBREV_START.match(item[0]):
            flush(buf)
            buf = []
        buf.append(item)
    flush(buf)
    return ExtractResult(records, hits, None)


# --- wells fargo checking CSV (wellsfargo_checking_csv_parser.py:55-161) ----

_WFCK_ROW = re.compile(r"^(\d{1,2}/\d{1,2}/\d{4}),(-?[\d.]+),\*,(.*?),(.*)$")


def extract_csv_wf_checking(text: str) -> ExtractResult:
    """S4 headerless positional CSV (wellsfargo_checking_csv_parser.py:94-98);
    R11 statement-date-from-last-row provenance (:119-128)."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    for ln in split_lines(text):
        m = _WFCK_ROW.match(ln.text)
        if not m:
            continue
        iso = D.parse_date(m.group(1))
        amt = clean_amount(m.group(2))
        desc = TN.normalize_description(m.group(4))
        ttype = "credit" if (amt or 0) >= 0 else "charge"
        records.append(Record(iso, amt, desc, ttype, ln.start, ln.end))
        _hit(hits, "s4_positional_row")
    if records:
        _hit(hits, "r11_statement_from_last_row")  # provenance: last valid date
    return ExtractResult(records, hits, None)


# --- wells fargo bank CSV (wellsfargo_bank_csv_parser.py:55-133) -------------

_WFB_FILE = re.compile(r"^FILE:\s*(.+)$", re.MULTILINE)
_WFB_PATH = re.compile(r"^PATH:\s*(.+)$", re.MULTILINE)
# positional 5-col split: any amount cell (coerced later), optional check
# number, description keeps its tail verbatim (pd.read_csv names= alignment)
_WFB_ROW = re.compile(r"^(\d{1,2}/\d{1,2}/\d{4}),([^,]*),\*,([^,]*),(.*)$")


def extract_wf_bank_csv(text: str) -> ExtractResult:
    """Wells Fargo BANK-account CSV export (wellsfargo_bank_csv_parser.py:
    55-133) — distinct from the checking-CSV family by its optional
    check-number column and its filename-FIRST statement-date ladder:

    - strict ``%m/%d/%Y`` date (:47-52; None on any other shape),
    - amount via the strict commas-only coerce (:35-44 — ``float(str.replace
      (',', ''))`` with 0.0 on ANY failure, so ``'$12.00'`` and ``'(45.00)'``
      coerce to 0.0 exactly like parse_amount; never None, so an unparseable
      amount never quarantines this family),
    - provenance ladder (:82-113): original_filename -> input_path ->
      last_row, recorded with the reference's statement_date_source enum as
      a rule-hit key (models.py StatementMetadata.statement_date_source).
    """
    hits: dict[str, int] = {}
    records: list[Record] = []
    valid_dates: list[str] = []
    for ln in split_lines(text):
        m = _WFB_ROW.match(ln.text)
        if not m:
            continue
        iso = D.parse_date_mdy_strict(m.group(1))
        amt = coerce_amount_commas_only(m.group(2))
        desc = TN.normalize_description(m.group(4))
        if iso:
            valid_dates.append(iso)
        records.append(Record(iso, amt, desc, "Unknown", ln.start, ln.end))
        _hit(hits, "wfb_csv_row")
    stmt: str | None = None
    source: str | None = None
    mf = _WFB_FILE.search(text)
    if mf:
        stmt = D.date_from_filename(mf.group(1))
        if stmt:
            source = "original_filename"
    if stmt is None:
        mp = _WFB_PATH.search(text)
        if mp:
            stmt = D.date_from_filename(mp.group(1))
            if stmt:
                source = "input_path"
    if stmt is None and valid_dates:
        stmt = valid_dates[-1]
        source = "last_row"
    if source:
        _hit(hits, f"r10_statement_source_{source}")
    return ExtractResult(records, hits, None)


# --- noisy descriptions (transaction_normalizer.py:381-407) ------------------


def extract_noisy_desc(text: str) -> ExtractResult:
    """R13-R15 + T7 over memo lines: the pure normalization family."""
    hits: dict[str, int] = {}
    out: list[str] = []
    for ln in split_lines(text):
        s = ln.text
        if s.startswith("MEMO "):
            s = s[5:]
        # strip_trailing=True: this family models FR-style memo lines, so the
        # bank-specific R15 tail strip applies (first_republic:430-432)
        cleaned = TN.normalize_description(TN.strip_non_printable(s), strip_trailing=True)
        if cleaned:
            out.append(cleaned)
            _hit(hits, "r13_description_normalized")
    return ExtractResult([], hits, out)


# --- date audit rows (normalize_api.py:188-215 date ladder) ------------------


def extract_date_edges(text: str) -> ExtractResult:
    """R7 coalescing ladder + R8 boundary over pipe-delimited audit rows."""
    hits: dict[str, int] = {}
    stmt_year = stmt_month = None
    m = _STMT_DATE.search(text)
    if m:
        iso = D.parse_date(m.group(1))
        if iso:
            stmt_year, stmt_month = int(iso[:4]), int(iso[5:7])
            _hit(hits, "r9_statement_date")
    records: list[Record] = []
    for ln in split_lines(text):
        if "|" not in ln.text:
            continue
        parts = ln.text.split("|")
        if len(parts) != 3:
            continue
        raw_date, raw_amt, desc = parts
        if stmt_year is not None and stmt_month is not None and _MMDD_SLASH.match(raw_date.strip()):
            iso = D.parse_mmdd_with_statement(raw_date.strip(), stmt_year, stmt_month)
            if iso and stmt_month == 1 and iso[:4] != str(stmt_year):
                _hit(hits, "r8_year_boundary")
        else:
            iso = D.parse_date(raw_date, statement_year=stmt_year)
        amt = clean_amount(raw_amt)
        records.append(
            Record(
                iso, amt, TN.normalize_description(desc),
                "credit" if (amt or 0) >= 0 else "charge", ln.start, ln.end,
            )
        )
        _hit(hits, "r7_date_ladder")
    return ExtractResult(records, hits, None)


_MMDD_SLASH = re.compile(r"^\d{1,2}/\d{1,2}$")


# --- ledger rows (validity/quarantine P5) ------------------------------------


def extract_ledger_rows(text: str) -> ExtractResult:
    """P5 validity exercise: pipe rows, possibly missing fields
    (transaction_normalizer.py:41-65 _is_valid_row semantics applied downstream)."""
    hits: dict[str, int] = {}
    records: list[Record] = []
    for ln in split_lines(text):
        if "|" not in ln.text:
            continue
        parts = ln.text.split("|")
        if len(parts) != 3:
            continue
        raw_date, raw_amt, desc = (p.strip() for p in parts)
        iso = D.parse_date(raw_date)
        amt = clean_amount(raw_amt)
        records.append(
            Record(
                iso, amt, TN.normalize_description(desc),
                None, ln.start, ln.end,
            )
        )
        _hit(hits, "p5_row_checked")
    return ExtractResult(records, hits, None)


# --- html main-content path ---------------------------------------------------


def extract_html_page(text: str) -> ExtractResult:
    """HTML boilerplate strip (rules/html.py): DOM-lite tokenize, drop
    script/style/comments, classify lines by text density + link density,
    keep main content. The north-rule DOM-heuristic component."""
    from .html import extract_main_content

    kept, hits = extract_main_content(text)
    return ExtractResult([], hits, kept)


# --- freeform main-content path ----------------------------------------------


def extract_freeform(text: str) -> ExtractResult:
    """Main-content extraction: P6 boilerplate strip + T7 + R14 per line
    (the readability-style default path for non-statement turns)."""
    hits: dict[str, int] = {}
    raw_lines = [ln.text for ln in split_lines(text)]
    kept, dropped = strip_boilerplate_lines(raw_lines)
    if dropped:
        _hit(hits, "p6_footer_dropped", dropped)
    out = []
    for s in kept:
        cleaned = TN.collapse_whitespace(TN.strip_non_printable(s))
        if cleaned:
            out.append(cleaned)
    if out:
        _hit(hits, "content_lines", len(out))
    return ExtractResult([], hits, out)


EXTRACTORS = {
    "chase_visa": extract_chase_visa,
    "chase_checking": extract_chase_checking,
    "bofa_bank": extract_bofa_bank,
    "bofa_visa": extract_bofa_visa,
    "amazon_invoice": extract_amazon_invoice,
    "amazon_history": extract_amazon_history,
    "csv_apple_card": extract_csv_apple_card,
    "chase_visa_csv": extract_chase_visa_csv,
    "capitalone_print": extract_capitalone_print,
    "wf_mastercard": extract_wf_mastercard,
    "wf_visa": extract_wf_visa,
    "first_republic": extract_first_republic,
    "wf_bank_layout": extract_wf_bank_layout,
    "amazon_order": extract_amazon_order,
    "csv_capitalone": extract_csv_capitalone,
    "wf_bank_csv": extract_wf_bank_csv,
    "csv_wf_checking": extract_csv_wf_checking,
    "noisy_desc": extract_noisy_desc,
    "date_edges": extract_date_edges,
    "ledger_rows": extract_ledger_rows,
    "html_page": extract_html_page,
    "freeform": extract_freeform,
}
