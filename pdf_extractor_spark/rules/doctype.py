"""S5 content-based format detection — first-match dispatch (SURVEY.md §2.1).

Reference semantics: registry.py:22-36 dispatches to the FIRST parser whose
``can_parse`` returns True, in registration order; each parser checks marker
phrases (e.g. wellsfargo_mastercard_parser.py:57-71 looks for
'"wells fargo" and "account number" and ("business card"|"credit line")').

DETECTION_ORDER is the registration order and is part of the contract
(SURVEY.md §7.8 #4): tests pin it, and the Spark-side ``when`` chain in
functions/exprs.py preserves it.
"""

from __future__ import annotations

import re

# shared anchors: detector and extractor must use the SAME predicate, or
# detection routes text to a family whose extractor then finds nothing
from .extractors import (
    _APPLE_REQUIRED,
    _CAPONE_PRINT_HEADER,
    _CHASE_CSV_REQUIRED,
    has_csv_header,
)

_CSV_CAPONE_HEADER = "Transaction Date,Posted Date,Card No.,Description"
_WF_CHECKING_ROW = re.compile(r"^\d{1,2}/\d{1,2}/\d{4},-?[\d.]+,\*,,", re.MULTILINE)

# (family, predicate) in registration order — first match wins.
DETECTION_ORDER: tuple[str, ...] = (
    "html_page",
    "wf_mastercard",
    "wf_visa",
    "bofa_bank",
    "bofa_visa",
    "first_republic",
    "chase_checking",
    "chase_visa",
    "wf_bank_layout",
    # invoice variant BEFORE the simple order family: invoice text also
    # contains 'Order Placed:' (registration-order semantics, registry.py)
    "amazon_invoice",
    "amazon_history",
    "amazon_order",
    "csv_apple_card",
    "chase_visa_csv",
    "csv_capitalone",
    "capitalone_print",
    # bank CSV BEFORE checking CSV: its rows also match the checking row
    # shape when the check column is empty; the FILE: marker disambiguates
    "wf_bank_csv",
    "csv_wf_checking",
    "noisy_desc",
    "date_edges",
    "ledger_rows",
)


def detect_family(text: str) -> str:
    """First-match family detection; 'freeform' when nothing matches.

    Marker phrases mirror the reference's can_parse checks (S5 citations in
    SURVEY.md §2.1); our synthetic families carry bank-name headers the same
    way real statements do.
    """
    from .html import looks_like_html

    low = text.lower()
    if looks_like_html(text, lowered=low):
        return "html_page"
    if "transpostreference number description credits charges" in low:
        return "wf_mastercard"
    if "total payments for this period" in low:
        return "wf_visa"
    if "deposits and other additions" in low or "withdrawals and other subtractions" in low:
        return "bofa_bank"
    if "purchases and adjustments" in low:
        return "bofa_visa"
    if "first republic" in low:
        return "first_republic"
    if "checking summary" in low or "*start*" in low:
        return "chase_checking"
    if "chase visa" in low:
        return "chase_visa"
    if "wells fargo bank" in low:
        return "wf_bank_layout"
    if "final details for order" in low and "amazon.com order number" in low:
        return "amazon_invoice"  # can_parse, amazon_invoice_pdf_parser.py:33-42
    if "ORDER PLACED" in text and "ORDER #" in text:
        return "amazon_history"  # amazon_pdf_parser.py:133-139 can_parse markers
    if "order placed:" in low:
        return "amazon_order"
    # EXACTLY the extractor's own header predicate (all four header names on
    # ONE line, case-sensitive): looser detection would route prose that
    # mentions column names to a family that then drops every record;
    # tighter detection (e.g. comma-adjacency) would reject reordered or
    # space-padded headers the extractor can parse fine
    if "Amount (USD)" in text and has_csv_header(text, _APPLE_REQUIRED):
        return "csv_apple_card"  # apple_card_csv_parser.py:122-135
    if "Post Date" in text and has_csv_header(text, _CHASE_CSV_REQUIRED):
        return "chase_visa_csv"  # chase_visa_csv_parser.py:87-97
    if _CSV_CAPONE_HEADER.lower() in low:
        return "csv_capitalone"
    if _CAPONE_PRINT_HEADER.search(text):
        return "capitalone_print"  # capitalone_visa_print_parser.py:83-86
    if low.startswith("file: wellsfargo_bank"):
        return "wf_bank_csv"  # wellsfargo_bank_csv_parser.py (dir-routed in ref)
    if _WF_CHECKING_ROW.search(text):
        return "csv_wf_checking"
    if low.startswith("memo "):
        return "noisy_desc"
    if "date audit" in low:
        return "date_edges"
    if "ledger rows" in low:
        return "ledger_rows"
    return "freeform"
