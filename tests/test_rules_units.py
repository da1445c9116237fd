"""Unit coverage for rule modules: detection order (S5 contract), amount
formatting parity (R4/R5 Decimal hop), whitespace-geometry classifier (T6)."""

from __future__ import annotations

from decimal import Decimal

from pdf_extractor_spark.rules.amounts import clean_amount, format_amount, normalize_sign
from pdf_extractor_spark.rules.doctype import DETECTION_ORDER, detect_family
from pdf_extractor_spark.rules.extractors import EXTRACTORS
from pdf_extractor_spark.rules.segment import (
    analyze_line_elements,
    classify_by_space_geometry,
)


def test_detection_order_is_pinned():
    """S5 first-match order IS the contract (SURVEY §7.8 #4) — changing it
    reroutes ambiguous documents, so any reorder must be deliberate."""
    assert DETECTION_ORDER == (
        "html_page",
        "wf_mastercard",
        "wf_visa",
        "bofa_bank",
        "first_republic",
        "chase_checking",
        "chase_visa",
        "wf_bank_layout",
        "amazon_order",
        "csv_capitalone",
        "csv_wf_checking",
        "noisy_desc",
        "date_edges",
        "ledger_rows",
    )
    assert set(DETECTION_ORDER) | {"freeform", "null"} >= set(EXTRACTORS) - {"freeform"}


def test_first_match_wins_on_ambiguous_doc():
    # contains BOTH wf_mastercard and bofa markers: registration order decides
    both = (
        "TransPostReference Number Description Credits Charges\n"
        "Deposits and other additions"
    )
    assert detect_family(both) == "wf_mastercard"


def test_amount_clean_variants():
    assert clean_amount("$1,234.56") == 1234.56
    assert clean_amount("1,234.56") == 1234.56
    assert clean_amount("-45.00") == -45.0
    assert clean_amount("") is None
    assert clean_amount("abc") is None


def test_sign_normalization_classes():
    # charge keywords force negative, credit keywords force positive
    assert normalize_sign(50.0, "charge") == -50.0
    assert normalize_sign(-50.0, "charge") == -50.0
    assert normalize_sign(-20.0, "credit") == 20.0
    assert normalize_sign(20.0, "deposit") == 20.0


def test_format_amount_reference_float_repr():
    """R4/R5 byte parity: the reference formats via a Decimal hop then
    Python str() of float (data_transformation.py:51-83)."""
    for raw in ("1234.56", "0.10", "2500.00", "-0.07"):
        assert format_amount(float(raw)) == str(float(Decimal(raw)))
    assert format_amount(None) == ""


def test_t6_geometry_runs_and_classification():
    runs = analyze_line_elements("12/5 STORE     1,200.00  4,500.00")
    kinds = [k for k, _ in runs]
    assert kinds[0] == "number" and "spaces" in kinds and "text" in kinds
    # wide gap before amount -> deposit column; narrow -> withdrawal
    assert classify_by_space_geometry("12/5 STORE     1,200.00") == "deposit"
    assert classify_by_space_geometry("12/5 STORE   1,200.00") == "withdrawal"
    # amount + trailing balance: the gap BEFORE THE AMOUNT decides, not the
    # amount-to-balance separator (regression: that branch used to be dead
    # and every balance-bearing line classified as withdrawal)
    assert classify_by_space_geometry("12/5 ACME PAYROLL     2,000.00  9,000.00") == "deposit"
    assert classify_by_space_geometry("12/5 ACME RENT   2,000.00  9,000.00") == "withdrawal"
    assert classify_by_space_geometry("no trailing amount") is None
