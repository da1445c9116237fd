"""Date-rule ladder coverage (rules/dates.py) incl. the R9 deep fallbacks."""

from __future__ import annotations

from pdf_extractor_spark.rules.dates import (
    date_from_filename,
    extract_statement_period,
    interest_credit_date,
    parse_date,
    parse_mmdd_with_statement,
)


def test_parse_date_ladder_order_and_validity():
    assert parse_date("2024-03-05") == "2024-03-05"
    assert parse_date("03/05/2024") == "2024-03-05"
    assert parse_date("3/5/24") == "2024-03-05"
    assert parse_date("12/28", statement_year=2023) == "2023-12-28"
    assert parse_date("March 5, 2024") == "2024-03-05"
    assert parse_date("02/30/2024") is None  # invalid calendar date
    assert parse_date("12/28") is None  # MM/DD without statement year
    assert parse_date(None) is None and parse_date("  ") is None


def test_year_boundary_via_mmdd():
    assert parse_mmdd_with_statement("12/28", 2024, 1) == "2023-12-28"
    assert parse_mmdd_with_statement("01/03", 2024, 1) == "2024-01-03"


def test_statement_period_direct_patterns():
    assert extract_statement_period(
        "Statement Period 12/15/2023 to 01/14/2024"
    ) == ("2023-12-15", "2024-01-14", "content")
    assert extract_statement_period(
        "Statement Period: May 11, 2024 - May 24, 2024"
    ) == ("2024-05-11", "2024-05-24", "content")
    assert extract_statement_period("no dates here") == (None, None, "none")


def test_statement_period_nfkd_fallback():
    # NBSP-degraded extraction: direct spaced patterns fail, NFKD folds
    # \xa0 -> ' ' and the ladder recovers
    degraded = "Statement Period: May\xa011, 2024 - May\xa024, 2024"
    assert extract_statement_period(degraded) == (
        "2024-05-11",
        "2024-05-24",
        "content",
    )


def test_statement_period_squashed_through_fallback():
    # line break inside the period string: only the whitespace-squashed
    # 'through' scan can see it
    broken = "period May 11,\n2024 through\nJune 24, 2024 (summary)"
    assert extract_statement_period(broken) == (
        "2024-05-11",
        "2024-06-24",
        "content",
    )


def test_closing_date_fallback_and_filename():
    assert extract_statement_period("Statement Closing Date: 01/14/2024") == (
        None,
        "2024-01-14",
        "content",
    )
    assert date_from_filename("stmt_20240115_99.pdf") == "2024-01-15"
    assert date_from_filename("no-digits.pdf") is None


def test_interest_credit_rule():
    assert interest_credit_date("INTEREST CREDIT", "2024-05-12", "2024-05-24") == "2024-05-24"
    assert interest_credit_date("COFFEE", "2024-05-12", "2024-05-24") == "2024-05-12"
    assert interest_credit_date("INTEREST CREDIT", "2024-05-12", None) == "2024-05-12"


def test_fuzzy_through_rung():
    """R9 last rung (utils/utils.py:157-166): dateutil fuzzy parse of the 40
    chars after 'through' — deterministic via the pinned 1900 default."""
    from pdf_extractor_spark.rules.dates import extract_statement_period

    s, e, src = extract_statement_period("Account activity through May 24 2024\nrest")
    assert (s, e, src) == (None, "2024-05-24", "content_fuzzy")
    # no year in the snippet -> the pinned default year is rejected, rung skipped
    s, e, src = extract_statement_period("carried through May 24 only")
    assert e is None and src == "none"
    # earlier rungs still win over the fuzzy one
    s, e, src = extract_statement_period(
        "Statement Period: May 11, 2024 - May 24, 2024\nblah through May 30 2024"
    )
    assert (s, e, src) == ("2024-05-11", "2024-05-24", "content")


def test_fuzzy_rung_requires_full_date_and_yields_to_closing():
    from pdf_extractor_spark.rules.dates import extract_statement_period

    # partial date ('January 2025': day defaulted) -> rejected
    s, e, src = extract_statement_period("offer valid through January 2025")
    assert e is None and src == "none"
    # the precise closing-date rung beats fuzzy boilerplate
    s, e, src = extract_statement_period(
        "offer valid through May 30 2024\nStatement Closing Date: 05/24/2024"
    )
    assert (e, src) == ("2024-05-24", "content")
