"""Round-2 parity families: Apple Card inverted-sign CSV, BofA Visa, and the
Amazon invoice variant — contract tests mirroring the reference's
tests/test_parser_contracts.py plus field-level parity fixtures."""

from __future__ import annotations

import random

from pdf_extractor_spark.rules.extractors import (
    extract_amazon_invoice,
    extract_bofa_visa,
    extract_csv_apple_card,
    parse_invoice_fields,
)
from pdf_extractor_spark.rules.oracle import extract_turn
from pdf_extractor_spark.sources.synth import (
    gen_amazon_invoice,
    gen_bofa_visa,
    gen_csv_apple_card,
)

APPLE_FIXTURE = """Transaction Date,Clearing Date,Description,Merchant,Category,Type,Amount (USD),Purchased By
01/05/2024,01/06/2024,APPLE.COM/BILL,Apple,Services,Purchase,9.99,JOHN DOE
01/10/2024,01/11/2024,ACH Deposit Internet Transfer,Apple Card,Payment,Payment,-150.00,JOHN DOE
01/12/2024,01/13/2024,"TRADER JOE'S, SF",Groceries,Food,Purchase,42.50,JOHN DOE
"""


def test_apple_card_sign_contract():
    """Reference contract (tests/test_parser_contracts.py:34-52): payments
    positive, charges negative — the is_charge_positive=True inversion."""
    r = extract_csv_apple_card(APPLE_FIXTURE)
    by_desc = {rec.description: rec for rec in r.records}
    charge = by_desc["APPLE.COM/BILL"]
    payment = by_desc["ACH Deposit Internet Transfer"]
    quoted = by_desc["TRADER JOE'S, SF"]
    assert charge.ttype == "debit" and charge.amount == -9.99
    assert payment.ttype == "credit" and payment.amount == 150.00
    assert quoted.amount == -42.5  # quoted comma-bearing description survives
    assert charge.date == "2024-01-05"


def test_apple_card_every_synth_row_obeys_signs():
    for seed in range(30):
        t = gen_csv_apple_card(random.Random(seed))
        r = extract_turn(t)
        assert r.family == "csv_apple_card"
        for line in filter(None, r.extracted_text.split("\n")):
            _, amount, _, ttype = line.split("|")
            if ttype == "debit":
                assert float(amount) < 0
            else:
                assert ttype == "credit" and float(amount) > 0


BOFA_VISA_FIXTURE = """FILE: bofa_visa_20240115.pdf
Account Summary
Purchases and Adjustments
12/28 12/29 HOLIDAY STORE 1111 2222 50.00
01/03 01/04 NEWYEAR SHOP 3333 4444 25.00
"""


def test_bofa_visa_append_year_and_sort():
    """append_year (bofa_visa_parser.py:27-53): Dec rows on a January
    statement land in the PREVIOUS year; output sorted by the MM/DD/YYYY
    string (:156), i.e. January before December."""
    r = extract_bofa_visa(BOFA_VISA_FIXTURE)
    assert [rec.date for rec in r.records] == ["2024-01-03", "2023-12-28"]
    assert r.records[0].description == "NEWYEAR SHOP"
    assert r.hits.get("r10_date_from_filename") == 1
    assert r.hits.get("r8_year_boundary") == 1


def test_bofa_visa_rows_without_start_flag_ignored():
    r = extract_bofa_visa("FILE: x_20240115.pdf\n12/28 12/29 SHOP 1111 2222 5.00")
    assert r.records == []


INVOICE_FIXTURE = """Final Details for Order #112-1234567-7654321
Order Placed: March 5, 2024
Amazon.com order number: 112-1234567-7654321
Order Total: $99.97
Paid By: JOHN DOE
Placed By: JANE DOE
Shipped on March 7, 2024
Items Ordered Price
2 of: WIDGET PRO
Sold by: WidgetCo
Supplied by: Other LLC
Condition: New
$29.99
1 of: GADGET MAX
Sold by: GadgetWorks (seller profile)
$39.99
Shipping Address:
JOHN DOE
123 MAIN ST
Shipping Speed:
Standard
Payment information
Visa ending in 4242: March 7, 2024: $99.97
To view the status of your order, return to Order Summary.
"""


def test_invoice_fields_parity():
    """amazon_invoice_pdf_parser.py:53-106 field surface."""
    f = parse_invoice_fields(INVOICE_FIXTURE)
    assert f["order_number"] == "112-1234567-7654321"
    assert f["paid_by"] == "JOHN DOE"
    assert f["placed_by"] == "JANE DOE"
    assert f["order_total"] == 99.97
    assert f["order_placed"] == "2024-03-05"
    assert f["shipped_date"] == "2024-03-07"
    assert f["shipping_address"] == "JOHN DOE\n123 MAIN ST"
    assert f["payment_method"] == "Visa 4242"
    assert f["payment_date"] == "2024-03-07"
    assert f["payment_amount"] == 99.97


def test_invoice_items_and_amount():
    """Item parsing (:112-156): last-price anchor, Sold by/Supplied by/
    Condition tail strip, amount = -(sum price*qty) as a normalized debit."""
    r = extract_amazon_invoice(INVOICE_FIXTURE)
    assert len(r.records) == 1
    rec = r.records[0]
    assert rec.description == "WIDGET PRO; GADGET MAX"
    assert rec.amount == -(round(2 * 29.99 + 1 * 39.99, 2))
    assert rec.date == "2024-03-05"
    assert rec.ttype == "charge"


def test_invoice_dispatch_beats_amazon_order():
    """Registration order: invoice text also contains 'Order Placed:', so the
    invoice check must win (first-match dispatch S5/J4)."""
    assert extract_turn(INVOICE_FIXTURE).family == "amazon_invoice"


def test_new_families_detected_in_synth():
    fams = set()
    for seed in range(40):
        rng = random.Random(seed)
        for gen in (gen_bofa_visa, gen_amazon_invoice, gen_csv_apple_card):
            fams.add(extract_turn(gen(rng)).family)
    assert fams == {"bofa_visa", "amazon_invoice", "csv_apple_card"}


def test_bofa_visa_missing_amount_quarantined():
    """Rows with an empty amount column (trailing separator space kept, as
    in real PDF extractions) match the reference regex with amount=None and
    are quarantined by P5 — the optional-group path has live coverage."""
    t = (
        "FILE: bofa_visa_20240115.pdf\n"
        "Purchases and Adjustments\n"
        "01/05 01/06 HOLIDAY STORE 1111 2222 \n"
        "01/07 01/08 NEWYEAR SHOP 3333 4444 25.00"
    )
    r = extract_turn(t)
    assert r.family == "bofa_visa"
    assert r.valid is False
    assert r.problem_reason == "missing_or_unparseable_amount"
    assert r.n_records == 1  # only the complete row renders


def test_apple_detection_requires_adjacent_headers():
    """Prose mentioning the column names must NOT route to csv_apple_card
    (the extractor needs a real one-line header; misrouting drops records)."""
    prose = (
        "memo about the transaction date and the clearing date\n"
        "totals in amount (usd) were reviewed"
    )
    assert extract_turn(prose).family != "csv_apple_card"


CAPONE_PRINT_FIXTURE = (
    "Capital One Visa\n"
    "Statement Date: 01/28/2024\n"
    "DATE DESC RIPTION CATEGORY CARD AMOUN T\n"
    "junk preamble row\n"
    "Dec 30 HOLIDAY \x00STORE Other 1234\n"
    "WRAPPED DESCRIPTION LINE $1,250.00\n"
    "Jan 5 COFFEE SHOP Other 1234 $4.50\n"
    "Jan 9 BROKEN ROW Other 1234 -$\n"
)


def test_capitalone_print_buffering_and_boundary():
    """capitalone_visa_print_parser.py:83-171: header anchor with in-word
    splits, month-abbrev buffering across wrapped lines, null-byte cleaning,
    Dec-on-Jan-statement year repair, '-$' amount -> quarantine."""
    from pdf_extractor_spark.rules.extractors import extract_capitalone_print

    r = extract_capitalone_print(CAPONE_PRINT_FIXTURE)
    assert [rec.date for rec in r.records] == ["2023-12-30", "2024-01-05", "2024-01-09"]
    assert r.records[0].amount == 1250.00
    assert "HOLIDAY STORE" in r.records[0].description  # null byte stripped
    assert "WRAPPED DESCRIPTION LINE" in r.records[0].description  # T3 join
    assert r.records[2].amount is None  # '-$' artifact
    assert r.hits["t3_buffer_record"] == 3
    assert r.hits["p7_unparsed_buffer"] == 1  # the junk preamble row


def test_capitalone_print_detected():
    from pdf_extractor_spark.rules.oracle import extract_turn

    r = extract_turn(CAPONE_PRINT_FIXTURE)
    assert r.family == "capitalone_print"
    assert r.valid is False and r.problem_reason == "missing_or_unparseable_amount"


CHASE_CSV_FIXTURE = """Transaction Date,Post Date,Description,Category,Type,Amount,Memo
01/05/2024,01/06/2024,STARBUCKS #123,Food,Sale,-4.50,
01/10/2024,01/11/2024,Payment Thank You,,Payment,250.00,
Jan 12 2024,01/13/2024,BAD ROW,Shopping,Sale,abc,
"""


def test_chase_visa_csv_family():
    """chase_visa_csv_parser.py:40-100: header-set detection, strict
    %m/%d/%Y date (else None), amount coerce->0.0, in-file signs kept."""
    from pdf_extractor_spark.rules.extractors import extract_chase_visa_csv

    r = extract_chase_visa_csv(CHASE_CSV_FIXTURE)
    assert [rec.amount for rec in r.records] == [-4.50, 250.00, 0.0]
    assert r.records[0].ttype == "charge" and r.records[1].ttype == "credit"
    assert r.records[2].date is None  # 'Jan 12 2024' fails the strict parse
    assert extract_turn(CHASE_CSV_FIXTURE).family == "chase_visa_csv"


def test_chase_csv_does_not_shadow_capitalone_or_apple():
    from pdf_extractor_spark.sources.synth import gen_csv_capitalone

    assert extract_turn(gen_csv_capitalone(random.Random(1))).family == "csv_capitalone"
    assert extract_turn(APPLE_FIXTURE).family == "csv_apple_card"


AMZ_HISTORY_FIXTURE = """Your Orders
ORDER PLACED
March 5, 2024
TOTAL $123.45
SHIP TO
JOHN DOE
ORDER # 112-1234567-7654321
View order details
Return or replace items
Buy it again
WIDGET PRO ULTRA EDITION
ORDER PLACED
March 9, 2024
TOTAL $19.99
SHIP TO
JANE DOE
ORDER # 112-9999999-1111111
View invoice
Write a product review
Get product support
Ask Product Question
"""


def test_amazon_history_blocks_and_description_ladder():
    """amazon_pdf_parser.py:47-126: ORDER PLACED block split, first-3
    product-line scan with boilerplate-prefix skips, description pick
    ladder with the 'Amazon Order' fallback when only boilerplate remains."""
    from pdf_extractor_spark.rules.extractors import extract_amazon_history

    r = extract_amazon_history(AMZ_HISTORY_FIXTURE)
    assert len(r.records) == 2
    assert r.records[0].date == "2024-03-05" and r.records[0].amount == 123.45
    assert r.records[0].description == "WIDGET PRO ULTRA EDITION"
    # second block: every candidate line is boilerplate -> fallback
    assert r.records[1].description == "Amazon Order"
    assert r.hits["r16_order_number"] == 2
    assert extract_turn(AMZ_HISTORY_FIXTURE).family == "amazon_history"


def test_csv_header_requires_cell_match_not_substring():
    """A header whose cells only SUBSTRING-match the required names (e.g.
    'Amount USD' for 'Amount') must be rejected — accepting it would zero
    every row's amount through the coerce path with no quarantine signal."""
    from pdf_extractor_spark.rules.extractors import (
        _CHASE_CSV_REQUIRED,
        csv_header_cols,
        extract_chase_visa_csv,
    )

    bad = "Transaction Date,Post Date,Description,Category,Type,Amount USD,Memo"
    assert csv_header_cols(bad, _CHASE_CSV_REQUIRED) is None
    txt = bad + "\n01/05/2024,01/06/2024,STORE,Food,Sale,-4.50,\n"
    assert extract_chase_visa_csv(txt).records == []
    assert extract_turn(txt).family != "chase_visa_csv"
    # print-style comma-less header: substrings present, cells absent
    assert extract_turn(
        "Transaction Date  Post Date  Description  Amount\nrow"
    ).family != "chase_visa_csv"


# --- wells fargo bank CSV (round 3: the 22nd family) -------------------------

WFB_FIXTURE_FILENAME = """FILE: wellsfargo_bank_20240131.csv
PATH: exports/wf/batch.csv
01/05/2024,120.50,*,1234,CHECK PAYMENT
01/07/2024,-45.00,*,,GROCERY STORE"""

WFB_FIXTURE_PATH = """FILE: wellsfargo_bank_export.csv
PATH: exports/wf/2024/stmt_20240229.csv
01/05/2024,N/A,*,,MYSTERY FEE"""

WFB_FIXTURE_LASTROW = """FILE: wellsfargo_bank_export.csv
PATH: exports/wf/latest.csv
01/05/2024,10.00,*,,A
02/09/2024,20.00,*,9999,B"""


def test_wf_bank_csv_provenance_ladder():
    """The filename-first statement-date ladder with the reference's source
    enum (wellsfargo_bank_csv_parser.py:82-113)."""
    from pdf_extractor_spark.rules.extractors import extract_wf_bank_csv

    r1 = extract_wf_bank_csv(WFB_FIXTURE_FILENAME)
    assert r1.hits.get("r10_statement_source_original_filename") == 1
    r2 = extract_wf_bank_csv(WFB_FIXTURE_PATH)
    assert r2.hits.get("r10_statement_source_input_path") == 1
    r3 = extract_wf_bank_csv(WFB_FIXTURE_LASTROW)
    assert r3.hits.get("r10_statement_source_last_row") == 1


def test_wf_bank_csv_amount_coerce_and_strict_date():
    """parse_amount -> 0.0 on failure (never quarantines); parse_date is
    strict %m/%d/%Y (wellsfargo_bank_csv_parser.py:35-52)."""
    na = extract_turn(WFB_FIXTURE_PATH)
    assert na.family == "wf_bank_csv"
    assert na.valid  # N/A amount coerces to 0.0, does NOT quarantine
    assert "|0.0|" in na.extracted_text
    bad_date = extract_turn(
        "FILE: wellsfargo_bank_x.csv\nPATH: p.csv\n2024-01-05,10.00,*,,ISO SHAPE"
    )
    # an ISO-shaped date row doesn't match the positional row regex at all
    # (reference pd.read_csv would align it but strptime returns None);
    # a matching row with an impossible date quarantines:
    bad2 = extract_turn(
        "FILE: wellsfargo_bank_x.csv\nPATH: p.csv\n13/45/2024,10.00,*,,BAD"
    )
    assert bad_date.n_records == 0
    assert not bad2.valid and bad2.problem_reason == "missing_or_unparseable_date"


def test_wf_bank_csv_amount_is_strict_commas_only():
    """Fidelity pin (r3 ADVICE): this family's coerce is EXACTLY the
    reference's float(str.replace(',', '')) — '$' and parenthesized
    negatives are NOT understood and coerce to 0.0, unlike the wider
    clean_amount_or_zero used by other families
    (wellsfargo_bank_csv_parser.py:35-44)."""
    from pdf_extractor_spark.rules.amounts import (
        clean_amount_or_zero,
        coerce_amount_commas_only,
    )

    assert coerce_amount_commas_only("$12.00") == 0.0
    assert coerce_amount_commas_only("(45.00)") == 0.0
    assert coerce_amount_commas_only("1,234.56") == 1234.56
    assert coerce_amount_commas_only(None) == 0.0
    assert coerce_amount_commas_only(7) == 7.0
    # the wider cleaner WOULD parse these — the families must diverge
    assert clean_amount_or_zero("$12.00") == 12.0
    assert clean_amount_or_zero("(45.00)") == -45.0
    # end-to-end through the family extractor
    dollar = extract_turn(
        "FILE: wellsfargo_bank_20240131.csv\nPATH: p.csv\n"
        "01/05/2024,$12.00,*,,DOLLAR AMT\n01/06/2024,(45.00),*,,PAREN AMT"
    )
    assert dollar.family == "wf_bank_csv"
    assert dollar.extracted_text.count("|0.0|") == 2


def test_wf_bank_csv_detection_beats_checking_alias():
    """A bank-CSV turn whose rows ALSO match the checking-CSV row shape
    (empty check column) must route to wf_bank_csv via the FILE marker —
    detection-order contract."""
    from pdf_extractor_spark.rules.doctype import detect_family

    assert detect_family(WFB_FIXTURE_FILENAME) == "wf_bank_csv"
    # and without the marker, the same rows stay with the checking family
    rows_only = "01/07/2024,-45.00,*,,GROCERY STORE"
    assert detect_family(rows_only) == "csv_wf_checking"


def test_wf_bank_csv_every_synth_turn_routes_home():
    from pdf_extractor_spark.sources.synth import gen_wf_bank_csv

    sources = set()
    for seed in range(60):
        t = gen_wf_bank_csv(random.Random(seed))
        r = extract_turn(t)
        assert r.family == "wf_bank_csv"
        assert r.rule_hits.get("wfb_csv_row", 0) >= 2
        for k in r.rule_hits:
            if k.startswith("r10_statement_source_"):
                sources.add(k.removeprefix("r10_statement_source_"))
    assert sources == {"original_filename", "input_path", "last_row"}


def test_wf_bank_csv_strict_date_equals_strptime_roundtrip():
    """parse_date_mdy_strict is a performance re-expression of the
    reference's strptime('%m/%d/%Y') + strftime round-trip — property-check
    equivalence including the rejected-short-year edge."""
    import random as _random
    from datetime import datetime

    from pdf_extractor_spark.rules.dates import parse_date_mdy_strict

    def ref(raw):
        try:
            return datetime.strptime(raw.strip(), "%m/%d/%Y").strftime("%Y-%m-%d")
        except ValueError:
            return None

    rng = _random.Random(7)
    cases = ["01/05/2024", "1/5/2024", "13/45/2024", "02/30/2024", "1/5/24",
             " 01/05/2024 ", "01-05-2024", "2024-01-05", "01/05/20245", ""]
    cases += [f"{rng.randint(0,19)}/{rng.randint(0,39)}/{rng.randint(0,12000)}"
              for _ in range(5000)]
    for c in cases:
        assert parse_date_mdy_strict(c) == ref(c), c
