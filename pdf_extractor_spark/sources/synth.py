"""Deterministic synthetic transcript generator (FIXTURES.md §1/§3, seed=42).

Emits the `(conv_id, turn_idx, role, text, tool, ts)` table from
BASELINE.json's input_hint. Conversation lengths are power-law distributed (to
exercise skew salting); rows are emitted SHUFFLED so the pipeline's stable
(conv_id, turn_idx) ordering is actually load-bearing; each turn's text is one
payload family chosen by a content hash (FIXTURES.md §3).

Everything keys off ``zlib.crc32`` (never Python's salted ``hash``) so the
table is bit-identical across processes and sessions.
"""

from __future__ import annotations

import datetime as _dt
import random
import zlib

import pandas as pd

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

_MERCHANTS = (
    "AMAZON MKTPL*12ZB3", "STARBUCKS #4821", "WHOLEFDS MKT 10233",
    "SHELL OIL 57442199", "NETFLIX.COM", "UBER TRIP HELP.UBER.COM",
    "TRADER JOE'S #553", "COSTCO WHSE #0412", "DELTA AIR 0062341234567",
    "OFFICE SUPPLY CO", "ACME PAYROLL", "CITY UTILITIES",
)
_WORDS = (
    "the quick ledger review shows reconciled balances for the quarter",
    "meeting notes follow up on vendor invoices and approvals",
    "please summarize spending by category for the last period",
    "the agent retrieved three statements and parsed them",
    "totals were verified against the downloaded CSV export",
)


def _rng(conv_id: str, turn_idx: int, seed: int) -> random.Random:
    key = f"{conv_id}:{turn_idx}:{seed}"
    return random.Random(zlib.crc32(key.encode()))


def _amt(rng: random.Random, lo: float = 1.0, hi: float = 2500.0) -> str:
    v = round(rng.uniform(lo, hi), 2)
    s = f"{v:,.2f}"
    return s


def _mmdd(rng: random.Random, month: int | None = None) -> str:
    m = month if month is not None else rng.randint(1, 12)
    return f"{m:02d}/{rng.randint(1, 28):02d}"


def _merch(rng: random.Random) -> str:
    return rng.choice(_MERCHANTS)


def gen_chase_visa(rng: random.Random) -> str:
    lines = ["Chase Visa", "Opening/Closing Date 12/15/23 - 01/14/24"]
    for _ in range(rng.randint(2, 6)):
        month = rng.choice((12, 1))
        sign = "-" if rng.random() < 0.7 else ""
        lines.append(f"{_mmdd(rng, month)} {_merch(rng)} {sign}{_amt(rng)}")
        if rng.random() < 0.3:
            lines.append("CONTINUATION DETAIL LINE")
    return "\n".join(lines)


def gen_chase_checking(rng: random.Random) -> str:
    lines = [
        "*start*checking summary",
        "CHECKING SUMMARY",
        "Statement Date: 12/31/2023",
    ]
    if rng.random() < 0.5:
        # R18 name/address block: ALL-CAPS runs above a street+zip pair,
        # with occasional service-phrase noise (chase_checking.py:320-364)
        noise = " Service Center:" if rng.random() < 0.4 else ""
        lines += [
            f"JOHN Q PUBLIC{noise}",
            "ACME HOLDINGS LLC",
            f"{rng.randint(100, 9999)} MAIN ST",
            f"SPRINGFIELD IL {rng.randint(10000, 99999)}",
        ]
    lines.append("TRANSACTION DETAIL")
    for _ in range(rng.randint(2, 5)):
        sign = "-" if rng.random() < 0.5 else ""
        lines.append(
            f"{_mmdd(rng, 12)} {_merch(rng)} {sign}{_amt(rng)} {_amt(rng, 100, 9000)}"
        )
    lines.append("*end*transaction detail")
    return "\n".join(lines)


def gen_bofa_bank(rng: random.Random) -> str:
    lines = ["Bank of America", "Deposits and other additions"]
    for _ in range(rng.randint(1, 3)):
        lines.append(f"12/{rng.randint(1,28):02d}/23 {_merch(rng)} {_amt(rng)}")
    lines.append("Withdrawals and other subtractions")
    for _ in range(rng.randint(1, 3)):
        lines.append(f"12/{rng.randint(1,28):02d}/23 {_merch(rng)} {_amt(rng)}")
    lines.append("Checks")
    for _ in range(rng.randint(0, 2)):
        lines.append(f"12/{rng.randint(1,28):02d}/23 {rng.randint(1000,9999)} {_amt(rng)}")
    return "\n".join(lines)


def gen_wf_mastercard(rng: random.Random) -> str:
    lines = [
        "Wells Fargo Business Card",
        "Statement Period 12/15/2023 to 01/14/2024",
        "TransPostReference Number Description Credits Charges",
    ]
    for _ in range(rng.randint(2, 6)):
        month = rng.choice((12, 1))
        d1, d2 = _mmdd(rng, month), _mmdd(rng, month)
        ref = f"REF{rng.randint(100,999)}"
        desc = (
            "AUTOMATIC PAYMENT - THANK YOU"
            if rng.random() < 0.25
            else _merch(rng)
        )
        lines.append(f"{d1}{d2}{ref} {desc} {_amt(rng)}")
    return "\n".join(lines)


def gen_wf_visa(rng: random.Random) -> str:
    lines = [
        "Wells Fargo Visa",
        "Statement Period 12/15/2023 to 01/14/2024",
        "Payments",
    ]
    for _ in range(rng.randint(1, 2)):
        lines.append(
            f"{_mmdd(rng, 12)} {_mmdd(rng, 12)} REF{rng.randint(100,999)} "
            f"ONLINE PAYMENT THANK YOU {_amt(rng)}"
        )
    lines.append("TOTAL PAYMENTS FOR THIS PERIOD")
    lines.append("Purchases")
    for _ in range(rng.randint(1, 4)):
        month = rng.choice((12, 1))
        lines.append(
            f"{rng.randint(1000,9999)} {_mmdd(rng, month)} {_mmdd(rng, month)} "
            f"REF{rng.randint(100,999)} {_merch(rng)} {_amt(rng)}"
        )
    lines.append("TOTAL PURCHASES FOR THIS PERIOD")
    if rng.random() < 0.4:
        # R18 coupon block in the statement tail (wellsfargo_visa_parser.py:511-534)
        lines += [
            "JOHN Q PUBLIC",
            f"{rng.randint(100, 9999)} MARKET ST",
            f"SAN FRANCISCO CA {rng.randint(10000, 99999)}",
            f"Account Number {rng.randint(1000,9999)} {rng.randint(1000,9999)} {rng.randint(1000,9999)}",
        ]
    return "\n".join(lines)


def gen_first_republic(rng: random.Random) -> str:
    # 20% of statements carry an NBSP-degraded period line (exercises the
    # NFKD fallback rung of the R9 ladder end-to-end); a further 15% degrade
    # to a comma-less 'through' line only the dateutil fuzzy rung can parse
    u = rng.random()
    if u < 0.15:
        period = f"Account activity through May {rng.randint(11, 24)} 2024"
    else:
        sep = "\xa0" if u < 0.35 else " "
        period = f"Statement Period: May{sep}11, 2024 - May{sep}24, 2024"
    lines = [
        "First Republic Bank",
        period,
        "Account Number: 123-456789",
        "Deposits",
    ]
    for _ in range(rng.randint(1, 3)):
        lines.append(f"05/{rng.randint(11,24):02d} {_merch(rng)} ${_amt(rng)}")
    if rng.random() < 0.5:
        lines.append(f"INTEREST CREDIT ${_amt(rng, 0.1, 5.0)}")
    lines.append("Withdrawals")
    for _ in range(rng.randint(1, 3)):
        lines.append(f"05/{rng.randint(11,24):02d} {_merch(rng)} ${_amt(rng)} -")
        if rng.random() < 0.3:
            lines.append("CONTINUATION MERCHANT CITY 94111")
    lines += ["111 Pine Street", "San Francisco, CA 94111", "Member FDIC", "Page 2 of 6"]
    return "\n".join(lines)


def gen_wf_bank_layout(rng: random.Random) -> str:
    lines = ["Wells Fargo Bank", "Statement Date: 12/31/2023"]
    for _ in range(rng.randint(2, 5)):
        deposit = rng.random() < 0.5
        gap = "     " if deposit else "   "
        lines.append(
            f"12/{rng.randint(1,28)} {_merch(rng)}{gap}{_amt(rng)}  {_amt(rng, 100, 9000)}"
        )
    return "\n".join(lines)


def gen_amazon_order(rng: random.Random) -> str:
    items = []
    for _ in range(rng.randint(1, 3)):
        items.append(
            f"{rng.randint(1,3)} of: WIDGET {rng.choice(('PRO','MAX','MINI','XL'))}\n"
            f"Sold by: WidgetCo Supplied by: WidgetCo Condition: New\n"
            f"${_amt(rng, 5, 200)}"
        )
    gift = f"\nGift Card Amount:-${round(rng.uniform(1,20),2):.2f}" if rng.random() < 0.3 else ""
    return (
        "Amazon.com\n"
        f"Order Placed: March {rng.randint(1,28)}, 2024\n"
        f"order number: 112-{rng.randint(1000000,9999999)}-{rng.randint(1000000,9999999)}\n"
        f"Order Total: ${_amt(rng, 10, 500)}\n"
        "Items Ordered\n" + "\n".join(items) + "\nShipping Address:\nJOHN DOE" + gift
    )


def gen_bofa_visa(rng: random.Random) -> str:
    """BofA Visa: filename-derived statement date + 'Purchases and
    Adjustments' start flag + the 6-column row shape; occasional missing
    amount exercises the optional-group regex + P5 quarantine."""
    stmt = rng.choice(("20240115", "20231220"))
    lines = [
        f"FILE: bofa_visa_{stmt}.pdf",
        "Account Summary",
        "Purchases and Adjustments",
    ]
    for _ in range(rng.randint(2, 5)):
        month = rng.choice((12, 1)) if stmt == "20240115" else 12
        d1, d2 = _mmdd(rng, month), _mmdd(rng, month)
        ref, acct = rng.randint(1000, 9999), rng.randint(1000, 9999)
        if rng.random() < 0.85:
            lines.append(f"{d1} {d2} {_merch(rng)} {ref} {acct} {_amt(rng)}")
        else:
            # amount column empty but the trailing separator space survives
            # (real PDF extractions keep it): the row matches the reference
            # regex with amount=None and P5 quarantines it downstream
            lines.append(f"{d1} {d2} {_merch(rng)} {ref} {acct} ")
    return "\n".join(lines)


def gen_amazon_invoice(rng: random.Random) -> str:
    """Amazon invoice variant: Final Details header, paid/placed-by, order
    number, shipment blocks with Sold by/Supplied by/Condition item tails,
    payment block — the amazon_invoice_pdf_parser.py:53-156 field surface."""
    order_no = f"112-{rng.randint(1000000,9999999)}-{rng.randint(1000000,9999999)}"
    placed_day = rng.randint(1, 28)
    shipments = []
    for _ in range(rng.randint(1, 2)):
        items = []
        for _ in range(rng.randint(1, 3)):
            name = f"WIDGET {rng.choice(('PRO','MAX','MINI','XL'))}"
            seller = rng.choice(
                (
                    "Sold by: WidgetCo\nCondition: New",
                    "Sold by: WidgetCo\nSupplied by: Other LLC\nCondition: Used - Good",
                    "Sold by: GadgetWorks (seller profile)",
                )
            )
            price = f"{round(rng.uniform(5, 200), 2):.2f}"
            items.append(f"{rng.randint(1,3)} of: {name}\n{seller}\n${price}")
        shipments.append(
            f"Shipped on March {rng.randint(placed_day, 28)}, 2024\n"
            "Items Ordered Price\n" + "\n".join(items) + "\n"
            "Shipping Address:\nJOHN DOE\n123 MAIN ST\nShipping Speed:\nStandard"
        )
    total = f"{round(rng.uniform(20, 600), 2):.2f}"
    return (
        f"Final Details for Order #{order_no}\n"
        f"Order Placed: March {placed_day}, 2024\n"
        f"Amazon.com order number: {order_no}\n"
        f"Order Total: ${total}\n"
        "Paid By: JOHN DOE\nPlaced By: JANE DOE\n"
        + "\n".join(shipments)
        + "\nPayment information\n"
        f"Visa ending in {rng.randint(1000,9999)}: March 28, 2024: ${total}\n"
        "To view the status of your order, return to Order Summary."
    )


def gen_csv_apple_card(rng: random.Random) -> str:
    """Apple Card CSV: the inverted-sign source — charges POSITIVE in the
    file, payments NEGATIVE (apple_card_csv_parser.py:71-79)."""
    lines = [
        "Transaction Date,Clearing Date,Description,Merchant,Category,Type,Amount (USD),Purchased By"
    ]
    for _ in range(rng.randint(2, 6)):
        d = rng.randint(1, 27)
        amt = f"{round(rng.uniform(1.0, 900.0), 2):.2f}"
        if rng.random() < 0.3:
            lines.append(
                f"01/{d:02d}/2024,01/{d+1:02d}/2024,ACH Deposit Internet Transfer,"
                f"Apple Card,Payment,Payment,-{amt},JOHN DOE"
            )
        else:
            ttype = rng.choice(("Purchase", "Installment", "Interest Charge"))
            lines.append(
                f"01/{d:02d}/2024,01/{d+1:02d}/2024,{_merch(rng)},"
                f"{rng.choice(('Apple','Uber','Costco'))},Other,{ttype},{amt},JOHN DOE"
            )
    return "\n".join(lines)


def gen_amazon_history(rng: random.Random) -> str:
    """Amazon order-history page: ORDER PLACED blocks, TOTAL/ORDER #/SHIP TO,
    first-3 product-line scan behind boilerplate action links."""
    blocks = []
    for _ in range(rng.randint(1, 3)):
        prods = [
            rng.choice(("Buy it again", "Return or replace items", "Get product support")),
            f"WIDGET {rng.choice(('PRO','MAX','MINI','XL'))} {rng.choice(('ULTRA','HOME','TRAVEL'))} EDITION",
            "Write a product review",
            f"SECOND PRODUCT {rng.randint(10,99)} PACK",
        ]
        blocks.append(
            "ORDER PLACED\n"
            f"March {rng.randint(1, 28)}, 2024\n"
            f"TOTAL ${round(rng.uniform(10, 400), 2):.2f}\n"
            "SHIP TO\nJOHN DOE\n"
            f"ORDER # 112-{rng.randint(1000000, 9999999)}-{rng.randint(1000000, 9999999)}\n"
            + rng.choice(("View order details", "View invoice")) + "\n"
            + "\n".join(prods)
        )
    return "Your Orders\n" + "\n".join(blocks)


def gen_csv_capitalone(rng: random.Random) -> str:
    lines = [
        "Capital One export",
        "Transaction Date,Posted Date,Card No.,Description,Category,Debit,Credit",
    ]
    for _ in range(rng.randint(2, 5)):
        d = rng.randint(1, 28)
        # CSV exports render amounts WITHOUT thousands commas (an embedded
        # comma would add a field); _amt()'s '1,234.56' form belongs to the
        # PDF families only
        amt = f"{round(rng.uniform(1.0, 2500.0), 2):.2f}"
        if rng.random() < 0.7:
            lines.append(
                f"2024-01-{d:02d},2024-01-{min(d+1,28):02d},1234,{_merch(rng)},Other,{amt},"
            )
        else:
            lines.append(
                f"2024-01-{d:02d},2024-01-{min(d+1,28):02d},1234,PAYMENT RECEIVED,Payment,,{amt}"
            )
    return "\n".join(lines)


_MONTH_ABBR = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
               "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def gen_chase_visa_csv(rng: random.Random) -> str:
    """Chase Visa CSV export: signed in-file amounts (charges negative),
    strict MM/DD/YYYY dates with occasional malformed rows (-> None date /
    0.0 amount via the coerce path)."""
    lines = [
        "Transaction Date,Post Date,Description,Category,Type,Amount,Memo"
    ]
    for _ in range(rng.randint(2, 6)):
        d = rng.randint(1, 27)
        amt = round(rng.uniform(1.0, 900.0), 2)
        if rng.random() < 0.25:
            lines.append(
                f"01/{d:02d}/2024,01/{d+1:02d}/2024,Payment Thank You,,Payment,{amt:.2f},"
            )
        elif rng.random() < 0.12:
            # malformed: bad date + unparseable amount -> None / 0.0
            lines.append(f"Jan {d} 2024,01/{d+1:02d}/2024,{_merch(rng)},Shopping,Sale,abc,")
        else:
            lines.append(
                f"01/{d:02d}/2024,01/{d+1:02d}/2024,{_merch(rng)},Shopping,Sale,-{amt:.2f},"
            )
    return "\n".join(lines)


def gen_capitalone_print(rng: random.Random) -> str:
    """Capital One print statement: split-word table header ('DESC RIPTION'),
    month-abbrev row starts with continuation buffering, occasional '-$'
    amount artifacts and null bytes (T7)."""
    month_i = rng.choice((0, 11))  # Jan or Dec statements (R8 boundary)
    lines = [
        "Capital One Visa print statement",
        f"Statement Date: {'01' if month_i == 0 else '12'}/28/2024",
        rng.choice(("DATE DESC RIPTION CATEGORY CARD AMOUN T",
                    "DATE DESCRIPTION CATEGORY CARD AMOUNT")),
    ]
    for _ in range(rng.randint(2, 5)):
        mon = _MONTH_ABBR[month_i if rng.random() < 0.7 else (month_i - 1) % 12]
        amt = f"${_amt(rng)}" if rng.random() < 0.85 else "-$"
        nul = "\x00" if rng.random() < 0.2 else ""
        head = f"{mon} {rng.randint(1, 28)} {_merch(rng)}{nul} Other 1234"
        if rng.random() < 0.3:
            # wrapped description: the amount lands on the continuation line,
            # so the joined buffer still ends in the amount (T3 buffering)
            lines.append(head)
            lines.append(f"CONTINUATION MEMBERSHIP RENEWAL {amt}")
        else:
            lines.append(f"{head} {amt}")
    return "\n".join(lines)


def gen_csv_wf_checking(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(2, 5)):
        sign = "-" if rng.random() < 0.6 else ""
        lines.append(
            f"{rng.randint(1,12)}/{rng.randint(1,28)}/2024,{sign}{round(rng.uniform(1,900),2)},*,,{_merch(rng)}"
        )
    return "\n".join(lines)


_NOISE = ("POS DEBIT 1234 ", "ACH CREDIT 99 ", "REF 4521 ", "TRANS 777 ",
          "PURCHASE AUTH 55 ", "5678* ")


def gen_wf_bank_csv(rng: random.Random) -> str:
    """Wells Fargo BANK CSV export: FILE/PATH provenance header + headerless
    date,amount,*,check,description rows. The three branches exercise every
    rung of the statement-date ladder (original_filename -> input_path ->
    last_row); the occasional 'N/A' amount exercises the coerce-to-0.0 path
    (which must NOT quarantine)."""
    rung = rng.random()
    if rung < 0.4:
        fname = f"wellsfargo_bank_{rng.choice(('20240131', '20231231'))}.csv"
        path = "exports/wf/batch.csv"
    elif rung < 0.7:
        fname = "wellsfargo_bank_export.csv"
        path = f"exports/wf/2024/stmt_{rng.choice(('20240229', '20240331'))}.csv"
    else:
        fname = "wellsfargo_bank_export.csv"
        path = "exports/wf/latest.csv"
    lines = [f"FILE: {fname}", f"PATH: {path}"]
    for _ in range(rng.randint(2, 5)):
        check = str(rng.randint(1000, 9999)) if rng.random() < 0.3 else ""
        amt = f"{round(rng.uniform(-500, 2500), 2)}"
        if rng.random() < 0.1:
            amt = "N/A"
        lines.append(
            f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/2024,{amt},*,{check},{_merch(rng)}"
        )
    return "\n".join(lines)


def gen_noisy_desc(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(2, 5)):
        noise = rng.choice(_NOISE)
        tail = " XXXXXXXXXXXX5678" if rng.random() < 0.3 else ""
        nbsp = "\xa0" if rng.random() < 0.3 else "  "
        lines.append(f"MEMO {noise}{_merch(rng)}{nbsp}{rng.choice(_WORDS)}{tail}\x00")
    return "\n".join(lines)


def gen_date_edges(rng: random.Random) -> str:
    formats = [
        lambda: f"2023-12-{rng.randint(10,28)}",
        lambda: f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/2024",
        lambda: f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/24",
        lambda: f"12/{rng.randint(1,28):02d}",  # + statement year w/ boundary
        lambda: f"March {rng.randint(1,28)}, 2024",
        lambda: "02/30/2024",  # invalid calendar date
    ]
    lines = ["DATE AUDIT", "Statement Date: 01/15/2024"]
    for _ in range(rng.randint(3, 6)):
        f = rng.choice(formats)
        lines.append(f"{f()}|{_amt(rng)}|{_merch(rng)}")
    return "\n".join(lines)


def gen_ledger_rows(rng: random.Random) -> str:
    rows = [
        lambda: f"2024-01-{rng.randint(1,28):02d}|{_amt(rng)}|{_merch(rng)}",
        lambda: f"|{_amt(rng)}|{_merch(rng)}",  # missing date
        lambda: f"2024-01-{rng.randint(1,28):02d}||{_merch(rng)}",  # missing amount
        lambda: f"2024-01-{rng.randint(1,28):02d}|abc|{_merch(rng)}",  # bad amount
        lambda: f"2024-01-{rng.randint(1,28):02d}|{_amt(rng)}|",  # empty desc
    ]
    lines = ["LEDGER ROWS"]
    for _ in range(rng.randint(3, 6)):
        lines.append(rng.choice(rows)())
    return "\n".join(lines)


def gen_html_page(rng: random.Random) -> str:
    """HTML page: link-dense nav chrome, script/style noise, entity escapes,
    and real paragraph content — exercises the DOM-heuristic family."""
    nav = " ".join(
        f'<a href="/{w}">{w}</a>' for w in ("home", "products", "pricing", "about")[: rng.randint(2, 4)]
    )
    paras = "".join(
        f"<p>{rng.choice(_WORDS)} &amp; {rng.choice(_WORDS)}</p>"
        for _ in range(rng.randint(1, 3))
    )
    script = "<script>var x = 1; tracker('pageview');</script>" if rng.random() < 0.6 else ""
    footer = '<footer><a href="/tos">terms</a> <a href="/privacy">privacy</a> &copy; 2024</footer>'
    return (
        "<!DOCTYPE html><html><head><style>.x{color:red}</style>"
        f"<title>Report {rng.randint(1,99)}</title></head>"
        f"<body><nav>{nav}</nav><div>{paras}</div>{script}{footer}</body></html>"
    )


def gen_freeform(rng: random.Random) -> str:
    lines = [rng.choice(_WORDS) for _ in range(rng.randint(2, 6))]
    if rng.random() < 0.5:
        lines.insert(rng.randint(0, len(lines)), "Page 3 of 9")
        lines.append("Member FDIC")
    return "\n".join(lines)


FAMILY_GENERATORS = (
    ("chase_visa", gen_chase_visa),
    ("chase_checking", gen_chase_checking),
    ("bofa_bank", gen_bofa_bank),
    ("bofa_visa", gen_bofa_visa),
    ("amazon_invoice", gen_amazon_invoice),
    ("csv_apple_card", gen_csv_apple_card),
    ("wf_mastercard", gen_wf_mastercard),
    ("wf_visa", gen_wf_visa),
    ("first_republic", gen_first_republic),
    ("wf_bank_layout", gen_wf_bank_layout),
    ("amazon_order", gen_amazon_order),
    ("amazon_history", gen_amazon_history),
    ("csv_capitalone", gen_csv_capitalone),
    ("chase_visa_csv", gen_chase_visa_csv),
    ("capitalone_print", gen_capitalone_print),
    ("wf_bank_csv", gen_wf_bank_csv),
    ("csv_wf_checking", gen_csv_wf_checking),
    ("noisy_desc", gen_noisy_desc),
    ("date_edges", gen_date_edges),
    ("ledger_rows", gen_ledger_rows),
    ("html_page", gen_html_page),
    ("freeform", gen_freeform),
)

_ROLES = ("user", "assistant", "tool")


def conversation_lengths(n_convs: int, seed: int = 42) -> list[int]:
    """Power-law-ish lengths: most conversations short, a few very long
    (FIXTURES.md §1 — exercises the skew salting)."""
    rng = random.Random(seed)
    out = []
    for _ in range(n_convs):
        u = rng.random()
        # pareto-ish: 80% in [2,8], tail up to ~400
        n = int(2 + 6 * u) if u < 0.8 else int(8 / max(1e-3, (1 - u)) ** 0.7)
        out.append(max(2, min(n, 400)))
    return out


def _conv_len_hashed(conv_id: str, seed: int) -> int:
    """Per-conversation length derived from a content hash — computable on any
    executor without a driver-side list (the scale-clean variant of
    ``conversation_lengths``; same power-law shape)."""
    u = (zlib.crc32(f"{conv_id}:{seed}:len".encode()) % 1_000_000) / 1_000_000
    n = int(2 + 6 * u) if u < 0.8 else int(8 / max(1e-3, (1 - u)) ** 0.7)
    return max(2, min(n, 400))


def _rows_for_conv(conv_id: str, seed: int) -> list[dict]:
    rows = []
    for t in range(_conv_len_hashed(conv_id, seed)):
        rng = _rng(conv_id, t, seed)
        fam_idx = zlib.crc32(f"{conv_id}:{t}:fam".encode()) % len(FAMILY_GENERATORS)
        _, gen = FAMILY_GENERATORS[fam_idx]
        role = _ROLES[t % 3]
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": gen(rng),
                "tool": ("pdf_reader" if rng.random() < 0.5 else "csv_reader")
                if role == "tool"
                else None,
                "ts": _EPOCH + _dt.timedelta(seconds=37 * t),
            }
        )
    return rows


def generate_transcripts_distributed(spark, n_convs: int, seed: int = 42, partitions: int = 64):
    """Distributed deterministic transcript generation: spark.range over conv
    ordinals fans out to executors; each emits its conversations via the same
    family generators. Bit-identical across runs/parallelism (crc32-keyed, no
    Python hash salt). This is how the bench corpus is built — at 10^12-turn
    scale the same shape generates any size without driver memory."""
    from collections.abc import Iterator

    from ..schema import TRANSCRIPTS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for k in pdf["id"]:
                rows.extend(_rows_for_conv(f"conv_{int(k):06d}", seed))
            out = pd.DataFrame(rows)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    ids = spark.range(n_convs).repartition(partitions)
    return ids.mapInPandas(gen, schema=TRANSCRIPTS)


def generate_transcripts(n_convs: int = 100, seed: int = 42) -> pd.DataFrame:
    """Deterministic transcript table; rows returned in SHUFFLED order."""
    rows = []
    lengths = conversation_lengths(n_convs, seed)
    for k, n_turns in enumerate(lengths):
        conv_id = f"conv_{k:06d}"
        for t in range(n_turns):
            rng = _rng(conv_id, t, seed)
            fam_idx = zlib.crc32(f"{conv_id}:{t}:fam".encode()) % len(FAMILY_GENERATORS)
            _, gen = FAMILY_GENERATORS[fam_idx]
            role = _ROLES[t % 3]
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": gen(rng),
                    "tool": ("pdf_reader" if rng.random() < 0.5 else "csv_reader")
                    if role == "tool"
                    else None,
                    "ts": _EPOCH + _dt.timedelta(seconds=37 * t),
                }
            )
    df = pd.DataFrame(rows)
    shuffle_rng = random.Random(seed ^ 0x5EED)
    order = list(range(len(df)))
    shuffle_rng.shuffle(order)
    df = df.iloc[order].reset_index(drop=True)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
