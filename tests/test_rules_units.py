"""Unit coverage for rule modules: detection order (S5 contract), amount
formatting parity (R4/R5 Decimal hop), whitespace-geometry classifier (T6)."""

from __future__ import annotations

from decimal import Decimal

from pdf_extractor_spark.rules.amounts import (
    CHARGE_KEYWORDS,
    CREDIT_KEYWORDS,
    clean_amount,
    format_amount,
    normalize_sign,
)
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
        "bofa_visa",
        "first_republic",
        "chase_checking",
        "chase_visa",
        "wf_bank_layout",
        "amazon_invoice",  # before amazon_order: invoice text also carries 'Order Placed:'
        "amazon_history",
        "amazon_order",
        "csv_apple_card",
        "chase_visa_csv",
        "csv_capitalone",
        "capitalone_print",
        "wf_bank_csv",  # before csv_wf_checking: rows alias when check col empty
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
    kinds = [r.kind for r in runs]
    assert kinds[0] == "number" and "spaces" in kinds and "text" in kinds
    # wide gap before amount -> deposit column; narrow -> withdrawal
    assert classify_by_space_geometry("12/5 STORE     1,200.00") == "deposit"
    assert classify_by_space_geometry("12/5 STORE   1,200.00") == "withdrawal"
    # amount + trailing balance: the gap BEFORE THE AMOUNT decides, not the
    # amount-to-balance separator (regression: that branch used to be dead
    # and every balance-bearing line classified as withdrawal)
    assert classify_by_space_geometry("12/5 ACME PAYROLL     2,000.00  9,000.00") == "deposit"
    assert classify_by_space_geometry("12/5 ACME RENT   2,000.00  9,000.00") == "withdrawal"
    # a bare integer in the description is NOT an amount+balance pair: the
    # wide run before the single real amount decides (regression)
    assert classify_by_space_geometry("1/05 CHECK 105      320.00") == "deposit"
    assert classify_by_space_geometry("no trailing amount") is None


def test_forward_fill_and_assemble_blocks():
    from pdf_extractor_spark.rules.segment import (
        assemble_blocks,
        forward_fill_sections,
        split_lines,
    )

    lines = split_lines("Deposits\nrow a\nrow b\nWithdrawals\nrow c")
    tagged = forward_fill_sections(
        lines, {"Deposits": "dep", "Withdrawals": "wd"}
    )
    assert [(ln.text, tag) for ln, tag in tagged] == [
        ("row a", "dep"), ("row b", "dep"), ("row c", "wd"),
    ]
    blocks = assemble_blocks(lines, is_start=lambda t: t.startswith("row"))
    assert [[ln.text for ln in b] for b in blocks] == [
        ["row a"], ["row b", "Withdrawals"], ["row c"],
    ]


def test_capitalone_quoted_comma_and_zero_debit():
    from pdf_extractor_spark.rules.extractors import extract_csv_capitalone

    text = (
        "Capital One export\n"
        "Transaction Date,Posted Date,Card No.,Description,Category,Debit,Credit\n"
        '2024-01-05,2024-01-06,1234,"AMAZON.COM, INC",Shopping,12.34,\n'
        "2024-01-07,2024-01-08,1234,REFUND GIVEN,Payment,0.00,25.00\n"
    )
    r = extract_csv_capitalone(text)
    assert len(r.records) == 2  # quoted comma does NOT explode the row
    amz, refund = r.records
    assert amz.description == "AMAZON.COM, INC" and amz.amount == -12.34
    # explicit 0.00 debit takes the credit branch (reference: Debit != 0)
    assert refund.amount == 25.0 and refund.ttype == "credit"


def test_chase_visa_continuation_stops_on_trailing_number():
    from pdf_extractor_spark.rules.extractors import extract_chase_visa

    text = (
        "Chase Visa\n"
        "Opening/Closing Date 12/15/23 - 01/14/24\n"
        "12/05 AMAZON PURCHASE 45.00\n"
        "MEMBERSHIP FEE 12.99\n"
    )
    r = extract_chase_visa(text)
    # 'MEMBERSHIP FEE 12.99' ends in a number -> NOT a continuation
    # (chase_visa_parser.py:71-79); description stays clean
    assert len(r.records) == 1
    assert r.records[0].description == "AMAZON PURCHASE"


def test_html_entities_no_double_unescape():
    from pdf_extractor_spark.rules.html import _unescape

    assert _unescape("&amp;lt;b&amp;gt;") == "&lt;b&gt;"
    assert _unescape("a &amp; b &lt;tag&gt;") == "a & b <tag>"


def test_r13_multispace_fragments_stripped():
    from pdf_extractor_spark.rules.textnorm import normalize_description

    # reference patterns use \s+ separators (transaction_normalizer.py:390-399)
    assert normalize_description("POS  DEBIT 4421 GROCERY") == "GROCERY"
    assert normalize_description("buy at WALMART STORE 4521") == "buy at WALMART STORE 4521"
    assert (
        normalize_description("card XXXXXXXXXXXX5678 tail 99", strip_trailing=True)
        == "card tail"
    )


def test_zero_record_turn_is_flagged():
    from pdf_extractor_spark.rules.oracle import extract_turn

    r = extract_turn("Chase Visa\nOpening/Closing Date 12/15/23 - 01/14/24\n")
    assert r.family == "chase_visa" and r.n_records == 0
    assert r.rule_hits.get("zero_records") == 1


def test_amount_fastpaths_equal_decimal_hop():
    """The r3 fast paths in amounts.py are value-preserving re-expressions of
    the reference's Decimal hops — property-pinned over randomized inputs."""
    import random

    rng = random.Random(11)
    raws = ["$1,234.56", "(45.00)", "12.", ".5", "1e3", "N/A", "", "  ", "-0.0",
            "Infinity", "1_000", "00123.4500"]
    raws += [f"{rng.uniform(-1e6, 1e6):.{rng.randint(0,6)}f}" for _ in range(3000)]
    for s in raws:
        got = clean_amount(s)
        # independent reference formulation
        t = s.strip()
        neg = t.startswith("(") and t.endswith(")")
        if neg:
            t = t[1:-1]
        t = t.replace("$", "").replace(",", "").strip()
        try:
            want = float(Decimal(t)) if t else None
        except Exception:
            want = None
        if want is not None and neg:
            want = -want
        assert got == want or (got is None and want is None), (s, got, want)

    for _ in range(3000):
        v = rng.uniform(-1e7, 1e7)
        assert format_amount(v) == repr(float(Decimal(str(v))))
        for ttype in (None, "debit", "Payment", "ACH CREDIT", "purchase x"):
            for inv in (False, True):
                got = normalize_sign(v, ttype, is_charge_positive=inv)
                d = Decimal(str(v))
                if inv:
                    want = float(-d)
                else:
                    tl = (ttype or "").lower()
                    if any(k in tl for k in CHARGE_KEYWORDS) and d > 0:
                        d = -d
                    elif any(k in tl for k in CREDIT_KEYWORDS) and d < 0:
                        d = -d
                    want = float(d)
                assert got == want and repr(got) == repr(want), (v, ttype, inv)


def test_normalize_sign_nan_and_infinity_match_decimal_hop():
    """Non-finite pins (r3 ADVICE): the float fast path must preserve the
    reference Decimal hop's behavior outside the finite range the property
    test samples. Decimal('NaN') > 0 raises InvalidOperation, so a NaN
    amount raises iff a charge/credit keyword brings it to a comparison;
    Infinity compares fine and flows through sign logic normally."""
    import math

    import pytest
    from decimal import InvalidOperation

    nan, inf = float("nan"), float("inf")
    # NaN reaching a sign comparison raises, like the Decimal hop
    for ttype in ("debit", "purchase refund", "credit", "ACH PAYMENT"):
        with pytest.raises(InvalidOperation):
            normalize_sign(nan, ttype)
    # no keyword -> no comparison -> NaN passes through (Decimal path never
    # compares); inverted sources negate unconditionally without comparing
    assert math.isnan(normalize_sign(nan, None))
    assert math.isnan(normalize_sign(nan, "misc fee"))
    assert math.isnan(normalize_sign(nan, "debit", is_charge_positive=True))
    # Infinity: Decimal('Infinity') compares normally — pin both branches
    assert normalize_sign(inf, "debit") == -inf
    assert normalize_sign(-inf, "credit") == inf
    assert normalize_sign(inf, None) == inf
    assert normalize_sign(inf, "debit", is_charge_positive=True) == -inf


def test_pii_scrub_fires_and_redacts(spark):
    """Round-4 PII tier non-vacuity: every injected residue class fires its
    counter, and the redacted tail carries the placeholder token (i.e. the
    scrub actually rewrites bytes, not just counts)."""
    from pdf_extractor_spark.plans import catalog_ext

    rows = {r.doc_id: r for r in catalog_ext.q_text_pii_scrub(spark, "/root/testdata/sf0.01").collect()}
    assert rows[0].n_emails >= 1 and "<EMAIL>" in rows[0].redacted_tail
    assert rows[1].n_phones >= 2 and "<PHONE>" in rows[1].redacted_tail
    assert rows[2].n_ssns >= 1 and "<SSN>" in rows[2].redacted_tail
    assert rows[3].n_ips >= 1 and rows[3].n_urls >= 1
    assert "<IP>" in rows[3].redacted_tail and "<URL>" in rows[3].redacted_tail
    assert rows[3].url_domain == "docs.example.org"
    # the untouched residue class stays silent: no false positives on the
    # word-soup corpus
    assert rows[4].n_emails == rows[4].n_phones == rows[4].n_ssns == 0


def test_repetition_signals_fire(spark):
    """Round-4 repetition tier non-vacuity: injected duplicate/bullet/
    ellipsis lines are counted; word-soup docs have top_word_share > 0."""
    from pdf_extractor_spark.plans import catalog_ext

    rows = {r.doc_id: r for r in catalog_ext.q_text_repetition(spark, "/root/testdata/sf0.01").collect()}
    assert rows[1].n_dup_lines >= 1  # 'repeated filler line' x2
    assert rows[1].n_bullet_lines == 1 and rows[1].n_ellipsis_lines == 1
    assert rows[3].n_bullet_lines == 2 and rows[3].n_dup_lines == 0
    assert rows[0].n_lines == 1 and rows[0].n_dup_lines == 0
    for r in rows.values():
        assert 0 < r.top_word_share_ppm <= 1_000_000
        assert r.rep_n_distinct <= r.rep_n_words


def test_decontamination_flags_planted_passage(spark):
    """Round-4 decontamination non-vacuity: train docs carrying the planted
    passage (doc_id % 7 == 3, not eval) are flagged with >= 4 contaminated
    shingles (the passage's 4 interior 8-grams; boundary shingles may add
    more). Docs flagged WITHOUT the passage must be the corpus's planted
    near-duplicates of an eval doc (long verbatim runs — the exact leak
    class decontamination exists to catch): their contaminated-shingle
    share must be high, not a one-shingle accident. And a majority of
    train docs must remain clean."""
    from pdf_extractor_spark.plans import catalog_ext

    rows = catalog_ext.q_text_decontaminate(spark, "/root/testdata/sf0.01").collect()
    n_clean = 0
    for r in rows:
        planted = r.doc_id % 7 == 3 and r.doc_id % 50 != 0
        if r.is_eval:
            assert r.doc_id % 50 == 0 and r.decon_n_contam > 0  # self-overlap
        elif planted:
            assert r.contaminated and r.decon_n_contam >= 4, r
        elif r.contaminated:
            # near-dup of an eval doc: verbatim-run overlap, not noise
            assert r.decon_n_contam * 2 >= r.decon_n_shingles, r
        else:
            n_clean += 1
            assert r.decon_n_contam == 0, r
    assert n_clean > len(rows) // 2


def test_decontaminate_is_total_on_short_docs(spark):
    """Round-4 review fix: a doc with fewer than n words has zero shingles
    and used to vanish from shingle_decontaminate's output (explode drops
    empty arrays) — silently losing the doc at curate_job's 1:1 join. The
    op must be total: one output row per input doc, zero counts."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.catalog_ext import shingle_decontaminate

    docs = spark.createDataFrame(
        [(0, "only three words"), (1, " ".join(f"w{i}" for i in range(20))), (2, "x")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in shingle_decontaminate(docs, F.col("doc_id") % 50 == 0).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].decon_n_shingles == 0 and rows[0].decon_n_contam == 0
    assert rows[2].decon_n_shingles == 0 and not rows[2].contaminated
    assert rows[1].decon_n_shingles == 13  # 20 words -> 13 distinct 8-grams


def test_pii_patterns_agree_across_engines_on_adversarial_inputs(spark):
    """The PII tier's correctness rests on the claim that its patterns
    behave identically under Java regex (Spark) and RE2 (DuckDB). The gate
    only exercises the injected corpus; this pins the claim over 500
    seeded-random strings plus hand-picked near-matches (unicode digits,
    word-char boundaries, trailing dots, parenthesized, NBSP, nested @)."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.catalog_ext import pii_columns

    tricky = [
        "123-45-67890",          # SSN-shaped but 5 trailing digits: \b blocks
        "_123-45-6789_",         # underscores are word chars: no boundary
        "x123-45-6789",          # leading word char: no boundary
        "123-456-7890 tail",     # phone exact
        "1234-456-7890",         # 4-digit area: no match
        "a@b.c",                 # 1-char TLD: below {2,}
        "a@b.co",                # minimal valid email
        "a.b+c_d%e@f-g.h.ij",    # full local-part class
        "user@@double.com",      # @@: local part absorbs first @? engines must agree
        "trailing.dot@mail.com.",
        "(415) 555-0100",        # parens format: not the dashed pattern
        "10.0.0.1",
        "999.999.999.999",      # out-of-range octets still match the shape
        "1.2.3.4.5",             # 5 octets: engines must agree on the span
        "v1.2.3.4a",             # word chars flanking
        "http://x.y/z_1-2/",
        "https://",              # no host chars after scheme
        "١٢٣-45-6789",  # arabic-indic digits: \d is ASCII in both
        "café@café.com",     # unicode in local/host: class is ASCII
        "a b@c.de",         # NBSP before local part
        "email:first.last@sub.domain.org;next",
    ]
    rng = random.Random(7)
    frags = ["123", "45", "6789", "-", ".", "@", "a", "Z", "_", " ", "http://", "x.com",
             "555", "(", ")", "10", "0", "q", " ", "+", "%"]
    texts = tricky + ["".join(rng.choice(frags) for _ in range(rng.randint(3, 24)))
                      for _ in range(500)]

    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    c = pii_columns(F.col("text"))
    got = {
        r.i: (r.e, r.p, r.s, r.ip, r.u, r.red)
        for r in sdf.select(
            "i", c["n_emails"].alias("e"), c["n_phones"].alias("p"),
            c["n_ssns"].alias("s"), c["n_ips"].alias("ip"), c["n_urls"].alias("u"),
            c["redacted"].alias("red"),
        ).collect()
    }

    from pdf_extractor_spark.plans.catalog_ext import (
        _PII_EMAIL, _PII_IP, _PII_PHONE, _PII_SSN, _PII_URL,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)])
    q = f"""
      SELECT i,
        len(regexp_extract_all(text, '{_PII_EMAIL}')),
        len(regexp_extract_all(text, '{_PII_PHONE}')),
        len(regexp_extract_all(text, '{_PII_SSN}')),
        len(regexp_extract_all(text, '{_PII_IP}')),
        len(regexp_extract_all(text, '{_PII_URL}')),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          text, '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_URL}', '<URL>', 'g'),
          '{_PII_SSN}', '<SSN>', 'g'), '{_PII_PHONE}', '<PHONE>', 'g'),
          '{_PII_IP}', '<IP>', 'g')
      FROM t
    """
    for i, e, p, s, ip, u, red in con.execute(q).fetchall():
        assert got[i] == (e, p, s, ip, u, red), (i, texts[i], got[i], (e, p, s, ip, u, red))


def test_shingle_and_line_exprs_agree_across_engines_on_fuzz(spark):
    """Same cross-engine discipline for the repetition/decontamination
    expression tier: distinct 8-gram shingles (split/slice/array_distinct vs
    string_split/list slicing/list_distinct) and the line signals must agree
    on fuzzed texts with multi-spaces (empty-string tokens!), newlines,
    bullets, and ellipses."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.catalog_ext import line_repetition_columns, shingle_array

    rng = random.Random(13)
    frags = ["alpha", "beta", "g", "", " ", "  ", "\n", "- bullet", "...", "x y z w v u t s",
             "dup line\ndup line", ".", "-"]
    texts = ["".join(rng.choice(frags) for _ in range(rng.randint(2, 20))) for _ in range(400)]
    texts += ["", " ", "a b c d e f g h", "a b c d e f g h i", "\n\n", "- a\n- a\n- a..."]

    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    lc = line_repetition_columns(F.col("text"))
    got = {
        r.i: (sorted(r.sh), r.nl, r.nd, r.nb, r.ne)
        for r in sdf.select(
            "i", shingle_array(F.col("text")).alias("sh"),
            lc["n_lines"].alias("nl"), lc["n_dup_lines"].alias("nd"),
            lc["n_bullet_lines"].alias("nb"), lc["n_ellipsis_lines"].alias("ne"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)])
    rows = con.execute("""
      SELECT i,
        list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-7),
                      j -> array_to_string(string_split(text,' ')[j:j+7], ' '))),
        len(string_split(text, chr(10))),
        len(string_split(text, chr(10))) - len(list_distinct(string_split(text, chr(10)))),
        len(list_filter(string_split(text, chr(10)), x -> x LIKE '- %')),
        len(list_filter(string_split(text, chr(10)), x -> x LIKE '%...'))
      FROM t
    """).fetchall()
    for i, sh, nl, nd, nb, ne in rows:
        assert got[i] == (sorted(sh), nl, nd, nb, ne), (i, repr(texts[i]), got[i], (sorted(sh), nl, nd, nb, ne))
