"""Native fast-tier parity (operators/native_rules.py, round 5): the tiered
extract_turns must be byte-identical to the scalar oracle on EVERY output
field — including rule_hits and n_records, which the golden test does not
compare — and the router must (a) capture 100% of the native families on the
synthetic corpus, (b) never claim a turn whose Python family is outside the
native set, (c) route guard-boundary shapes (exotic amounts, >15-digit
literals, tiny magnitudes, non-ASCII charsets) to the Python tier. Both
routings are pinned: the default content-only tier and the
``native_ledger`` HOF tier."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.operators.native_rules import native_eligible
from pdf_extractor_spark.rules.doctype import detect_family
from pdf_extractor_spark.rules.oracle import extract_turn
from pdf_extractor_spark.schema import TRANSCRIPTS
from pdf_extractor_spark.sources.synth import generate_transcripts

# guard-boundary shapes: each exercises one clause of the routing predicate
# or one branch of the native expressions
_EDGE_TEXTS = [
    None,
    "",
    "   ",
    "\x00\x1c\x1d\x1e\x1f\xa0",  # control/NBSP soup (in charset, all-ws strip)
    "plain freeform line\nPage 3 of 9\nMember FDIC\n*start* marker",
    "freeform with\xa0nbsp and \x00 nul and trailing run 99",
    "freeform\rcarriage\x0bvtab\x0cformfeed inside a line",
    "line with summary of something\nTRANSACTION DETAIL\nkept line",
    "MEMO POS DEBIT 12345 coffee  shop\nMEMO plain   memo line 99",
    "MEMO XXXXXXXXXXXX1234 card suffix\nmemo lowercase body line",
    "MEMO \xa0\x00 REF\x1c123 exotic ws between ref and digits",
    "MEMO MEMO double prefix\nMEMO\xa0nbsp not a prefix",
    "MEMO ref 77 then TRANS 88 then 1234* mask",
    "ledger rows\n99/99/9999|12.00|BAD DATE ROW",
    "ledger rows\n01/15/2024|NOTANUM|BAD AMOUNT ROW",
    "ledger rows\n01/15/2024|12.00|",
    "ledger rows\n01/15/2024|1,234.56|  coffee shop  alpha\n03/01/2024|(45.00)|refund beta",
    "LEDGER ROWS\n2024-01-05|0012.500|leading+trailing zeros\n2024-02-30|5.00|bad calendar",
    "ledger rows\n0000-01-01|5.00|year zero is invalid",
    "ledger rows\n12/31/99|7|two digit year widens\nMarch 5, 2024|-0|neg zero",
    "ledger rows\nJanx 5, 2024|3|bad month name\n01/05/2024|($1,2,3.4)|paren dollar commas",
    "ledger rows\n2024-01-05|(0.00)|paren zero keeps sign",
    "ledger rows\nno pipes here\na|b\na|b|c|d",  # zero qualifying rows
    "ledger rows\n2024-01-05|5.00|desc with REF 77 and 1234* inside",
    # exotic amounts the Python Decimal path parses (ledger tier must route
    # these to Python even when native_ledger is on)
    "ledger rows\n2024-01-05|1e5|exponent",
    "ledger rows\n2024-01-05|inf|infinity",
    "ledger rows\n2024-01-05|.5|bare fraction",
    "ledger rows\n2024-01-05|+5|plus sign",
    "ledger rows\n2024-01-05|0.00004|tiny magnitude",
    "ledger rows\n2024-01-05|9999999999999999|sixteen digits",
    # router -> Python tier: charset / earlier-precedence markers
    "unicode snowman ☃ goes to python",
    "date audit\n01/02|5.00|date edges family",
    "checking summary\nledger rows\n01/05/2024|5.00|stolen by chase",
    "Post Date mention routes python",
    "<html><body>html family</body></html>",
]


def _compare(texts, spark, salt=None, **kw):
    rows = [(f"c{i:04d}", 0, "a", t, None, None) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    got = {
        r["conv_id"]: r
        for r in extract_turns(sdf, salt_partitions=salt, native_tier=True, **kw).collect()
    }
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        o = extract_turn(t)
        g = got[f"c{i:04d}"]
        assert g["family"] == o.family, (t, g["family"], o.family)
        assert g["extracted_text"] == o.extracted_text, t
        assert [(s["start"], s["end"], s["kind"]) for s in g["spans"]] == list(o.spans), t
        assert dict(g["rule_hits"]) == o.rule_hits, (t, dict(g["rule_hits"]), o.rule_hits)
        assert g["n_records"] == o.n_records, t
        assert g["valid"] == o.valid, t
        assert g["problem_reason"] == o.problem_reason, t


@pytest.mark.parametrize("ledger", [False, True])
def test_tiered_extraction_matches_oracle_on_guard_boundaries(spark, ledger):
    _compare(_EDGE_TEXTS, spark, native_ledger=ledger)


@pytest.mark.parametrize("ledger", [False, True])
def test_tiered_extraction_matches_oracle_on_fuzzed_corpus(spark, ledger):
    """Deterministic fuzz: random compositions of native-family fragments,
    markers, pipe rows with random amount shapes, and whitespace soup."""
    rng = random.Random(20250817)
    frag_pool = [
        "ledger rows", "MEMO ", "memo ", "Page 3 of 9", "member fdic",
        "REF 4521", "TRANS\t77", "XXXXXXXXXXXX5678", "1234*", "\xa0", "\x00",
        "|", "|5.00|", "01/15/2024", "2024-02-29", "(1,2.3)", "$", "-0.0",
        "0.0001", "0.00001", "123456789012345", "1234567890123456",
        "date audit", "checking summary", "coffee shop", "   ", "\x1c\x1d",
        "a|b|c", "5.|x", ".5", "1e3", "nan", "Infinity", "March 5, 2024",
        "www.", "questions?", "p.o. box", "*start*", "SUMMARY OF", "\r", "\x0b",
    ]
    texts = []
    for _ in range(400):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            lines.append("".join(rng.choice(frag_pool) for _ in range(rng.randint(1, 6))))
        texts.append("\n".join(lines))
    _compare(texts, spark, salt=4, native_ledger=ledger)


def test_router_captures_all_native_families_and_no_others(spark):
    """On the synthetic corpus the router must route EVERY native-family
    turn natively (zero over-conservatism on real shapes) and NOTHING whose
    Python family is outside the native set — at both ledger settings."""
    tr = generate_transcripts(n_convs=120, seed=42)
    sdf = spark.createDataFrame(tr, schema=TRANSCRIPTS)
    for ledger in (False, True):
        native_set = {"freeform", "noisy_desc", "null"} | (
            {"ledger_rows"} if ledger else set()
        )
        out = sdf.select(
            "text", native_eligible(F.col("text"), include_ledger=ledger).alias("ok")
        ).collect()
        for r in out:
            fam = "null" if r["text"] is None else detect_family(r["text"])
            assert r["ok"] == (fam in native_set), (ledger, fam, r["ok"], (r["text"] or "")[:80])


def test_tiered_equals_python_only_on_synth_corpus(spark):
    """Whole-corpus cross-check: tiered output == native_tier=False output
    row-for-row on every field (sorted by key)."""
    tr = generate_transcripts(n_convs=60, seed=7)
    sdf = spark.createDataFrame(tr, schema=TRANSCRIPTS)

    def canon(df):
        return (
            df.orderBy("conv_id", "turn_idx")
            .withColumn("spans_j", F.to_json("spans"))
            .withColumn(
                "hits_j",
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.transform(
                            F.map_entries("rule_hits"),
                            lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
                        )
                    ),
                ),
            )
            .drop("spans", "rule_hits")
            .collect()
        )

    b = canon(extract_turns(sdf, native_tier=False))
    for kw in ({"native_ledger": False}, {"native_ledger": True}):
        a = canon(extract_turns(sdf, native_tier=True, **kw))
        assert a == b, kw
