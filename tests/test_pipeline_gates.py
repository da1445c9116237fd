"""Pins for the flagship gate's injected exemplar turns (catalog_ext2:
_INJECTED_TURNS): each literal must keep producing exactly the extraction —
family, extracted_text bytes, span rendering, rule-hit CSV, validity,
quarantine reason — that the DuckDB flagship oracle hard-codes for its
(mod, offset) slot. If an extractor or validity-rule change moves any byte,
this fails BEFORE the driver's value hash does, with a readable message.

Renderings mirror q_pipeline_extract's scalar projection exactly:
spans -> Spark to_json of [{"start":..,"end":..,"kind":..}] (no spaces,
schema field order), rule_hits -> sorted "k:v" CSV.
"""

from __future__ import annotations

import pytest

from pdf_extractor_spark.plans.catalog_ext2 import _INJECTED_TURNS, _QUARANTINING
from pdf_extractor_spark.rules.oracle import extract_turn


def _spans_json(spans: list[tuple[int, int, str]]) -> str:
    return "[" + ",".join(
        '{"start":%d,"end":%d,"kind":"%s"}' % (s, e, k) for s, e, k in spans
    ) + "]"


def _hits_csv(hits: dict[str, int]) -> str:
    return ",".join(sorted(f"{k}:{v}" for k, v in hits.items()))


def test_injection_slots_are_distinct():
    assert len({t.off for t in _INJECTED_TURNS}) == len(_INJECTED_TURNS)


@pytest.mark.parametrize("inj", _INJECTED_TURNS, ids=lambda t: f"mod{t.mod}_{t.family}")
def test_injected_literal_reproduces_pinned_extraction(inj):
    r = extract_turn(inj.text)
    assert r.family == inj.family
    assert r.extracted_text == inj.extracted
    assert _spans_json(r.spans) == inj.spans_json
    assert _hits_csv(r.rule_hits) == inj.hits_csv
    assert r.n_records == inj.n_records
    assert r.valid is inj.valid
    assert r.problem_reason == inj.reason


def test_quarantining_exemplars_cover_every_p5_class():
    reasons = {r for t in _QUARANTINING for r in (t.reason or "").split(";")}
    assert reasons == {
        "null_text",
        "missing_or_unparseable_date",
        "missing_or_unparseable_amount",
        "empty_description",
    }


def test_p5_reason_coverage_per_family_group():
    """r3 VERDICT ask #8: >=1 injected exemplar per P5 reason per record
    family group, with the wf_bank_csv asymmetry pinned — an unparseable
    amount CANNOT quarantine that family (the reference's parse_amount
    coerces to 0.0, wellsfargo_bank_csv_parser.py:35-44), so its reason set
    legitimately lacks missing_or_unparseable_amount."""
    by_family: dict[str, set[str]] = {}
    for t in _QUARANTINING:
        by_family.setdefault(t.family, set()).update((t.reason or "").split(";"))
    assert by_family["ledger_rows"] == {
        "missing_or_unparseable_date",
        "missing_or_unparseable_amount",
        "empty_description",
    }
    assert by_family["date_edges"] == {
        "missing_or_unparseable_date",
        "missing_or_unparseable_amount",
        "empty_description",
    }
    assert by_family["wf_bank_csv"] == {
        "missing_or_unparseable_date",
        "empty_description",
    }
    assert by_family["null"] == {"null_text"}


def test_wf_bank_csv_amount_coerce_asymmetry_stays_valid():
    """The same amount shapes that quarantine ledger_rows ('$12.00',
    '(45.00)' both unparseable to the strict commas-only coerce) yield
    VALID wf_bank_csv rows with amount rendered 0.0."""
    valid_wfb = [t for t in _INJECTED_TURNS if t.valid and t.family == "wf_bank_csv"]
    assert valid_wfb, "the coerce-asymmetry exemplar must stay in the table"
    for t in valid_wfb:
        assert "$12.00" in t.text and "(45.00)" in t.text
        r = extract_turn(t.text)
        assert r.valid and r.n_records == 2
        assert "|0.0|" in r.extracted_text
