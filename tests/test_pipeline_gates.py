"""Pins for the flagship gate's injected malformed turns (catalog_ext2:
_BAD_TURNS): each literal must keep producing exactly the quarantine reason
the DuckDB oracle hard-codes for its (mod, offset) slot. If an extractor or
validity-rule change reroutes one of these literals, this fails BEFORE the
driver's value hash does, with a readable message."""

from __future__ import annotations

from pdf_extractor_spark.plans.catalog_ext2 import _BAD_TURNS
from pdf_extractor_spark.rules.oracle import extract_turn


def test_bad_turn_literals_produce_pinned_reasons():
    assert len(_BAD_TURNS) == 4
    assert len({off for _, off, _, _ in _BAD_TURNS}) == 4  # distinct slots
    for mod, _off, text, reason in _BAD_TURNS:
        r = extract_turn(text)
        assert not r.valid, f"mod-{mod} literal unexpectedly valid"
        assert r.problem_reason == reason, (
            f"mod-{mod} literal: {r.problem_reason!r} != pinned {reason!r}"
        )
        assert r.n_records == 0  # nothing extractable leaks into valid output


def test_bad_turn_reasons_cover_every_p5_class():
    reasons = {reason for _, _, _, reason in _BAD_TURNS}
    assert reasons == {
        "null_text",
        "missing_or_unparseable_date",
        "missing_or_unparseable_amount",
        "empty_description",
    }
