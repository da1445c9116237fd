"""Exact token_sort_ratio (InDel) fuzzy matching (operators/fuzzy.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.operators.fuzzy import (
    _lcs_len,
    fuzzy_topk_indel,
    indel_ratio,
    token_sort,
    token_sort_indel_ratio,
)


def _indel_distance_dp(a: str, b: str) -> int:
    """Independent oracle: edit distance with substitutions FORBIDDEN."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur.append(prev[j - 1])
            else:
                cur.append(1 + min(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


_WORDS = st.text(st.sampled_from("abcde "), max_size=14)


@settings(max_examples=300, deadline=None)
@given(_WORDS, _WORDS)
def test_lcs_identity_vs_indel_dp(a, b):
    # indel = l1 + l2 - 2*LCS — the two formulations must agree exactly
    assert len(a) + len(b) - 2 * _lcs_len(a, b) == _indel_distance_dp(a, b)


def test_known_ratios():
    assert indel_ratio("abc", "abc") == 1.0
    assert indel_ratio("", "") == 1.0
    assert indel_ratio("abc", "") == 0.0
    # rapidfuzz.fuzz.ratio("kitten","sitting") == 61.53846... -> 0.6154
    assert indel_ratio("kitten", "sitting") == 0.6154
    # token order must not matter after token_sort
    assert token_sort_indel_ratio("red widget", "widget red") == 1.0
    assert token_sort("B a C") == "a b c"


def test_substitution_costs_two():
    # unlike Levenshtein, a substitution is delete+insert
    assert _indel_distance_dp("abc", "axc") == 2
    assert indel_ratio("abc", "axc") == int(2 * 2 / 6 * 10000 + 0.5) / 10000.0


@pytest.mark.slow
def test_fuzzy_topk_indel_end_to_end(spark):
    left = spark.createDataFrame(
        [(1, "red widget pro"), (2, "blue bolt"), (3, "completely unrelated")],
        "pk long, name string",
    )
    dim = spark.createDataFrame(
        [("widget red",), ("bolt blue xl",), ("green gear",)], "title string"
    )
    got = {
        r.pk: r
        for r in fuzzy_topk_indel(left, dim, "pk", "name", "title").collect()
    }
    assert got[1].matched_text == "widget red"
    assert got[1].match_ratio == token_sort_indel_ratio("red widget pro", "widget red")
    assert got[2].matched_text == "bolt blue xl"
    assert len(got) == 3  # argmax always yields one row per left key


@pytest.mark.slow
def test_fuzzy_topk_string_key_schema(spark):
    # regression: the output schema is derived from the left key's type
    # (was hardcoded 'long', failing for string ids)
    left = spark.createDataFrame(
        [("conv_a", "red widget"), ("conv_b", "green gear")], "cid string, name string"
    )
    dim = spark.createDataFrame([("widget red",), ("gear green",)], "title string")
    got = {r.cid: r.matched_text for r in fuzzy_topk_indel(left, dim, "cid", "name", "title").collect()}
    assert got == {"conv_a": "widget red", "conv_b": "gear green"}
