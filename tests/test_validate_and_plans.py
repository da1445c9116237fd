"""Validity split + observe() metrics, and physical-plan regression guards
(the plan properties SURVEY §4 relies on must not silently regress)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.operators.validate import split_extracted
from pdf_extractor_spark.schema import TRANSCRIPTS
from pdf_extractor_spark.sources.synth import generate_transcripts

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def extracted(spark):
    pdf = generate_transcripts(n_convs=30, seed=42)
    return extract_turns(spark.createDataFrame(pdf, schema=TRANSCRIPTS))


def test_split_partitions_completely(spark, extracted):
    s = split_extracted(extracted)
    n_valid, n_quar, n_all = s.valid.count(), s.quarantine.count(), extracted.count()
    assert n_valid + n_quar == n_all
    assert s.quarantine.where(F.col("problem_reason").isNull()).count() == 0
    m = s.observation.get
    assert m["n_turns"] == n_all
    assert m["n_valid"] == n_valid
    assert m["n_records"] >= m["n_turns_with_hits"] > 0


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        entrymod.queries()[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(spark, "p4_amount_threshold")
    assert "GreaterThanOrEqual(o_totalprice,150000.0)" in p  # PushedFilters
    assert "o_comment" not in p  # column pruning


def test_q3_broadcasts_dims_and_prunes(spark):
    p = _plan(spark, "tpch_q3_shipping")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    # fact scan reads exactly the 3 needed columns
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in p


def test_extraction_plan_has_no_shuffle(spark, extracted):
    # stateless per-turn extraction must be a narrow pipeline: no Exchange
    buf = io.StringIO()
    with redirect_stdout(buf):
        extracted.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert any(tag in p for tag in ("MapInArrow", "PythonMapInArrow", "MapInPandas"))


def test_minhash_join_keys_are_small(spark):
    # the LSH band join must join on (band_id, key) only — never on token
    # arrays or text; candidate side carries just ids + 32-char keys.
    # (The production query, directly; the gate registry wraps it in the
    # tagged dedup_minhash_suite.)
    from pdf_extractor_spark.plans import catalog_ext

    buf = io.StringIO()
    with redirect_stdout(buf):
        catalog_ext.q_dedup_minhash_lsh(spark, SF).explain("formatted")
    p = buf.getvalue()
    assert "band_id" in p and "key" in p


def test_window_suite_single_exchange(spark):
    # four window ops over one spec must plan exactly ONE shuffle
    from pdf_extractor_spark.plans import suites

    import re

    buf = io.StringIO()
    with redirect_stdout(buf):
        suites.q_window_suite(spark, SF).explain("formatted")
    p = buf.getvalue()
    # formatted output repeats each node in the detail section: count the
    # "(n) Exchange" node headers, not raw substring occurrences
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_sample_stratified_is_narrow(spark):
    # deterministic hash sampling must not move data
    from pdf_extractor_spark.plans import llm_extras

    buf = io.StringIO()
    with redirect_stdout(buf):
        llm_extras.q_sample_stratified(spark, SF).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_window_consumers_plan_single_exchange(spark):
    """r3 VERDICT #4 adoption audit, pinned: every registry entry whose plan
    is 'one window spec over one table' must plan exactly ONE shuffle — the
    ranking sweep (3 ranking functions), sessionize (lag + cumulative sum,
    two frames), per-key argmax, the sequential id, and the last-row
    provenance ladder all share their partitionBy/orderBy across every
    window function they compute. Multi-exchange registry entries were
    audited alongside (round 4): each of their exchanges serves a distinct
    join/agg key, so there is nothing left to share."""
    import re

    from pdf_extractor_spark.plans import catalog, catalog_ext2

    def n_exchanges(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))

    single = {
        "o3_top1_per_key": catalog.q_o3_top1_per_key,
        "w7_ranking_suite": catalog.q_w7_ranking_suite,
        "w6_sessionize": catalog.q_w6_sessionize,
        "r21_sequential_id": catalog.q_r21_sequential_id,
        "r11_last_row_provenance": catalog_ext2.q_r11_last_row_provenance,
    }
    for name, fn in single.items():
        assert n_exchanges(fn(spark, SF)) == 1, name
