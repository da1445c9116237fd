"""R18 full composition (chase_checking.py:320-364 + wellsfargo_visa_parser.py:
511-534): street->city/zip pairing, ALL-CAPS name scan of the 10 lines above,
service-phrase stripping, and the last-40-lines coupon variant."""

from __future__ import annotations

import random

from pdf_extractor_spark.rules.extractors import extract_chase_checking
from pdf_extractor_spark.rules.segment import find_coupon_block, find_name_address
from pdf_extractor_spark.sources.synth import gen_chase_checking


def test_street_zip_pair_and_caps_scan():
    t = (
        "CUSTOMER SERVICE INFORMATION\n"
        "JOHN Q PUBLIC Service Center:\n"
        "ACME HOLDINGS LLC\n"
        "123 MAIN ST\n"
        "SPRINGFIELD IL 62704\n"
        "later content"
    )
    name, address = find_name_address(t)
    assert address == "123 MAIN ST SPRINGFIELD IL 62704"
    # service phrase stripped, skip-set header excluded, both runs kept
    assert name == "JOHN Q PUBLIC ACME HOLDINGS LLC"


def test_caps_scan_rejects_single_word_runs():
    name, address = find_name_address("WIDGETS\n9 ELM AVE\nTOWN 12345\n")
    assert address == "9 ELM AVE TOWN 12345"
    assert name is None  # 'WIDGETS' is a single word -> rejected


def test_no_pair_no_address():
    assert find_name_address("JOHN Q PUBLIC\nno street here\n") == (None, None)


def test_caps_scan_window_is_ten_lines():
    filler = "\n".join(f"line {i}" for i in range(12))
    t = f"FAR AWAY NAME\n{filler}\n42 OAK DR\nCITY 99999\n"
    name, _ = find_name_address(t)
    assert name is None  # the run sits >10 lines above the street line


def test_coupon_block_variant():
    t = "header\n" + "\n".join(f"row {i}" for i in range(5)) + (
        "\nJOHN Q PUBLIC\n77 STATE ST\nBOSTON MA 02109\n"
        "Account Number 1234 5678 9012"
    )
    name, address, acct = find_coupon_block(t)
    assert name == "JOHN Q PUBLIC"
    assert address == "77 STATE ST, BOSTON MA 02109"
    assert acct == "123456789012"


def test_chase_checking_emits_r18_hits():
    found = 0
    for seed in range(40):
        t = gen_chase_checking(random.Random(seed))
        r = extract_chase_checking(t)
        if r.hits.get("r18_address_found"):
            found += 1
            assert r.hits.get("r18_name_runs") == 1
    assert found > 5
