"""HTML boilerplate strip / DOM-heuristic rules (rules/html.py)."""

from __future__ import annotations

from pdf_extractor_spark.rules.doctype import detect_family
from pdf_extractor_spark.rules.html import (
    extract_main_content,
    html_lines,
    looks_like_html,
)
from pdf_extractor_spark.rules.oracle import extract_turn
from pdf_extractor_spark.sources.synth import gen_html_page

PAGE = (
    "<!DOCTYPE html><html><head><style>.n{display:none}</style>"
    "<title>T</title></head><body>"
    '<nav><a href="/">home</a> <a href="/x">products</a> <a href="/y">pricing</a></nav>'
    "<p>The quarterly ledger review shows reconciled balances across every "
    "account &amp; the totals were verified against the export.</p>"
    "<script>tracker('pv'); var q = 1 < 2;</script>"
    '<footer><a href="/tos">terms</a> <a href="/p">privacy</a></footer>'
    "</body></html>"
)


def test_detection_routes_html_first():
    assert looks_like_html(PAGE)
    assert detect_family(PAGE) == "html_page"
    assert detect_family("Chase Visa\n12/01 X 1.00") == "chase_visa"


def test_deep_body_window_requires_document_head_opener():
    """r4 ADVICE pin: the 2048-char '<body' window is granted only to
    payloads opening with an unambiguous document head (<head, <meta,
    <?xml, <!--, <!doctype). Prose that merely starts with '<' (quoted
    text, '<redacted>') and mentions '<body' deep inside keeps the tight
    256-char guard and is NOT rerouted to the html family."""
    deep_mention = "x" * 600 + " the markup used a <body tag here"
    prose_lt = "<redacted> customer wrote: " + deep_mention
    assert not looks_like_html(prose_lt)
    assert detect_family(prose_lt + "\nChase Visa\n12/01 X 1.00") == "chase_visa"
    # a real fragment with a long head section still routes home
    long_head = "<head><meta x='" + "y" * 600 + "'></head><body><p>hi</p></body>"
    assert looks_like_html(long_head)
    assert looks_like_html("<?xml version='1.0'?>" + long_head)
    # near-start mention keeps working for prose too (the 256 guard)
    assert looks_like_html("fragment: <body class='m'>")


def test_script_style_comments_dropped():
    lines = html_lines(PAGE + "<!-- hidden comment 123 -->")
    joined = " ".join(ln.text for ln in lines)
    assert "tracker" not in joined
    assert "display:none" not in joined
    assert "hidden comment" not in joined


def test_entities_unescaped_and_density_classifier():
    kept, hits = extract_main_content(PAGE)
    assert len(kept) == 1  # only the paragraph survives
    assert "&" in kept[0] and "&amp;" not in kept[0]
    assert hits["html_link_dense_dropped"] >= 2  # nav + footer
    assert hits["html_content_lines"] == 1


def test_nav_is_link_dense_content_is_not():
    lines = {ln.text[:10]: ln for ln in html_lines(PAGE)}
    nav = next(ln for ln in lines.values() if "home" in ln.text)
    para = next(ln for ln in lines.values() if "ledger" in ln.text)
    assert nav.link_density > 0.5
    assert para.link_density == 0.0
    assert para.density > nav.density


def test_extract_turn_html_family_end_to_end():
    r = extract_turn(PAGE)
    assert r.family == "html_page"
    assert r.valid
    assert "ledger review" in r.extracted_text
    assert "home" not in r.extracted_text  # chrome stripped
    assert r.rule_hits["family_html_page"] == 1


def test_synth_generator_produces_extractable_pages():
    import random

    for seed in range(20):
        page = gen_html_page(random.Random(seed))
        r = extract_turn(page)
        assert r.family == "html_page"
        assert "tracker" not in r.extracted_text
        assert "<" not in r.extracted_text
