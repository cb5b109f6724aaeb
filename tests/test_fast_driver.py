"""Differential tests: FastHtmlSaxDriver must produce the same triples
and extracted text as the stdlib-based HtmlSaxDriver on the entire
fixture corpus, on seeded tag soup, and under arbitrary chunking."""

from __future__ import annotations

import json
import random
from pathlib import Path

import pytest

from rdfa_streaming_parser_js_spark.kernel import RdfaExtractor
from rdfa_streaming_parser_js_spark.kernel.fast_driver import (
    FastHtmlSaxDriver)
from rdfa_streaming_parser_js_spark.kernel.html_driver import HtmlSaxDriver
from rdfa_streaming_parser_js_spark.kernel.isomorphism import (
    flatten_triples)
from rdfa_streaming_parser_js_spark.kernel.profiles import RdfaFeatures

CASES = json.loads(
    (Path(__file__).parent / "fixtures" / "rdfa_cases.json").read_text()
)["cases"]
HTML_CASES = [c for c in CASES
              if c["options"].get("profile", "") != "xml"
              and c["options"].get("content_type") is None]


def _run(driver_cls, html, opts):
    features = (RdfaFeatures(**opts["features"])
                if "features" in opts else None)
    ex = RdfaExtractor(base_iri=opts.get("base_iri", ""),
                       profile=opts.get("profile", "html") or "html",
                       language=opts.get("language"),
                       vocab=opts.get("vocab"), features=features)
    d = driver_cls(ex)
    d.feed(html)
    d.finish()
    return flatten_triples(ex.triples), ex.extracted_text()


@pytest.mark.parametrize("case", HTML_CASES,
                         ids=[c["name"][:60] for c in HTML_CASES])
def test_fixture_parity(case):
    slow = _run(HtmlSaxDriver, case["html"], case["options"])
    fast = _run(FastHtmlSaxDriver, case["html"], case["options"])
    assert fast == slow


TAGS = ["div", "span", "p", "li", "meta", "base", "time", "a", "head",
        "body", "html", "svg", "title", "script", "style", "table",
        "tr", "td"]
ATTRS = ["about", "resource", "property", "rel", "typeof", "prefix",
         "vocab", "content", "datatype", "datetime", "href", "lang",
         "inlist", "xmlns:ex", "id", "data-x"]
VALS = ["", "x", "ex:y", "[ex:z]", "_:b1", "http://e.org/a", "#f",
        "../up", "dc:title schema:name", ":", "a b  c", "2024-03-01",
        "&amp;", "&lt;tag&gt;", "&bogus", "q'q", "é中"]
JUNK = ["<!--c-->", "<!-- unterminated", "<!DOCTYPE html>",
        "<![CDATA[x]]>", "&amp;", "&ampx", "&#65;", "&#x41;", "&bogus;",
        "&", "<", ">", "</", "<>", "< div>", "\x00", "<?pi?>",
        "</p extra>", "<a", "<div class=", "text&am"]


def _soup(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(0, 20)):
        k = rng.randrange(6)
        t = rng.choice(TAGS)
        if k == 0:
            attrs = []
            for _ in range(rng.randrange(0, 4)):
                a, v = rng.choice(ATTRS), rng.choice(VALS)
                style = rng.randrange(3)
                if style == 0:
                    attrs.append(f'{a}="{v}"')
                elif style == 1:
                    attrs.append(f"{a}='{v}'")
                else:
                    attrs.append(f"{a}={v.split()[0] if v.strip() else 'v'}")
            parts.append(f"<{t} {' '.join(attrs)}>")
        elif k == 1:
            parts.append(f"</{t}>")
        elif k == 2:
            parts.append(rng.choice(VALS))
        elif k == 3:
            parts.append(f"<{t}/>")
        elif k == 4:
            parts.append(rng.choice(JUNK))
        else:
            parts.append(f"<{t.upper()} Prop='{rng.choice(VALS)}'>")
    return "".join(parts)


def test_fuzz_parity_5000():
    rng = random.Random(20260817)
    opts = {"base_iri": "http://example.org/d/p"}
    for trial in range(5000):
        doc = _soup(rng)
        slow = _run(HtmlSaxDriver, doc, opts)
        fast = _run(FastHtmlSaxDriver, doc, opts)
        assert fast == slow, f"trial {trial}: {doc!r}"


def test_chunked_parity():
    rng = random.Random(42)
    opts = {"base_iri": "http://example.org/"}
    for trial in range(400):
        doc = _soup(rng)
        whole = _run(FastHtmlSaxDriver, doc, opts)
        ex = RdfaExtractor(base_iri=opts["base_iri"], profile="html")
        d = FastHtmlSaxDriver(ex)
        i = 0
        while i < len(doc):
            step = rng.randrange(1, 9)
            d.feed(doc[i:i + step])
            i += step
        d.finish()
        assert (flatten_triples(ex.triples),
                ex.extracted_text()) == whole, f"trial {trial}: {doc!r}"


# CDATA (script/style) content-model corner cases: html.parser stays in
# CDATA mode until a FULL end-tag match ('</' \s* name \s* '>') naming
# the CDATA element; near-misses ('</scriptx>', '</script foo>',
# '</script/>', '</styles>') are raw text.  A prefix-match scanner
# exits CDATA too early on all of these.
CDATA_CASES = [
    "<script>x</scriptx>more</script>",
    "<script>var s = 'a</scriptfoo>b';</script><p property='dc:t'>T</p>",
    "<style>a::before{content:'</styles>'}</style>",
    "<script>x</script foo>y</script>",
    "<script>x</script/>y</script>",
    "<script>x</ script>after",
    "<script>x</SCRIPT >after",
    "<style>s</stylex></style><span property='p'>v</span>",
    "<script>x</scriptx>",           # unterminated: dropped at EOF
    "<script>x</script",             # partial close at EOF
    "<script>x</scr",                # partial near-miss at EOF
    "<script>a<b>c&amp;d</e></script>t",
    "<script></script' ></script>",
    "<script>x</script\t\n>y",
    "<p property='a'>A<script>ig<div property='no'>n</div></scripty>"
    "</script><span property='b'>B</span></p>",
]


@pytest.mark.parametrize("doc", CDATA_CASES)
def test_cdata_near_miss_parity(doc):
    opts = {"base_iri": "http://example.org/d/p"}
    assert _run(FastHtmlSaxDriver, doc, opts) \
        == _run(HtmlSaxDriver, doc, opts)


@pytest.mark.parametrize("doc", CDATA_CASES)
def test_cdata_near_miss_chunked(doc):
    """Byte-at-a-time feed must match the whole-document fast parse."""
    opts = {"base_iri": "http://example.org/d/p"}
    whole = _run(HtmlSaxDriver, doc, opts)
    ex = RdfaExtractor(base_iri=opts["base_iri"], profile="html")
    d = FastHtmlSaxDriver(ex)
    for ch in doc:
        d.feed(ch)
    d.finish()
    assert (flatten_triples(ex.triples), ex.extracted_text()) == whole


CDATA_BITS = ["</script", "</scriptx>", "</script foo>", "</script/>",
              "</ script>", "</scr", "</style>", "</styles>", "x", "'",
              '"', ">", "<", "&amp;", "a b", "</script>", "</SCRIPT>",
              "</script >", "\n", "</st", "ipt>"]


def test_cdata_fuzz_parity_2000():
    rng = random.Random(20260818)
    opts = {"base_iri": "http://example.org/d/p"}
    for trial in range(2000):
        body = "".join(rng.choice(CDATA_BITS)
                       for _ in range(rng.randrange(0, 8)))
        elem = rng.choice(["script", "style"])
        doc = (f"<p property='dc:a'>x</p><{elem}>{body}"
               + rng.choice(["", f"</{elem}>"])
               + "<span property='dc:b'>y</span>")
        slow = _run(HtmlSaxDriver, doc, opts)
        fast = _run(FastHtmlSaxDriver, doc, opts)
        assert fast == slow, f"trial {trial}: {doc!r}"


# --------------------------------------------------------------------------
# Extractor fast-path parity: the no-RDFa-attributes shortcut in
# on_tag_open (kernel/extractor.py FAST_TAG_PATH) must be behaviorally
# invisible.  Unlike the driver differentials above — where both drivers
# share the extractor — this compares the SAME driver with the shortcut
# disabled vs enabled, so a semantic divergence in the shortcut itself
# cannot cancel out.
# --------------------------------------------------------------------------

@pytest.fixture
def _slow_tag_path(monkeypatch):
    from rdfa_streaming_parser_js_spark.kernel import extractor as ex_mod
    monkeypatch.setattr(ex_mod, "FAST_TAG_PATH", False)


def test_fast_tag_path_fixture_parity(monkeypatch):
    from rdfa_streaming_parser_js_spark.kernel import extractor as ex_mod
    for case in HTML_CASES:
        fast = _run(FastHtmlSaxDriver, case["html"], case["options"])
        monkeypatch.setattr(ex_mod, "FAST_TAG_PATH", False)
        slow = _run(FastHtmlSaxDriver, case["html"], case["options"])
        monkeypatch.setattr(ex_mod, "FAST_TAG_PATH", True)
        assert fast == slow, case["name"]


def test_fast_tag_path_fuzz_parity(monkeypatch):
    from rdfa_streaming_parser_js_spark.kernel import extractor as ex_mod
    rng = random.Random(20260819)
    opts = {"base_iri": "http://example.org/d/p"}
    for trial in range(3000):
        doc = _soup(rng)
        fast = _run(FastHtmlSaxDriver, doc, opts)
        monkeypatch.setattr(ex_mod, "FAST_TAG_PATH", False)
        slow = _run(FastHtmlSaxDriver, doc, opts)
        monkeypatch.setattr(ex_mod, "FAST_TAG_PATH", True)
        assert fast == slow, f"trial {trial}: {doc!r}"


def test_fast_tag_path_plain_markup_parity(monkeypatch):
    """Attribute-less soup — the markup shape the fast path exists for:
    every non-root tag with only class/id/data-* attributes takes it."""
    from rdfa_streaming_parser_js_spark.kernel import extractor as ex_mod
    doc = ("<html prefix='ex: http://e.org/'><body vocab='http://v.org/'>"
           "<div class='a'><p id='x'>one <b>two</b></p>"
           "<span data-k='v'>three</span>"
           "<div about='ex:s' rel='ex:r'><ul><li><a href='x'>L</a></li>"
           "</ul></div>"
           "<div property='ex:p'>nested <i>text</i> here</div>"
           "</div></body></html>")
    fast = _run(FastHtmlSaxDriver, doc, {"base_iri": "http://example.org/"})
    monkeypatch.setattr(ex_mod, "FAST_TAG_PATH", False)
    slow = _run(FastHtmlSaxDriver, doc, {"base_iri": "http://example.org/"})
    assert fast == slow
    assert fast[0]  # sanity: the document does yield triples
