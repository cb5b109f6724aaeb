"""HTML-parse-listener hook parity — transcribed from the reference's
listener test (/root/reference/test/RdfParser-test.ts:3416-3461)."""

from __future__ import annotations

from rdfa_streaming_parser_js_spark.kernel import (
    HtmlParseListener, NamedNode, parse_rdfa)


class Recorder(HtmlParseListener):
    def __init__(self):
        self.opens, self.texts, self.closes, self.ends = [], [], 0, 0

    def on_tag_open(self, name, attributes):
        self.opens.append((name, dict(attributes)))

    def on_text(self, data):
        self.texts.append(data)

    def on_tag_close(self):
        self.closes += 1

    def on_end(self):
        self.ends += 1


DOC = """<html>
<head></head>
<body>
    <h2 about="http://example2.org/" property="http://purl.org/dc/terms/title">The Trouble with Bob</h2>
</body>
</html>"""


def test_listener_receives_tokenizer_stream():
    rec = Recorder()
    ex = parse_rdfa(DOC, base_iri="http://example.org/",
                    html_parse_listener=rec)
    assert [(s.value, p.value, o.value) for s, p, o in ex.triples] == [
        ("http://example2.org/", "http://purl.org/dc/terms/title",
         "The Trouble with Bob")]
    assert isinstance(ex.triples[0][0], NamedNode)

    assert [n for n, _ in rec.opens] == ["html", "head", "body", "h2"]
    assert rec.opens[0][1] == {}
    assert rec.opens[3][1] == {
        "about": "http://example2.org/",
        "property": "http://purl.org/dc/terms/title"}
    assert rec.closes == 4
    assert rec.ends == 1
    assert "The Trouble with Bob" in rec.texts
    assert rec.texts.count("\n") >= 2


def test_listener_absent_is_default():
    ex = parse_rdfa(DOC, base_iri="http://example.org/")
    assert len(ex.triples) == 1


# -- emitTriple guard parity (reference RdfParser-test.ts:95-122) ---------

def _emit_probe():
    from rdfa_streaming_parser_js_spark.kernel import RdfaExtractor
    return RdfaExtractor(base_iri="http://example.org/")


def test_emit_triple_valid_terms():
    from rdfa_streaming_parser_js_spark.kernel import NamedNode
    x = _emit_probe()
    x.emit_triple(NamedNode("http://s"), NamedNode("http://p"),
                  NamedNode("http://o"))
    assert len(x.triples) == 1


def test_emit_triple_invalid_terms_dropped():
    from rdfa_streaming_parser_js_spark.kernel import NamedNode
    for s, p, o in [("s", "http://p", "http://o"),
                    ("http://s", "p", "http://o"),
                    ("http://s", "http://p", "o")]:
        x = _emit_probe()
        x.emit_triple(NamedNode(s), NamedNode(p), NamedNode(o))
        assert x.triples == []


def test_base_tag_without_href_keeps_base_iri():
    # reference RdfParser-test.ts:325-335
    ex = parse_rdfa("""<html>
<head>
    <base />
</head>
<body prefix="dc: http://purl.org/dc/terms/ schema: http://schema.org/">
    <div property="dc:title" resource="img.jpg"></div>
</body>
</html>""", base_iri="http://example.org/")
    assert ex.util.base_iri.value == "http://example.org/"
    assert any(o.value == "http://example.org/img.jpg"
               for _, _, o in ex.triples)


def test_listener_errors_propagate():
    # mirror of 'should error when an error is thrown in onTagOpen/...'
    # (RdfParser-test.ts:125-173): exceptions surface to the caller
    import pytest

    class Boom(HtmlParseListener):
        def on_text(self, data):
            raise RuntimeError("Dummy error")

    with pytest.raises(RuntimeError, match="Dummy error"):
        parse_rdfa(DOC, base_iri="http://example.org/",
                   html_parse_listener=Boom())


def test_chunked_feed_equals_whole_document():
    """The reference consumes arbitrary chunk splits (Node Transform,
    /root/reference/lib/RdfaParser.ts:77-80); our drivers must tokenize
    identically when fed byte-at-a-time across tag boundaries."""
    import json
    from pathlib import Path
    from rdfa_streaming_parser_js_spark.kernel import RdfaExtractor
    from rdfa_streaming_parser_js_spark.kernel.html_driver import (
        HtmlSaxDriver)
    from rdfa_streaming_parser_js_spark.kernel.isomorphism import (
        flatten_triples)

    cases = json.loads(
        (Path(__file__).parent / "fixtures" / "rdfa_cases.json")
        .read_text())["cases"]
    html_cases = [c for c in cases
                  if c["options"].get("profile", "") in ("", "html")
                  and "features" not in c["options"]][:25]
    assert len(html_cases) == 25
    for case in html_cases:
        base = case["options"].get("base_iri", "")
        whole = RdfaExtractor(base_iri=base, profile="html")
        d = HtmlSaxDriver(whole)
        d.feed(case["html"])
        d.finish()

        chunked = RdfaExtractor(base_iri=base, profile="html")
        d2 = HtmlSaxDriver(chunked)
        for i in range(0, len(case["html"]), 7):
            d2.feed(case["html"][i:i + 7])
        d2.finish()
        assert (flatten_triples(whole.triples)
                == flatten_triples(chunked.triples)), case["name"]
        assert whole.extracted_text() == chunked.extracted_text()
