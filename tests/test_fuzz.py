"""Property-based robustness: the kernel must never crash and must be
deterministic on arbitrary tag soup (the reference's implicit guarantee —
it recovers from malformed markup rather than erroring; htmlparser2 is
lenient by design)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rdfa_streaming_parser_js_spark.kernel import parse_rdfa
from rdfa_streaming_parser_js_spark.kernel.isomorphism import (
    flatten_triples, isomorphic)

TAGS = ["div", "span", "p", "li", "meta", "base", "time", "a", "head",
        "body", "html", "svg", "title"]
ATTRS = ["about", "resource", "property", "rel", "rev", "typeof",
         "prefix", "vocab", "content", "datatype", "datetime", "href",
         "src", "lang", "xml:lang", "inlist", "role", "xmlns:ex", "id"]
VALUES = ["", "x", "ex:y", "[ex:z]", "_:b1", "http://e.org/a", "#f",
          "../up", "dc:title schema:name", ":", "%zz", "a b  c",
          "2024-03-01", "P3Y6M", "und-Latn", "é中"]


@st.composite
def tag_soup(draw):
    n = draw(st.integers(0, 14))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 4))
        tag = draw(st.sampled_from(TAGS))
        if kind == 0:
            attrs = " ".join(
                f'{draw(st.sampled_from(ATTRS))}="{draw(st.sampled_from(VALUES))}"'
                for _ in range(draw(st.integers(0, 3))))
            parts.append(f"<{tag} {attrs}>")
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(st.sampled_from(VALUES)))
        elif kind == 3:
            parts.append(f"<{tag}/>")
        else:
            parts.append(draw(st.sampled_from(
                ["<!--c-->", "<!DOCTYPE html>", "<![CDATA[x]]>", "&amp;",
                 "&bogus;", "<", ">", "\x00"])))
    return "".join(parts)


@given(tag_soup(), st.sampled_from(["html", "xhtml", "xml", ""]))
@settings(max_examples=300, deadline=None)
def test_kernel_never_crashes_and_is_deterministic(doc, profile):
    a = parse_rdfa(doc, base_iri="http://example.org/dir/page", profile=profile)
    b = parse_rdfa(doc, base_iri="http://example.org/dir/page", profile=profile)
    # determinism: identical term triples AND identical extracted text
    assert flatten_triples(a.triples) == flatten_triples(b.triples)
    assert a.extracted_text() == b.extracted_text()
    # self-isomorphism sanity (exercises the bnode-relabel comparator)
    assert isomorphic(flatten_triples(a.triples), flatten_triples(b.triples))
    for s, p, o in a.triples:
        assert p.value  # predicates always non-empty IRIs


def test_inlist_without_object_never_leaks_boolean_terms():
    """Fuzz-found: about + rel + inlist with no object resource and no
    children made the explicit-new-subject singleton-list path emit the
    reference's internal use-base-IRI sentinel (a raw boolean) as the
    rdf:first object (the reference itself pushes ``false`` here —
    lib/RdfaParser.ts:443 + lib/Util.ts:161-163).  We drop the
    unrepresentable term and keep the representable rows."""
    from rdfa_streaming_parser_js_spark.kernel import parse_rdfa
    p = parse_rdfa('<div ><div ><div about="" rel="ex:y" inlist="">',
                   base_iri="http://ex.org/x", profile="html")
    flat = flatten_triples(p.triples)  # must not raise
    assert all(isinstance(part, str)
               for t in flat for term in t for part in term
               if part is not None)
    preds = sorted(t[1][1] for t in flat)
    assert preds == ["ex:y",
                     "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"]
