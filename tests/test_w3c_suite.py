"""Offline subset of the W3C RDFa 1.1 test suite (rdfa.info).

The reference's conformance layer runs the rdfa.info manifests over the
network (/root/reference/package.json:47-79, spec/parser.js:1-8), which
is impossible in this sandbox.  This module vendors a curated subset of
those public W3C test cases as offline fixtures (179 cases)
(tests/fixtures/w3c_cases.json): each case records its test-suite
``source`` URL, the markup is recreated offline from the published
cases (byte-exact vendoring would require network access — see
FIXTURES.md §7 for the honesty note), and the expected triples follow
RDFa Core 1.1 / HTML+RDFa 1.1 processing rules.

Coverage: html5 + html4 (the `spec-html4` job: same-numbered
cases under the HTML 4.01 doctype plus html4-flavored wrinkles —
<base href>, @lang (not xml:lang), safe-CURIE bnodes, hanging-@rel
completion, core-context @rel terms, and the RDFa 1.1 @src-is-object
rule) (@property, @rel+@rev, @content, @datatype, <link>/
<meta>, @typeof with and without @about, @vocab + rdfa:usesVocabulary,
@inlist rdf:List, @lang inheritance, <time>/@datetime sniffing),
xhtml5 (bare @rel terms from the XHTML initial context), svg
(xmlns-prefix mapping, xml:base) — plus, since round 4, the
role-attribute suite (the CI `spec-role` job) and the
rdfa:copy/rdfa:Pattern family, and since round 5 the rdfa1.0 manifests
(xhtml1/svg/xml, processed with the 1.1 rules under the xhtml/xml
profiles exactly as the reference CI's `spec-1-*` jobs do) and a
deeper svg/xml-profile slab asserting the xml feature-flag deltas
both positively and negatively;
those cases also cite their reference jest anchors
(test/RdfParser-test.ts:3349-3414 and :1682-2194) in a `reference`
field.  See FIXTURES.md §7 for the full case list and honesty note.

Comparison is graph isomorphism, like the reference's
``toBeRdfIsomorphic`` and the jest-derived corpus in test_fixtures.py.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from rdfa_streaming_parser_js_spark.kernel import parse_rdfa
from rdfa_streaming_parser_js_spark.kernel.isomorphism import (
    flatten_triples, isomorphic)

CASES = json.loads(
    (Path(__file__).parent / "fixtures" / "w3c_cases.json").read_text()
)["cases"]


def _expected_terms(case):
    out = []
    for s, p, o in case["expected"]:
        out.append(tuple(
            tuple(x) if x[0] != "lit" else ("lit", x[1], x[2], x[3])
            for x in (s, p, o)))
    return out


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_w3c_case(case):
    opts = case["options"]
    extractor = parse_rdfa(
        case["html"],
        base_iri=opts.get("base_iri", ""),
        profile=opts.get("profile", ""),
    )
    got = flatten_triples(extractor.triples)
    expected = _expected_terms(case)
    assert isomorphic(got, expected), (
        f"\ncase: {case['name']}\nsource: {case['source']}\ngot:\n  "
        + "\n  ".join(map(str, sorted(set(got))))
        + "\nexpected:\n  "
        + "\n  ".join(map(str, sorted(set(expected)))))
