"""API-surface parity with the reference's constructor/option tests
(/root/reference/test/RdfParser-test.ts:15-95) — the jest cases that are
plumbing rather than fixtures, re-expressed directly against
``RdfaExtractor``/``parse_rdfa``.  Case-by-case accounting of every
untranscribed jest case lives in FIXTURES.md §6.
"""

from __future__ import annotations

import pytest

from rdfa_streaming_parser_js_spark.kernel.extractor import RdfaExtractor
from rdfa_streaming_parser_js_spark.kernel.html_driver import parse_rdfa
from rdfa_streaming_parser_js_spark.kernel.profiles import (
    RDFA_FEATURES, RdfaFeatures)


# RdfParser-test.ts:15-30 — constructable without/with empty args.
# (custom data factory / default graph are RDF/JS plumbing with no
# analogue here: terms are plain Python objects, graphs are DataFrames)
def test_constructable_without_args():
    ex = RdfaExtractor()
    assert ex.triples == []
    assert ex.util.base_iri.value == ""


def test_constructable_with_base_iri():
    ex = RdfaExtractor(base_iri="http://example.org/")
    assert ex.util.base_iri.value == "http://example.org/"
    assert ex.util.base_iri_document.value == "http://example.org/"


# RdfParser-test.ts:67-71 — no content type / profile / features set
# defaults to the '' profile (every feature enabled).
def test_default_profile_is_empty_all_features():
    ex = RdfaExtractor(base_iri="http://example.org/")
    assert ex.profile == ""
    assert ex.features == RDFA_FEATURES[""]
    assert ex.features.role_attribute and ex.features.xml_base


# RdfParser-test.ts:72-77 — custom features override the profile's.
def test_custom_features_override_profile():
    feats = RdfaFeatures(base_tag=True)
    ex = RdfaExtractor(profile="html", features=feats)
    assert ex.features == feats
    assert not ex.features.role_attribute  # html profile would set it


# RdfParser-test.ts:78-82 — profile selects its feature set.
def test_profile_selects_features():
    ex = RdfaExtractor(profile="core")
    assert ex.features == RDFA_FEATURES["core"]
    assert not ex.features.base_tag


# RdfParser-test.ts:83-88 — content type wins over profile.
def test_content_type_overrides_profile():
    ex = RdfaExtractor(profile="core", content_type="image/svg+xml")
    assert ex.profile == "xml"
    assert ex.features == RDFA_FEATURES["xml"]


# The features object is copied per document: mutating one document's
# features must not leak into the shared profile table.
def test_features_are_copied_per_instance():
    ex = RdfaExtractor(profile="html")
    ex.features.base_tag = False
    assert RDFA_FEATURES["html"].base_tag is True


@pytest.mark.parametrize("profile", ["", "core", "html", "xhtml", "xml"])
def test_parse_rdfa_accepts_every_profile(profile):
    doc = ('<html><body><div about="#a" property="http://p.example/x">'
           "v</div></body></html>")
    ex = parse_rdfa(doc, base_iri="http://example.org/", profile=profile)
    assert len(ex.triples) == 1
