"""RDFa term/IRI/literal utilities.

Semantic port of /root/reference/lib/Util.ts (constants :12-32, prefix
parsing :52-80, term expansion :88-120, IRI validity :127-129, content-type
mapping :137-139, base-IRI handling :146-172, vocab IRIs :182-195, literal
construction + time sniffing :203-213, CURIE/IRI resolution :239-297).

All functions are pure Python — they run inside the Arrow-batched UDF, never
per-row through Spark.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from .active_tag import ActiveTag
from .iri import resolve
from .profiles import RDFA_CONTENTTYPES
from .terms import BlankNode, Literal, NamedNode

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDFA = "http://www.w3.org/ns/rdfa#"
XHTML_VOCAB = "http://www.w3.org/1999/xhtml/vocab#"

# /root/reference/lib/Util.ts:16 — one `prefix: iri` pair per match; a pair
# without a ':' or without an IRI is silently ignored / maps to ''.
_PREFIX_RE = re.compile(r"\s*([^\s:]*):\s*(\S*)\s*")

# /root/reference/lib/Util.ts:17-30 — xsd datatype sniffing for <time>
# contents and datetime attributes. Lexical forms are preserved verbatim;
# only the datatype tag is derived. First match wins.
TIME_REGEXES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^-?P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d)?S)?)?$"),
     "duration"),
    (re.compile(r"^\d+-\d\d-\d\dT\d\d:\d\d:\d\d((Z?)|([+-]\d\d:\d\d))$"),
     "dateTime"),
    (re.compile(r"^\d+-\d\d-\d\dZ?$"), "date"),
    (re.compile(r"^\d\d:\d\d:\d\d((Z?)|([+-]\d\d:\d\d))$"), "time"),
    (re.compile(r"^\d+-\d\d$"), "gYearMonth"),
    (re.compile(r"^\d+$"), "gYear"),
]

# /root/reference/lib/Util.ts:32 — structural IRI validity.
_IRI_RE = re.compile(r'^([A-Za-z][\d+-.A-Za-z]*|_):[^ "<>[\\\]`{|}]*$')

# /root/reference/lib/Util.ts:191 — multi-valued attribute separator.
_WS_SPLIT = re.compile(r"\s+")


def parse_prefixes(attributes: dict[str, str], parent_prefixes: dict[str, str],
                   xmlns_prefix_mappings: bool) -> dict[str, str]:
    """Extract prefix mappings from @prefix / xmlns:* attributes.

    Copy-on-write: returns ``parent_prefixes`` unchanged when the tag
    declares nothing new (/root/reference/lib/Util.ts:66-79).
    """
    additional: dict[str, str] = {}
    if xmlns_prefix_mappings:
        for attribute, value in attributes.items():
            if attribute.startswith("xmlns"):
                additional[attribute[6:]] = value

    prefix_attr = attributes.get("prefix")
    if prefix_attr or additional:
        prefixes = {**parent_prefixes, **additional}
        if prefix_attr:
            for m in _PREFIX_RE.finditer(prefix_attr):
                prefixes[m.group(1)] = m.group(2)
        return prefixes
    return parent_prefixes


def expand_prefixed_term(term: str, active_tag: ActiveTag) -> str:
    """CURIE prefix / bare-term expansion (/root/reference/lib/Util.ts:88-120)."""
    colon = term.find(":")
    prefix: Optional[str] = None
    local: Optional[str] = None
    if colon >= 0:
        prefix = term[:colon]
        local = term[colon + 1:]

    # Empty prefix → XHTML default vocabulary
    if prefix == "":
        return XHTML_VOCAB + (local or "")

    if prefix:
        mapped = active_tag.prefixes_all.get(prefix)
        if mapped:
            return mapped + (local or "")

    if term:
        expanded = active_tag.prefixes_all.get(term.lower())
        if expanded:
            return expanded

    return term


def is_valid_iri(iri: str) -> bool:
    return _IRI_RE.match(iri) is not None


def content_type_to_profile(content_type: str) -> str:
    return RDFA_CONTENTTYPES.get(content_type, "")


class Util:
    """Stateful utility holder: document base IRI + blank-node factory.

    Mirrors the instance side of /root/reference/lib/Util.ts:34-43. The
    ``base_iri`` is document-global (mutated by <base>, lib/RdfaParser.ts:206)
    while ``base_iri_document`` stays frozen at the initial value (used for
    vocab-mode prefixed relative IRIs, lib/Util.ts:291).
    """

    def __init__(self, base_iri: str | None,
                 fresh_blank_node: Callable[[], BlankNode]) -> None:
        self.base_iri = NamedNode(base_iri or "")
        self.base_iri_document = self.base_iri
        self.blank_node_factory: Optional[Callable[[], BlankNode]] = None
        self._fresh_blank_node = fresh_blank_node

    def get_base_iri(self, base_iri_value: str) -> NamedNode:
        """<base href> / xml:base handling: strip fragment, resolve
        against the current base (/root/reference/lib/Util.ts:146-153)."""
        href = base_iri_value
        frag = href.find("#")
        if frag >= 0:
            href = href[:frag]
        return NamedNode(resolve(href, self.base_iri.value))

    def get_base_iri_term(self, active_tag: ActiveTag) -> NamedNode:
        return active_tag.local_base_iri or self.base_iri

    def get_resource_or_base_iri(self, term, active_tag: ActiveTag):
        """Resolve the boolean-as-baseIRI sentinel
        (/root/reference/lib/Util.ts:161-163)."""
        return self.get_base_iri_term(active_tag) if term is True else term

    def create_blank_node(self) -> BlankNode:
        if self.blank_node_factory is not None:
            return self.blank_node_factory()
        return self._fresh_blank_node()

    def create_vocab_iris(self, terms: str | None, active_tag: ActiveTag,
                          allow_terms: bool, allow_blank_node: bool) -> list:
        """Whitespace-split multi-valued attribute → term list
        (/root/reference/lib/Util.ts:182-195)."""
        out = []
        for term in _WS_SPLIT.split(terms or ""):
            if not term or (not allow_terms and ":" not in term):
                continue
            created = self.create_iri(term, active_tag, True, True,
                                      allow_blank_node)
            if created is not None:
                out.append(created)
        return out

    def create_literal(self, literal: str, active_tag: ActiveTag) -> Literal:
        """Literal with time-datatype sniffing; datatype wins over language;
        language lowercased (/root/reference/lib/Util.ts:203-213)."""
        if active_tag.interpret_object_as_time and not active_tag.datatype:
            for regex, xsd_type in TIME_REGEXES:
                if regex.match(literal):
                    active_tag.datatype = NamedNode(XSD + xsd_type)
                    break
        if active_tag.datatype:
            return Literal(literal, datatype=active_tag.datatype)
        if active_tag.language:
            return Literal(literal, language=active_tag.language.lower())
        return Literal(literal)

    def create_iri(self, term: str | None, active_tag: ActiveTag, vocab: bool,
                   allow_safe_curie: bool, allow_blank_node: bool):
        """CURIE/safe-CURIE/IRI resolution
        (/root/reference/lib/Util.ts:239-297). Returns NamedNode, BlankNode,
        or None for invalid terms."""
        term = term or ""

        if not allow_safe_curie:
            if not vocab:
                term = resolve(term, self.get_base_iri_term(active_tag).value)
            if not is_valid_iri(term):
                return None
            return NamedNode(term)

        # Safe CURIEs: [prefix:local]; must contain a prefix separator
        if term and term.startswith("[") and term.endswith("]"):
            term = term[1:-1]
            if ":" not in term:
                return None

        # Blank nodes
        if term.startswith("_:"):
            if not allow_blank_node:
                return None
            return BlankNode(term[2:] or "b_identity")

        # Vocab IRIs
        if vocab and active_tag.vocab and ":" not in term:
            return NamedNode(active_tag.vocab + term)

        # Prefixed IRIs
        iri = expand_prefixed_term(term, active_tag)
        if not vocab:
            iri = resolve(iri, self.get_base_iri_term(active_tag).value)
        elif term != iri:
            # prefixed relative IRI in vocab-mode resolves against the
            # document (not mutated) base
            iri = resolve(iri, self.base_iri_document.value)
        if not is_valid_iri(iri):
            return None
        return NamedNode(iri)
