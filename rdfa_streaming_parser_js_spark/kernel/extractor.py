"""RDFa Core 1.1 + HTML5 evaluation-context state machine.

Semantic port of /root/reference/lib/RdfaParser.ts (tag-open processing
steps 1-13 :87-590, text accumulation :592-610, tag-close emission
:612-724, document-end pattern flush :726-755, list mapping :775-795,
triple validation :803-811, rdfa:Pattern copying :819-868).

This class is driven by SAX-style events (``on_tag_open`` / ``on_text`` /
``on_tag_close`` / ``on_end``) — the same seam the reference exposes
(/root/reference/README.md "advanced usage") — so unit tests can bypass
HTML tokenization, and the HTML/XML drivers in ``html_driver.py`` feed it.

Blank nodes are minted from a deterministic per-document counter
(labels ``g_0``, ``g_1``, ...) so extraction is reproducible at any
parallelism — unlike the reference's process-global counter
(/root/reference/lib/Util.ts:219-224); fixture comparison uses graph
isomorphism so labels don't matter, and distributed runs skolemize with
sha1(url || label) downstream.
"""

from __future__ import annotations

from .active_tag import ActiveTag, RdfaPattern
from .contexts import INITIAL_CONTEXT, INITIAL_CONTEXT_XHTML
from .profiles import RDFA_FEATURES, RdfaFeatures
from .terms import BlankNode, NamedNode
from .util import RDF, RDFA, XHTML_VOCAB, Util, content_type_to_profile, parse_prefixes

# Hoisted constant terms (NamedNode is immutable value-equality):
# constructing these per emitted triple showed up in profiles.
_RDF_TYPE = NamedNode(RDF + "type")
_RDF_FIRST = NamedNode(RDF + "first")
_RDF_REST = NamedNode(RDF + "rest")
_RDF_NIL = NamedNode(RDF + "nil")
_RDFA_USES_VOCABULARY = NamedNode(RDFA + "usesVocabulary")

# Attributes that make a tag RDFa-relevant: if none of these (and no
# xmlns*) appear, steps 2-13 collapse to pure context inheritance plus
# the skip-element rule, and ``on_tag_open`` takes a fast path.  Most
# real-web markup (div/span/p/a-without-RDFa soup) lands there.
_RDFA_ATTRS = frozenset((
    "about", "resource", "href", "src", "typeof", "property", "rel",
    "rev", "content", "datatype", "datetime", "inlist", "vocab",
    "prefix", "role", "lang", "xml:lang", "xml:base"))
# Tags with name-triggered behavior (base-IRI override, time datatype
# sniffing, head/body subject inheritance) that must take the full path
# even with no attributes.
_NAME_TRIGGERED_TAGS = frozenset(("base", "time", "head", "body"))
# Differential-test switch (tests/test_fast_driver.py): the fast path
# must be behaviorally invisible; parity is asserted by running the
# fixture + fuzz corpora with this flag off and on.
FAST_TAG_PATH = True


class RdfaError(Exception):
    """Raised for states where the reference would emit a stream error."""


_CLONE_SLOTS = ActiveTag.__slots__


def _clone_tag(tag: ActiveTag) -> ActiveTag:
    """Shallow clone, sharing mutable members — mirrors the JS object
    spread at /root/reference/lib/RdfaParser.ts:96-103."""
    out = ActiveTag.__new__(ActiveTag)
    for slot in _CLONE_SLOTS:
        setattr(out, slot, getattr(tag, slot))
    return out


class RdfaExtractor:
    """One instance per document. Collects triples into ``self.triples``."""

    def __init__(self, base_iri: str = "", profile: str | None = "",
                 content_type: str | None = None, language: str | None = None,
                 vocab: str | None = None,
                 features: RdfaFeatures | None = None) -> None:
        if content_type is not None:
            profile = content_type_to_profile(content_type)
        profile = profile or ""
        self.profile = profile
        self.features = (features or RDFA_FEATURES[profile]).copy()
        self._bnode_counter = 0
        self.util = Util(base_iri, self._fresh_blank_node)
        self.triples: list[tuple] = []

        self._copy_rdfa_patterns = self.features.copy_rdfa_patterns
        self.rdfa_patterns: dict[str, RdfaPattern] = {}
        self.pending_copies: dict[str, list[ActiveTag]] = {}

        root = ActiveTag()
        root.language = language
        root.vocab = vocab
        root.prefixes_all = dict(INITIAL_CONTEXT)
        if self.features.xhtml_initial_context:
            root.prefixes_all.update(INITIAL_CONTEXT_XHTML)
        self.stack: list[ActiveTag] = [root]

    # ------------------------------------------------------------------
    def _fresh_blank_node(self) -> BlankNode:
        label = f"g_{self._bnode_counter}"
        self._bnode_counter += 1
        return BlankNode(label)

    def _is_inherit_subject_in_head_body(self, name: str) -> bool:
        # /root/reference/lib/RdfaParser.ts:763-765
        return (self.features.inherit_subject_in_head_body
                and name in ("head", "body"))

    # ------------------------------------------------------------------
    def on_tag_open(self, name: str, attributes: dict[str, str]) -> None:
        features = self.features
        util = self.util
        stack = self.stack

        # Determine the parent tag, ignoring skipped tags; a skipped tag
        # still donates lang/prefixes/vocab (RdfaParser.ts:89-104).
        parent_i = len(stack) - 1
        while parent_i > 0 and stack[parent_i].skip_element:
            parent_i -= 1
        parent = stack[parent_i]
        if parent_i != len(stack) - 1:
            last = stack[-1]
            merged = _clone_tag(parent)
            merged.language = last.language
            merged.prefixes_all = last.prefixes_all
            merged.prefixes_custom = last.prefixes_custom
            merged.vocab = last.vocab
            parent = merged

        tag = ActiveTag()
        tag.name = name
        tag.collect_child_tags = parent.collect_child_tags
        tag.collect_child_tags_for_current_tag = \
            parent.collect_child_tags_for_current_tag
        tag.inlist = "inlist" in attributes
        tag.list_mapping_local = parent.list_mapping
        tag.local_base_iri = parent.local_base_iri
        stack.append(tag)

        # Fast path: no RDFa-relevant attributes, no name-triggered
        # behavior, not the root element, not inside an XMLLiteral or an
        # rdfa:Pattern collection.  Steps 2-4 reduce to inheritance;
        # steps 5-13 reduce to the 5.2 no-attribute arm: inherit the
        # parent object as subject and mark the element skipped
        # (RdfaParser.ts:412-419), or — with no parent object — keep the
        # parent subject and pass incomplete triples through.  Exactly
        # equivalent to the full path below (differential-tested with
        # FAST_TAG_PATH off/on over the fixture and fuzz corpora).
        if (FAST_TAG_PATH and not tag.collect_child_tags
                and len(stack) != 2
                and name not in _NAME_TRIGGERED_TAGS
                and (not self._copy_rdfa_patterns
                     or parent.collected_pattern_tag is None)
                and _RDFA_ATTRS.isdisjoint(attributes)):
            for a in attributes:
                if a.startswith("xmlns"):
                    break
            else:
                tag.vocab = parent.vocab
                tag.prefixes_custom = parent.prefixes_custom
                tag.prefixes_all = parent.prefixes_all
                tag.language = parent.language
                parent_object = parent.object
                if parent_object:
                    tag.skip_element = True
                    tag.subject = parent_object
                    tag.object = parent_object
                else:
                    tag.subject = parent.subject
                if parent.incomplete_triples:
                    tag.incomplete_triples = (tag.incomplete_triples
                                              + parent.incomplete_triples)
                return

        # XMLLiteral/HTML collection: serialize the open tag, re-declaring
        # inherited custom prefixes alphabetically (RdfaParser.ts:123-139).
        if tag.collect_child_tags:
            for prefix in sorted(parent.prefixes_custom.keys()):
                key = "xmlns" if prefix == "" else f"xmlns:{prefix}"
                if key not in attributes:
                    attributes[key] = parent.prefixes_custom[prefix]
            serialized = " ".join(f'{k}="{v}"' for k, v in attributes.items())
            tag.text_with_tags = [
                f"<{name} {serialized}>" if serialized else f"<{name}>"]
            if features.skip_handling_xml_literal_children:
                return

        allow_terms_in_rel = True
        allow_terms_in_rev = True
        if features.only_allow_uri_rel_rev_if_property:
            # Drop non-CURIE rel/rev when property is present
            # (RdfaParser.ts:143-157)
            if "property" in attributes and "rel" in attributes:
                allow_terms_in_rel = False
                if ":" not in attributes["rel"]:
                    del attributes["rel"]
            if "property" in attributes and "rev" in attributes:
                allow_terms_in_rev = False
                if ":" not in attributes["rev"]:
                    del attributes["rev"]

        if self._copy_rdfa_patterns:
            # Collect children of an open pattern (RdfaParser.ts:161-173)
            if parent.collected_pattern_tag is not None:
                pattern = RdfaPattern(name, attributes, root_pattern=False)
                parent.collected_pattern_tag.children.append(pattern)
                tag.collected_pattern_tag = pattern
                return
            # Start a new pattern (RdfaParser.ts:176-187)
            if attributes.get("typeof") == "rdfa:Pattern":
                tag.collected_pattern_tag = RdfaPattern(
                    name, attributes, root_pattern=True, parent_tag=parent)
                return
            # Instantiate on rdfa:copy (RdfaParser.ts:190-201)
            if attributes.get("property") == "rdfa:copy":
                copy_id = (attributes.get("resource")
                           or attributes.get("href")
                           or attributes.get("src"))
                if copy_id in self.rdfa_patterns:
                    self.emit_pattern_copy(
                        parent, self.rdfa_patterns[copy_id], copy_id)
                else:
                    self.pending_copies.setdefault(copy_id, []).append(parent)
                return

        # <base> overrides the document base; xml:base is subtree-scoped
        # (RdfaParser.ts:204-211)
        if features.base_tag and name == "base" and attributes.get("href"):
            util.base_iri = util.get_base_iri(attributes["href"])
        if features.xml_base and attributes.get("xml:base"):
            tag.local_base_iri = util.get_base_iri(attributes["xml:base"])

        # <time> sniffs datatypes (RdfaParser.ts:214-216)
        if features.time_tag and name == "time" and "datatype" not in attributes:
            tag.interpret_object_as_time = True

        # RDFa Core processing steps 1-13 (RdfaParser.ts:218-589)
        new_subject = None
        current_object_resource = None
        typed_resource = None

        # 2: vocab
        if "vocab" in attributes:
            if attributes["vocab"]:
                tag.vocab = attributes["vocab"]
                self.emit_triple(
                    util.get_base_iri_term(tag),
                    _RDFA_USES_VOCABULARY,
                    NamedNode(tag.vocab))
            else:
                tag.vocab = stack[0].vocab
        else:
            tag.vocab = parent.vocab

        # 3: prefixes
        tag.prefixes_custom = parse_prefixes(
            attributes, parent.prefixes_custom,
            bool(features.xmlns_prefix_mappings))
        tag.prefixes_all = ({**parent.prefixes_all, **tag.prefixes_custom}
                            if tag.prefixes_custom else parent.prefixes_all)

        # @role (RdfaParser.ts:253-268)
        if features.role_attribute and attributes.get("role"):
            if attributes.get("id"):
                role_subject = util.create_iri(
                    "#" + attributes["id"], tag, False, False, False)
            else:
                role_subject = util.create_blank_node()
            vocab_old = tag.vocab
            tag.vocab = XHTML_VOCAB
            for role in util.create_vocab_iris(
                    attributes["role"], tag, True, False):
                self.emit_triple(
                    role_subject, NamedNode(XHTML_VOCAB + "role"), role)
            tag.vocab = vocab_old

        # 4: language
        if "xml:lang" in attributes or (
                features.lang_attribute and "lang" in attributes):
            tag.language = (attributes.get("xml:lang")
                            or attributes.get("lang") or None)
        else:
            tag.language = parent.language

        is_root_tag = len(stack) == 2
        if "rel" not in attributes and "rev" not in attributes:
            # 5: new subject without rel/rev
            if ("property" in attributes and "content" not in attributes
                    and "datatype" not in attributes):
                # 5.1
                if "about" in attributes:
                    new_subject = util.create_iri(
                        attributes["about"], tag, False, True, True)
                    tag.explicit_new_subject = bool(new_subject)
                elif is_root_tag:
                    new_subject = True
                elif parent.object:
                    new_subject = parent.object

                if "typeof" in attributes:
                    if "about" in attributes:
                        typed_resource = util.create_iri(
                            attributes["about"], tag, False, True, True)
                    if not typed_resource and is_root_tag:
                        typed_resource = True
                    if not typed_resource and "resource" in attributes:
                        typed_resource = util.create_iri(
                            attributes["resource"], tag, False, True, True)
                    if not typed_resource and (
                            "href" in attributes or "src" in attributes):
                        typed_resource = util.create_iri(
                            attributes.get("href") or attributes.get("src"),
                            tag, False, False, True)
                    if (not typed_resource
                            and self._is_inherit_subject_in_head_body(name)):
                        typed_resource = new_subject
                    if not typed_resource:
                        typed_resource = util.create_blank_node()
                    current_object_resource = typed_resource
            else:
                # 5.2
                if "about" in attributes or "resource" in attributes:
                    new_subject = util.create_iri(
                        attributes.get("about") or attributes.get("resource"),
                        tag, False, True, True)
                    tag.explicit_new_subject = bool(new_subject)
                if not new_subject and (
                        "href" in attributes or "src" in attributes):
                    new_subject = util.create_iri(
                        attributes.get("href") or attributes.get("src"),
                        tag, False, False, True)
                    tag.explicit_new_subject = bool(new_subject)
                if not new_subject:
                    if is_root_tag:
                        new_subject = True
                    elif self._is_inherit_subject_in_head_body(name):
                        new_subject = parent.object
                    elif "typeof" in attributes:
                        new_subject = util.create_blank_node()
                        tag.explicit_new_subject = True
                    elif parent.object:
                        new_subject = parent.object
                        if "property" not in attributes:
                            tag.skip_element = True
                if "typeof" in attributes:
                    typed_resource = new_subject
        else:
            # 6: new subject with rel/rev
            if "about" in attributes:
                new_subject = util.create_iri(
                    attributes["about"], tag, False, True, True)
                tag.explicit_new_subject = bool(new_subject)
                if "typeof" in attributes:
                    typed_resource = new_subject
            elif is_root_tag:
                new_subject = True
            elif parent.object:
                new_subject = parent.object

            if "resource" in attributes:
                current_object_resource = util.create_iri(
                    attributes["resource"], tag, False, True, True)
            if not current_object_resource:
                if "href" in attributes or "src" in attributes:
                    current_object_resource = util.create_iri(
                        attributes.get("href") or attributes.get("src"),
                        tag, False, False, True)
                elif ("typeof" in attributes and "about" not in attributes
                      and not self._is_inherit_subject_in_head_body(name)):
                    current_object_resource = util.create_blank_node()

            if "typeof" in attributes and "about" not in attributes:
                if self._is_inherit_subject_in_head_body(name):
                    typed_resource = new_subject
                else:
                    typed_resource = current_object_resource

        # 7: emit rdf:type for the typed resource
        if typed_resource:
            for type_term in util.create_vocab_iris(
                    attributes.get("typeof"), tag, True, True):
                self.emit_triple(
                    util.get_resource_or_base_iri(typed_resource, tag),
                    _RDF_TYPE, type_term)

        # 8: reset list mapping on new subject
        if new_subject:
            tag.list_mapping = {}

        # 9: emit triples for the current object resource
        if current_object_resource:
            rel_inlist = "rel" in attributes and "inlist" in attributes
            if rel_inlist:
                for predicate in util.create_vocab_iris(
                        attributes["rel"], tag, allow_terms_in_rel, False):
                    self.add_list_mapping(
                        tag, new_subject, predicate, current_object_resource)
            else:
                if "rel" in attributes:
                    for predicate in util.create_vocab_iris(
                            attributes["rel"], tag, allow_terms_in_rel, False):
                        self.emit_triple(
                            util.get_resource_or_base_iri(new_subject, tag),
                            predicate,
                            util.get_resource_or_base_iri(
                                current_object_resource, tag))
                if "rev" in attributes:
                    for predicate in util.create_vocab_iris(
                            attributes["rev"], tag, allow_terms_in_rev, False):
                        self.emit_triple(
                            util.get_resource_or_base_iri(
                                current_object_resource, tag),
                            predicate,
                            util.get_resource_or_base_iri(new_subject, tag))

        # 10: store incomplete triples when no object yet
        if not current_object_resource:
            if "rel" in attributes:
                if "inlist" in attributes:
                    for predicate in util.create_vocab_iris(
                            attributes["rel"], tag, allow_terms_in_rel, False):
                        self.add_list_mapping(tag, new_subject, predicate, False)
                        tag.incomplete_triples.append((predicate, False, True))
                else:
                    for predicate in util.create_vocab_iris(
                            attributes["rel"], tag, allow_terms_in_rel, False):
                        tag.incomplete_triples.append((predicate, False, False))
            if "rev" in attributes:
                for predicate in util.create_vocab_iris(
                        attributes["rev"], tag, allow_terms_in_rev, False):
                    tag.incomplete_triples.append((predicate, True, False))
            if tag.incomplete_triples:
                current_object_resource = util.create_blank_node()

        # 11: property values
        if "property" in attributes:
            tag.predicates = util.create_vocab_iris(
                attributes["property"], tag, True, False)

            local_object_resource = None
            if "datatype" in attributes:
                tag.datatype = util.create_iri(
                    attributes["datatype"], tag, True, True, False)
                if tag.datatype and (
                        tag.datatype.value == RDF + "XMLLiteral"
                        or (features.html_datatype
                            and tag.datatype.value == RDF + "HTML")):
                    tag.collect_child_tags = True
                    tag.collect_child_tags_for_current_tag = True
            else:
                if ("rev" not in attributes and "rel" not in attributes
                        and "content" not in attributes):
                    if "resource" in attributes:
                        local_object_resource = util.create_iri(
                            attributes["resource"], tag, False, True, True)
                    if not local_object_resource and "href" in attributes:
                        local_object_resource = util.create_iri(
                            attributes["href"], tag, False, False, True)
                    if not local_object_resource and "src" in attributes:
                        local_object_resource = util.create_iri(
                            attributes["src"], tag, False, False, True)
                if "typeof" in attributes and "about" not in attributes:
                    local_object_resource = typed_resource

            # A non-XMLLiteral tag inside a collecting parent stops
            # collection for the current tag (RdfaParser.ts:499-504)
            if "datatype" not in attributes or attributes["datatype"] == "":
                tag.collect_child_tags_for_current_tag = False

            if "content" in attributes:
                # content= wins over text (RdfaParser.ts:506-521)
                obj = util.create_literal(attributes["content"], tag)
                if "inlist" in attributes:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, new_subject, predicate, obj)
                else:
                    subject = util.get_resource_or_base_iri(new_subject, tag)
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                tag.predicates = None
            elif features.datetime_attribute and "datetime" in attributes:
                tag.interpret_object_as_time = True
                obj = util.create_literal(attributes["datetime"], tag)
                if "inlist" in attributes:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, new_subject, predicate, obj)
                else:
                    subject = util.get_resource_or_base_iri(new_subject, tag)
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                tag.predicates = None
            elif local_object_resource:
                obj = util.get_resource_or_base_iri(local_object_resource, tag)
                if "inlist" in attributes:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, new_subject, predicate, obj)
                else:
                    subject = util.get_resource_or_base_iri(new_subject, tag)
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                tag.predicates = None

        # 12: complete incomplete triples from the parent
        incomplete_completed = False
        if (not tag.skip_element and new_subject
                and parent.incomplete_triples):
            incomplete_completed = True
            subject = util.get_resource_or_base_iri(parent.subject, tag)
            obj = util.get_resource_or_base_iri(new_subject, tag)
            for predicate, reverse, is_list in parent.incomplete_triples:
                if reverse:
                    self.emit_triple(obj, predicate, subject)
                elif is_list:
                    # The nearest ancestor with @inlist owns the list
                    first_in_list_tag = None
                    for i in range(len(stack) - 1, -1, -1):
                        if stack[i].inlist:
                            first_in_list_tag = stack[i]
                            break
                    self.add_list_mapping(
                        first_in_list_tag, new_subject, predicate, obj)
                else:
                    self.emit_triple(subject, predicate, obj)
        if not incomplete_completed and parent.incomplete_triples:
            tag.incomplete_triples = (tag.incomplete_triples
                                      + parent.incomplete_triples)

        # 13: save evaluation context
        tag.subject = new_subject or parent.subject
        tag.object = current_object_resource or new_subject

    # ------------------------------------------------------------------
    def on_text(self, data: str) -> None:
        tag = self.stack[-1]
        if self._copy_rdfa_patterns and tag.collected_pattern_tag is not None:
            tag.collected_pattern_tag.text.append(data)
            return
        if tag.text_with_tags is None:
            tag.text_with_tags = []
        if tag.text_without_tags is None:
            tag.text_without_tags = []
        tag.text_with_tags.append(data)
        tag.text_without_tags.append(data)

    # ------------------------------------------------------------------
    def on_tag_close(self) -> None:
        util = self.util
        tag = self.stack[-1]
        parent = self.stack[-2] if len(self.stack) >= 2 else None

        if not (tag.collect_child_tags and parent is not None
                and parent.collect_child_tags
                and self.features.skip_handling_xml_literal_children):
            # Finalize rdfa:Pattern (RdfaParser.ts:619-642)
            if (self._copy_rdfa_patterns
                    and tag.collected_pattern_tag is not None
                    and tag.collected_pattern_tag.root_pattern):
                pattern_id = tag.collected_pattern_tag.attributes.get("resource")
                tag.collected_pattern_tag.attributes.pop("resource", None)
                tag.collected_pattern_tag.attributes.pop("typeof", None)
                self.rdfa_patterns[pattern_id] = tag.collected_pattern_tag
                if pattern_id in self.pending_copies:
                    for pending_tag in self.pending_copies[pattern_id]:
                        self.emit_pattern_copy(
                            pending_tag, tag.collected_pattern_tag, pattern_id)
                    del self.pending_copies[pattern_id]
                self.stack.pop()
                return

            # Emit pending property literals from accumulated text
            # (RdfaParser.ts:645-673)
            if tag.predicates is not None:
                subject = util.get_resource_or_base_iri(tag.subject, tag)
                if tag.collect_child_tags_for_current_tag:
                    segments = tag.text_with_tags or []
                    if (tag.collect_child_tags and parent is not None
                            and parent.collect_child_tags):
                        # Inside an XMLLiteral child with RDFa content:
                        # drop the collected open-tag token
                        segments = segments[1:]
                else:
                    segments = tag.text_without_tags or []
                obj = util.create_literal("".join(segments), tag)
                if tag.inlist:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, subject, predicate, obj)
                else:
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                if parent is None or parent.predicates is None:
                    tag.text_without_tags = None
                    tag.text_with_tags = None

            # 14: local list mappings → rdf:first/rest/nil chains
            # (RdfaParser.ts:676-698)
            if tag.object and tag.list_mapping:
                subject = util.get_resource_or_base_iri(tag.object, tag)
                for predicate_value, values in tag.list_mapping.items():
                    predicate = NamedNode(predicate_value)
                    if values:
                        bnodes = [util.create_blank_node() for _ in values]
                        last = len(values) - 1
                        for i, value in enumerate(values):
                            obj = util.get_resource_or_base_iri(value, tag)
                            self.emit_triple(
                                bnodes[i], _RDF_FIRST, obj)
                            self.emit_triple(
                                bnodes[i], _RDF_REST,
                                bnodes[i + 1] if i < last
                                else _RDF_NIL)
                        self.emit_triple(subject, predicate, bnodes[0])
                    else:
                        self.emit_triple(
                            subject, predicate, _RDF_NIL)

        self.stack.pop()

        # Serialize close tag for XMLLiteral collection
        if tag.collect_child_tags and tag.text_with_tags is not None:
            tag.text_with_tags.append(f"</{tag.name}>")

        # Propagate text to the parent (RdfaParser.ts:705-723)
        if tag.text_with_tags is not None and parent is not None:
            if parent.text_with_tags is not None:
                parent.text_with_tags = (parent.text_with_tags
                                         + tag.text_with_tags)
            else:
                parent.text_with_tags = tag.text_with_tags
        if tag.text_without_tags is not None and parent is not None:
            if parent.text_without_tags is not None:
                parent.text_without_tags = (parent.text_without_tags
                                            + tag.text_without_tags)
            else:
                parent.text_without_tags = tag.text_without_tags

    # ------------------------------------------------------------------
    def on_end(self) -> None:
        """Flush unreferenced patterns and dangling rdfa:copy links
        (RdfaParser.ts:726-755)."""
        if self._copy_rdfa_patterns:
            self._copy_rdfa_patterns = False

            for pattern_id in list(self.rdfa_patterns):
                pattern = self.rdfa_patterns[pattern_id]
                if not pattern.referenced:
                    pattern.attributes["typeof"] = "rdfa:Pattern"
                    pattern.attributes["resource"] = pattern_id
                    self.emit_pattern_copy(
                        pattern.parent_tag, pattern, pattern_id)
                    pattern.referenced = False
                    pattern.attributes.pop("typeof", None)
                    pattern.attributes.pop("resource", None)

            for pattern_id, tags in list(self.pending_copies.items()):
                for parent_tag in tags:
                    self.stack.append(parent_tag)
                    self.on_tag_open(
                        "link", {"property": "rdfa:copy", "href": pattern_id})
                    self.on_tag_close()
                    self.stack.pop()

            self._copy_rdfa_patterns = True

    # ------------------------------------------------------------------
    def add_list_mapping(self, active_tag: ActiveTag, subject, predicate,
                         current_object_resource) -> None:
        """RdfaParser.ts:775-795 — explicit new subjects emit singleton
        lists immediately; otherwise buffer per (predicate) in the local
        list mapping (ordered, per-document)."""
        if active_tag.explicit_new_subject:
            bnode = self.util.create_blank_node()
            self.emit_triple(
                self.util.get_resource_or_base_iri(subject, active_tag),
                predicate, bnode)
            self.emit_triple(
                bnode, _RDF_FIRST,
                self.util.get_resource_or_base_iri(
                    current_object_resource, active_tag))
            self.emit_triple(
                bnode, _RDF_REST, _RDF_NIL)
        else:
            values = active_tag.list_mapping_local.setdefault(
                predicate.value, [])
            if current_object_resource:
                values.append(current_object_resource)

    # ------------------------------------------------------------------
    def emit_triple(self, subject, predicate, obj) -> None:
        """Validate and emit (RdfaParser.ts:803-811): NamedNodes must
        contain ':'; triples with a missing term are dropped (the
        reference would raise a stream error for nulls — unreachable on
        well-formed input).  Booleans are dropped too: the reference's
        internal use-base-IRI sentinel can leak a raw ``false`` into a
        quad on degenerate markup (about + rel + inlist with no object
        and no children — getResourceOrBaseIri, lib/Util.ts:161-163,
        only maps ``true``), producing an unrepresentable term; we emit
        the representable subset of its output instead (fuzz-found)."""
        if (subject is None or predicate is None or obj is None
                or isinstance(subject, bool) or isinstance(obj, bool)):
            return
        if ((isinstance(subject, NamedNode) and ":" not in subject.value)
                or (isinstance(predicate, NamedNode)
                    and ":" not in predicate.value)
                or (isinstance(obj, NamedNode) and ":" not in obj.value)):
            return
        self.triples.append((subject, predicate, obj))

    # ------------------------------------------------------------------
    def emit_pattern_copy(self, parent_tag: ActiveTag, pattern: RdfaPattern,
                          root_pattern_id: str) -> None:
        """Instantiate a pattern under parent_tag; blank nodes are minted
        once and shared across all copies (RdfaParser.ts:819-842)."""
        self.stack.append(parent_tag)
        pattern.referenced = True

        if pattern.constructed_blank_nodes is not None:
            nodes = pattern.constructed_blank_nodes
            state = {"i": 0}

            def replay_factory() -> BlankNode:
                node = nodes[state["i"]]
                state["i"] += 1
                return node

            self.util.blank_node_factory = replay_factory
        else:
            pattern.constructed_blank_nodes = []
            constructed = pattern.constructed_blank_nodes

            def recording_factory() -> BlankNode:
                node = self._fresh_blank_node()
                constructed.append(node)
                return node

            self.util.blank_node_factory = recording_factory

        self.emit_pattern_copy_absolute(pattern, True, root_pattern_id)

        self.util.blank_node_factory = None
        self.stack.pop()

    def emit_pattern_copy_absolute(self, pattern: RdfaPattern, root: bool,
                                   root_pattern_id: str) -> None:
        """Replay the stored pattern subtree; cyclic copies are cut
        (RdfaParser.ts:854-868)."""
        if (not root and pattern.attributes.get("property") == "rdfa:copy"
                and pattern.attributes.get("href") == root_pattern_id):
            return
        self.on_tag_open(pattern.name, pattern.attributes)
        for text in pattern.text:
            self.on_text(text)
        for child in pattern.children:
            self.emit_pattern_copy_absolute(child, False, root_pattern_id)
        self.on_tag_close()

    # ------------------------------------------------------------------
    def extracted_text(self) -> str:
        """The document's accumulated text (the byte-identical-text
        invariant): the root frame's textWithoutTags segments joined,
        matching RdfaParser.ts:592-610 + :717-723 propagation."""
        root = self.stack[0]
        return "".join(root.text_without_tags or [])
