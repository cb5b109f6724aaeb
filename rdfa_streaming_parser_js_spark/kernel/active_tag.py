"""Per-element evaluation-context frame.

Semantic port of /root/reference/lib/IActiveTag.ts:7-30 and
/root/reference/lib/IRdfaPattern.ts:7-16. One frame per open element; the
stack of these frames is the complete RDFa state for a document.
"""

from __future__ import annotations


class ActiveTag:
    __slots__ = (
        "name", "prefixes_all", "prefixes_custom", "subject",
        "explicit_new_subject", "predicates", "object", "text_with_tags",
        "text_without_tags", "vocab", "language", "datatype",
        "collect_child_tags", "collect_child_tags_for_current_tag",
        "collected_pattern_tag", "interpret_object_as_time",
        "incomplete_triples", "inlist", "list_mapping",
        "list_mapping_local", "skip_element", "local_base_iri",
    )

    def __init__(self) -> None:
        self.name = ""
        self.prefixes_all: dict[str, str] = {}
        self.prefixes_custom: dict[str, str] = {}
        self.subject = None              # NamedNode | BlankNode | True | None
        self.explicit_new_subject = False
        self.predicates = None           # list[NamedNode] | None
        self.object = None               # NamedNode | BlankNode | True | None
        self.text_with_tags = None       # list[str] | None
        self.text_without_tags = None    # list[str] | None
        self.vocab = None                # str | None
        self.language = None             # str | None
        self.datatype = None             # NamedNode | None
        self.collect_child_tags = False
        self.collect_child_tags_for_current_tag = False
        self.collected_pattern_tag = None  # RdfaPattern | None
        self.interpret_object_as_time = False
        self.incomplete_triples: list[tuple] = []  # (predicate, reverse, list)
        self.inlist = False
        self.list_mapping: dict[str, list] = {}
        self.list_mapping_local: dict[str, list] = {}
        self.skip_element = False
        self.local_base_iri = None       # NamedNode | None


class RdfaPattern:
    """Stored rdfa:Pattern subtree for rdfa:copy instantiation."""

    __slots__ = ("root_pattern", "name", "attributes", "text", "children",
                 "referenced", "parent_tag", "constructed_blank_nodes")

    def __init__(self, name: str, attributes: dict[str, str],
                 root_pattern: bool, parent_tag: ActiveTag | None = None) -> None:
        self.root_pattern = root_pattern
        self.name = name
        self.attributes = attributes
        self.text: list[str] = []
        self.children: list[RdfaPattern] = []
        self.referenced = False
        self.parent_tag = parent_tag
        self.constructed_blank_nodes = None  # list[BlankNode] | None
