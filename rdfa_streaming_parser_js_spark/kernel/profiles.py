"""RDFa profiles → feature flags and content-type mapping.

Semantic port of /root/reference/lib/RdfaProfile.ts:15-161. Profiles:
'' (all features), 'core', 'html', 'xhtml', 'xml'.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass
class RdfaFeatures:
    base_tag: bool = False
    xml_base: bool = False
    lang_attribute: bool = False
    only_allow_uri_rel_rev_if_property: bool = False
    inherit_subject_in_head_body: bool = False
    datetime_attribute: bool = False
    time_tag: bool = False
    html_datatype: bool = False
    copy_rdfa_patterns: bool = False
    xmlns_prefix_mappings: bool = False
    skip_handling_xml_literal_children: bool = False
    xhtml_initial_context: bool = False
    role_attribute: bool = False

    def copy(self) -> "RdfaFeatures":
        return replace(self)


RDFA_FEATURES: dict[str, RdfaFeatures] = {
    "": RdfaFeatures(
        base_tag=True, xml_base=True, lang_attribute=True,
        only_allow_uri_rel_rev_if_property=True,
        inherit_subject_in_head_body=True, datetime_attribute=True,
        time_tag=True, html_datatype=True, copy_rdfa_patterns=True,
        xmlns_prefix_mappings=True, xhtml_initial_context=True,
        role_attribute=True,
    ),
    "core": RdfaFeatures(
        lang_attribute=True, only_allow_uri_rel_rev_if_property=True,
        copy_rdfa_patterns=True, xmlns_prefix_mappings=True,
    ),
    "html": RdfaFeatures(
        base_tag=True, lang_attribute=True,
        only_allow_uri_rel_rev_if_property=True,
        inherit_subject_in_head_body=True, datetime_attribute=True,
        time_tag=True, html_datatype=True, copy_rdfa_patterns=True,
        xmlns_prefix_mappings=True, role_attribute=True,
    ),
    "xhtml": RdfaFeatures(
        base_tag=True, lang_attribute=True,
        only_allow_uri_rel_rev_if_property=True,
        inherit_subject_in_head_body=True, datetime_attribute=True,
        time_tag=True, html_datatype=True, copy_rdfa_patterns=True,
        xmlns_prefix_mappings=True, xhtml_initial_context=True,
        role_attribute=True,
    ),
    "xml": RdfaFeatures(
        xml_base=True, lang_attribute=True, datetime_attribute=True,
        time_tag=True, xmlns_prefix_mappings=True, role_attribute=True,
    ),
}

RDFA_CONTENTTYPES: dict[str, str] = {
    "text/html": "html",
    "application/xhtml+xml": "xhtml",
    "application/xml": "xml",
    "text/xml": "xml",
    "image/svg+xml": "xml",
}
