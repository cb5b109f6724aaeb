"""Distributed DataFrame operators."""

from .extract import TRIPLES_SCHEMA, extract_page_text, extract_triples

__all__ = ["TRIPLES_SCHEMA", "extract_triples", "extract_page_text"]
