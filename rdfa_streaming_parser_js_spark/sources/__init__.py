"""Sources: synthetic Common-Crawl-style pages + parquet table loaders."""

from .pages import pages_from_documents
from .tables import load_table

__all__ = ["pages_from_documents", "load_table"]
