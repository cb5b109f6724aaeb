"""Column-level functions: text analysis + multimodal plumbing."""

from .text import (bpe_ish_token_count, doc_fingerprint, lang_id,
                   quality_score_cols, stopword_ratio, whitespace_tokens)

__all__ = ["whitespace_tokens", "bpe_ish_token_count", "stopword_ratio",
           "quality_score_cols", "lang_id", "doc_fingerprint"]
