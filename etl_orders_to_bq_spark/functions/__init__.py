from .repair import cast_columns, repair_decimal_comma, strip_non_digits
from .names import clean_name, html_unescape
from .text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokenize,
    word_ngrams,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "repair_decimal_comma",
    "strip_non_digits",
    "cast_columns",
    "clean_name",
    "html_unescape",
    "tokenize",
    "token_count",
    "word_ngrams",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
