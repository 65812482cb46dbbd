"""Tokenizers — all JVM-side Catalyst expressions, zero Python UDFs.

The reference consumes pre-analyzed Lucene multi-valued fields
(README.md:113-116 in /root/reference); here tokenization is part of
the engine. Both tokenizers compile to ``regexp_extract_all`` /
``split`` inside whole-stage codegen, so the hot path of the index
build never crosses the Python boundary.

``CODE_TOKEN_RE`` is shared verbatim with the DuckDB oracle SQL
(both engines support the same RE2-compatible pattern), which is what
makes BM25 results byte-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# identifiers (incl. snake_case) or integer literals, lowercased
CODE_TOKEN_RE = "[a-zA-Z_][a-zA-Z0-9_]*|[0-9]+"


def tokenize_code(col: Column | str) -> Column:
    """Code-aware tokenizer: identifier/number tokens, lowercased."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(CODE_TOKEN_RE), 0)


def tokenize_ws(col: Column | str) -> Column:
    """Whitespace tokenizer for pre-normalized text (documents.text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
