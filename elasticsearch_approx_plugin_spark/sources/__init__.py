from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .corpus import generate_corpus, read_corpus_verified

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "generate_corpus",
    "read_corpus_verified",
]
