from .postings import InvertedIndex, assign_doc_ids, build_index, read_index, write_index
from .bm25 import bm25_topk, score_queries

__all__ = [
    "InvertedIndex",
    "assign_doc_ids",
    "build_index",
    "write_index",
    "read_index",
    "bm25_topk",
    "score_queries",
]
