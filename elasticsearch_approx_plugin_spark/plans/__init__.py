from .facet_query import DateFacetQuery, TermListQuery, TopKQuery
from .search import search_topk

__all__ = ["DateFacetQuery", "TermListQuery", "TopKQuery", "search_topk"]
