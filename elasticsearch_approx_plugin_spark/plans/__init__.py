from .facet_query import DateFacetQuery, TermListQuery, TopKQuery

__all__ = ["DateFacetQuery", "TermListQuery", "TopKQuery"]
