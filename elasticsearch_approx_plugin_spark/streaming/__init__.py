from .facets import streaming_date_facet

__all__ = ["streaming_date_facet"]
