from .dedup import streaming_dedup_exact
from .facets import streaming_date_facet

__all__ = ["streaming_date_facet", "streaming_dedup_exact"]
