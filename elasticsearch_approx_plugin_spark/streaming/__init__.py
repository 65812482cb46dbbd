from .dedup import streaming_dedup_exact
from .facets import streaming_date_facet
from .indexing import streaming_index

__all__ = ["streaming_date_facet", "streaming_dedup_exact", "streaming_index"]
