"""Structured Streaming index ingestion — continuous ES-style indexing.

Elasticsearch's core loop is continuous ingestion: documents arrive,
the index absorbs them, queries see them after a refresh. The batch
half of that loop already exists here (``postings.append_to_index`` —
delta build + per-(term,range) varint merge, touched buckets only);
this module is the streaming driver: a ``foreachBatch`` sink that
bootstraps the persisted index from the first non-empty micro-batch
and appends every later one.

Why ``foreachBatch`` and not a continuous stateful operator: an
inverted index is a *merge-structured* store (Lucene segments, LSM
levels) — ingestion is batched merges against persistent storage, not
per-row state. ``foreachBatch`` hands each micro-batch to the same
deterministic batch machinery, which keeps three properties the
north rule cares about:

- **exactly-once net effect**: Spark may replay a micro-batch after a
  failure; ``append_to_index`` is idempotent (delta-fingerprint
  short-circuit + already-present docID drop), so a replayed batch is
  a no-op — the checkpoint plus idempotent sink is the standard
  Structured Streaming exactly-once recipe;
- **bit-identical scoring**: a stream-built index returns the same
  BM25 results as one batch-built over the concatenated corpus
  (postings carry raw tf/dl; the scorer recomputes with refreshed
  df/avgdl) — asserted by the driver gate;
- **scale**: per-batch cost is delta-sized (touched buckets only), so
  sustained ingest cost tracks ingest rate, not index size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.postings import (
    DEFAULT_RANGE_BITS,
    append_to_index,
    build_index,
    write_index,
)


def streaming_index(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    range_bits: int = DEFAULT_RANGE_BITS,
    n_buckets: int = 16,
    query_name: str = "streaming_index",
    available_now: bool = True,
) -> StreamingQuery:
    """Start a stream that maintains a persisted inverted index at
    ``path``. Input stream: ``(id_col, tokens_col)`` rows.

    The first non-empty micro-batch bootstraps (build + write); later
    batches append incrementally. Returns the started query — callers
    own ``awaitTermination``. ``available_now=False`` runs the
    24/7-ingest trigger instead of draining what's available.
    """
    import os

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, tokens_col)
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not os.path.exists(os.path.join(path, "manifest.json")):
            write_index(
                build_index(batch, tokens_col, id_col, range_bits=range_bits),
                path,
                n_buckets=n_buckets,
            )
            return
        append_to_index(spark, path, batch, tokens_col, id_col)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
