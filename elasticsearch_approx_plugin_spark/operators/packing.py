"""Cross-document sequence packing (concat-and-chunk pretraining prep).

``token_chunk`` (text_analysis) windows ONE document; a pretraining
pipeline also needs the opposite: concatenate MANY documents into a
token stream and cut fixed-length training sequences so short
documents don't waste pad tokens. At 100 TB a single global
concatenation order is a one-partition window — a non-starter — so
the production shape is *bucketed* packing:

- every document hashes to one of ``n_buckets`` streams with the same
  engine-invariant md5 arithmetic the hash splitter uses (pure
  function of (id, seed): reproducible at any parallelism, in any
  engine — the DuckDB oracle gate recomputes it bit-for-bit);
- within a bucket, documents concatenate in ``id`` order and the
  stream is cut every ``seq_len`` tokens; a document overlapping a cut
  contributes a span to BOTH sequences (no token dropped, no pad
  inserted except the final partial sequence of each bucket);
- the assignment ``(bucket, seq_id, doc_id, start_in_doc, n_toks)`` is
  the output — the materialization join (gather the actual token
  slices) is a trivial follow-up projection, and keeping the
  assignment relational lets the same plan drive shard manifests,
  curriculum reorderings, or pack-efficiency audits.

One shuffle (the window's partitionBy bucket), uniform keys by
construction, ~corpus/n_buckets rows per task — the operator's only
scale knob. Everything is built-in Catalyst: window sum + a
``sequence``/``explode`` Generate; zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Assign each document's tokens to fixed-length packed sequences.

    Input: one row per document with a token count (compute it with
    ``F.size(tokenize_ws(...))`` or any tokenizer). Ids must be unique
    — they define the concatenation order within a bucket.

    Output: one row per (document, sequence) span —
    ``(bucket, seq_id, id, start_in_doc, n_toks)`` where ``seq_id`` is
    the sequence's ordinal within its bucket, ``start_in_doc`` is the
    0-based token offset of the span inside the document, and spans of
    one sequence concatenate (in id order) to exactly ``seq_len``
    tokens — except each bucket's final sequence, which may be short
    (the only padding the layout ever needs). Zero-token documents
    produce no rows.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    bucket = (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % n_buckets).alias(
        "bucket"
    )
    n = F.col(n_tokens_col).cast("long")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(F.col("__n")).over(w), F.lit(0)).alias("offset")
    L = F.lit(int(seq_len)).cast("long")
    first_seq = F.floor(F.col("offset") / L).cast("long")
    last_seq = F.floor((F.col("offset") + F.col("__n") - 1) / L).cast("long")
    return (
        df.select(F.col(id_col), n.alias("__n"), bucket)
        .filter(F.col("__n") > 0)
        .select("*", offset)
        .select(
            "bucket",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
            F.col(id_col),
            F.col("offset"),
            F.col("__n"),
        )
        .select(
            "bucket",
            "seq_id",
            id_col,
            F.greatest(
                F.lit(0).cast("long"), F.col("seq_id") * L - F.col("offset")
            ).alias("start_in_doc"),
            (
                F.least(F.col("__n"), (F.col("seq_id") + 1) * L - F.col("offset"))
                - F.greatest(F.lit(0).cast("long"), F.col("seq_id") * L - F.col("offset"))
            ).alias("n_toks"),
        )
    )


def length_bucket_batches(
    df: DataFrame,
    batch_rows: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Padding-efficient batching — the PADDED-training twin of
    :func:`pack_sequences` (which is the concat regime).

    A trainer that pads each batch to its longest sequence wastes
    ``Σ(max_len − len)`` tokens per batch; random batching makes that
    waste ~the corpus length spread. Sorting by length first makes
    neighbours in a batch nearly equal — the standard "length
    bucketing" every padded pipeline uses — and doing it
    DETERMINISTICALLY (md5-bucket for parallelism, then
    ``(n_tokens, id)`` order within the bucket) keeps the batch
    assignment a pure function of (id, n_tokens, seed, batch_rows):
    partitioning/cluster/engine-invariant, so the oracle recomputes
    it row for row.

    Output: one row per document —
    ``(bucket, batch_id, id, n_tokens, pad_to)`` where ``batch_id``
    numbers ``batch_rows``-sized groups within the bucket (the last
    per bucket may be short) and ``pad_to`` is the batch's longest
    sequence (what the trainer pads to). Zero-token docs drop.

    One shuffle (the per-bucket sort window); bucket sizes are
    corpus/n_buckets — the pack_sequences memory story.
    """
    if batch_rows < 1:
        raise ValueError(f"batch_rows must be >= 1, got {batch_rows}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    bucket = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % n_buckets
    ).alias("bucket")
    n = F.col(n_tokens_col).cast("long")
    w = Window.partitionBy("bucket").orderBy(F.col("__n"), F.col(id_col))
    base = (
        df.select(F.col(id_col), n.alias("__n"), bucket)
        .filter(F.col("__n") > 0)
        .withColumn(
            "batch_id",
            F.floor((F.row_number().over(w) - 1) / F.lit(int(batch_rows))).cast(
                "long"
            ),
        )
    )
    wb = Window.partitionBy("bucket", "batch_id")
    return base.select(
        "bucket",
        "batch_id",
        F.col(id_col),
        F.col("__n").alias(n_tokens_col),
        F.max("__n").over(wb).alias("pad_to"),
    )
