"""Inspection APIs — ``_termvectors`` and index ``_stats``.

ES exposes per-document term vectors (``_termvectors``: each term's
in-document frequency, optionally the corpus-level term statistics)
and per-index stats (``_stats``/``_segments``: doc counts, term
counts, posting volumes).  Both are one-liners over this engine's
relational index layout — which is the point: the index IS tables.

- :func:`term_vectors`: the requested doc ids (a bounded list — the
  API is per-document, batched here) push into the corpus scan as an
  IN filter (the highlight/rescore discipline); tf is a groupBy over
  the exploded tokens of ONLY those docs; ``term_statistics=True``
  joins the dictionary (broadcast — the per-doc distinct-term set is
  tiny) for df/cf, exactly ES's ``doc_freq``/``ttf``.
- :func:`index_stats`: one partial-aggregating pass over the
  dictionary (terms, Σdf postings, Σcf tokens) cross-joined with the
  driver-known doc count / avgdl and the tombstone count — a 1-row
  answer at any index size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.small_df import small_df

from .postings import InvertedIndex


def term_vectors(
    index: InvertedIndex,
    corpus: DataFrame,
    doc_ids: list[int],
    term_statistics: bool = False,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc term vectors → (doc_id, term, term_freq[, doc_freq,
    ttf]). ``doc_ids`` is the bounded request list (ES batches via
    ``_mtermvectors``); unknown ids yield no rows."""
    if not doc_ids:
        raise ValueError("term_vectors needs at least one doc id")
    ids = sorted({int(d) for d in doc_ids})
    tf = (
        corpus.filter(F.col(id_col).isin(ids))
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("term_freq"))
    )
    if not term_statistics:
        return tf
    dic = index.dictionary.select(
        "term", F.col("df").cast("long").alias("doc_freq"),
        F.col("cf").cast("long").alias("ttf"),
    )
    return tf.join(F.broadcast(dic.join(tf.select("term").distinct(), "term")), "term").select(
        "doc_id", "term", "term_freq", "doc_freq", "ttf"
    )


def index_stats(index: InvertedIndex) -> DataFrame:
    """One row: (n_docs, n_deleted, n_terms, n_postings, n_tokens,
    avgdl) — the ES ``_stats`` docs/terms counters over the relational
    index layout."""
    agg = index.dictionary.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("n_postings"),
        F.coalesce(F.sum("cf"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    n_del = (
        index.tombstones.count() if index.tombstones is not None else 0
    )
    return agg.select(
        F.lit(int(index.n_docs)).cast("long").alias("n_docs"),
        F.lit(int(n_del)).cast("long").alias("n_deleted"),
        "n_terms",
        "n_postings",
        "n_tokens",
        F.round(F.lit(float(index.avgdl)), 6).alias("avgdl"),
    )


def analyze_text(
    spark,
    texts: list[tuple[int, str]],
    analyzer: str = "whitespace",
) -> DataFrame:
    """The ES ``_analyze`` API: preview how text tokenizes →
    ``(text_id, position, token)``, positions 0-based like ES.

    ``analyzer``: ``whitespace`` (the documents analyzer) or ``code``
    (the source-code analyzer — identifier/number tokens, lowercased).
    Runs the EXACT Catalyst tokenizer expressions the index build uses
    (``functions.tokenize``), so what this previews is what the index
    stores — the point of ``_analyze``.
    """
    from ..functions.tokenize import tokenize_code, tokenize_ws

    if not texts:
        raise ValueError("_analyze needs at least one text")
    tok = {"whitespace": tokenize_ws, "code": tokenize_code}.get(analyzer)
    if tok is None:
        raise ValueError(f"unknown analyzer {analyzer!r} (whitespace, code)")
    df = small_df(spark, 
        [(int(i), str(t)) for i, t in texts], "text_id long, text string"
    )
    return df.select(
        "text_id",
        F.posexplode(tok("text")).alias("position", "token"),
    ).select("text_id", F.col("position").cast("long"), "token")
