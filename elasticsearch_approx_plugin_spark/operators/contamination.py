"""Benchmark decontamination for training corpora.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM §6.1
style): flag every training document that shares at least one word
n-gram with an evaluation corpus, so eval-contaminated documents can
be dropped or quarantined before training.

The reference has no such operator; this module follows the same
Spark-first pattern as the rest of the pipeline suite — JVM-side
tokenization and hashing, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_ws
from .text_analysis import word_ngrams


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(id, n_contaminated_ngrams, contaminated) per training document:
    the count of DISTINCT word ``n``-grams the document shares with
    ``eval_df``, and whether that count is nonzero.

    100 TB design: the eval side is benchmarks — thousands of
    documents, not billions — so its distinct n-gram set is collected
    into a broadcast hash join (``broadcast_eval=True``, the default):
    the training side streams through map-side probes with NO shuffle
    of the exploded training n-grams. ``array_distinct`` runs
    per-document BEFORE the explode, so a gram repeated inside one
    document costs one probe, and the per-doc count needs no post-join
    DISTINCT. With ``broadcast_eval=False`` the same plan degrades to a
    shuffle join for an eval side too large to broadcast.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ev = (
        eval_df.select(
            F.explode(word_ngrams(tokenize_ws(text_col), n)).alias("gram")
        ).distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(tokenize_ws(text_col), n))).alias("gram"),
    )
    hits = tr.join(ev, "gram").groupBy(id_col).agg(
        F.count("*").alias("n_contaminated_ngrams")
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("long")
            .alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
