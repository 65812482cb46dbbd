"""In-corpus n-gram language-model scoring (CCNet-style perplexity
filtering, without an external model).

CCNet ranks web documents by the perplexity of a language model and
keeps the head; the standard production shape trains KenLM offline.
This operator is the self-contained analog a 100 TB pipeline can run
with no model artifact: a bigram LM with add-α smoothing estimated
from the corpus ITSELF, scoring each document by its mean bigram
log-probability. Low (very negative) scores flag gibberish /
boilerplate whose token transitions are unlike the corpus; the score
is a pure function of corpus counts, so any engine reproduces it —
the DuckDB oracle gate recomputes it bit-for-bit (6-dp rounding).

Plan shape (all built-in Catalyst, zero Python):

1. bigrams per doc, ROW-LOCALLY (``arrays_zip`` of two slices — the
   token array never leaves the row);
2. one uniform-key shuffle for global bigram counts (map-side
   combine; distinct-bigram cardinality, not corpus size);
3. first-token totals derive from the bigram counts (a second, tiny
   aggregation) — so P(w2|w1) = (c(w1,w2)+α) / (c1(w1)+α·V) is
   consistent by construction;
4. the per-doc score join is (w1,w2)-keyed; AQE's skew-join handles
   the hot-bigram tail ("of the"), and at small vocabularies the
   count table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_ws


def ngram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Score every document with ≥ 2 tokens:
    (id, n_bigrams, avg_logp) where avg_logp is the mean of
    ln((c(w1,w2)+α) / (c1(w1)+α·V)) over the doc's bigrams, rounded
    to 6 dp. V = corpus distinct-unigram count; c1(w1) = Σ_w2 c(w1,w2)
    (w1's occurrences as a bigram head). Docs with < 2 tokens emit no
    row — they have no transitions to judge."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = df.select(F.col(id_col), tokenize_ws(text_col).alias("t"))
    n = F.size("t")
    bigrams = (
        toks.filter(n >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, n - 1).alias("w1"),
                    F.slice("t", 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    head_counts = bg_counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    logp = F.log(
        (F.col("c") + F.lit(float(alpha)))
        / (F.col("c1") + F.lit(float(alpha)) * F.col("v"))
    )
    # count joins are (w1,w2)/(w1)-keyed — AQE broadcasts them at small
    # vocabularies and skew-splits the hot-bigram tail at web scale;
    # the vocab size V is one row, a trivial broadcast
    return (
        bigrams.join(bg_counts, ["w1", "w2"])
        .join(head_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
        )
    )
