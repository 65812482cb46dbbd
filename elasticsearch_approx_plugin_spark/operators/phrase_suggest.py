"""Phrase suggester — ES 0.90's second suggester (whole-phrase
did-you-mean).

The ES phrase suggester improves on per-token corrections by ranking
CANDIDATE PHRASES with an n-gram language model over the index, so
"tabel scna" corrects to the phrase whose token transitions the corpus
actually exhibits. This module composes two already-gated mechanisms:

- per-token candidates come from the TERM suggester's machinery
  (:func:`suggest.term_suggest`, mode ``always`` so in-vocabulary
  tokens can still be corrected — ES ``real-word errors``), each token
  keeping itself plus its top ``candidates_per_token − 1`` similarity-
  ranked corrections;
- candidate CHAINS (the cartesian product across positions, bounded:
  ``candidates_per_token ** n_tokens`` ≤ ``MAX_CHAINS``, enumerated
  driver-side like ES's shard-local generator) are scored by the SAME
  add-α-smoothed in-corpus bigram LM as :func:`lm.ngram_lm_score` —
  ``Σ ln((c(w1,w2)+α) / (c1(w1)+α·V))`` over the chain's transitions —
  a pure function of corpus counts any engine reproduces;
- the identity chain (the input itself) is EXCLUDED: the output is
  corrections, ranked (score desc, suggestion asc), top ``size``.

Spark shape: the corpus bigram/head/vocab counts are the lm.py
aggregations (one uniform-key shuffle each, map-side combined); the
tiny chain-transition table joins them (broadcast — chains are
driver-bounded), so the per-suggestion cost beyond the count
aggregates is negligible. Scores are 6-dp rounded at the edge.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.small_df import small_df

from .postings import InvertedIndex
from .suggest import term_suggest

MAX_CHAINS = 4096


def phrase_suggest(
    index: InvertedIndex,
    corpus: DataFrame,
    text: str,
    size: int = 3,
    candidates_per_token: int = 3,
    max_edits: int = 2,
    prefix_length: int = 1,
    alpha: float = 0.1,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Whole-phrase corrections → (suggestion, score, rank).

    ``corpus``: (id, tokens) — the LM estimates from it. ``text``
    must analyze to ≥ 2 tokens (a 1-token phrase has no transitions —
    use the term suggester). Scores are summed bigram log-probs, so
    they compare only within one call (like ES's).
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if candidates_per_token < 1:
        raise ValueError("candidates_per_token must be >= 1")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = [t for t in str(text).split() if t]
    if len(toks) < 2:
        raise ValueError("phrase_suggest needs >= 2 tokens (term_suggest otherwise)")
    n_chains = candidates_per_token ** len(toks)
    if n_chains > MAX_CHAINS:
        raise ValueError(
            f"{candidates_per_token}^{len(toks)} chains exceed {MAX_CHAINS}"
        )

    # per-token candidate sets: self + top similarity-ranked corrections
    cand_rows = term_suggest(
        index,
        list(enumerate(toks)),
        size=max(candidates_per_token - 1, 1),
        suggest_mode="always",
        max_edits=max_edits,
        prefix_length=prefix_length,
        min_word_length=1,
    ).collect()
    cands: list[list[str]] = [[t] for t in toks]
    if candidates_per_token > 1:
        for r in cand_rows:
            pos = int(r["query_id"])
            if r["suggestion"] not in cands[pos]:
                cands[pos].append(r["suggestion"])
    chains = [
        " ".join(chain)
        for chain in product(*cands)
        if list(chain) != toks  # corrections only — identity excluded
    ]
    spark = corpus.sparkSession
    out_schema = "suggestion string, score double, rank long"
    if not chains:
        return spark.createDataFrame([], out_schema)

    # chain transitions (chain_id, w1, w2) — driver-bounded rows
    trans = small_df(spark, 
        [
            (ci, chain, chain.split()[i], chain.split()[i + 1])
            for ci, chain in enumerate(chains)
            for i in range(len(chain.split()) - 1)
        ],
        "chain_id long, suggestion string, w1 string, w2 string",
    )
    # the lm.py corpus estimates: bigram counts, head totals, vocab
    t = F.col(tokens_col)
    n = F.size(t)
    bigrams = (
        corpus.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, n - 1).alias("w1"),
                    F.slice(t, 2, n - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    head_counts = bg_counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    vocab = corpus.select(F.explode(t).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    joined = (
        F.broadcast(trans)
        .join(bg_counts, ["w1", "w2"], "left")
        .join(head_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(alpha)) * F.col("v"))
    )
    return (
        joined.groupBy("chain_id", "suggestion")
        .agg(F.round(F.sum(logp), 6).alias("score"))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.desc("score"), F.asc("suggestion")
                )
            )
            .cast("long"),
        )
        .filter(F.col("rank") <= size)
        .select("suggestion", "score", "rank")
    )
