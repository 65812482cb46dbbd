"""Search-result highlighting: snippet extraction over BM25 top-k.

ES attaches a ``highlight`` block to search hits — the plain
highlighter re-analyzes the stored text, picks the best fragment and
wraps matched terms in tags. That "best fragment" choice is a
Lucene-internal heuristic; a distributed engine wants a rule that is
deterministic and engine-reproducible, so this operator anchors the
fragment at the FIRST whole-word occurrence of any query term and
wraps every whole-word term occurrence inside it:

- candidate docs are the BM25 top-k (``score_queries`` — WAND /
  tombstones / pruning inherited), so the snippet join touches q·k
  rows, never the corpus: the bounded id set pushes into the
  documents scan as an ``IN`` filter (parquet row-group skipping) and
  the hit list broadcasts;
- fragment = ``frag_size`` chars of the space-padded text starting at
  the first match; wrapping = one whole-word ``replace`` per query
  term in sorted term order (left-to-right non-overlapping — the
  semantics Spark and DuckDB share, which is what makes the gate's
  snippet hashes comparable);
- everything is built-in Catalyst string functions; zero Python in
  the row path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.small_df import small_df

from .bm25 import score_queries
from .postings import InvertedIndex

DEFAULT_FRAG_SIZE = 100  # Lucene plain highlighter's fragment size
DEFAULT_PRE_TAG = "<em>"
DEFAULT_POST_TAG = "</em>"


def _first_match_pos(padded: Column, terms: list[str]) -> Column:
    """1-based position of the first whole-word occurrence of any
    term in the space-padded text (null if none match)."""
    poss = [
        F.nullif(F.instr(padded, f" {t} "), F.lit(0)) for t in sorted(set(terms))
    ]
    return F.least(*poss) if len(poss) > 1 else poss[0]


def _wrap(frag: Column, terms: list[str], pre: str, post: str) -> Column:
    """Wrap every whole-word term occurrence in the fragment."""
    out = frag
    for t in sorted(set(terms)):
        out = F.replace(out, F.lit(f" {t} "), F.lit(f" {pre}{t}{post} "))
    return out


def highlight_topk(
    index: InvertedIndex,
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    frag_size: int = DEFAULT_FRAG_SIZE,
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
    prune: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k with a highlighted snippet per hit:
    (query_id, doc_id, score, rank, snippet).

    ``docs`` holds the stored text (``id_col``, ``text_col``) — the
    analog of ES's ``_source``. A hit whose matched terms came from
    analysis-time transforms the stored text doesn't contain verbatim
    would get a null snippet; with the engine's whitespace tokenizer
    the stored text always contains its own tokens, so snippets are
    non-null by construction.
    """
    if frag_size < 1:
        raise ValueError(f"frag_size must be >= 1, got {frag_size}")
    if not queries or any(not ts for _, ts in queries):
        raise ValueError("queries must each carry at least one term")
    topk = score_queries(index, queries, k, prune=prune)
    # bounded: q·k rows (the serving result set, same bound the RRF
    # fusion and query-side caches already rely on)
    hits = topk.collect()
    if not hits:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank long, snippet string"
        )
    spark = topk.sparkSession
    hits_df = F.broadcast(
        small_df(spark, hits, "query_id long, doc_id long, score double, rank long")
    )
    ids = sorted({r["doc_id"] for r in hits})
    texts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.lit(" "), F.col(text_col), F.lit(" ")).alias("__padded"),
    ).filter(F.col(id_col).isin(ids))
    joined = hits_df.join(texts, "doc_id")
    by_qid = {int(qid): ts for qid, ts in queries}
    snip_expr = None
    for qid, terms in sorted(by_qid.items()):
        pos = _first_match_pos(F.col("__padded"), terms)
        frag = F.substring(F.col("__padded"), pos, frag_size)
        snip = F.trim(_wrap(frag, terms, pre_tag, post_tag))
        cond = F.col("query_id") == qid
        snip_expr = (
            F.when(cond, snip) if snip_expr is None else snip_expr.when(cond, snip)
        )
    return joined.select(
        "query_id", "doc_id", "score", "rank", snip_expr.alias("snippet")
    )
