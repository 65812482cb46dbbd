"""ES ``query_string``: the Lucene query-syntax front door.

Supports the portable, deterministic core of the Lucene QueryParser
grammar — the part whose semantics compose exactly from this engine's
existing gated operators:

- bare terms (``should`` clauses), ``+term`` (must), ``-term``
  (must_not);
- quoted phrases with the same prefixes (``+"hash join"``,
  ``-"slow scan"``, bare ``"a b"``);
- ``default_operator`` "or" (Lucene default: optional clauses need
  one match only when nothing is required) / "and" (optional term
  clauses become required).

Everything else — field prefixes, wildcards/fuzzy suffixes inside the
string, boosts, ranges, parentheses, explicit AND/OR/NOT — raises with
a clear error instead of silently approximating (the parser posture
every other replay surface here follows). Users get those features
through the structured query types, which is where ES 0.90's own
builders push them anyway.

Matching semantics (Lucene BooleanQuery):

- a doc must satisfy EVERY must clause (terms AND phrases), must fail
  every must_not clause, and — when no must clause exists — must
  satisfy at least one should clause (phrase adjacency included);
- score = the engine's BM25 sum over the distinct scoring terms: must
  terms, should terms, and the terms of must/should phrase clauses —
  a phrase contributes its TERMS to the scoring disjunction wherever
  they appear, while its adjacency gates candidacy only. This is the
  same term-sum simplification ``phrase_topk`` documents (identical
  idf/tfnorm to the term scorers) instead of Lucene's
  phrase-frequency tf; it is deterministic and oracle-reproducible,
  which Lucene's sloppy-frequency arithmetic is not.

Execution composes the gated primitives: ``score_queries`` for the
BM25 sum, ``bool_should_topk``'s match counting for must-term
coverage, ``phrase_match`` for phrase sets — all restrictions are
id-set semi/anti joins (broadcast-able; q·matches-bounded), never a
corpus shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import score_queries
from .phrase import _candidates, _term_doc_pairs, phrase_match
from .postings import InvertedIndex

_RESERVED = set('():^~*?[]{}\\/')
_CLAUSE_RE = re.compile(r'([+-]?)"([^"]*)"|([+-]?)(\S+)')
_OCCUR = {"": "should", "+": "must", "-": "must_not"}


def parse_query_string(qs: str) -> list[tuple[str, str, object]]:
    """``qs`` → [(occur, kind, payload)] where occur ∈ must/should/
    must_not, kind ∈ term/phrase, payload = str | list[str]."""
    if not qs or not qs.strip():
        raise ValueError("query_string must be non-empty")
    clauses: list[tuple[str, str, object]] = []
    pos = 0
    for m in _CLAUSE_RE.finditer(qs):
        if qs[pos:m.start()].strip():
            raise ValueError(f"unparseable query_string fragment {qs[pos:m.start()]!r}")
        pos = m.end()
        if m.group(2) is not None:
            words = [w for w in re.split(r"\s+", m.group(2)) if w]
            if not words:
                raise ValueError("empty quoted phrase in query_string")
            kind, payload, occur = "phrase", words, _OCCUR[m.group(1)]
            bad = [w for w in words if set(w) & _RESERVED]
        else:
            tok = m.group(4)
            if tok in ("AND", "OR", "NOT", "&&", "||"):
                raise ValueError(
                    f"explicit boolean operator {tok!r} is not supported: use "
                    "+/- prefixes or default_operator"
                )
            if set(tok) & _RESERVED or '"' in tok:
                raise ValueError(
                    f"term {tok!r} uses unsupported query_string syntax "
                    "(fields/wildcards/fuzzy/boosts/ranges belong to the "
                    "structured query types)"
                )
            kind, payload, occur = "term", tok, _OCCUR[m.group(3)]
        clauses.append((occur, kind, payload))
    if qs[pos:].strip():
        raise ValueError(f"unparseable query_string tail {qs[pos:]!r}")
    if not any(occ != "must_not" for occ, _, _ in clauses):
        raise ValueError("query_string needs at least one non-negated clause")
    return clauses


def query_string_topk(
    index: InvertedIndex,
    corpus: DataFrame,
    qs: str,
    k: int = 10,
    default_operator: str = "or",
    prune: bool = False,
) -> DataFrame:
    """Top-k for one query_string: (query_id=0, doc_id, score, rank).
    ``corpus`` is the (doc_id, tokens) frame phrase verification reads."""
    if default_operator not in ("or", "and"):
        raise ValueError(f"default_operator must be or/and, got {default_operator!r}")
    clauses = parse_query_string(qs)
    if default_operator == "and":
        clauses = [
            ("must" if occ == "should" else occ, kind, p)
            for occ, kind, p in clauses
        ]
    must_terms = sorted({p for occ, kind, p in clauses if occ == "must" and kind == "term"})
    should_terms = sorted({p for occ, kind, p in clauses if occ == "should" and kind == "term"})
    not_terms = sorted({p for occ, kind, p in clauses if occ == "must_not" and kind == "term"})
    phrases = [(occ, p) for occ, kind, p in clauses if kind == "phrase"]
    must_phrases = [p for occ, p in phrases if occ == "must"]
    should_phrases = [p for occ, p in phrases if occ == "should"]
    not_phrases = [p for occ, p in phrases if occ == "must_not"]
    if phrases and corpus is None:
        raise ValueError(
            "query_string with phrase clauses needs the tokens DataFrame"
        )

    scoring = sorted(
        set(must_terms)
        | set(should_terms)
        | {t for p in must_phrases + should_phrases for t in p}
    )
    scored = score_queries(
        index, [(0, scoring)], index.n_docs, prune=prune, ranked=False
    )

    def ids_of(df: DataFrame) -> DataFrame:
        return df.select("doc_id")

    hits = scored
    # required coverage: ALL must terms — an id-SET, so it reads the
    # postings intersection directly (the same lowering phrase
    # candidates use) instead of running a full BM25 scoring pass
    # whose scores the semi-join would throw away (one
    # repartition+applyInPandas stage per set drops out; round 7)
    if must_terms:
        req = _candidates(index, [(0, must_terms)])
        hits = hits.join(ids_of(req), "doc_id", "left_semi")
    # ... and every must phrase
    for p in must_phrases:
        hits = hits.join(
            ids_of(phrase_match(index, corpus, [(0, p)])), "doc_id", "left_semi"
        )
    # pure-should queries: at least one should clause must match. Term
    # shoulds already imply a hit in `scored`; a should PHRASE demands
    # the phrase itself, so keep docs matching any should clause.
    if not must_terms and not must_phrases and should_phrases:
        any_should = None
        if should_terms:
            # id-set only: docs holding >= 1 should term, straight from
            # the postings (tombstoned ids may ride along — `hits` is
            # already live-only, so the semi-join result is identical)
            any_should = _term_doc_pairs(index, should_terms).select("doc_id")
        for p in should_phrases:
            pm = ids_of(phrase_match(index, corpus, [(0, p)]))
            any_should = pm if any_should is None else any_should.unionByName(pm)
        hits = hits.join(any_should.distinct(), "doc_id", "left_semi")
    # exclusions — id-set only, same postings-expand lowering (a
    # tombstoned id in the exclusion set anti-joins nothing: `hits`
    # holds live docs)
    if not_terms:
        hits = hits.join(
            _term_doc_pairs(index, not_terms).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    for p in not_phrases:
        hits = hits.join(
            ids_of(phrase_match(index, corpus, [(0, p)])), "doc_id", "left_anti"
        )
    return (
        hits.select("query_id", "doc_id", "score")
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("score").desc(), F.col("doc_id")
                )
            )
            .cast("long"),
        )
        .filter(F.col("rank") <= k)
    )
