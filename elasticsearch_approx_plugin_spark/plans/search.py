"""Replay an ES ``_search`` request body end-to-end: hits + facets.

``request_parser`` replays the reference's facet REQUESTs; this module
adds the other half of the search API — the scored hit list — so a
user can POST the same ``_search`` JSON they send to Elasticsearch and
get back (doc_id, score, rank[, snippet]) plus the parsed facet specs.
Every query type dispatches to the operator that already implements
its semantics (and carries its oracle gate):

====================  =================================================
clause                operator
====================  =================================================
``match`` (OR)        ``bm25.score_queries`` — terms via the index's
                      whitespace analysis
``match`` (AND /      ``bm25.bool_should_topk`` with m = n_terms /
``minimum_should_     the requested m
match``)
``match_phrase``      ``phrase.phrase_topk`` (needs ``tokens``)
``query_string``      ``query_string.query_string_topk`` — the +/-/
                      phrase Lucene-core grammar (``tokens`` needed
                      for phrase clauses)
``prefix``            ``prefix.prefix_topk``
``fuzzy``             ``fuzzy.fuzzy_topk``
``wildcard``          ``wildcard.wildcard_topk``
``regexp``            ``regexp.regexp_topk``
``more_like_this``    ``mlt.mlt_topk``
``bool`` w/ should    ``bm25.bool_should_topk``
term clauses
``constant_score``    every filter match scores the boost (needs
                      ``docs``)
``filtered``          inner scored query, hit set intersected with
                      ``lower_filter`` evaluated on ``docs``
====================  =================================================

Pagination (``from``/``size``) trims AFTER ranking, like ES; a
``highlight`` block attaches snippets via ``highlight.highlight_topk``
semantics. Anything unrecognized raises — the parser's strict
no-silent-drop posture, same as ``request_parser``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.bm25 import bool_should_topk, score_queries
from ..operators.fuzzy import fuzzy_topk
from ..operators.mlt import mlt_topk
from ..operators.postings import InvertedIndex
from ..operators.prefix import prefix_topk
from ..operators.regexp import regexp_topk
from ..operators.wildcard import wildcard_topk
from .request_parser import lower_filter

DEFAULT_SIZE = 10  # the ES default


def _analyze(text: str) -> list[str]:
    """The Python twin of ``tokenize_ws`` (whitespace split, empties
    dropped) — query-side analysis must match index-side analysis."""
    return [t for t in re.split(r"\s+", text) if t]


def _field_body(clause_body: dict[str, Any], kind: str) -> tuple[str, Any]:
    if len(clause_body) != 1:
        raise ValueError(f"{kind} query must name exactly one field, got {sorted(clause_body)}")
    ((fld, spec),) = clause_body.items()
    return fld, spec


def _scored_hits(
    index: InvertedIndex,
    clause: dict[str, Any],
    k: int,
    tokens: DataFrame | None,
    docs: DataFrame | None,
    prune: bool,
) -> DataFrame:
    """(query_id=0, doc_id, score, rank) for one scored query clause."""
    if len(clause) != 1:
        raise ValueError(f"query clause must have exactly one key, got {sorted(clause)}")
    ((kind, body),) = clause.items()

    if kind == "match":
        fld, spec = _field_body(body, "match")
        if isinstance(spec, str):
            text, operator, msm = spec, "or", None
        else:
            unknown = set(spec) - {"query", "operator", "minimum_should_match"}
            if unknown:
                raise ValueError(f"match query: unsupported option(s) {sorted(unknown)}")
            text = spec["query"]
            operator = spec.get("operator", "or").lower()
            msm = spec.get("minimum_should_match")
        terms = _analyze(text)
        if not terms:
            raise ValueError("match query analyzed to zero terms")
        if operator == "and":
            msm = len(set(terms))
        elif operator != "or":
            raise ValueError(f"match operator must be and/or, got {operator!r}")
        if msm is not None and int(msm) > 1:
            return bool_should_topk(index, [(0, terms, int(msm))], k, prune=prune)
        return score_queries(index, [(0, terms)], k, prune=prune)

    if kind == "match_phrase":
        if tokens is None:
            raise ValueError("match_phrase needs the tokens DataFrame")
        from ..operators.phrase import phrase_topk

        fld, spec = _field_body(body, "match_phrase")
        text = spec if isinstance(spec, str) else spec["query"]
        return phrase_topk(index, tokens, [(0, _analyze(text))], k)

    if kind == "prefix":
        fld, spec = _field_body(body, "prefix")
        val = spec if isinstance(spec, str) else spec["value"]
        return prefix_topk(index, [(0, val)], k, prune=prune)

    if kind == "fuzzy":
        fld, spec = _field_body(body, "fuzzy")
        if isinstance(spec, str):
            return fuzzy_topk(index, [(0, spec)], k, prune=prune)
        unknown = set(spec) - {"value", "fuzziness", "prefix_length", "max_expansions"}
        if unknown:
            raise ValueError(f"fuzzy query: unsupported option(s) {sorted(unknown)}")
        return fuzzy_topk(
            index,
            [(0, spec["value"])],
            k,
            fuzziness=int(spec.get("fuzziness", 2)),
            prefix_length=int(spec.get("prefix_length", 0)),
            max_expansions=int(spec.get("max_expansions", 50)),
            prune=prune,
        )

    if kind == "wildcard":
        fld, spec = _field_body(body, "wildcard")
        val = spec if isinstance(spec, str) else spec["value"]
        return wildcard_topk(index, [(0, val)], k, prune=prune)

    if kind == "regexp":
        fld, spec = _field_body(body, "regexp")
        val = spec if isinstance(spec, str) else spec["value"]
        return regexp_topk(index, [(0, val)], k, prune=prune)

    if kind == "more_like_this":
        unknown = set(body) - {
            "like_text", "fields", "max_query_terms", "min_term_freq", "min_doc_freq",
        }
        if unknown:
            raise ValueError(f"more_like_this: unsupported option(s) {sorted(unknown)}")
        return mlt_topk(
            index,
            [(0, body["like_text"])],
            k,
            max_query_terms=int(body.get("max_query_terms", 25)),
            min_term_freq=int(body.get("min_term_freq", 2)),
            min_doc_freq=int(body.get("min_doc_freq", 5)),
            prune=prune,
        )

    if kind == "query_string":
        unknown = set(body) - {"query", "default_operator"}
        if unknown:
            raise ValueError(f"query_string: unsupported option(s) {sorted(unknown)}")
        from ..operators.query_string import query_string_topk

        return query_string_topk(
            index,
            tokens,
            body["query"],
            k,
            default_operator=str(body.get("default_operator", "or")).lower(),
            prune=prune,
        )

    if kind == "terms":
        # ES terms query: bool-OR over the listed terms; 0.90's
        # minimum_match knob maps to minimum_should_match
        body = dict(body)
        mm = int(body.pop("minimum_match", body.pop("minimum_should_match", 1)))
        fld, vals = _field_body(body, "terms")
        if not isinstance(vals, list) or not vals:
            raise ValueError("terms query requires a non-empty term list")
        terms = [str(v) for v in vals]
        if mm > 1:
            return bool_should_topk(index, [(0, terms, mm)], k, prune=prune)
        return score_queries(index, [(0, terms)], k, prune=prune)

    if kind == "bool":
        unknown = set(body) - {"should", "minimum_should_match"}
        if unknown:
            raise ValueError(
                f"scored bool query supports should + minimum_should_match here, "
                f"got {sorted(unknown)} (filter-context bool belongs in 'filtered')"
            )
        shoulds = body.get("should", [])
        terms = []
        for sub in shoulds if isinstance(shoulds, list) else [shoulds]:
            ((skind, sbody),) = sub.items()
            if skind != "term":
                raise ValueError(f"scored bool should clause must be term, got {skind!r}")
            ((_, val),) = sbody.items()
            terms.append(str(val))
        if not terms:
            raise ValueError("scored bool query has no should term clauses")
        m = int(body.get("minimum_should_match", 1))
        return bool_should_topk(index, [(0, terms, m)], k, prune=prune)

    if kind == "constant_score":
        # every filter-matched doc scores exactly the boost (ES
        # ConstantScoreQuery); ranks tie-break by doc_id
        unknown = set(body) - {"filter", "boost"}
        if unknown:
            raise ValueError(f"constant_score query: unsupported key(s) {sorted(unknown)}")
        if "filter" not in body:
            raise ValueError("constant_score query requires a filter")
        if docs is None:
            raise ValueError("constant_score needs the docs DataFrame")
        boost = round(float(body.get("boost", 1.0)), 6)
        return (
            docs.filter(lower_filter(body["filter"]))
            .select(
                F.lit(0).cast("long").alias("query_id"),
                F.col("doc_id"),
                F.lit(boost).cast("double").alias("score"),
            )
            .withColumn(
                "rank",
                F.row_number()
                .over(Window.partitionBy("query_id").orderBy(F.col("doc_id")))
                .cast("long"),
            )
            .filter(F.col("rank") <= k)
        )

    if kind == "filtered":
        unknown = set(body) - {"query", "filter"}
        if unknown:
            raise ValueError(f"filtered query: unsupported key(s) {sorted(unknown)}")
        if docs is None:
            raise ValueError("filtered query needs the docs DataFrame to evaluate the filter")
        inner = body.get("query", {"match_all": {}})
        pred = lower_filter(body["filter"])
        # ES filters the candidate set BEFORE ranking: score everything
        # (k = n_docs — the scorers compute all scores before the
        # group-limit anyway), intersect with the filter on docs, then
        # re-rank. At scale the filtered id set rides a broadcast-able
        # semi join (filter selectivity is the knob, same as ES).
        scored = _scored_hits(index, inner, index.n_docs, tokens, docs, prune)
        keep = docs.filter(pred).select(F.col("doc_id"))
        return (
            scored.join(keep, "doc_id", "left_semi")
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
        )

    raise ValueError(
        f"unsupported search query type {kind!r} (supported: match, match_phrase, "
        "terms, prefix, fuzzy, wildcard, regexp, more_like_this, bool-should, "
        "constant_score, filtered)"
    )


def search_topk(
    index: InvertedIndex,
    request: dict[str, Any],
    tokens: DataFrame | None = None,
    docs: DataFrame | None = None,
    prune: bool = False,
) -> DataFrame:
    """Replay a ``_search`` request body → the hit list
    ``(doc_id, score, rank[, snippet])``, ranks 1-based BEFORE
    pagination so ``from``/``size`` read like ES's.

    Facets in the request are NOT executed here — pass the same dict
    to ``request_parser.parse_request`` for the facet side (the two
    compose; this function validates but ignores the ``facets`` key).
    """
    known = {"query", "size", "from", "highlight", "facets"}
    unknown = set(request) - known
    if unknown:
        raise ValueError(f"unsupported _search key(s) {sorted(unknown)}")
    if "query" not in request:
        raise ValueError("_search request requires a query clause")
    size = int(request.get("size", DEFAULT_SIZE))
    offset = int(request.get("from", 0))
    if size < 1 or offset < 0:
        raise ValueError(f"size must be >= 1 and from >= 0, got {size}/{offset}")
    hits = _scored_hits(
        index, request["query"], offset + size, tokens, docs, prune
    ).filter((F.col("rank") > offset) & (F.col("rank") <= offset + size))
    hl = request.get("highlight")
    if hl is not None:
        if docs is None:
            raise ValueError("highlight needs the docs DataFrame")
        unknown = set(hl) - {"fragment_size", "pre_tags", "post_tags", "fields"}
        if unknown:
            raise ValueError(f"highlight: unsupported option(s) {sorted(unknown)}")
        from ..operators.highlight import (
            DEFAULT_FRAG_SIZE,
            DEFAULT_POST_TAG,
            DEFAULT_PRE_TAG,
            _first_match_pos,
            _wrap,
        )

        terms = _highlight_terms(request["query"])
        frag_size = int(hl.get("fragment_size", DEFAULT_FRAG_SIZE))
        (pre,) = hl.get("pre_tags", [DEFAULT_PRE_TAG])
        (post,) = hl.get("post_tags", [DEFAULT_POST_TAG])
        padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
        pos = _first_match_pos(padded, terms)
        snip = F.trim(_wrap(F.substring(padded, pos, frag_size), terms, pre, post))
        hits = hits.join(
            docs.select("doc_id", snip.alias("snippet")), "doc_id"
        )
    return hits.drop("query_id").select(
        "doc_id", "score", "rank", *(["snippet"] if hl is not None else [])
    )


def _highlight_terms(clause: dict[str, Any]) -> list[str]:
    """The literal terms a query contributes to highlighting (the
    expansion-based types would need their expanded term lists — ES's
    plain highlighter has the same rewrite dependence; unsupported
    here, raises)."""
    ((kind, body),) = clause.items()
    if kind == "match":
        _, spec = _field_body(body, "match")
        return _analyze(spec if isinstance(spec, str) else spec["query"])
    if kind == "match_phrase":
        _, spec = _field_body(body, "match_phrase")
        return _analyze(spec if isinstance(spec, str) else spec["query"])
    if kind == "bool":
        terms = []
        for sub in body.get("should", []):
            ((_, sbody),) = sub.items()
            ((_, val),) = sbody.items()
            terms.append(str(val))
        return terms
    if kind == "filtered":
        return _highlight_terms(body.get("query", {"match_all": {}}))
    raise ValueError(f"highlight is not supported for query type {kind!r}")
