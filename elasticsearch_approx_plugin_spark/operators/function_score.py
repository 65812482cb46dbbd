"""function_score — decay functions and boost factors over BM25.

ES adds ``function_score`` in the 0.90 line (0.90.4): the query score
is combined with per-document function values — distance DECAY on a
numeric/date field (``gauss`` / ``linear`` / ``exp``), constant boosts
(``boost_factor`` / ``weight``) — under a ``score_mode`` (combining
the functions) and a ``boost_mode`` (combining the result with the
query score).  The decay closed forms follow the public ES reference:

- distance ``d = max(0, |value − origin| − offset)``
- ``gauss``:  ``exp(−d² / (2σ²))`` with ``σ² = −scale² / (2·ln decay)``
- ``exp``:    ``exp(ln(decay)/scale · d)``
- ``linear``: ``max(0, (s − d)/s)`` with ``s = scale / (1 − decay)``

so that a document at ``|value − origin| = offset + scale`` scores
exactly ``decay``.  A document with a NULL field gets function value
1.0 (ES treats missing as no decay for numeric fields — documented
choice here).

Spark shape: decay scoring is by definition a re-rank of EVERY
matching document (a far-away doc can still win on a high base
score), so the base query runs the gated scorer UNCAPPED
(``k = n_docs`` — the scorers compute all scores before their group
limit, so this changes shuffle volume, not compute), then ONE
uniform-key join on doc_id brings in the numeric field, the function
values are per-row Catalyst closed forms (no UDF, no aggregation —
engine-reproducible), and the final top-k is the same per-query
window every ranked operator uses.  Function values and the combined
score are 6-dp rounded so the DuckDB oracle reproduces them.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import score_queries
from .postings import InvertedIndex

_DECAYS = ("gauss", "exp", "linear")
_SCORE_MODES = ("multiply", "sum", "avg", "max", "min")
_BOOST_MODES = ("multiply", "sum", "avg", "max", "min", "replace")


def _decay_col(kind: str, spec: dict) -> Column:
    field = spec["field"]
    origin = float(spec["origin"])
    scale = float(spec["scale"])
    offset = float(spec.get("offset", 0.0))
    decay = float(spec.get("decay", 0.5))
    if scale <= 0:
        raise ValueError(f"{kind} decay: scale must be positive, got {scale}")
    if not 0 < decay < 1:
        raise ValueError(f"{kind} decay: decay must be in (0, 1), got {decay}")
    if offset < 0:
        raise ValueError(f"{kind} decay: offset must be >= 0, got {offset}")
    v = F.col(field).cast("double")
    d = F.greatest(F.abs(v - F.lit(origin)) - F.lit(offset), F.lit(0.0))
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        val = F.exp(-(d * d) / F.lit(2.0 * sigma2))
    elif kind == "exp":
        lam = math.log(decay) / scale
        val = F.exp(F.lit(lam) * d)
    else:  # linear
        s = scale / (1.0 - decay)
        val = F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))
    # NULL field -> 1.0 (no decay), like a doc with no distance
    return F.when(v.isNull(), F.lit(1.0)).otherwise(val)


def _function_col(fn: dict) -> Column:
    keys = set(fn)
    weight = float(fn.get("weight", fn.get("boost_factor", 1.0)))
    decay_kinds = keys & set(_DECAYS)
    extra = keys - set(_DECAYS) - {"weight", "boost_factor"}
    if extra:
        raise ValueError(f"function_score: unsupported function key(s) {sorted(extra)}")
    if len(decay_kinds) > 1:
        raise ValueError(f"function_score: one decay per function, got {sorted(decay_kinds)}")
    if decay_kinds:
        kind = decay_kinds.pop()
        spec = dict(fn[kind])
        missing = {"field", "origin", "scale"} - set(spec)
        if missing:
            raise ValueError(f"{kind} decay requires {sorted(missing)}")
        unknown = set(spec) - {"field", "origin", "scale", "offset", "decay"}
        if unknown:
            raise ValueError(f"{kind} decay: unsupported key(s) {sorted(unknown)}")
        return F.lit(weight) * _decay_col(kind, spec)
    if not ({"weight", "boost_factor"} & keys):
        raise ValueError("function_score: empty function (need a decay or a boost)")
    return F.lit(weight)


def function_score_topk(
    index: InvertedIndex,
    meta: DataFrame,
    queries: list[tuple[int, list[str]]],
    functions: list[dict],
    k: int = 10,
    boost_mode: str = "multiply",
    score_mode: str = "multiply",
    id_col: str = "doc_id",
) -> DataFrame:
    """function_score top-k → (query_id, doc_id, score, rank).

    ``meta``: the table carrying the decay fields (joined on
    ``id_col``; only the referenced fields are projected, so column
    pruning reaches the scan).  ``functions``: ES function entries —
    ``{"gauss": {"field", "origin", "scale", "offset"?, "decay"?},
    "weight"?}`` (or ``linear`` / ``exp``), or a bare
    ``{"boost_factor": w}`` / ``{"weight": w}``.
    """
    base = score_queries(index, queries, k=index.n_docs, ranked=False).select(
        "query_id", "doc_id", F.col("score").alias("score")
    )
    return apply_functions(
        base, meta, functions, k,
        boost_mode=boost_mode, score_mode=score_mode, id_col=id_col,
    )


def apply_functions(
    base: DataFrame,
    meta: DataFrame,
    functions: list[dict],
    k: int,
    boost_mode: str = "multiply",
    score_mode: str = "multiply",
    id_col: str = "doc_id",
) -> DataFrame:
    """The function_score combine over an UNCAPPED base match set
    ``(query_id, doc_id, score)`` — exposed separately so the
    ``_search`` dispatcher can wrap ANY scored query type."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not functions:
        raise ValueError("function_score requires at least one function")
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if boost_mode not in _BOOST_MODES:
        raise ValueError(f"boost_mode must be one of {_BOOST_MODES}")
    cols = [_function_col(fn) for fn in functions]
    if score_mode == "multiply":
        fval = cols[0]
        for c in cols[1:]:
            fval = fval * c
    elif score_mode == "sum":
        fval = sum(cols[1:], cols[0])
    elif score_mode == "avg":
        fval = sum(cols[1:], cols[0]) / F.lit(float(len(cols)))
    elif score_mode == "max":
        fval = F.greatest(*cols) if len(cols) > 1 else cols[0]
    else:
        fval = F.least(*cols) if len(cols) > 1 else cols[0]
    fval = F.round(fval, 6)

    fields = sorted(
        {
            fn[kind]["field"]
            for fn in functions
            for kind in (set(fn) & set(_DECAYS))
        }
    )
    base = base.select("query_id", "doc_id", F.col("score").alias("_base"))
    # left join: a doc absent from meta keeps its base row (its decay
    # fields are NULL -> function value 1.0, the no-decay posture)
    joined = base.join(
        meta.select(F.col(id_col).alias("doc_id"), *fields), "doc_id", "left"
    )
    b, f = F.col("_base"), fval
    combined = {
        "multiply": b * f,
        "sum": b + f,
        "avg": (b + f) / F.lit(2.0),
        "max": F.greatest(b, f),
        "min": F.least(b, f),
        "replace": f,
    }[boost_mode]
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.select("query_id", "doc_id", F.round(combined, 6).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
