"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB dataset is split into train/val/test ONCE and the assignment
must be reproducible forever after — independent of partitioning,
cluster size, row order, or Spark version. ``df.randomSplit`` gives
none of that (it samples per-partition with a plan-dependent seed
stream), so the standard production shape is a *hash split*: a pure
function of (stable id, seed) → bucket → split label. Zero shuffle,
zero state — a projection that fuses into whatever scan precedes it —
and any engine (here: DuckDB for the oracle gate) reproduces it from
the same two inputs.

The hash is the first 8 hex chars of ``md5(id || ':' || seed)`` read
as an integer, mod ``BUCKETS`` — md5 because every engine computes the
identical digest (Spark's ``xxhash64``/``hash`` are Spark-specific).
md5 is cryptographically broken but statistically uniform, which is
the only property a splitter needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # split resolution: 0.01% granularity


def _hash_bucket(id_col: str, seed: int) -> Column:
    """Uniform bucket in [0, BUCKETS) as a pure function of (id, seed);
    identical arithmetic is expressible in ANSI SQL / DuckDB."""
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label, deterministically.

    ``weights`` maps label → fraction (must sum to 1 within BUCKETS
    resolution); labels claim contiguous bucket ranges in dict order,
    so adding a new tail split never reassigns existing rows of the
    earlier splits (the append-safe layout a long-lived corpus needs).

    **Key order IS the assignment** (ADVICE r5): because ranges are
    claimed in iteration order, the same weights passed in a different
    key order relabel every row — ``{"train": .8, "val": .2}`` and
    ``{"val": .2, "train": .8}`` are different splits. Callers must
    treat the dict as an ordered sequence of (label, weight) pairs
    (Python dicts preserve insertion order) and pass it identically on
    every run against the same corpus.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    if abs(sum(weights.values()) - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")
    bucket = _hash_bucket(id_col, seed)
    expr = None
    edge = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        edge += weights[label]
        cond = bucket < int(round(edge * BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keeps a row iff its
    bucket falls below ``fraction``. Unlike ``df.sample`` the kept set
    is a pure function of (id, seed) — stable across partitioning and
    re-runs, and a sample at fraction f is a SUBSET of the sample at
    any f' > f (nested samples, the property scaling-law runs rely
    on)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_hash_bucket(id_col, seed) < int(round(fraction * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-MIXING primitive
    (domain reweighting a la Pile/RedPajama recipes): keep each row with
    its stratum's fraction, e.g. ``{"web": 0.3, "code": 1.0}`` keeps
    30% of web docs and all code docs.

    Same hash arithmetic as :func:`hash_sample` — a pure function of
    (id, seed), so the kept set is partitioning/cluster/engine-invariant
    AND nested across fractions per stratum (raising one stratum's rate
    only ADDS rows of that stratum; it never swaps earlier picks —
    mixture-ratio sweeps reuse shards instead of re-sampling).

    Rows whose stratum is unlisted (or NULL) keep ``default_fraction``
    (0.0: unknown domains are dropped loudly, not silently kept).
    ``df.sampleBy`` gives per-partition seed streams and none of this.

    100 TB design: one zero-shuffle filter fused into the scan; the
    stratum→threshold map is a literal CASE (strata are domains —
    dozens, not millions), never a join.
    """
    bad = {k: v for k, v in fractions.items() if not 0.0 <= v <= 1.0}
    if bad or not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"fractions must be in [0, 1]: {bad or default_fraction}")
    thresh = F.lit(int(round(default_fraction * BUCKETS)))
    for label, frac in reversed(list(fractions.items())):
        thresh = F.when(
            F.col(stratum_col) == label, F.lit(int(round(frac * BUCKETS)))
        ).otherwise(thresh)
    return df.filter(_hash_bucket(id_col, seed) < thresh)


def mixture_sample(
    df: DataFrame,
    proportions: dict[str, float],
    stratum_col: str = "source",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    token_budget: int | None = None,
) -> DataFrame:
    """Sample to a target TOKEN mixture — the budgeted data-mixing
    recipe (Pile/DoReMi-style: "the training set shall be 60% web,
    30% code, 10% papers by tokens, at most B tokens total").

    :func:`stratified_sample` takes per-stratum RATES; this computes
    them. Per-stratum token totals come from ONE aggregation (strata
    are domains — dozens of rows collect driver-side); the largest
    total ``T`` satisfying both the proportions and the per-stratum
    supply is ``min_s(tokens_s / p_s)`` (capped by ``token_budget``),
    and each stratum keeps ``rate_s = p_s * T / tokens_s``. Rates
    quantize to the hash-bucket grid by FLOOR (never exceed supply or
    budget; floor — not banker's round — so any engine recomputing the
    arithmetic lands on the identical threshold integer), then the
    zero-shuffle :func:`stratified_sample` filter applies them — the
    kept set stays a pure function of (id, seed): partitioning-,
    cluster- and engine-invariant, and nested under budget increases
    (a bigger budget only ADDS rows per stratum, so budget ladders for
    scaling-law runs reuse shards).

    Expected kept tokens approximate the targets (hash sampling is
    Bernoulli by document, exact in expectation — the variance at
    domain scale, millions of docs, is negligible); strata missing
    from ``proportions`` are dropped. A target stratum with zero
    supply raises — silence would ship a skewed mixture.
    """
    if not proportions or any(p <= 0 for p in proportions.values()):
        raise ValueError(f"proportions must be positive: {proportions}")
    if abs(sum(proportions.values()) - 1.0) > 1e-9:
        raise ValueError(f"proportions must sum to 1: {sum(proportions.values())}")
    if token_budget is not None and token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    totals = {
        r["s"]: r["tok"]
        for r in df.filter(F.col(stratum_col).isin(list(proportions)))
        .groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(F.col(weight_col).cast("long")).alias("tok"))
        .collect()
    }
    empty = [s for s in proportions if not totals.get(s)]
    if empty:
        raise ValueError(f"target stratum(s) with no tokens: {sorted(empty)}")
    t_max = min(totals[s] / p for s, p in proportions.items())
    if token_budget is not None:
        t_max = min(t_max, float(token_budget))
    fractions = {
        # floor-quantized to the bucket grid (see docstring)
        s: int(p * t_max / totals[s] * BUCKETS) / BUCKETS
        for s, p in proportions.items()
    }
    return stratified_sample(
        df,
        fractions,
        stratum_col=stratum_col,
        id_col=id_col,
        seed=seed,
        default_fraction=0.0,
    )
