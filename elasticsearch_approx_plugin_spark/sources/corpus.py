"""Deterministic synthetic source-code corpus.

Shape per ``BASELINE.json.input_hint``:
``(repo string, path string, commit string, lang string, content string)``
plus a derived ``content_sha`` column (sha256 hex of content) whose
per-row equality against the source is asserted on every verified read
— the input-hint invariant.

Design points (FIXTURES.md §1):
- fully deterministic from the row index (seed folded into a counter
  hash), so the corpus is identical at any parallelism and any scale
  prefix — generation is distributed via ``spark.range`` +
  ``mapInPandas`` (Arrow batches, no per-row Python on the Spark side
  beyond the vectorized batch fn);
- token stream drawn from a Zipf-distributed vocabulary → hot terms
  exercise the salted posting merge;
- one per-row unique token (``uniq_<i>``) → exact distinct counts are
  known in closed form;
- ``tokens_for_row(i)`` reproduces a row's token list in the driver,
  giving the in-tree exact BM25 oracle its ground truth.

The reference's corpora are seeded the same way: ``Random(0)`` in
``RandomizedApproxReadWriteTest.java:87`` and
``termlist/TestUtils.java:10`` (/root/reference).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 2000
ZIPF_S = 1.3
LANGS = ("py", "java", "c", "go", "js", "md")
# lang weights: skewed categorical
_LANG_CUM = np.cumsum(np.array([0.35, 0.25, 0.15, 0.10, 0.10, 0.05]))

_BASE_WORDS = (
    "def class import return self static void public int for while if else "
    "struct func package var const let function export require include "
    "printf malloc free string array map list dict hash merge sort scan "
    "join filter index query token parse buffer stream batch shard node "
    "count distinct facet bucket range offset limit order group agg"
).split()


def _vocab(n: int = VOCAB_SIZE) -> list[str]:
    """Deterministic vocabulary: base identifiers then generated ones."""
    out = list(_BASE_WORDS)
    i = 0
    while len(out) < n:
        out.append(f"ident_{i:04d}")
        i += 1
    return out[:n]


_VOCAB = _vocab()
# Zipf pmf over vocab ranks (rank 0 hottest).
_ZIPF_W = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_ZIPF_CUM = np.cumsum(_ZIPF_W / _ZIPF_W.sum())


def _rand01(idx: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uniform(0,1) per (row index, stream) — splitmix64."""
    x = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) + np.uint64(
        SEED * 1_000_003 + stream
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _doc_len(i: int) -> int:
    return 20 + int(_rand01(np.array([i]), 0)[0] * 180)  # 20..199 tokens


def tokens_for_row(i: int) -> list[str]:
    """Closed-form token list of row ``i`` (driver-side ground truth)."""
    n = _doc_len(i)
    u = _rand01(np.arange(n, dtype=np.int64) + np.int64(i) * 1_000_003, 1)
    ranks = np.searchsorted(_ZIPF_CUM, u, side="left")
    toks = [_VOCAB[r] for r in ranks]
    toks.append(f"uniq_{i}")
    return toks


def content_for_row(i: int) -> str:
    """Content = tokens joined with spaces/newlines every 10 tokens."""
    toks = tokens_for_row(i)
    lines = [" ".join(toks[j : j + 10]) for j in range(0, len(toks), 10)]
    return "\n".join(lines)


def row_for_index(i: int) -> dict[str, str]:
    lang = LANGS[int(np.searchsorted(_LANG_CUM, _rand01(np.array([i]), 2)[0]))]
    content = content_for_row(i)
    return {
        "repo": f"org{i % 7}/repo{i % 101}",
        "path": f"src/m{i % 13}/f{i % 997}.{lang}",
        "commit": hashlib.sha1(f"commit-{SEED}-{i}".encode()).hexdigest(),
        "lang": lang,
        "content": content,
        "content_sha": hashlib.sha256(content.encode()).hexdigest(),
    }


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha string"
)


def generate_corpus(spark: SparkSession, n_rows: int, parallelism: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_rows`` files.

    ``spark.range`` gives each task a disjoint index range; every row
    is a pure function of its index, so output is identical at any
    parallelism (the scaling-efficiency benchmark depends on this).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [row_for_index(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[c.split()[0] for c in CORPUS_SCHEMA.split(", ")])

    rng = spark.range(0, n_rows, numPartitions=parallelism or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)


def read_corpus_verified(df: DataFrame) -> DataFrame:
    """Enforce the input-hint invariant: per-row sha256(content) equality.

    Hashing runs JVM-side (``F.sha2``); rows failing the check would
    surface as a non-empty ``_sha_mismatch`` filter — callers can
    ``assert_sha_ok`` (action) or keep the lazy guard column.
    """
    return df.withColumn(
        "_sha_ok", F.sha2(F.col("content").cast("binary"), 256) == F.col("content_sha")
    )


def assert_sha_ok(df: DataFrame) -> None:
    bad = read_corpus_verified(df).filter(~F.col("_sha_ok")).count()
    if bad:
        raise ValueError(f"content sha256 mismatch on {bad} rows")


def with_sha_enforced(
    df: DataFrame, content_col: str = "content", sha_col: str = "content_sha"
) -> DataFrame:
    """Per-row sha256 invariant enforced INLINE on the read path.

    The content column is wrapped so a mismatching row fails its task
    (``raise_error``) the moment it is read — no second scan, the
    check rides the same whole-stage-codegen pass as the tokenizer
    downstream. This is the always-on form of the invariant as
    BASELINE.json phrases it ("content sha256 equality is asserted per
    row against the source"); :func:`assert_sha_ok` remains the
    batch-audit form (counts all bad rows instead of failing on the
    first)."""
    guard = F.when(
        F.sha2(F.col(content_col).cast("binary"), 256) == F.col(sha_col),
        F.col(content_col),
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("content sha256 mismatch at row"),
                *[F.col(c).cast("string") for c in ("repo", "path", "commit") if c in df.columns],
            )
        )
    )
    return df.withColumn(content_col, guard)
