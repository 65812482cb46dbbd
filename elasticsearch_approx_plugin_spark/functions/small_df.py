"""Driver-local rows as a DataFrame without the default-parallelism
fan-out.

``spark.createDataFrame(list)`` parallelizes local data into
``spark.default.parallelism`` slices; for the few-hundred-row query /
payload tables every serving operator builds per call, that is ~128
mostly-empty Python tasks (measured ~1.4 s per call on ``local[32]``,
the single largest fixed cost of every serving query at benchmark
scale) before the broadcast is even built.  One slice per 64k rows
keeps a query table to ONE Python task (~50 ms) while staying safe for
the occasional larger bounded list (keep-lists, offsets); the result is
an ordinary, schema-verified, broadcastable DataFrame.

This is a driver-side construction cost, independent of data scale: at
100 TB the query tables are the same few hundred rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ROWS_PER_SLICE = 65536


def spread_small_input(df: DataFrame) -> DataFrame:
    """Re-spread an input whose planned scan parallelism is far below
    the session's shuffle width (guide-style input-skew fix: one small
    unsplittable file serializes every CPU-dense downstream stage on a
    single task — MinHash signatures, sketch partials, phrase/span
    verify folds all sat on 1-task scans at benchmark scale).

    No-op — and crucially NO shuffle — whenever the input already
    splits to at least half the shuffle width, which any at-scale table
    does (splits = bytes / maxPartitionBytes); the reshuffle only fires
    for inputs bounded by ~width × maxPartitionBytes, where moving them
    once is negligible and buys full-core parallelism."""
    from ..session import n_shuffle_partitions

    n = n_shuffle_partitions(df.sparkSession)
    if df.rdd.getNumPartitions() < max(2, n // 2):
        return df.repartition(n)
    return df


def width_partitioned(df: DataFrame, *keys: str) -> DataFrame:
    """Pin a bounded intermediate to the session shuffle width, hashed
    by ``keys`` (REPARTITION_BY_NUM — AQE never coalesces an explicit
    numPartitions repartition), so a CPU-dense row-local stage
    downstream cannot fold onto the 1–2 byte-coalesced tasks AQE picks
    for byte-small exchanges.  Use on candidate sets feeding
    interpreted-HOF verify/score projections: their bytes are tiny
    (ids) but their per-row CPU is not.  Keying on the downstream join
    key lets a sort-merge join at scale reuse the exchange."""
    from ..session import n_shuffle_partitions

    return df.repartition(n_shuffle_partitions(df.sparkSession), *keys)


def small_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """``rows`` (bounded, driver-local) → DataFrame with one slice per
    64k rows instead of ``spark.default.parallelism`` slices."""
    if not rows:
        return spark.createDataFrame([], schema)
    n_slices = 1 + (len(rows) - 1) // _ROWS_PER_SLICE
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
