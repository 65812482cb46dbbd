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


def small_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """``rows`` (bounded, driver-local) → DataFrame with one slice per
    64k rows instead of ``spark.default.parallelism`` slices."""
    if not rows:
        return spark.createDataFrame([], schema)
    n_slices = 1 + (len(rows) - 1) // _ROWS_PER_SLICE
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
