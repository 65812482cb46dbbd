"""Parquet table loaders for the driver-generated test data.

The reference reads Lucene per-segment field data
(``TimestampFirstCollector.java:86-89`` in /root/reference); our scan
layer is Spark's vectorized parquet reader — columnar, with predicate
pushdown, column pruning and partition pruning supplied by Catalyst.
Iceberg would slot in here unchanged (same DataFrame surface); the
sandbox image has no Iceberg jars, so plain parquet paths stand in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
