"""Table loaders: Iceberg catalog when configured, parquet fallback.

The reference reads Lucene per-segment field data
(``TimestampFirstCollector.java:86-89`` in /root/reference); our scan
layer is Spark's vectorized columnar reader — predicate pushdown,
column pruning and partition pruning supplied by Catalyst either way.

BASELINE's input hint names an Iceberg table of source-code repos. The
sandbox image has no Iceberg jars, so the executable path here is
parquet; the Iceberg path is the SAME DataFrame surface behind a
config switch and activates the day the runtime has
``iceberg-spark-runtime`` on the classpath:

- set ``spark.sql.catalog.<name>`` to the Iceberg catalog impl, and
- pass ``catalog="<name>"`` (or set ``$SPARK_GRAFT_ICEBERG_CATALOG``),

whereupon ``load_table`` becomes ``spark.read.table(f"{catalog}.{db}.
{name}")`` — Iceberg supplies snapshot isolation, hidden partitioning
and metadata-pruned scans; nothing downstream changes because every
operator consumes a plain DataFrame.
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


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    catalog: str | None = None,
    database: str = "default",
) -> DataFrame:
    """Read ``name`` from the Iceberg catalog when one is configured,
    else from the parquet directory layout under ``sf_dir``."""
    catalog = catalog or os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG")
    if catalog:
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            raise ValueError(
                f"catalog {catalog!r} requested but spark.sql.catalog.{catalog} "
                "is not configured (is iceberg-spark-runtime on the classpath?)"
            )
        return spark.read.table(f"{catalog}.{database}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
