"""round6_oracle must reproduce the DuckDB oracle's round(x, 6) on the
score domain — including the systematic boundary class (a 6-dp score
times a constant whose product gains a 7th decimal digit of exactly 5)
where Spark's F.round diverges."""

import duckdb
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.rounding import round6_oracle


def test_boundary_class_matches_duckdb(spark):
    con = duckdb.connect()
    cases = [
        ("0.342703 * 1.5", 0.342703, 1.5),     # the search_dismax_topk repro
        ("0.885229 * 0.25", 0.885229, 0.25),
        ("0.514054 * 0.3", 0.514054, 0.3),
        ("1.039445 * 1.5", 1.039445, 1.5),
        ("0.000001 * 0.5", 0.000001, 0.5),
    ]
    exprs = [
        round6_oracle(F.lit(a) * F.lit(b)).alias(f"c{i}")
        for i, (_, a, b) in enumerate(cases)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, (sql, _, _) in enumerate(cases):
        duck = con.sql(f"SELECT round({sql}::DOUBLE, 6)").fetchall()[0][0]
        assert row[f"c{i}"] == duck, (sql, row[f"c{i}"], duck)


def test_off_boundary_agrees_with_f_round(spark):
    vals = [0.1234564, 0.1234566, 3.9999994, 0.0, 12.345678901]
    row = spark.range(1).select(
        *[round6_oracle(F.lit(v)).alias(f"a{i}") for i, v in enumerate(vals)],
        *[F.round(F.lit(v), 6).alias(f"b{i}") for i, v in enumerate(vals)],
    ).collect()[0]
    for i in range(len(vals)):
        assert row[f"a{i}"] == row[f"b{i}"], vals[i]
