"""Randomized core-facet sweep — random frames and random facet
configs (size / order / exclude / interval / overlapping ranges),
every result checked against a from-scratch DuckDB formulation of the
same ES 0.90 semantics (the RandomizedApproxReadWriteTest posture the
date facets already follow)."""

import duckdb
import numpy as np
import pytest

from elasticsearch_approx_plugin_spark.operators.facets import (
    histogram_facet,
    range_facet,
    statistical_facet,
    terms_facet,
    terms_stats_facet,
)

N_ROWS = 3000
_ORDER_SQL = {
    "count": "count DESC, term",
    "reverse_count": "count ASC, term",
    "term": "term",
    "reverse_term": "term DESC",
}


@pytest.fixture(scope="module")
def frame(spark, tmp_path_factory):
    rng = np.random.default_rng(1234)
    terms = [f"t{i}" for i in range(17)]
    rows = [
        (
            i,
            None if rng.random() < 0.08 else terms[int(rng.integers(0, len(terms)))],
            None if rng.random() < 0.05 else round(float(rng.normal(40, 55)), 2),
        )
        for i in range(N_ROWS)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    path = str(tmp_path_factory.mktemp("randcore") / "frame.parquet")
    df.write.mode("overwrite").parquet(path)
    return df, f"{path}/*.parquet"


def test_random_terms_facets(frame):
    df, path = frame
    rng = np.random.default_rng(7)
    for _ in range(6):
        size = int(rng.integers(1, 20))
        order = ["count", "term", "reverse_count", "reverse_term"][
            int(rng.integers(0, 4))
        ]
        exclude = tuple(
            f"t{int(i)}" for i in rng.choice(17, size=int(rng.integers(0, 3)),
                                             replace=False)
        )
        got = {
            tuple(r)
            for r in terms_facet(df, "k", size=size, order=order,
                                 exclude=exclude).collect()
        }
        ex = (
            "AND term NOT IN (" + ", ".join(f"'{t}'" for t in exclude) + ")"
            if exclude
            else ""
        )
        want = set(
            duckdb.sql(
                f"""
            WITH c AS (SELECT k AS term, count(*)::BIGINT AS count
                       FROM '{path}' WHERE k IS NOT NULL {ex} GROUP BY 1),
            top AS (SELECT * FROM c ORDER BY {_ORDER_SQL[order]} LIMIT {size}),
            s AS (SELECT coalesce(sum(count), 0)::BIGINT AS total FROM c),
            m AS (SELECT count(*)::BIGINT AS missing FROM '{path}' WHERE k IS NULL),
            r AS (SELECT coalesce(sum(count), 0)::BIGINT AS ret FROM top)
            SELECT term, count, s.total, (s.total - r.ret)::BIGINT, m.missing
            FROM top, s, m, r
            """
            ).fetchall()
        )
        assert got == want, (size, order, exclude)


def test_random_histograms_and_stats(frame):
    df, path = frame
    rng = np.random.default_rng(11)
    for _ in range(5):
        interval = round(float(rng.uniform(3, 60)), 2)
        got = {
            tuple(r)
            for r in histogram_facet(df, "v", interval, value_field="v").collect()
        }
        want = set(
            duckdb.sql(
                f"""
            SELECT floor(floor(v / {interval!r}) * {interval!r})::BIGINT,
                   count(*)::BIGINT, count(v)::BIGINT,
                   round(min(v), 6), round(max(v), 6), round(sum(v), 6),
                   round(sum(v) / count(v), 6)
            FROM '{path}' WHERE v IS NOT NULL GROUP BY 1
            """
            ).fetchall()
        )
        assert got == want, interval
    got = tuple(statistical_facet(df, "v").collect()[0])
    want = duckdb.sql(
        f"""
        SELECT count(v)::BIGINT, round(sum(v), 6), round(min(v), 6),
               round(max(v), 6), round(sum(v) / count(v), 6),
               round(sum(v * v), 6),
               round(greatest(sum(v * v) / count(v)
                     - (sum(v) / count(v)) * (sum(v) / count(v)), 0), 6),
               round(sqrt(greatest(sum(v * v) / count(v)
                     - (sum(v) / count(v)) * (sum(v) / count(v)), 0)), 6)
        FROM '{path}'
        """
    ).fetchone()
    assert got == tuple(want)


def test_random_overlapping_ranges(frame):
    df, path = frame
    rng = np.random.default_rng(13)
    for _ in range(5):
        bounds = sorted(round(float(b), 2) for b in rng.uniform(-80, 160, 4))
        ranges = [
            (None, bounds[1]),
            (bounds[0], bounds[3]),  # overlaps both neighbours
            (bounds[2], None),
        ]
        got = {
            tuple(r) for r in range_facet(df, "v", ranges, value_field="v").collect()
        }
        want = set()
        for lo, hi in ranges:
            conds = ["v IS NOT NULL"]
            if lo is not None:
                conds.append(f"v >= {lo!r}")
            if hi is not None:
                conds.append(f"v < {hi!r}")
            row = duckdb.sql(
                f"""
                SELECT count(*)::BIGINT, count(v)::BIGINT, round(min(v), 6),
                       round(max(v), 6), round(sum(v), 6),
                       round(sum(v) / count(v), 6)
                FROM '{path}' WHERE {' AND '.join(conds)}
                """
            ).fetchone()
            want.add((lo, hi) + tuple(row))
        assert got == want, ranges


def test_random_terms_stats(frame):
    df, path = frame
    rng = np.random.default_rng(17)
    for order in ["count", "total", "min", "max", "mean", "term"]:
        size = int(rng.integers(0, 8))
        got = {
            tuple(r)
            for r in terms_stats_facet(df, "k", "v", size=size, order=order).collect()
        }
        if order in _ORDER_SQL:
            osql = _ORDER_SQL[order]
        else:
            osql = f"{order} DESC, term"
        lim = f"LIMIT {size}" if size else ""
        want = set(
            duckdb.sql(
                f"""
            WITH g AS (
              SELECT k AS term, count(*)::BIGINT AS count, count(v)::BIGINT AS total_count,
                     round(min(v), 6) AS min, round(max(v), 6) AS max,
                     round(sum(v), 6) AS total, round(sum(v) / count(v), 6) AS mean
              FROM '{path}' WHERE k IS NOT NULL GROUP BY 1
            ),
            m AS (SELECT count(*)::BIGINT AS missing FROM '{path}' WHERE k IS NULL)
            SELECT term, count, total_count, min, max, total, mean, m.missing
            FROM g, m ORDER BY {osql} {lim}
            """
            ).fetchall()
        )
        assert got == want, (order, size)
