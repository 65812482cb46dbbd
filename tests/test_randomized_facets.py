"""Randomized facet queries cross-checked against generated DuckDB SQL
— the engine analog of the reference's randomized integration tests
(RandomizedApproxReadWriteTest: seeded Random(0), exact oracle, 1%
tolerance for HLL) and its 100-random-query self-consistency layer
(MediumDataSetPerformanceTest)."""

import duckdb
import numpy as np
import pytest

from elasticsearch_approx_plugin_spark.operators.date_facet import date_facet

INTERVALS = ["hour", "day", "minute", "6h", "90m"]
SLICES = [None, "event_type"]
THRESHOLDS = [-1, 0, 50, 1000]

_TRUNC = {
    "hour": "date_trunc('hour', ts)",
    "day": "date_trunc('day', ts)::TIMESTAMP",
    "minute": "date_trunc('minute', ts)",
    "6h": "epoch_ms((epoch_ms(ts) // 21600000) * 21600000)",
    "90m": "epoch_ms((epoch_ms(ts) // 5400000) * 5400000)",
}


def _oracle(sf_dir, interval, slice_field):
    trunc = _TRUNC[interval]
    cols = [f"{trunc} AS time"]
    group = ["1"]
    if slice_field:
        cols.append(f"{slice_field} AS term")
        group.append("2")
    sql = (
        f"SELECT {', '.join(cols)}, count(user_id) AS cnt, "
        f"count(DISTINCT user_id) AS dc "
        f"FROM read_parquet('{sf_dir}/events.parquet') GROUP BY {', '.join(group)}"
    )
    out = {}
    for row in duckdb.sql(sql).fetchall():
        key = tuple(row[:-2])
        out[key] = (row[-2], row[-1])
    return out


@pytest.mark.parametrize("case", range(8))
def test_random_facet_vs_oracle(spark, sf_dir_med, case):
    rng = np.random.default_rng(case)  # deterministic per case (Random(0) discipline)
    interval = INTERVALS[rng.integers(len(INTERVALS))]
    slice_field = SLICES[rng.integers(len(SLICES))]
    threshold = THRESHOLDS[rng.integers(len(THRESHOLDS))]

    events = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    res = date_facet(
        events, "ts", interval, slice_field=slice_field,
        distinct_field="user_id", exact_threshold=threshold,
        distinct_method="hybrid",
    ).collect()
    exp = _oracle(sf_dir_med, interval, slice_field)

    assert len(res) == len(exp)
    for r in res:
        key = (r["time"], r["term"]) if slice_field else (r["time"],)
        cnt, dc = exp[key]
        assert r["count"] == cnt  # occurrence counts always exact
        if r["tipped"]:
            assert abs(r["distinct_count"] - dc) <= max(0.02 * dc, 2)  # HLL ≤2%
        else:
            assert r["distinct_count"] == dc  # untipped ⇒ exact, by contract
            assert threshold == -1 or dc <= threshold
