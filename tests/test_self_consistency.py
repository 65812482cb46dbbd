"""Self-consistency layer — the reference's fourth test layer
(SURVEY.md §5): every facet bucket is INDEPENDENTLY re-queried with a
plain filtered query over the bucket's exact half-open time range and
cross-checked, mirroring ``CountingQueryResultChecker.java:41-61,
122-164`` (bucket end = next bucket's start, ``includeUpper(false)``),
``DistinctQueryResultChecker.java:42-77`` (overall distinct = distinct
over the union, not Σ buckets) and
``SlicedQueryResultChecker.java:59-89`` (per-label counts). The
concurrent test mirrors ``MediumDataSetMultiThreadedPerformanceTest``
(5-way concurrent queries) but ASSERTS result equality, which the
reference only logs."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.date_facet import date_facet


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _bucket_bounds(rows):
    """(start, end) per bucket — end is the bucket start + interval,
    making every range half-open [start, end) like the reference's
    includeUpper(false)."""
    return [(r["time"], r["time"] + dt.timedelta(days=1)) for r in rows]


def test_counting_bucket_requery(events):
    rows = date_facet(events, "ts", "day").collect()
    assert rows
    for (lo, hi), r in zip(_bucket_bounds(rows), rows):
        n = events.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))).count()
        assert n == r["count"], (lo, hi)


def test_distinct_bucket_requery_and_overall(events):
    out = date_facet(
        events, "ts", "day", distinct_field="user_id",
        distinct_method="exact", totals=True,
    ).collect()
    buckets = [r for r in out if r["time"] is not None]
    total = [r for r in out if r["time"] is None]
    assert len(total) == 1
    for (lo, hi), r in zip(_bucket_bounds(buckets), buckets):
        sub = events.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        got = sub.agg(
            F.count("user_id").alias("c"), F.countDistinct("user_id").alias("d")
        ).collect()[0]
        assert (got["c"], got["d"]) == (r["count"], r["distinct_count"]), (lo, hi)
    # facet-level distinct is distinct over the WHOLE result (a merge,
    # not a sum of buckets — InternalDistinctFacet.java:188-236)
    overall = events.agg(F.countDistinct("user_id")).collect()[0][0]
    assert total[0]["distinct_count"] == overall
    assert overall < sum(r["distinct_count"] for r in buckets)  # Σ would be wrong


def test_sliced_bucket_requery(events):
    rows = date_facet(events, "ts", "day", slice_field="event_type").collect()
    assert rows
    for r in rows:
        lo = r["time"]
        hi = lo + dt.timedelta(days=1)
        n = events.filter(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(hi))
            & (F.col("event_type") == r["term"])
        ).count()
        assert n == r["count"], (lo, r["term"])


def test_wand_churn_per_bucket_self_consistency(spark, tmp_path):
    """The ``RandomizedApproxReadWriteTest`` analog for the CRUD
    surface (VERDICT r3 stretch): a randomized append / delete /
    resurrect / compact sequence, and at EVERY index state

    1. block-max WAND (prune=True) is rank-identical to the exhaustive
       scorer, and
    2. the result re-derives from independent per-slice re-queries: doc
       ranges partition documents, so scoring each ``range_id % 4``
       slice separately (its own jobs, fresh caches) and re-ranking the
       union must reproduce the global top-k exactly — the external
       re-check of the partial/merge contract, like the reference's
       per-bucket facet re-queries above.
    """
    import dataclasses
    from functools import reduce

    import numpy as np

    from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_code
    from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
    from elasticsearch_approx_plugin_spark.operators.postings import (
        append_to_index,
        build_index,
        compact_index,
        delete_from_index,
        read_index,
        write_index,
    )
    from elasticsearch_approx_plugin_spark.sources.corpus import generate_corpus

    toks = generate_corpus(spark, 700).select(
        F.xxhash64("repo", "path", "commit")
        .bitwiseAND(F.lit((1 << 63) - 1))
        .alias("doc_id"),
        tokenize_code("content").alias("tokens"),
    ).persist()
    all_ids = sorted(r["doc_id"] for r in toks.select("doc_id").collect())
    rng = np.random.default_rng(7)
    qs = [
        (0, ["def", "class"]),
        (1, ["import", "return"]),
        (2, ["merge", "sort", "scan"]),
        (3, ["table"]),
    ]

    path = str(tmp_path / "churn")
    write_index(
        build_index(
            toks.filter(F.col("doc_id").isin(all_ids[:500])), range_bits=57
        ),
        path,
        n_buckets=4,
    )

    def check(label):
        idx = read_index(spark, path)
        a = sorted(tuple(r) for r in score_queries(idx, qs, 10).collect())
        b = sorted(tuple(r) for r in score_queries(idx, qs, 10, prune=True).collect())
        assert b == a, label
        parts = []
        for s in range(4):
            sub = dataclasses.replace(
                idx,
                postings=idx.postings.filter(
                    F.pmod(F.col("range_id"), F.lit(4)) == s
                ),
                term_cache={},
                tomb_cache=[],
            )
            parts.append(
                score_queries(sub, qs, 10).select("query_id", "doc_id", "score")
            )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        merged = (
            reduce(lambda x, y: x.unionByName(y), parts)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 10)
        )
        c = sorted(tuple(r) for r in merged.collect())
        assert c == a, f"{label}: per-slice re-query diverged"

    check("fresh")
    live = set(all_ids[:500])
    unused = set(all_ids[500:])
    for rnd in range(2):
        batch = set(rng.choice(sorted(unused), 80, replace=False).tolist())
        append_to_index(spark, path, toks.filter(F.col("doc_id").isin(list(batch))))
        live |= batch
        unused -= batch
        check(f"appended-{rnd}")
        victims = sorted(rng.choice(sorted(live), 60, replace=False).tolist())
        delete_from_index(spark, path, victims)
        check(f"deleted-{rnd}")
        # resurrect half via re-append, then compact away the rest
        revive = victims[:30]
        append_to_index(spark, path, toks.filter(F.col("doc_id").isin(revive)))
        check(f"resurrected-{rnd}")
        compact_index(spark, path)
        live -= set(victims[30:])
        check(f"compacted-{rnd}")
    toks.unpersist()


def test_concurrent_facets_identical(events):
    """Five facet queries of different modes running concurrently on
    the shared SparkSession return exactly what they return serially."""
    from concurrent.futures import ThreadPoolExecutor

    jobs = {
        "counting": lambda: date_facet(events, "ts", "hour"),
        "sliced": lambda: date_facet(events, "ts", "day", slice_field="event_type"),
        "distinct_exact": lambda: date_facet(
            events, "ts", "day", distinct_field="user_id", distinct_method="exact"
        ),
        "hybrid": lambda: date_facet(
            events, "ts", "day", distinct_field="user_id",
            exact_threshold=1000, distinct_method="hybrid",
        ),
        "tv24h": lambda: date_facet(events, "ts", "24h"),
    }
    serial = {k: sorted(map(tuple, f().collect())) for k, f in jobs.items()}
    with ThreadPoolExecutor(max_workers=5) as ex:
        for _ in range(2):  # two concurrent waves
            futs = {k: ex.submit(lambda f=f: sorted(map(tuple, f().collect()))) for k, f in jobs.items()}
            for k, fut in futs.items():
                assert fut.result() == serial[k], k
