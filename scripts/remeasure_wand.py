"""Re-measure bm25_wand_exhaustive / bm25_wand_pruned on a
probe-bracketed window (VERDICT r5 #6).

Round 5's driver bench read 4.49 → 5.46 s exhaustive (+22%) against an
otherwise improving round. This isolates the two WAND rows from the
rest of the suite, runs REPS timed repetitions of each, and brackets
every rep with the same ~3-s raw-CPU capacity probe the driver bench
uses, so a drift-contaminated rep is machine-visible. Prints one JSON
line; interpretation goes to BENCH.md.

Usage: python scripts/remeasure_wand.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _suite_capacity_probe, _timed, CPUS, N_BM25_QUERIES  # noqa: E402
from elasticsearch_approx_plugin_spark.session import get_spark  # noqa: E402
from elasticsearch_approx_plugin_spark.operators.postings import build_index  # noqa: E402
from elasticsearch_approx_plugin_spark.operators.bm25 import (  # noqa: E402
    score_queries,
    warm_index,
)
from elasticsearch_approx_plugin_spark.sources.corpus import generate_corpus  # noqa: E402
from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_code  # noqa: E402

REPS = 3


def main() -> None:
    probes = [round(_suite_capacity_probe() / 1e6, 1)]
    spark = get_spark(app_name="wand_remeasure", master=f"local[{CPUS}]")
    # identical setup to bench.py's WAND section: 20k-file Zipf-vocab
    # corpus, 256 hash ranges, 2-rare+1-hot query mix, uncached terms
    wcorpus = generate_corpus(spark, 20000)
    wtoks = wcorpus.select(
        F.xxhash64("repo", "path", "commit")
        .bitwiseAND(F.lit((1 << 63) - 1))
        .alias("doc_id"),
        tokenize_code("content").alias("tokens"),
    ).persist()
    fine = build_index(wtoks, range_bits=55)
    fine.postings = fine.postings.persist()
    fine.dictionary = fine.dictionary.persist()
    fine.postings.count()
    warm_index(fine, warm_terms=None)
    dict_rows = (
        fine.dictionary.filter(~F.col("term").startswith("uniq_"))
        .orderBy(F.asc("df"), "term")
        .collect()
    )
    rare = [r["term"] for r in dict_rows[:400]]
    hot = [r["term"] for r in dict_rows[-50:]]
    rngp = np.random.default_rng(13)
    qs_mix = [
        (
            i,
            [rare[int(j)] for j in rngp.integers(0, len(rare), 2)]
            + [hot[int(rngp.integers(0, len(hot)))]],
        )
        for i in range(N_BM25_QUERIES)
    ]
    exhaustive, pruned = [], []
    for _ in range(REPS):
        fine.term_cache.clear()
        t, _ = _timed(lambda: score_queries(fine, qs_mix, 10).count())
        exhaustive.append(round(t, 3))
        probes.append(round(_suite_capacity_probe() / 1e6, 1))
        fine.term_cache.clear()
        t, _ = _timed(lambda: score_queries(fine, qs_mix, 10, prune=True).count())
        pruned.append(round(t, 3))
        probes.append(round(_suite_capacity_probe() / 1e6, 1))
    stats: dict = {}
    score_queries(fine, qs_mix, 10, prune=True, stats=stats).count()
    spark.stop()
    print(json.dumps({
        "wand_exhaustive_sec": exhaustive,
        "wand_pruned_sec": pruned,
        "skip_rate": round(stats.get("skip_rate", 0.0), 4),
        "capacity_probes_mops": probes,
        "reference_r4": {"exhaustive": 4.49, "pruned": 2.65},
        "reference_r5": {"exhaustive": 5.46, "pruned": 3.03},
    }))


if __name__ == "__main__":
    main()
