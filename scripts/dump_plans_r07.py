"""Dump .explain('formatted') for every query the round-7 optimization
touched, mirroring bench.py's query shapes at sf0.1.

Usage: python scripts/dump_plans_r07.py <out_dir> [suffix]
Writes <out_dir>/<query>_<suffix>.txt (suffix: before/after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.session import get_spark
from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries, warm_index
from elasticsearch_approx_plugin_spark.operators.postings import build_index

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix = sys.argv[1], (sys.argv[2] if len(sys.argv) > 2 else "after")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans_r07", master="local[8]")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select("doc_id", tokenize_ws("text").alias("tokens"))
    events = spark.read.parquet(f"{SF}/events.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    index = build_index(toks, range_bits=9)
    index.postings = index.postings.persist()
    index.dictionary = index.dictionary.persist()
    index.postings.count()
    warm_index(index, prune=False)

    terms = [
        r["term"]
        for r in index.dictionary.orderBy(F.desc("df"), "term").limit(200).collect()
    ]
    rng = np.random.default_rng(42)
    qs = [
        (qid, [terms[int(i)] for i in rng.integers(0, len(terms), 1 + qid % 4)])
        for qid in range(50)
    ]

    plans = {}
    plans["index_build_postings"] = build_index(toks, range_bits=9).postings
    plans["bm25_topk_50q"] = score_queries(index, qs, 10)
    plans["bm25_wand_pruned"] = score_queries(index, qs, 10, prune=True)

    from elasticsearch_approx_plugin_spark.operators.phrase import phrase_topk
    plans["phrase_topk"] = phrase_topk(
        index, toks,
        [(0, ["table", "hash"]), (1, ["slow", "hash", "batch"]), (2, ["table", "table"])],
        10,
    )
    from elasticsearch_approx_plugin_spark.operators.span import span_near_topk
    plans["span_near"] = span_near_topk(
        index, toks, [(0, ["table", "hash"]), (1, ["scan", "merge", "sort"])],
        10, slop=2, in_order=False,
    )
    from elasticsearch_approx_plugin_spark.operators.query_string import query_string_topk
    plans["query_string"] = query_string_topk(index, toks, '+"table hash" dup -stream', 10)
    from elasticsearch_approx_plugin_spark.operators.multi_match import multi_match_topk
    src_index = build_index(
        docs.select("doc_id", tokenize_ws("source").alias("tokens")), range_bits=9
    )
    plans["multi_match"] = multi_match_topk(
        {"text": index, "source": src_index},
        [(0, ["table", "src1"]), (1, ["hash", "join"])], 10, tie_breaker=0.3,
    )
    from elasticsearch_approx_plugin_spark.operators.rescore import rescore_topk
    plans["rescore_topk"] = rescore_topk(
        index, toks, [(0, ["hash", "join"]), (1, ["table", "scan"])],
        {0: ["table", "hash"], 1: ["table", "table"]},
        k=10, window_size=25, rescore_query_weight=2.0, rescore_type="match_phrase",
    )
    from elasticsearch_approx_plugin_spark.operators.function_score import function_score_topk
    plans["function_score"] = function_score_topk(
        index, docs, [(0, ["hash", "join"]), (1, ["table", "scan"])],
        [{"gauss": {"field": "n_chars", "origin": 150.0, "scale": 50.0}}], k=10,
    )
    from elasticsearch_approx_plugin_spark.operators.percolate import percolate, register_queries
    reg = register_queries(
        spark,
        [(0, ["table", "hash"], "and", None), (1, ["dup", "window", "spark"], "or", 2),
         (2, ["slow", "batch"], "or", None)],
    )
    plans["percolate"] = percolate(toks, reg)
    from elasticsearch_approx_plugin_spark.operators.text_analysis import token_chunk
    plans["token_chunk"] = token_chunk(docs, max_tokens=16, stride=8)
    from elasticsearch_approx_plugin_spark.operators.dedup import minhash_lsh_dedup
    # minhash materializes eagerly; capture the plan of the pre-checkpoint
    # pipeline via the returned (checkpointed) frame's small plan plus a
    # note — skip here, covered by profiler evidence.
    from elasticsearch_approx_plugin_spark.operators.ann import cosine_topk, rrf_fuse
    qvecs = [
        (r["vec_id"], list(map(float, r["embedding"])))
        for r in emb.filter("vec_id < 10").collect()
    ]
    plans["hybrid_rrf"] = rrf_fuse(
        [score_queries(index, qs[:10], 10),
         cosine_topk(emb, qvecs, 10).withColumnRenamed("vec_id", "doc_id")]
    )
    from elasticsearch_approx_plugin_spark.plans.search import search_topk
    plans["search_request"] = search_topk(
        index,
        {"query": {"match": {"text": "hash join scan"}}, "size": 10,
         "highlight": {"fragment_size": 60}},
        docs=docs,
    )
    from elasticsearch_approx_plugin_spark.operators.facets import range_facet
    plans["range_facet"] = range_facet(
        events, "value", [(None, 25.0), (10.0, 100.0), (250.0, None)]
    )

    for name, df in plans.items():
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
