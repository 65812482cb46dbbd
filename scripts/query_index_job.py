"""spark-submit entry point: BM25 top-k queries against a persisted index.

    spark-submit --py-files <zip> scripts/query_index_job.py \
        --index /path/to/index --k 10 --query "hash join" --query "btree scan"

Prints one JSON line per query with its top-k (doc_id, score) and a
summary line with QPS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_approx_plugin_spark.session import get_spark
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries, warm_index
from elasticsearch_approx_plugin_spark.operators.postings import read_index


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--query", action="append", help="space-separated terms")
    ap.add_argument("--queries-file", help="one query per line (batch serving shape)")
    ap.add_argument(
        "--prune",
        action="store_true",
        help="document-at-a-time block-max WAND (identical results; wins on "
        "large indexes / query batches)",
    )
    args = ap.parse_args()
    if not args.query and not args.queries_file:
        ap.error("need --query and/or --queries-file")

    spark = get_spark(app_name="query_index_job")
    index = read_index(spark, args.index)
    # ES-warmer analog: compile both scoring pipelines before the first
    # user-facing batch (one-time ~1.5-2 s of codegen otherwise lands
    # on the first query's latency)
    warm_index(index)
    texts = list(args.query or [])
    if args.queries_file:
        with open(args.queries_file) as f:
            texts += [line.strip() for line in f if line.strip()]
    queries = [(i, q.split()) for i, q in enumerate(texts)]
    t0 = time.time()
    rows = score_queries(index, queries, args.k, prune=args.prune).collect()
    wall = time.time() - t0
    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append([r["doc_id"], r["score"]])
    for qid, q in queries:
        print(json.dumps({"query": " ".join(q), "topk": by_q.get(qid, [])}))
    print(json.dumps({"n_queries": len(queries), "wall_sec": round(wall, 3),
                      "qps": round(len(queries) / wall, 2)}))


if __name__ == "__main__":
    main()
