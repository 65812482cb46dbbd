"""Profile the cold score_queries path: where does cold−warm go?
Usage: python scripts/profile_bm25_cold.py [sf_dir]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.session import get_spark
from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries, _idf
from elasticsearch_approx_plugin_spark.operators.postings import build_index

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_bm25", master="local[32]")

docs = spark.read.parquet(f"{sf}/documents.parquet")
toks = docs.select("doc_id", tokenize_ws("text").alias("tokens"))
index = build_index(toks, range_bits=9)
index.postings = index.postings.persist()
index.dictionary = index.dictionary.persist()
index.postings.count()

terms_all = [
    r["term"] for r in index.dictionary.orderBy(F.desc("df"), "term").limit(200).collect()
]
rng = np.random.default_rng(42)
qs = [(qid, [terms_all[int(i)] for i in rng.integers(0, len(terms_all), 1 + qid % 4)])
      for qid in range(50)]

terms = sorted({t for _, ts in qs for t in ts})

# piece 1: the dictionary collect (the only driver job pre-scoring when cold)
t0 = time.time()
rows = index.dictionary.filter(F.col("term").isin(terms)).select("term", "df").collect()
t_collect = time.time() - t0

# piece 2: createDataFrame of the query table
idf = {r["term"]: _idf(index.n_docs, r["df"]) for r in rows}
t0 = time.time()
qt = spark.createDataFrame(
    [(qid, t, idf.get(t, 0.0)) for qid, ts in qs for t in set(ts)],
    "query_id long, term string, idf double",
)
t_createdf = time.time() - t0

# warmer probe: does a 1-term scoring call pre-compile the pipeline so
# the first real batch runs at warm speed?
if os.environ.get("WARM_PROBE") == "1":
    t0 = time.time()
    score_queries(index, [(0, [terms_all[0]])], 10).count()
    print(f"warm probe: {time.time() - t0:.3f}s")
    index.term_cache.clear()  # isolate plan-compile warmup from term cache

# now the real cold call (fresh cache state — index.term_cache is empty? no,
# _frozen-style collect above did NOT populate index.term_cache)
print("term_cache entries before cold call:", len(index.term_cache))
t0 = time.time()
score_queries(index, qs, 10).count()
t_cold = time.time() - t0
t0 = time.time()
score_queries(index, qs, 10).count()
t_warm1 = time.time() - t0
t0 = time.time()
score_queries(index, qs, 10).count()
t_warm2 = time.time() - t0

print(f"dict collect alone: {t_collect:.3f}s  createDataFrame: {t_createdf:.3f}s")
print(f"cold: {t_cold:.3f}s  warm1: {t_warm1:.3f}s  warm2: {t_warm2:.3f}s")
print(f"cold-warm1: {t_cold - t_warm1:.3f}s")
spark.stop()
