"""Streaming index ingestion: a foreachBatch-maintained persisted
index must return bit-identical BM25 results to one batch-built over
the concatenated corpus, and a replayed micro-batch must be a no-op
(the exactly-once contract rides append_to_index's idempotency)."""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.postings import (
    build_index,
    read_index,
)
from elasticsearch_approx_plugin_spark.streaming.indexing import streaming_index


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"doc {i} " + " ".join(["hash", "join", "scan", "table"][: 1 + i % 4]))
        for i in range(30)
    ]
    return (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", tokenize_ws("text").alias("tokens"))
    )


def _stream_batches(spark, corpus, tmp, n_batches=3):
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    for i in range(n_batches):
        bdir = os.path.join(tmp, f"w{i}")
        corpus.filter(F.col("doc_id") % n_batches == i).coalesce(1).write.parquet(bdir)
        (part,) = glob.glob(f"{bdir}/part-*.parquet")
        dst = os.path.join(src, f"batch-{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_600_000_000 + i * 100,) * 2)
    return (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_stream_built_index_scores_like_batch(spark, corpus, tmp_path):
    stream = _stream_batches(spark, corpus, str(tmp_path / "in"))
    idx_path = str(tmp_path / "idx")
    q = streaming_index(
        stream, idx_path, str(tmp_path / "ckpt"), range_bits=2, n_buckets=4,
        query_name="stream_index_test",
    )
    q.awaitTermination()
    got = sorted(
        map(
            tuple,
            score_queries(
                read_index(spark, idx_path), [(0, ["hash", "table"])], 10
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, score_queries(build_index(corpus, range_bits=2), [(0, ["hash", "table"])], 10).collect())
    )
    assert got == want and got
    # three micro-batches: one bootstrap + two appends
    with open(os.path.join(idx_path, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest.get("appends", [])) == 2


def test_replayed_batch_is_noop(spark, corpus, tmp_path):
    stream = _stream_batches(spark, corpus, str(tmp_path / "in"))
    idx_path = str(tmp_path / "idx")
    streaming_index(
        stream, idx_path, str(tmp_path / "ckpt"), range_bits=2, n_buckets=4,
        query_name="stream_index_replay",
    ).awaitTermination()
    before = read_index(spark, idx_path)
    # simulate a post-failure replay: re-run the same batches with a
    # FRESH checkpoint (Spark will re-deliver everything); the
    # idempotent sink must not double-count
    stream2 = _stream_batches(spark, corpus, str(tmp_path / "in2"))
    streaming_index(
        stream2, idx_path, str(tmp_path / "ckpt2"), range_bits=2, n_buckets=4,
        query_name="stream_index_replay2",
    ).awaitTermination()
    after = read_index(spark, idx_path)
    assert after.n_docs == before.n_docs == 30
    assert after.avgdl == before.avgdl
    got = score_queries(after, [(0, ["hash", "table"])], 10).collect()
    want = score_queries(before, [(0, ["hash", "table"])], 10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
