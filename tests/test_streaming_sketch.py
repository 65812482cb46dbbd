"""Incremental streaming CountThenEstimate equals the batch answer
after all micro-batches (monoid property end-to-end)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.streaming.sketch_state import (
    streaming_distinct_facet,
)


def test_streaming_distinct_matches_batch(spark, sf_dir, tmp_path):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    # two files → at least two micro-batches with maxFilesPerTrigger=1
    batch.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{src}/a.parquet")
    batch.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{src}/b.parquet")

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    agg = streaming_distinct_facet(
        stream, "ts", "day", "user_id", exact_threshold=-1
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("sketch_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode appends one refreshed row per touched bucket per batch;
    # the LAST row per bucket is the final state
    rows = spark.sql("SELECT * FROM sketch_out").collect()
    final = {}
    for r in rows:  # memory sink preserves batch order
        final[r["time"]] = (r["cnt"], r["distinct_cnt"], r["tipped"])
    exp = {
        r["time"]: (r["cnt"], r["dc"])
        for r in batch.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("time")
        )
        .agg(F.count("user_id").alias("cnt"), F.countDistinct("user_id").alias("dc"))
        .collect()
    }
    assert set(final) == set(exp)
    for t, (cnt, dc) in exp.items():
        g_cnt, g_dc, tipped = final[t]
        assert (g_cnt, g_dc) == (cnt, dc)
        assert not tipped  # threshold=-1 → exact forever


def test_streaming_dedup_exact_matches_batch(spark, sf_dir, tmp_path):
    """Continuous-ingest exact dedup: across micro-batches (including
    duplicates split BETWEEN batches) exactly one row per distinct
    digest survives — the same admitted set as batch dedup_exact over
    the concatenation."""
    from elasticsearch_approx_plugin_spark.streaming.dedup import (
        streaming_dedup_exact,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "dsrc")
    # batch b re-ships half of batch a's docs (cross-batch duplicates)
    # plus its own half, so dedup must remember digests across triggers
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{src}/a.parquet")
    docs.filter("doc_id % 2 = 1").union(
        docs.filter("doc_id % 4 = 0")
    ).coalesce(1).write.parquet(f"{src}/b.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        streaming_dedup_exact(stream, "text")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql("SELECT digest FROM dedup_out").collect()
    digests = [r["digest"] for r in got]
    assert len(digests) == len(set(digests))  # exactly-once per digest
    exp = {r["digest"] for r in docs.select(F.md5("text").alias("digest")).distinct().collect()}
    assert set(digests) == exp


def test_streaming_dedup_windowed_state_bound(spark, sf_dir, tmp_path):
    """The watermarked variant plans a DropDuplicatesWithinWatermark
    (bounded state) and still admits each digest once when duplicates
    arrive inside the horizon."""
    from elasticsearch_approx_plugin_spark.streaming.dedup import (
        streaming_dedup_exact,
    )

    docs = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type"
    )
    src = str(tmp_path / "wsrc")
    docs.coalesce(1).write.parquet(f"{src}/a.parquet")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_dedup_exact(stream, "event_type", event_time="ts", watermark="10 days")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT digest FROM dedup_wm_out").collect()
    digests = [r["digest"] for r in rows]
    assert len(digests) == len(set(digests))
    n_types = docs.select("event_type").distinct().count()
    assert len(digests) == n_types
