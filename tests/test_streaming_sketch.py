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
