"""Structured Streaming exact dedup — continuous-ingest duplicate
dropping, the streaming twin of ``operators.dedup.dedup_exact``.

The reference engine is batch/query-time only (SURVEY.md §2.2
"Streaming: none"); this is the forward-looking piece a continuous
training-data ingest needs: as document batches arrive, drop any whose
content digest was already admitted, exactly once, across micro-batch
boundaries.

Two state regimes, chosen by whether an event-time column is given:

- **global** (``event_time=None``): ``dropDuplicates`` on the digest —
  state is the full seen-digest set, the strict equivalent of batch
  ``dedup_exact`` over the concatenation of all batches. Right for
  bounded backfills (availableNow) or corpora whose distinct count
  fits state storage (RocksDB state store on a real cluster; a digest
  is 32 bytes — 10^9 distinct docs ≈ 32 GB spread over executors).
- **windowed** (``event_time="ts"``): ``dropDuplicatesWithinWatermark``
  — digests expire once they fall behind the watermark, bounding state
  by ingest rate × horizon instead of corpus size. Right for unbounded
  24/7 ingest where a re-crawled duplicate arrives within hours, the
  common production shape at 100 TB/day.

Representative choice within a micro-batch is first-arrival (Spark's
dropDuplicates contract) — order across partitions is not defined, so
downstream consumers key on the digest, not on which physical row
survived (the batch operator's min-id tie-break needs a global group
and has no incremental analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_COL = "digest"


def streaming_dedup_exact(
    stream: DataFrame,
    text_field: str,
    event_time: str | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """First-occurrence-wins exact dedup across micro-batches.

    Returns the input rows that survive, plus a ``digest`` column
    (md5 of ``text_field`` — the same key as batch ``dedup_exact``,
    so a batch job and the stream agree on what "duplicate" means).
    Append output mode; one row per distinct digest ever admitted.
    """
    hashed = stream.withColumn(DIGEST_COL, F.md5(F.col(text_field)))
    if event_time is None:
        return hashed.dropDuplicates([DIGEST_COL])
    wm = hashed.withColumn("__ts", F.col(event_time).cast("timestamp")).withWatermark(
        "__ts", watermark
    )
    return wm.dropDuplicatesWithinWatermark([DIGEST_COL]).drop("__ts")
