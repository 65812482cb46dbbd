"""Stateful streaming CountThenEstimate — the reference's distinct
facet as an incremental streaming aggregation.

``applyInPandasWithState`` keeps one serialized
:class:`~..functions.sketch.CountThenEstimate` per bucket (and slice):
each micro-batch offers its pre-hashed values into the state and emits
the bucket's updated (cnt, distinct_cnt, tipped) row. Because the
sketch is a commutative monoid (exactly why the reference could merge
shard facets, ``InternalDistinctFacet.java:130-146`` in
/root/reference), the result after any sequence of micro-batches
equals the batch aggregation over the union of the data.

State size is bounded the same way as in batch: exact sets tip to
fixed-size HLL registers past ``exact_threshold``.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.sketch import CountThenEstimate
from ..operators.date_facet import bucket_expr


def streaming_distinct_facet(
    stream: DataFrame,
    key_field: str,
    interval: str,
    distinct_field: str,
    slice_field: str | None = None,
    exact_threshold: int = 1000,
    rsd: float = 0.05,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-bucket streaming distinct counts with exact→HLL tipping.

    Output (update mode): ``time`` [, ``term``], ``cnt``,
    ``distinct_cnt``, ``tipped`` — one refreshed row per bucket per
    micro-batch that touched it.
    """
    b = bucket_expr(key_field, interval, key_type=stream.schema[key_field].dataType)
    src = (
        stream.filter(F.col(distinct_field).isNotNull())
        .withColumn("time", b)
        .withColumn("_h", F.xxhash64(distinct_field))
        .withWatermark("time", watermark)
    )
    keys = ["time"] + (["term"] if slice_field else [])
    if slice_field:
        src = src.withColumn("term", F.col(slice_field).cast("string"))

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = CountThenEstimate.from_bytes(bytes(state.get[0]))
        else:
            st = CountThenEstimate(exact_threshold, rsd)
        for pdf in pdfs:
            st.offer_hashes(pdf["_h"].to_numpy(dtype=np.int64).view(np.uint64))
        state.update((st.to_bytes(),))
        row: dict[str, Any] = {k: [v] for k, v in zip(keys, key)}
        row.update(
            {"cnt": [st.count], "distinct_cnt": [st.cardinality()], "tipped": [st.tipped]}
        )
        yield pd.DataFrame(row)

    out_schema = (
        "time timestamp, "
        + ("term string, " if slice_field else "")
        + "cnt long, distinct_cnt long, tipped boolean"
    )
    return src.groupBy(*keys).applyInPandasWithState(
        update, out_schema, "state binary", "update", GroupStateTimeout.NoTimeout
    )
