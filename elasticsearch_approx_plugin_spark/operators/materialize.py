"""Materialize facet DataFrames into the reference's external JSON
shape, so a client of the plugin can consume our results unchanged.

Shape (/root/reference — ``external/Constants.java:11-38``,
``TimePeriod.java:63-67``, ``Slice.java:48-52``, golden RESPONSE files):

    {"_type": "<counting|distinct|sliced|sliced_distinct>_date_facet",
     "count": <facet total>, ["distinct_count": <overall distinct>,]
     "entries": [
        {"time": <epoch ms>, "count": N, ["distinct_count": D,]
         ["slices": [{"term": ..., "count": N[, "distinct_count": D]}]]},
        ...chronological...]}

Facet ``_type`` strings match ``Internal*Facet.java`` TYPE constants.
Term lists: ``{"_type": "term_list", "entries": [term, ...]}``
(``InternalStringTermListFacet.java:84-93`` analog).

This is a result *formatter* for already-small facet outputs (bucket
counts, not raw data), so the collect here is by design — the heavy
lifting stayed distributed upstream.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_response(df: DataFrame, as_json: bool = False):
    """Render a ``date_facet(...)`` result (any mode, with or without
    ``totals=True``) into the reference's response dict/JSON.

    Epoch-ms entry labels are computed JVM-side (``unix_millis``)
    BEFORE collect: PySpark renders TimestampType in the driver's
    local timezone on collect, which would shift naive-UTC math by
    the driver's offset (ADVICE r1 #3)."""
    cols = set(df.columns)
    sliced = "term" in cols
    distinct = "distinct_count" in cols
    _type = (
        ("sliced_" if sliced else "")
        + ("distinct_" if distinct else "")
        + "date_facet"
    )
    if not sliced and not distinct:
        _type = "counting_date_facet"

    rows = df.withColumn(
        "__time_ms", F.unix_millis(F.col("time").cast("timestamp"))
    ).collect()
    total_row = [r for r in rows if r["time"] is None and (not sliced or r["term"] is None)]
    bucket_rows = [r for r in rows if r["time"] is not None]

    entries: list[dict[str, Any]] = []
    if sliced:
        by_time: dict[Any, dict[str, Any]] = {}
        for r in sorted(bucket_rows, key=lambda r: (r["__time_ms"], str(r["term"]))):
            e = by_time.setdefault(
                r["__time_ms"], {"time": r["__time_ms"], "count": 0, "slices": []}
            )
            s = {"term": r["term"], "count": r["count"]}
            if distinct:
                s["distinct_count"] = r["distinct_count"]
            e["slices"].append(s)
            e["count"] += r["count"]
        entries = list(by_time.values())
    else:
        for r in sorted(bucket_rows, key=lambda r: r["__time_ms"]):
            e = {"time": r["__time_ms"], "count": r["count"]}
            if distinct:
                e["distinct_count"] = r["distinct_count"]
            entries.append(e)

    out: dict[str, Any] = {"_type": _type, "count": sum(e["count"] for e in entries)}
    if total_row:
        out["count"] = total_row[0]["count"]
        if distinct:
            out["distinct_count"] = total_row[0]["distinct_count"]
    out["entries"] = entries
    return json.dumps(out) if as_json else out


def term_list_response(df: DataFrame, as_json: bool = False):
    out = {"_type": "term_list", "entries": [r["term"] for r in df.collect()]}
    return json.dumps(out) if as_json else out
