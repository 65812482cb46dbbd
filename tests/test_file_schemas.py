"""The explicit read schemas passed to ``spark.read.schema(...)`` in
postings.py (round-7: skipping the per-read parquet schema-inference
job) MUST equal what write_index / append / delete actually write —
a drift would silently null out mis-typed columns on read."""

from __future__ import annotations

from elasticsearch_approx_plugin_spark.operators.postings import (
    DICTIONARY_FILE_SCHEMA,
    DOC_STATS_FILE_SCHEMA,
    POSTINGS_FILE_SCHEMA,
    TOMBSTONES_FILE_SCHEMA,
    append_to_index,
    build_index,
    delete_from_index,
    write_index,
)


def test_on_disk_schemas_match_declared(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["b", "c"]), (3, ["c", "d"])],
        "doc_id long, tokens array<string>",
    )
    path = str(tmp_path / "ix")
    write_index(build_index(docs, range_bits=9), path, n_buckets=2)
    delete_from_index(spark, path, [1])
    delta = spark.createDataFrame(
        [(4, ["d", "e"])], "doc_id long, tokens array<string>"
    )
    append_to_index(spark, path, delta)

    declared = {
        "postings": POSTINGS_FILE_SCHEMA,
        "dictionary": DICTIONARY_FILE_SCHEMA,
        "doc_stats": DOC_STATS_FILE_SCHEMA,
        "tombstones": TOMBSTONES_FILE_SCHEMA,
    }
    for sub, ddl in declared.items():
        inferred = spark.read.parquet(f"{path}/{sub}").schema
        want = spark.createDataFrame([], ddl).schema
        assert inferred == want, f"{sub}: on-disk {inferred} != declared {want}"
