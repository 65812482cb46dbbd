"""Corpus generator invariants, query-spec dataclasses, streaming facet."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.plans import DateFacetQuery, TermListQuery
from elasticsearch_approx_plugin_spark.sources.corpus import (
    assert_sha_ok,
    content_for_row,
    generate_corpus,
    tokens_for_row,
)
from elasticsearch_approx_plugin_spark.streaming.facets import streaming_date_facet


def test_corpus_deterministic_across_parallelism(spark):
    a = generate_corpus(spark, 100, parallelism=1).orderBy("commit").collect()
    b = generate_corpus(spark, 100, parallelism=7).orderBy("commit").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_corpus_sha_invariant_and_ground_truth(spark):
    df = generate_corpus(spark, 50)
    assert_sha_ok(df)  # input_hint invariant: sha256(content) per row
    rows = {r["commit"]: r for r in df.collect()}
    # closed-form ground truth: driver-side token list == spark content
    for i in [0, 7, 49]:
        content = content_for_row(i)
        assert content.split() == tokens_for_row(i)
        assert any(r["content"] == content for r in rows.values())
    # per-row unique token ⇒ closed-form distinct count
    uniq = df.select(F.explode(F.split("content", r"\s+")).alias("t")).filter(
        F.col("t").startswith("uniq_")
    )
    assert uniq.distinct().count() == 50


def test_corpus_sha_detects_corruption(spark):
    df = generate_corpus(spark, 10).withColumn(
        "content", F.concat(F.col("content"), F.lit("x"))
    )
    with pytest.raises(ValueError, match="sha256 mismatch"):
        assert_sha_ok(df)


def test_date_facet_query_spec(spark, sf_dir_med):
    events = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    spec = DateFacetQuery("ts", "day", slice_field="event_type", filter="value > 100")
    got = {(r["time"], r["term"]): r["count"] for r in spec.run(events).collect()}
    exp = {
        (r["time"], r["term"]): r["count"]
        for r in events.filter("value > 100")
        .groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("time"),
            F.col("event_type").alias("term"),
        )
        .count()
        .collect()
    }
    assert got == exp


def test_term_list_query_spec(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["term"] for r in TermListQuery("lang").run(docs).collect()}
    exp = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert got == exp


def test_streaming_date_facet_matches_batch(spark, sf_dir, tmp_path):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "stream_src")
    batch.write.mode("overwrite").parquet(src)  # stream source must be a dir
    stream = spark.readStream.schema(batch.schema).parquet(src)
    agg = streaming_date_facet(stream, "ts", "hour", slice_field="event_type")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("facet_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["time"], r["term"]): r["cnt"]
        for r in spark.sql("SELECT * FROM facet_out").collect()
    }
    exp = {
        (r["time"], r["term"]): r["cnt"]
        for r in batch.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("time"),
            F.col("event_type").alias("term"),
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == exp


def test_with_sha_enforced_read_path_guard(spark):
    """The inline read-path guard passes clean rows untouched and
    fails the task on the first corrupted row (no second scan)."""
    from elasticsearch_approx_plugin_spark.sources.corpus import with_sha_enforced

    clean = generate_corpus(spark, 50)
    assert with_sha_enforced(clean).count() == 50
    # content round-trips unmodified through the guard
    a = clean.orderBy("commit").select("content").first()[0]
    b = with_sha_enforced(clean).orderBy("commit").select("content").first()[0]
    assert a == b

    corrupted = clean.withColumn(
        "content",
        F.when(F.col("repo") == "org1/repo1", F.concat("content", F.lit("X"))).otherwise(
            F.col("content")
        ),
    )
    with pytest.raises(Exception, match="sha256 mismatch"):
        with_sha_enforced(corrupted).select(F.length("content").alias("l")).agg(
            F.sum("l")
        ).collect()


@pytest.fixture(scope="module")
def nested_events(spark, sf_dir_med):
    """events re-shaped as parent docs with an array<struct> child
    scope — the flat-DataFrame analog of an ES nested mapping. One
    parent per user; ``actions`` holds that user's events."""
    events = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    parents = events.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_type", F.struct("value").alias("meta")))
        ).alias("actions")
    )
    return events, parents


def test_nested_facet_equals_flat(nested_events):
    """DateFacetBuilder.nested (DateFacetBuilder.java:283-296): a facet
    over the nested scope counts every nested object whose parent
    matches — with match_all, identical to the flat facet over the
    un-nested table."""
    events, parents = nested_events
    nested = DateFacetQuery(
        "actions.ts", "day", slice_field="actions.event_type", nested="actions"
    ).run(parents)
    flat = DateFacetQuery("ts", "day", slice_field="event_type").run(events)
    key = lambda rows: {(r["time"], r["term"]): r["count"] for r in rows}
    assert key(nested.collect()) == key(flat.collect())


def test_nested_facet_root_filter_scope(nested_events):
    """facetFilter matches in the ROOT scope: a matching parent brings
    ALL its nested objects into the facet (the reference's block-join
    semantics), not just the nested rows that would match."""
    events, parents = nested_events
    nested = DateFacetQuery(
        "actions.ts",
        "day",
        distinct_field="actions.event_type",
        distinct_method="exact",
        nested="actions",
        filter="user_id % 5 = 0",
    ).run(parents)
    flat = DateFacetQuery("ts", "day", distinct_field="event_type", distinct_method="exact").run(
        events.filter("user_id % 5 = 0")
    )
    key = lambda rows: {r["time"]: (r["count"], r["distinct_count"]) for r in rows}
    assert key(nested.collect()) == key(flat.collect())


def test_nested_deep_path_and_errors(nested_events):
    events, parents = nested_events
    # dot path below the first level ("actions.meta.value")
    deep = DateFacetQuery(
        "actions.ts", "day", value_field="actions.meta.value", nested="actions"
    ).run(parents)
    flat = DateFacetQuery("ts", "day", value_field="value").run(events)
    key = lambda rows: {r["time"]: r["count"] for r in rows}
    assert key(deep.collect()) == key(flat.collect())
    # no faceted field under the path → error, not a silent flat facet
    with pytest.raises(ValueError, match="no faceted field"):
        DateFacetQuery("ts", "day", nested="actions").run(parents)


def test_nested_term_list(nested_events):
    """nested/global come from ES 0.90's base FacetBuilder, so the
    term-list facet inherits them: a nested term list over the child
    scope equals the flat term list over the un-nested table."""
    events, parents = nested_events
    nested = TermListQuery("actions.event_type", nested="actions").run(parents)
    flat = TermListQuery("event_type").run(events)
    terms = lambda rows: {r["term"] for r in rows}
    assert terms(nested.collect()) == terms(flat.collect())


def test_parse_request_nested_and_global_siblings(spark):
    """The builder emits ``nested`` / ``global`` / ``facet_filter`` as
    facet-level siblings of the ``date_facet`` body; ``facet_filter``
    is lowered onto ``spec.filter`` (round 5 — see
    test_golden_replay.test_facet_filter_replay for semantics), and an
    unsupported filter shape still raises rather than being dropped.
    (Needs the ``spark`` fixture: lowering builds real ``Column``s.)"""
    from elasticsearch_approx_plugin_spark.plans.request_parser import parse_request

    specs = parse_request(
        {
            "facets": {
                "histo": {
                    "date_facet": {"field": "actions.ts", "interval": "day"},
                    "nested": "actions",
                    "global": True,
                }
            }
        }
    )
    q = specs["histo"]
    assert q.nested == "actions" and q.global_facet is True
    assert q.key_field == "actions.ts"
    specs = parse_request(
        {
            "facets": {
                "h": {
                    "date_facet": {"field": "ts", "interval": "day"},
                    "facet_filter": {"term": {"x": 1}},
                }
            }
        }
    )
    assert specs["h"].filter is not None  # lowered, not dropped
    with pytest.raises(ValueError, match="unsupported filter type"):
        parse_request(
            {
                "facets": {
                    "h": {
                        "date_facet": {"field": "ts", "interval": "day"},
                        "facet_filter": {"fuzzy": {"x": "y"}},
                    }
                }
            }
        )


def test_global_facet_ignores_enclosing_filter(spark, sf_dir_med):
    """DateFacetQuery(global_facet=True) facets the UNFILTERED table
    (the reference's `global` option, DateFacetBuilder.java:261-269),
    with `filter` still acting as the facetFilter."""
    events = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    narrowed = events.filter(F.col("event_type") == "click")

    q = DateFacetQuery("ts", "day", global_facet=True)
    got = q.run(narrowed, global_df=events).agg(F.sum("count")).first()[0]
    assert got == events.count()

    q2 = DateFacetQuery("ts", "day")
    got2 = q2.run(narrowed).agg(F.sum("count")).first()[0]
    assert got2 == narrowed.count() < got

    with pytest.raises(ValueError, match="global_df"):
        DateFacetQuery("ts", "day", global_facet=True).run(narrowed)


def test_job_scripts_end_to_end(tmp_path):
    """The spark-submit entry points drive the full lifecycle:
    bootstrap (--append on empty), append, WAND query — each a real
    subprocess, the deployment surface the north rule names."""
    import json
    import subprocess
    import sys

    root = "/root/repo"
    out = str(tmp_path / "idx")

    def run(*args):
        proc = subprocess.run(
            [sys.executable, *args], capture_output=True, text=True, cwd=root
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]

    r1 = run(f"{root}/scripts/build_index_job.py", "--generate", "400",
             "--output", out, "--n-buckets", "2", "--range-bits", "57", "--append")
    assert r1[-1]["n_docs"] == 400
    r2 = run(f"{root}/scripts/build_index_job.py", "--generate", "400",
             "--output", out, "--n-buckets", "2", "--range-bits", "57", "--append")
    # same 400 generated docs again → same hash ids → the retried append
    # short-circuits (fingerprint replay guard): nothing double-counts
    assert r2[-1]["appended"] is True
    assert r2[-1]["n_docs"] == 400
    r3 = run(f"{root}/scripts/query_index_job.py", "--index", out,
             "--query", "def class", "--prune", "--k", "3")
    assert len(r3[0]["topk"]) == 3
    assert r3[1]["n_queries"] == 1
    # maintenance job: delete the top doc, then compact — it must be
    # gone from results and n_docs must shrink
    victim = r3[0]["topk"][0][0]
    ids_file = str(tmp_path / "del.txt")
    with open(ids_file, "w") as f:
        f.write(f"{victim}\n")
    r4 = run(f"{root}/scripts/maintain_index_job.py", "--index", out,
             "--delete-ids-file", ids_file, "--compact")
    assert r4[-1]["compacted"] is True and r4[-1]["n_docs"] == 399
    r5 = run(f"{root}/scripts/query_index_job.py", "--index", out,
             "--query", "def class", "--prune", "--k", "3")
    assert victim not in [t[0] for t in r5[0]["topk"]]
