"""Corpus-hygiene operators (round 6): Gopher-style repetition
features/filter, C4-style cross-document line dedup, and benchmark
decontamination — hand-built corpora with known answers, plus the
north-rule partitioning-invariance probe."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.contamination import decontaminate
from elasticsearch_approx_plugin_spark.operators.dedup import line_dedup
from elasticsearch_approx_plugin_spark.operators.text_analysis import (
    add_repetition_features,
    repetition_filter,
    word_ngrams,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- word_ngrams ------------------------------------------------------------


def test_word_ngrams_basic_and_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["a", "b"]), (3, [])],
        "doc_id long, toks array<string>",
    )
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams(F.col("toks"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    # fewer than n tokens must yield [] — an unguarded sequence(1, size-n+1)
    # would DESCEND and fabricate grams
    assert got[2] == []
    assert got[3] == []


def test_word_ngrams_n1_is_identity_and_n0_raises(spark):
    df = spark.createDataFrame([(1, ["x", "y"])], "doc_id long, toks array<string>")
    assert df.select(word_ngrams(F.col("toks"), 1).alias("g")).first()["g"] == ["x", "y"]
    with pytest.raises(ValueError):
        word_ngrams(F.col("toks"), 0)


# -- repetition features / filter -------------------------------------------


def test_repetition_features_hand_corpus(spark):
    docs = _df(
        spark,
        [
            # 4 lines, lines 3+4 repeat line 1 -> dup_line_frac = 2/4
            (1, "a b\nc d\na b\na b"),
            # unique lines, but trigram stream repeats: tokens
            # a b c a b c a b -> 6 trigrams, distinct 3 -> 0.5
            (2, "a b c a\nb c a b"),
            (3, "p q r\ns t u"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in add_repetition_features(docs).collect()}
    assert got[1]["n_lines"] == 4 and got[1]["dup_line_frac"] == 0.5
    assert got[2]["dup_line_frac"] == 0.0 and got[2]["dup_ngram_frac"] == 0.5
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["dup_ngram_frac"] == 0.0


def test_repetition_filter_first_failing_rule_and_thresholds(spark):
    docs = _df(
        spark,
        [
            (1, "a b\na b\na b"),  # trips BOTH rules -> line rule wins (fixed order)
            (2, "a b c a\nb c a b"),  # trips only the ngram rule
            (3, "p q r s\nt u v w"),  # clean
        ],
    )
    got = {r["doc_id"]: (r["passes"], r["reject_reason"]) for r in repetition_filter(docs).collect()}
    assert got[1] == (False, "too_many_dup_lines")
    assert got[2] == (False, "too_many_dup_ngrams")
    assert got[3] == (True, None)
    # thresholds are overridable; unknown names rejected loudly
    relaxed = repetition_filter(docs, max_dup_line_frac=1.0, max_dup_ngram_frac=1.0)
    assert all(r["passes"] for r in relaxed.collect())
    with pytest.raises(ValueError):
        repetition_filter(docs, max_dup_lines=0.5)


# -- line dedup ---------------------------------------------------------------


def test_line_dedup_global_first_occurrence(spark):
    docs = _df(
        spark,
        [
            (1, "keep one\nshared line\nkeep two"),
            (2, "shared line\nonly in two\nshared line"),  # cross-doc + in-doc dup
            (3, "shared line"),  # fully duplicated doc survives as ''
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in line_dedup(docs).collect()}
    assert got[1]["text_dedup"] == "keep one\nshared line\nkeep two"
    assert got[1]["n_lines"] == 3 and got[1]["n_lines_kept"] == 3
    # doc 2: 'shared line' first occurred at (doc 1, pos 1) -> both copies drop
    assert got[2]["text_dedup"] == "only in two"
    assert got[2]["n_lines"] == 3 and got[2]["n_lines_kept"] == 1
    assert got[3]["text_dedup"] == "" and got[3]["n_lines_kept"] == 0


def test_line_dedup_preserves_order_and_is_partitioning_invariant(spark):
    rows = [(i, f"common header\nbody {i} alpha\nbody {i} beta") for i in range(1, 9)]
    docs = _df(spark, rows)
    base = sorted(tuple(r) for r in line_dedup(docs).collect())
    # north-rule determinism: same result under a different partitioning
    repart = sorted(tuple(r) for r in line_dedup(docs.repartition(7)).collect())
    assert base == repart
    got = dict((t[0], t[1]) for t in base)
    assert got[1] == "common header\nbody 1 alpha\nbody 1 beta"
    for i in range(2, 9):
        assert got[i] == f"body {i} alpha\nbody {i} beta"


# -- decontamination ----------------------------------------------------------


def test_decontaminate_counts_distinct_shared_ngrams(spark):
    train = _df(
        spark,
        [
            # contains the eval 4-gram 'the quick brown fox' TWICE ->
            # distinct-per-doc, counted once
            (1, "the quick brown fox says the quick brown fox"),
            (2, "entirely novel training text here"),
            # shares two different eval 4-grams
            (3, "the quick brown fox jumps over the lazy dog"),
        ],
    )
    ev = _df(spark, [(100, "the quick brown fox jumps over the lazy dog tonight")])
    got = {r["doc_id"]: (r["n_contaminated_ngrams"], r["contaminated"])
           for r in decontaminate(train, ev, n=4).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    # doc 3 shares every 4-gram of 'the quick brown fox jumps over the lazy dog': 6 grams
    assert got[3] == (6, True)


def test_decontaminate_shuffle_join_path_matches_broadcast(spark):
    train = _df(spark, [(i, f"alpha beta gamma delta doc {i}") for i in range(5)])
    ev = _df(spark, [(9, "alpha beta gamma delta")])
    a = sorted(tuple(r) for r in decontaminate(train, ev, n=4).collect())
    b = sorted(tuple(r) for r in decontaminate(train, ev, n=4, broadcast_eval=False).collect())
    assert a == b
    assert all(t[2] for t in a)  # every train doc contains the eval 4-gram
    with pytest.raises(ValueError):
        decontaminate(train, ev, n=0)


# -- stratified sampling (data mixing) ----------------------------------------


def test_stratified_sample_rates_and_nesting(spark):
    from elasticsearch_approx_plugin_spark.operators.sampling import (
        BUCKETS,
        _hash_bucket,
        stratified_sample,
    )

    rows = [(i, "web" if i % 2 else "code") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = stratified_sample(df, {"web": 0.5, "code": 1.0})
    got = {r["doc_id"] for r in kept.collect()}
    # exact semantics: bucket < fraction * BUCKETS per stratum
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", _hash_bucket("doc_id", 42).alias("b")).collect()
    }
    exp = {
        i
        for i, src in rows
        if buckets[i] < (BUCKETS // 2 if src == "web" else BUCKETS)
    }
    assert got == exp
    # nesting: raising web's rate only ADDS web rows
    more = {r["doc_id"] for r in stratified_sample(df, {"web": 0.8, "code": 1.0}).collect()}
    assert got <= more
    # unlisted strata follow default_fraction (0 -> dropped)
    assert {r["doc_id"] for r in stratified_sample(df, {"web": 1.0}).collect()} == {
        i for i, s in rows if s == "web"
    }


def test_stratified_sample_null_stratum_and_validation(spark):
    import pytest as _pytest

    from elasticsearch_approx_plugin_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(1, "web"), (2, None), (3, "web")], "doc_id long, source string"
    )
    # NULL stratum matches no CASE arm -> default_fraction applies
    kept = stratified_sample(df, {"web": 1.0}, default_fraction=1.0)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}
    kept0 = stratified_sample(df, {"web": 1.0}, default_fraction=0.0)
    assert {r["doc_id"] for r in kept0.collect()} == {1, 3}
    with _pytest.raises(ValueError):
        stratified_sample(df, {"web": 1.5})


# -- PII redaction ------------------------------------------------------------


def test_pii_redact_rewrites_and_counts(spark):
    from elasticsearch_approx_plugin_spark.operators.text_analysis import pii_redact

    df = _df(
        spark,
        [
            (1, "mail bob.smith+x@corp.example.com or 10.0.0.1 call +1 (555) 123-4567"),
            (2, "no pii here just words"),
            (3, "two mails a@b.io c@d.org and ip 192.168.1.255"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert got[1]["text_redacted"] == "mail <EMAIL> or <IPV4> call <PHONE>"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[2]["text_redacted"] == "no pii here just words"
    assert (got[3]["n_email"], got[3]["n_ipv4"]) == (2, 1)


def test_pii_redact_kinds_subset_and_validation(spark):
    import pytest as _pytest

    from elasticsearch_approx_plugin_spark.operators.text_analysis import pii_redact

    df = _df(spark, [(1, "a@b.io at 10.0.0.1")])
    r = pii_redact(df, kinds=("email",)).first()
    # only the requested kind is redacted or counted
    assert r["text_redacted"] == "<EMAIL> at 10.0.0.1"
    assert r.asDict().get("n_ipv4") is None
    with _pytest.raises(ValueError):
        pii_redact(df, kinds=("email", "ssn"))


# -- token chunking (sequence prep) -------------------------------------------


def test_token_chunk_window_math(spark):
    from elasticsearch_approx_plugin_spark.operators.text_analysis import token_chunk

    df = _df(spark, [(1, "t1 t2 t3 t4 t5 t6 t7"), (2, "a b"), (3, "")])
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in token_chunk(df, max_tokens=4, stride=2).collect()
    )
    assert rows == [
        (1, 0, "t1 t2 t3 t4", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t5 t6 t7", 3),  # short tail window kept
        (2, 0, "a b", 2),  # doc shorter than max -> one window
        # doc 3 has zero tokens -> zero chunks
    ]


def test_token_chunk_nonoverlap_reconstructs_and_validates(spark):
    import pytest as _pytest

    from elasticsearch_approx_plugin_spark.operators.text_analysis import token_chunk

    text = " ".join(f"w{i}" for i in range(23))
    df = _df(spark, [(1, text)])
    rows = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in token_chunk(df, max_tokens=8).collect()
    )
    # default stride == max_tokens: chunks partition the token stream
    assert " ".join(t for _, t in rows) == text
    with _pytest.raises(ValueError):
        token_chunk(df, max_tokens=0)
    with _pytest.raises(ValueError):
        token_chunk(df, max_tokens=4, stride=5)


# -- stream/batch parity ------------------------------------------------------


def test_hygiene_ops_stream_identically_to_batch(spark, sf_dir, tmp_path):
    """repetition_filter, pii_redact, token_chunk, and
    stratified_sample are stateless row-local stages, so the SAME
    function applied to a readStream input must emit exactly the batch
    result — one pipeline definition serves the 100 TB backfill and
    the live ingest. (line_dedup/decontaminate are global-state
    operators and are deliberately batch/foreachBatch-only.)"""
    from elasticsearch_approx_plugin_spark.operators.sampling import stratified_sample
    from elasticsearch_approx_plugin_spark.operators.text_analysis import (
        pii_redact,
        repetition_filter,
        token_chunk,
    )

    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "hygiene_stream_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    def pipe(df):
        mixed = stratified_sample(df, {"src0": 1.0, "src1": 0.5}, default_fraction=0.2)
        rep = repetition_filter(mixed)
        pii = pii_redact(mixed)
        chunks = token_chunk(mixed, max_tokens=16, stride=8)
        return (
            rep.join(pii, "doc_id")
            .join(chunks, "doc_id")
            .select(
                "doc_id", "passes", "text_redacted", "n_email",
                "chunk_id", "chunk_text",
            )
        )

    q = (
        pipe(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hygiene_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM hygiene_out").collect()}
    exp = {tuple(r) for r in pipe(batch).collect()}
    assert got == exp and len(got) > 0
