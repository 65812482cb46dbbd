"""Text analysis operators (language ID, quality, token count,
fingerprint) — deterministic heuristics with exact oracles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.text_analysis import (
    add_quality_features,
    fingerprint,
    lang_id,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_matches_oracle(docs, sf_dir):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count("text").alias("n")).collect()
    }
    exp = dict(
        duckdb.sql(
            f"""SELECT doc_id, len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                FROM read_parquet('{sf_dir}/documents.parquet')"""
        ).fetchall()
    )
    assert got == exp


def test_quality_features(docs):
    rows = add_quality_features(docs, "text").select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    ).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
    # deterministic: re-run gives identical values
    again = add_quality_features(docs, "text").select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_lang_id_deterministic_and_sane(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is that"),
            (2, "el perro y la casa de los que se del"),
            (3, "le chat et les maisons des un du une la"),
            (4, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df, "text", "doc_id").collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "und"}


def test_fingerprint_token_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta alpha"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "text", "doc_id").collect()}
    assert fp[1] == fp[2]  # order + multiplicity canonicalized away
    assert fp[1] != fp[3]


def test_fingerprint_matches_duckdb(docs, sf_dir):
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs, "text", "doc_id").collect()}
    exp = dict(
        duckdb.sql(
            f"""SELECT doc_id,
                       md5(array_to_string(list_sort(list_distinct(
                           list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))), ' '))
                FROM read_parquet('{sf_dir}/documents.parquet')"""
        ).fetchall()
    )
    assert got == exp


def test_token_count_bpe_matches_oracle(docs, sf_dir):
    from elasticsearch_approx_plugin_spark.operators.text_analysis import token_count_bpe

    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count_bpe("text").alias("n")).collect()
    }
    exp = dict(
        duckdb.sql(
            f"""SELECT doc_id, len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                FROM read_parquet('{sf_dir}/documents.parquet')"""
        ).fetchall()
    )
    assert got == exp
