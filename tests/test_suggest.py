"""Term suggester — candidate generation, scoring, suggest_mode
gating, sort grammar, and a DuckDB cross-check."""

import duckdb
import pytest

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.operators.suggest import term_suggest


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "table scan merge table"),
        (1, "table spark window"),
        (2, "tables batch spark"),
        (3, "cable stark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    return build_index(df, range_bits=9)


def _rows(df):
    return [
        (r["query_id"], r["suggestion"], r["score"], r["freq"], r["rank"])
        for r in df.collect()
    ]


def test_missing_mode_scores_and_order(index):
    # 'tabel' absent -> suggested; dist(table)=2 (score 1-2/5=0.6),
    # dist(tables)=2 (score 1-2/6≈0.667 — longer term dilutes less);
    # dist(cable)=2 but prefix_length=1 requires 't'
    out = _rows(term_suggest(index, [(0, "tabel")], size=5))
    assert [(r[0], r[1]) for r in out] == [(0, "tables"), (0, "table")]
    assert out[0][2] == pytest.approx(round(1 - 2 / 6, 6))
    assert out[1][2] == pytest.approx(round(1 - 2 / 5, 6))
    assert out[1][3] == 2  # df of 'table' (docs 0 and 1)


def test_missing_mode_suppresses_present_input(index):
    out = _rows(term_suggest(index, [(0, "table")], size=5))
    assert out == []


def test_always_mode_and_prefix_zero(index):
    # prefix_length=0 admits 'cable' (dist 1 from 'table')
    out = _rows(
        term_suggest(index, [(1, "table")], suggest_mode="always", prefix_length=0)
    )
    got = {r[1] for r in out}
    assert got == {"cable", "tables"}  # dist 1 each; 'table' itself excluded


def test_popular_mode_requires_higher_df(index):
    # input 'tables' (df 1): only candidates with df > 1 survive
    out = _rows(
        term_suggest(index, [(2, "tables")], suggest_mode="popular", prefix_length=1)
    )
    assert [(r[0], r[1]) for r in out] == [(2, "table")]


def test_sort_frequency_vs_score(index):
    # input 'stark' (absent): candidates sharing 's' within 2 edits:
    # 'spark' (dist 1, df 2), 'scan' (dist 3 — out), 'stark' itself not
    # in dict... use prefix 0 to admit 'start'-like none; keep simple:
    by_score = _rows(term_suggest(index, [(0, "starkk")], min_word_length=4,
                                  suggest_mode="missing", prefix_length=1))
    # starkk -> stark dist 1 (df 1), spark dist 2 (df 2)
    assert [r[1] for r in by_score] == ["stark", "spark"]
    by_freq = _rows(term_suggest(index, [(0, "starkk")], sort="frequency",
                                 prefix_length=1))
    assert [r[1] for r in by_freq] == ["spark", "stark"]


def test_min_word_length_and_size(index):
    assert _rows(term_suggest(index, [(0, "tab")], min_word_length=4)) == []
    out = _rows(
        term_suggest(index, [(1, "table")], suggest_mode="always",
                     prefix_length=0, size=1)
    )
    assert len(out) == 1 and out[0][4] == 1


def test_min_doc_freq(index):
    out = _rows(
        term_suggest(index, [(1, "table")], suggest_mode="always",
                     prefix_length=0, min_doc_freq=2)
    )
    assert {r[1] for r in out} == set()  # cable df1, tables df1 both cut


def test_validation(index):
    with pytest.raises(ValueError):
        term_suggest(index, [])
    with pytest.raises(ValueError):
        term_suggest(index, [(0, "x")], size=0)
    with pytest.raises(ValueError):
        term_suggest(index, [(0, "x")], suggest_mode="bogus")
    with pytest.raises(ValueError):
        term_suggest(index, [(0, "x")], sort="bogus")
    with pytest.raises(ValueError):
        term_suggest(index, [(0, "x")], max_edits=3)


def test_vs_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    idx = build_index(docs, range_bits=9)
    inputs = [(0, "tabel"), (1, "windoe"), (2, "sprak")]
    got = set(_rows(term_suggest(idx, inputs, size=3, suggest_mode="missing")))
    vals = ", ".join(f"({q}, '{t}')" for q, t in inputs)
    want = set(
        duckdb.sql(
            f"""
        WITH tok AS (SELECT doc_id, t.term
                     FROM read_parquet('{sf_dir}/documents.parquet'),
                          unnest(string_split_regex(text, '\\s+')) AS t(term)
                     WHERE t.term <> ''),
        d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
        q AS (SELECT * FROM (VALUES {vals}) AS q(query_id, input)),
        miss AS (SELECT q.* FROM q LEFT JOIN d ON d.term = q.input WHERE d.term IS NULL),
        cand AS (
          SELECT m.query_id, d.term AS suggestion,
                 round(1 - levenshtein(d.term, m.input)::DOUBLE /
                       greatest(length(m.input), length(d.term)), 6) AS score,
                 d.df AS freq
          FROM miss m JOIN d ON d.term <> m.input
           AND starts_with(d.term, m.input[1:1])
           AND levenshtein(d.term, m.input) <= 2
        )
        SELECT query_id::BIGINT, suggestion, score, freq,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, freq DESC, suggestion) AS rank
        FROM cand QUALIFY rank <= 3
        """
        ).fetchall()
    )
    assert got == want
