"""Randomized cross-engine sweep for the corpus-hygiene operators:
seeded random corpora (adversarial shapes — empty docs, whitespace
runs, heavy token collisions, near-miss PII) run through the Spark
operators AND an independently-written DuckDB query; results must
match exactly. Complements the hand-corpus tests in
test_corpus_hygiene.py the same way test_randomized_facets.py
complements the facet gates."""

import random

import duckdb
import pytest

PIECES = [
    "alpha", "beta", "beta", "gamma", "x", "yz", "a b", "  ", "\n",
    "tok1 tok2 tok3", "alpha beta", "",
]
PII_PIECES = [
    "bob.smith+x@corp.example.io", "a@b.co", "a@b",  # last: no TLD -> no match
    "10.0.0.1", "999.999.999.999", "1.2.3.4.5",
    "+1 (555) 123-4567", "+123456789", "call +1 555",  # last: too short
    "not@ an@email", "ip 10.0.0 end",
]


def _corpus(seed: int, n: int, pii: bool):
    rng = random.Random(seed)
    pool = PIECES + (PII_PIECES if pii else [])
    rows = []
    for i in range(n):
        k = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(pool) for _ in range(k))))
    return rows


def _duck(spark_rows, sql, rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.sql(sql).fetchall())
    got = sorted(tuple(r) for r in spark_rows)
    assert got == exp, f"first diff: {next((a, b) for a, b in zip(got, exp) if a != b)}"


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_repetition_features_random_sweep(spark, seed):
    from elasticsearch_approx_plugin_spark.operators.text_analysis import (
        add_repetition_features,
    )

    rows = _corpus(seed, 120, pii=False)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in add_repetition_features(df, ngram_n=2).collect()]
    _duck(
        got,
        """
WITH f AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, lines, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> array_to_string(toks[i:i+1], ' '))
              ELSE [] END AS grams
  FROM f
)
SELECT doc_id, len(lines)::INT AS n_lines,
       round(CASE WHEN len(lines) > 0
             THEN 1 - len(list_distinct(lines)) / len(lines) ELSE 0.0 END, 6) AS dup_line_frac,
       round(CASE WHEN len(grams) > 0
             THEN 1 - len(list_distinct(grams)) / len(grams) ELSE 0.0 END, 6) AS dup_ngram_frac
FROM g
""",
        rows,
    )


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_line_dedup_random_sweep(spark, seed):
    from elasticsearch_approx_plugin_spark.operators.dedup import line_dedup

    rows = _corpus(seed, 120, pii=False)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in line_dedup(df).collect()]
    _duck(
        got,
        """
WITH l AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines FROM documents
), e AS (
  SELECT doc_id, unnest(lines) AS line,
         unnest(generate_series(1, len(lines))) AS pos
  FROM l
), firsts AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM e
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
         count(*) AS n_kept
  FROM firsts WHERE rn = 1 GROUP BY doc_id
)
SELECT l.doc_id, coalesce(r.text_dedup, '') AS text_dedup,
       len(l.lines)::BIGINT AS n_lines, coalesce(r.n_kept, 0)::BIGINT AS n_lines_kept
FROM l LEFT JOIN rebuilt r ON l.doc_id = r.doc_id
""",
        rows,
    )


@pytest.mark.parametrize("seed,max_tokens,stride", [(31, 5, 2), (32, 7, 7), (33, 3, 1)])
def test_token_chunk_random_sweep(spark, seed, max_tokens, stride):
    from elasticsearch_approx_plugin_spark.operators.text_analysis import token_chunk

    rows = _corpus(seed, 120, pii=False)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in token_chunk(df, max_tokens=max_tokens, stride=stride).collect()]
    _duck(
        got,
        f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), w AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(generate_series(0,
           CASE WHEN len(toks) > 0
                THEN ceil(greatest(len(toks) - {max_tokens}, 0) / {stride}.0)::INT
                ELSE -1 END)) AS i
  FROM toks
)
SELECT doc_id, i::BIGINT AS chunk_id,
       array_to_string(toks[i*{stride}+1:i*{stride}+{max_tokens}], ' ') AS chunk_text,
       least(n - i*{stride}, {max_tokens})::BIGINT AS n_chunk_tokens
FROM w
""",
        rows,
    )


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_pii_redact_random_sweep(spark, seed):
    from elasticsearch_approx_plugin_spark.operators.text_analysis import (
        PII_PATTERNS,
        pii_redact,
    )

    rows = _corpus(seed, 120, pii=True)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in pii_redact(df).collect()]
    sql, prev, carried = "WITH s0 AS (SELECT doc_id, text FROM documents)", "s0", []
    for i, (kind, pat) in enumerate(PII_PATTERNS.items(), 1):
        carry = ", ".join(carried) + (", " if carried else "")
        sql += (
            f", s{i} AS (SELECT doc_id, {carry}"
            f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{kind}, "
            f"regexp_replace(text, '{pat}', '<{kind.upper()}>', 'g') AS text FROM {prev})"
        )
        carried.append(f"n_{kind}")
        prev = f"s{i}"
    cols = ", ".join(f"n_{k}" for k in PII_PATTERNS)
    _duck(got, sql + f" SELECT doc_id, text AS text_redacted, {cols} FROM {prev}", rows)
