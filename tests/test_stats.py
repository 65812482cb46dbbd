"""_termvectors and index _stats over the relational index layout."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.postings import (
    build_index,
    delete_from_index,
)
from elasticsearch_approx_plugin_spark.operators.stats import (
    index_stats,
    term_vectors,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "table scan table"),
        (1, "scan merge"),
        (2, "table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=2)


def test_term_vectors_tf(index, corpus):
    got = {
        (r["doc_id"], r["term"]): r["term_freq"]
        for r in term_vectors(index, corpus, [0, 2, 99]).collect()
    }
    assert got == {(0, "table"): 2, (0, "scan"): 1, (2, "table"): 1}


def test_term_vectors_with_statistics(index, corpus):
    got = {
        (r["doc_id"], r["term"]): (r["term_freq"], r["doc_freq"], r["ttf"])
        for r in term_vectors(index, corpus, [0], term_statistics=True).collect()
    }
    # table: df 2 (docs 0,2), ttf 3; scan: df 2, ttf 2
    assert got == {(0, "table"): (2, 2, 3), (0, "scan"): (1, 2, 2)}
    with pytest.raises(ValueError):
        term_vectors(index, corpus, [])


def test_index_stats(index):
    r = index_stats(index).collect()[0]
    # 3 docs; terms: table, scan, merge; postings Σdf = 2+2+1;
    # tokens Σcf = 3+2+1; avgdl = 6/3
    assert (r["n_docs"], r["n_deleted"], r["n_terms"]) == (3, 0, 3)
    assert (r["n_postings"], r["n_tokens"]) == (5, 6)
    assert r["avgdl"] == 2.0


def test_index_stats_counts_tombstones(corpus, spark, tmp_path):
    from elasticsearch_approx_plugin_spark.operators.postings import (
        read_index,
        write_index,
    )

    path = str(tmp_path / "idx")
    write_index(build_index(corpus, range_bits=2), path, n_buckets=2)
    delete_from_index(spark, path, [0])
    idx = read_index(spark, path)
    r = index_stats(idx).collect()[0]
    assert r["n_deleted"] == 1


def test_analyze_text(spark):
    from elasticsearch_approx_plugin_spark.operators.stats import analyze_text

    out = analyze_text(spark, [(0, "  table   scan "), (1, "x")]).collect()
    got = {(r["text_id"], r["position"], r["token"]) for r in out}
    assert got == {(0, 0, "table"), (0, 1, "scan"), (1, 0, "x")}
    code = analyze_text(spark, [(0, "fooBar = baz_9(2);")], analyzer="code").collect()
    assert [r["token"] for r in sorted(code, key=lambda r: r["position"])] == [
        "foobar", "baz_9", "2",
    ]
    import pytest as _pt

    with _pt.raises(ValueError):
        analyze_text(spark, [])
    with _pt.raises(ValueError):
        analyze_text(spark, [(0, "x")], analyzer="bogus")
