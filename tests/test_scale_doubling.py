"""Scale-doubling loop with closed-form ground truths — the analog of
RandomizedApproxReadWriteTest's 2^t items-per-day loop (:478-537):
the corpus generator exposes exact distinct counts in closed form
(one uniq_<i> token per row), so every scale asserts exactly."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.distinct_count import sketch_agg
from elasticsearch_approx_plugin_spark.sources.corpus import generate_corpus
from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_code


@pytest.mark.parametrize("t", [6, 8, 10])
def test_closed_form_distincts_at_scale(spark, t):
    n = 2**t
    corpus = generate_corpus(spark, n)
    toks = corpus.select("lang", tokenize_code("content").alias("tokens"))
    uniq = toks.select(
        "lang", F.explode(F.filter("tokens", lambda x: x.startswith("uniq_"))).alias("u")
    )
    # exact closed form: one unique token per row, total == n
    row = sketch_agg(uniq, [], "u", exact_threshold=-1).collect()[0]
    assert (row["count"], row["distinct_count"]) == (n, n)
    # tipped regime stays within the 2% contract at every scale
    est = sketch_agg(uniq, [], "u", exact_threshold=0, rsd=0.01).collect()[0]
    assert est["tipped"]
    assert abs(est["distinct_count"] - n) <= max(0.02 * n, 2)
    # per-lang split sums to the whole (disjoint partition of rows)
    per_lang = sketch_agg(uniq, ["lang"], "u", exact_threshold=-1).collect()
    assert sum(r["distinct_count"] for r in per_lang) == n
