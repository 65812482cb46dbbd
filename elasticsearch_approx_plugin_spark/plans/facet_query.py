"""Typed query specs — the client-API analog of the reference's fluent
builders (``DateFacetBuilder.java:36-359``, ``TermListFacetBuilder.java:8-47``
in /root/reference).

The reference's builders emit a JSON clause that a server-side parser
re-reads (``DateFacetParser.java:93-193``); in a PySpark-native engine
the host language *is* the parser, so a spec is just a frozen dataclass
that validates its fields and lowers itself onto a DataFrame. Fields
mirror the builder surface: keyField/valueField/distinctField/
sliceField/interval/preZone/postZone/preOffset/postOffset/
exactThreshold, plus ``filter`` standing in for facetFilter/global
(filtering is the enclosing query's job in ES; here it's a predicate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame

from ..operators.date_facet import date_facet
from ..operators.term_list import term_list
from ..operators.bm25 import bm25_topk
from ..operators.postings import InvertedIndex


@dataclass(frozen=True)
class DateFacetQuery:
    key_field: str
    interval: str
    value_field: str | None = None
    distinct_field: str | None = None
    slice_field: str | None = None
    exact_threshold: int = 1000
    distinct_method: str = "hybrid"
    pre_zone: str | None = None
    post_zone: str | None = None
    pre_offset: str | int | None = None
    post_offset: str | int | None = None
    pre_zone_adjust_large_interval: bool = False  # DateFacetBuilder.java:176-180
    factor: float | None = None  # numeric-key epoch multiplier (DateFacetBuilder.java:186-196)
    totals: bool = False
    filter: Column | str | None = None  # facetFilter analog
    # ``global`` analog (DateFacetBuilder.java:261-269): ignore the
    # enclosing query — the caller passes the unfiltered table to
    # ``run(df, global_df=...)`` and the facet runs over THAT, with
    # ``filter`` (the facetFilter) still applied.
    global_facet: bool = False

    def run(self, df: DataFrame, global_df: DataFrame | None = None) -> DataFrame:
        if self.global_facet:
            if global_df is None:
                raise ValueError("global_facet=True requires global_df (the unfiltered table)")
            df = global_df
        if self.filter is not None:
            df = df.filter(self.filter)
        return date_facet(
            df,
            self.key_field,
            self.interval,
            value_field=self.value_field,
            distinct_field=self.distinct_field,
            slice_field=self.slice_field,
            exact_threshold=self.exact_threshold,
            distinct_method=self.distinct_method,
            pre_zone=self.pre_zone,
            post_zone=self.post_zone,
            pre_offset=self.pre_offset,
            post_offset=self.post_offset,
            factor=self.factor,
            totals=self.totals,
            pre_zone_adjust_large_interval=self.pre_zone_adjust_large_interval,
        )


@dataclass(frozen=True)
class TermListQuery:
    key_field: str
    max_per_shard: int = 1000  # reference name; per-partition here
    sample: float = 1.0
    mode: str = "collector"
    filter: Column | str | None = None

    def run(self, df: DataFrame, dictionary: DataFrame | None = None) -> DataFrame:
        if self.filter is not None:
            df = df.filter(self.filter)
        return term_list(
            df,
            self.key_field,
            max_per_partition=self.max_per_shard,
            sample=self.sample,
            mode=self.mode,
            dictionary=dictionary,
        )


@dataclass(frozen=True)
class TopKQuery:
    terms: tuple[str, ...]
    k: int = 10

    def run(self, index: InvertedIndex) -> DataFrame:
        return bm25_topk(index, list(self.terms), self.k)
