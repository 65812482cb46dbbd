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
from pyspark.sql import functions as F

from ..operators.date_facet import date_facet
from ..operators.term_list import term_list
from ..operators.bm25 import bm25_topk
from ..operators.postings import InvertedIndex


def _explode_nested(
    df: DataFrame, path: str, names: dict[str, str | None]
) -> tuple[DataFrame, dict[str, str | None]]:
    """Lower a nested-scope facet onto a flat DataFrame.

    ES runs a nested facet over the block-joined child docs under
    ``path``; the Spark analog of that child table is
    ``explode(path)`` — a Generate node, pipelined into the scan with
    no shuffle of its own. Fields under the path (dot notation, as in
    the reference's nested queries) are projected to flat columns so
    the downstream facet operators (which look fields up by top-level
    name) work unchanged; root-scope fields that the facet also uses
    are carried through, replicated per nested object exactly as
    block-join scoping replicates the parent match.
    """
    pfx = path + "."
    used = [v for v in names.values() if v]
    # fail here with a clear message rather than later with an opaque
    # Catalyst AnalysisException (ADVICE r4): the nested path itself is
    # an array<struct> column (not facetable), and a dotted field that
    # isn't under the path has no flat analog after the explode
    for v in used:
        if v == path:
            raise ValueError(
                f"faceted field {v!r} IS the nested path — facet a field "
                f"under it, e.g. {path + '.<field>'!r}"
            )
        if "." in v and not v.startswith(pfx):
            raise ValueError(
                f"dotted faceted field {v!r} lies outside nested path {path!r}"
            )
    nested_used = sorted({v for v in used if v.startswith(pfx)})
    root_used = sorted({v for v in used if not v.startswith(pfx)})
    if not nested_used:
        raise ValueError(f"nested={path!r} but no faceted field lies under that path")
    # deeper paths keep working ("a.b.c" under nested="a" → struct
    # access b.c inside each element); flat alias avoids dotted names
    leaf = {v: v[len(pfx):].replace(".", "__") for v in nested_used}
    if len(set(leaf.values())) != len(leaf):
        raise ValueError(
            f"nested fields {sorted(leaf)} flatten to colliding aliases "
            f"{sorted(leaf.values())}"
        )
    clash = set(leaf.values()) & set(root_used)
    if clash:
        raise ValueError(f"nested field alias(es) {sorted(clash)} collide with root fields")
    ex = df.select(*root_used, F.explode(path).alias("__nested__")).select(
        *root_used, *[F.col(f"__nested__.{v[len(pfx):]}").alias(a) for v, a in leaf.items()]
    )
    return ex, {k: (leaf.get(v, v) if v else None) for k, v in names.items()}


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
    # ``nested`` analog (DateFacetBuilder.java:283-296): the facet
    # executes over the nested objects under this path — "a match (root
    # object) will then cause all the nested objects matching the path
    # to be computed into the facet". The Lucene block-join scope maps
    # to an array<struct> column here: filter roots, then ``explode``
    # the path (a Generate node — pipelined into the scan, no extra
    # shuffle; partial aggregation still happens map-side after it).
    # Faceted fields use ES dot notation ("path.field"); root-level
    # fields remain addressable by their plain name.
    nested: str | None = None

    def run(self, df: DataFrame, global_df: DataFrame | None = None) -> DataFrame:
        if self.global_facet:
            if global_df is None:
                raise ValueError("global_facet=True requires global_df (the unfiltered table)")
            df = global_df
        if self.filter is not None:
            # facetFilter applies in the ROOT scope (the match decides
            # which documents contribute their nested objects)
            df = df.filter(self.filter)
        names = {
            "key_field": self.key_field,
            "value_field": self.value_field,
            "distinct_field": self.distinct_field,
            "slice_field": self.slice_field,
        }
        if self.nested is not None:
            df, names = _explode_nested(df, self.nested, names)
        return date_facet(
            df,
            names["key_field"],
            self.interval,
            value_field=names["value_field"],
            distinct_field=names["distinct_field"],
            slice_field=names["slice_field"],
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
    # inherited from ES 0.90's base FacetBuilder (nested/global exist
    # on every facet builder, TermListFacetBuilder.java:8): same
    # lowering as DateFacetQuery — explode the array<struct> scope /
    # run over the caller-supplied unfiltered table.
    nested: str | None = None
    global_facet: bool = False

    def run(
        self,
        df: DataFrame,
        dictionary: DataFrame | None = None,
        global_df: DataFrame | None = None,
    ) -> DataFrame:
        if self.global_facet:
            if global_df is None:
                raise ValueError("global_facet=True requires global_df (the unfiltered table)")
            df = global_df
        if self.filter is not None:
            df = df.filter(self.filter)
        key_field = self.key_field
        if self.nested is not None:
            df, names = _explode_nested(df, self.nested, {"key_field": key_field})
            key_field = names["key_field"]
        return term_list(
            df,
            key_field,
            max_per_partition=self.max_per_shard,
            sample=self.sample,
            mode=self.mode,
            dictionary=dictionary,
        )


@dataclass(frozen=True)
class CoreFacetQuery:
    """One of ES 0.90's built-in facets (terms / statistical /
    histogram / range / terms_stats) as a typed spec, so the full
    ``facets`` request block a reference user sends — plugin facets and
    core facets side by side — replays through :func:`parse_request`.
    ``params`` are the (already-validated) keyword arguments of the
    matching ``operators.facets`` function; filter / nested / global
    lower exactly like the plugin facets above."""

    kind: str
    params: dict
    filter: Column | str | None = None
    nested: str | None = None
    global_facet: bool = False

    # which params name fields (subject to the nested re-aliasing);
    # filter/query facets carry a lowered predicate instead of fields,
    # so they cannot re-alias under a nested scope (raise below)
    _FIELD_PARAMS = {
        "terms": ("field",),
        "statistical": ("field",),
        "histogram": ("key_field", "value_field"),
        "range": ("field", "value_field"),
        "terms_stats": ("key_field", "value_field"),
        "filter": (),
        "query": (),
    }

    def run(self, df: DataFrame, global_df: DataFrame | None = None) -> DataFrame:
        from ..operators import facets as core

        if self.global_facet:
            if global_df is None:
                raise ValueError("global_facet=True requires global_df (the unfiltered table)")
            df = global_df
        if self.filter is not None:
            df = df.filter(self.filter)
        params = dict(self.params)
        if self.nested is not None:
            if not self._FIELD_PARAMS[self.kind]:
                raise ValueError(
                    f"nested {self.kind} facet is not supported: the lowered "
                    "predicate references root-scope columns"
                )
            names = {k: params.get(k) for k in self._FIELD_PARAMS[self.kind]}
            df, names = _explode_nested(df, self.nested, names)
            params.update({k: v for k, v in names.items() if k in params})
        fn = {
            "terms": core.terms_facet,
            "statistical": core.statistical_facet,
            "histogram": core.histogram_facet,
            "range": core.range_facet,
            "terms_stats": core.terms_stats_facet,
            "filter": core.filter_facet,
            "query": core.query_facet,
        }[self.kind]
        return fn(df, **params)


@dataclass(frozen=True)
class TopKQuery:
    terms: tuple[str, ...]
    k: int = 10

    def run(self, index: InvertedIndex) -> DataFrame:
        return bm25_topk(index, list(self.terms), self.k)
