"""Parse the reference's facet REQUEST JSON into typed query specs.

This is the client-facing analog of the reference's server-side
parsers (``DateFacetParser.java:93-193``, ``TermListFacetParser.java:
44-72`` in /root/reference): the same JSON clause a reference user
sends to ES replays here unchanged. Field-name aliases (snake_case /
camelCase) match the reference exactly; ``time_zone`` is an alias for
``pre_zone`` (DateFacetParser.java:133-135); any negative
``exact_threshold`` means never-tip (DateFacetParser.java:188-189,
handled downstream in sketch.py).

Only the ``facets`` clause is interpreted — the enclosing ``query``
is the caller's DataFrame filter in a PySpark-native engine (a
``match_all`` maps to "no filter"). ``value_script``/``lang`` are
unsupported here exactly as they are commented out in the reference
parser.
"""

from __future__ import annotations

from typing import Any

from .facet_query import DateFacetQuery, TermListQuery

_DATE_ALIASES = {
    "field": "key_field",
    "key_field": "key_field",
    "keyField": "key_field",
    "value_field": "value_field",
    "valueField": "value_field",
    "distinct_field": "distinct_field",
    "distinctField": "distinct_field",
    "slice_field": "slice_field",
    "sliceField": "slice_field",
    "interval": "interval",
    "time_zone": "pre_zone",
    "timeZone": "pre_zone",
    "pre_zone": "pre_zone",
    "preZone": "pre_zone",
    "post_zone": "post_zone",
    "postZone": "post_zone",
    "pre_offset": "pre_offset",
    "preOffset": "pre_offset",
    "post_offset": "post_offset",
    "postOffset": "post_offset",
    "pre_zone_adjust_large_interval": "pre_zone_adjust_large_interval",
    "preZoneAdjustLargeInterval": "pre_zone_adjust_large_interval",
    "exact_threshold": "exact_threshold",
    "exactThreshold": "exact_threshold",
}


def parse_date_facet(clause: dict[str, Any]) -> DateFacetQuery:
    """``{"date_facet": {...}}`` body → :class:`DateFacetQuery`."""
    kwargs: dict[str, Any] = {}
    for k, v in clause.items():
        if k == "factor":
            kwargs["factor"] = float(v)
            continue
        if k in ("value_script", "valueScript", "lang"):
            raise ValueError(f"{k} is not supported (reference parser comments it out)")
        field = _DATE_ALIASES.get(k)
        if field is None:
            raise ValueError(f"unknown date_facet field {k!r}")
        if field in ("pre_zone", "post_zone") and isinstance(v, int):
            # DateFacetParser.parseZone accepts whole-hour numbers
            # (DateTimeZone.forOffsetHours) — normalize to ±HH:00
            v = f"{'+' if v >= 0 else '-'}{abs(v):02d}:00"
        kwargs[field] = v
    if "key_field" not in kwargs or "interval" not in kwargs:
        raise ValueError("date_facet requires key_field and interval")
    return DateFacetQuery(**kwargs)


def parse_term_list(clause: dict[str, Any], mode: str = "collector") -> TermListQuery:
    kwargs: dict[str, Any] = {"mode": mode}
    for k, v in clause.items():
        if k in ("field", "key_field", "keyField"):
            kwargs["key_field"] = v
        elif k in ("max_per_shard", "maxPerShard"):
            kwargs["max_per_shard"] = int(v)
        elif k == "sample":
            kwargs["sample"] = float(v)
        else:
            raise ValueError(f"unknown term_list field {k!r}")
    if "key_field" not in kwargs:
        raise ValueError("term_list requires key_field")
    return TermListQuery(**kwargs)


def parse_request(request: dict[str, Any]) -> dict[str, DateFacetQuery | TermListQuery]:
    """Full REQUEST body → {facet_name: query spec}.

    The ``query`` clause must be ``match_all`` (anything else is the
    caller's job to pre-filter the DataFrame — raise so nothing is
    silently ignored).
    """
    query = request.get("query", {"match_all": {}})
    if set(query) != {"match_all"}:
        raise ValueError("only match_all queries replay directly; pre-filter the DataFrame")
    out: dict[str, DateFacetQuery | TermListQuery] = {}
    for name, spec in request.get("facets", {}).items():
        # facet-level siblings the reference's builders emit next to
        # the facet body: ``nested`` (DateFacetBuilder.java:283-296)
        # and ``global`` (DateFacetBuilder.java:261-269) are honored;
        # ``facet_filter`` is the caller's DataFrame filter here (set
        # ``.filter`` on the returned spec), so raise rather than
        # silently dropping it.
        known = {"date_facet", "term_list", "mode", "nested", "global"}
        unknown = set(spec) - known
        if unknown:
            raise ValueError(
                f"facet {name!r}: unsupported facet-level key(s) {sorted(unknown)}"
                " (facet_filter → pre-filter the DataFrame / spec.filter)"
            )
        if "date_facet" in spec:
            if "mode" in spec:
                # mode only exists on the term-list facet; dropping it
                # here would be the silent-ignore this check forbids
                raise ValueError(f"facet {name!r}: 'mode' is a term_list key")
            q = parse_date_facet(spec["date_facet"])
        elif "term_list" in spec:
            q = parse_term_list(spec["term_list"], spec.get("mode", "collector"))
        else:
            raise ValueError(f"facet {name!r}: unknown facet type {set(spec)}")
        if spec.get("nested") is not None or spec.get("global"):
            import dataclasses

            q = dataclasses.replace(
                q,
                nested=spec.get("nested"),
                global_facet=bool(spec.get("global", False)),
            )
        out[name] = q
    return out
