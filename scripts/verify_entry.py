"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry at sf0.01 next to its ``oracle_sql()`` twin in
DuckDB and compares row count, column names, and an order-insensitive
value multiset. Usage: python scripts/verify_entry.py [sf_dir] [name_substring]"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from elasticsearch_approx_plugin_spark.session import get_spark
from elasticsearch_approx_plugin_spark.sources.tables import TABLE_NAMES


_TYPE_MAP = {
    "bigint": "i64", "long": "i64", "int": "i32", "integer": "i32",
    "double": "f64", "float": "f32", "string": "str", "varchar": "str",
    "boolean": "bool", "binary": "bytes", "blob": "bytes",
    "timestamp": "ts", "timestamp_ntz": "ts",
}


def _norm_type(t: str) -> str:
    return _TYPE_MAP.get(t.strip().lower(), t.strip().lower())


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions="16")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if len(sys.argv) > 2:
        qs = {k: v for k, v in qs.items() if sys.argv[2] in k}
        if not qs:
            sys.exit(f"no query matches {sys.argv[2]!r}")
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(rows)} rows) {time.time()-t0:.1f}s")
            if len(rows) == 0 and name != "noop":
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            ores = con.sql(oracles[name])
            ocols, orows = ores.columns, ores.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR {e}"))
            print(f"FAIL  {name}: oracle error {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append((name, f"schema {sorted(cols)} != {sorted(ocols)}"))
            print(f"FAIL  {name}: schema {sorted(cols)} != {sorted(ocols)}")
            continue
        stypes = {f.name: _norm_type(f.dataType.simpleString()) for f in df.schema.fields}
        otypes = {c: _norm_type(str(t)) for c, t in zip(ores.columns, ores.types)}
        mismatched = {c for c in stypes if stypes[c] != otypes.get(c)}
        if mismatched:
            detail = {c: (stypes[c], otypes.get(c)) for c in mismatched}
            failures.append((name, f"dtype mismatch {detail}"))
            print(f"FAIL  {name}: dtype mismatch {detail}")
            continue
        a, b = norm_rows(cols, [tuple(r) for r in rows]), norm_rows(ocols, orows)
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} != {len(b)}"))
            print(f"FAIL  {name}: rowcount {len(a)} != {len(b)}")
        elif a != b:
            diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
            failures.append((name, f"values differ at {diff}"))
            print(f"FAIL  {name}: values differ: {diff}")
        else:
            print(f"ok    {name}: {len(a)} rows match {time.time()-t0:.1f}s")

    print()
    # full sweeps (no name filter) are the standing pre-flight
    # (README "Release checklist") — log them so each round's sweep is
    # on the record next to the driver's own PROGRESS entries
    if len(sys.argv) <= 2:
        rec = {
            "event": "verify_sweep",
            "ts": time.time(),
            "sf_dir": sf_dir,
            "gates": len(qs),
            "oracle_gates": sum(1 for k in qs if k in oracles),
            "failures": [f[0] for f in failures],
        }
        try:
            with open(os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "PROGRESS.jsonl"), "a") as fh:
                import json

                fh.write(json.dumps(rec) + "\n")
        except OSError:
            pass
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    n_oracle = sum(1 for k in qs if k in oracles)
    print(f"all {len(qs)} queries verified ({n_oracle} with SQL oracles)")


if __name__ == "__main__":
    main()
