"""6-dp rounding that matches the DuckDB oracle bit-for-bit on the
score domain.

Spark's ``F.round`` on a DOUBLE rounds the value's SHORTEST DECIMAL
REPRESENTATION half-up (Java ``BigDecimal(Double.toString(x))``);
DuckDB's ``round(x, 6)`` rounds the BINARY value
(``std::round(x * 1e6) / 1e6``). For almost every double the two
agree, but a systematic divergence class exists: re-rounding a
6-dp-rounded score after multiplying by a constant whose product
gains a 7th decimal digit of exactly 5 (boost 1.5 on an odd last
digit, tie_breaker 0.3, negative_boost 0.25 ...). There the true
decimal sits ON the rounding boundary: Spark's shortest-repr path
rounds half-up while DuckDB sees the binary neighbor (e.g.
``0.342703 * 1.5`` → binary ``0.51405449999999997`` → DuckDB
``0.514054``, Spark ``0.514055``).

The oracles are frozen, so the engine reproduces DuckDB's semantics
at exactly those re-round sites: ``floor(x*1e6 + 0.5) / 1e6`` equals
``std::round(x*1e6)/1e6`` for the non-negative, < ~1e9 score domain
(both are half-up on the binary value there; they would differ only
for negative halves or where ``x*1e6 + 0.5`` itself rounds across an
integer, ~1e-11-relative coincidences). Plain ``F.round`` stays
everywhere else: sums of 6-dp decimals and power-of-two rescales
cannot gain a 7th digit, and first-roundings of raw BM25 doubles hit
a shortest-repr boundary only by chance — where the two engines' raw
doubles already differ below 6 dp, no rounding mode can align them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round6_oracle(col: Column) -> Column:
    """DuckDB-semantics round(x, 6) for non-negative score columns."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
