"""Bit-reproducible numeric rendering shared by operators and the query
registry (the render half of the exact money-aggregate idiom — full
statement at the top of py_etl_spark/queries.py).

``float_round(col, k)`` replaces ``F.round(col, k)`` wherever the
rounded value sits on a RATIONAL LATTICE (ratios of integer counts —
jaccard, shares, drift statistics, bits-per-token — or interpolations
of decimal-lattice values): such values can land exactly on a
10^-(k+1) tie, where Spark's round (BigDecimal HALF_UP over the
double's exact decimal expansion) and a float-space round (DuckDB)
disagree. Measured r11: 3 of 1264 tie-capable n/d ratios at k=6 split
the engines (41/640 → 0.064063 vs 0.064062). floor(x*10^k + 0.5)/10^k
uses only IEEE-correctly-rounded ops (*, +, floor, /), so every engine
produces the same bits from the same input.

Rounds over transcendental-valued expressions (ln-based BM25 idf,
sqrt-normalized cosines, HLL/KMV estimates) keep ``F.round``: they
have no rational lattice, so exact decimal ties are measure-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def float_round(col: Column, k: int) -> Column:
    """Float-space round-half-up at ``k`` decimals, bit-reproducible
    across engines. Oracle SQL spelling (keep the op order identical):
    ``floor((x) * 1e{k} + 0.5) / 1e{k}``."""
    s = float(10**k)
    return F.floor(col * s + F.lit(0.5)) / s
