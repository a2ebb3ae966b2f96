"""Cross-engine deterministic quantization.

`round(x, n)` is NOT portable for hash-matching: Spark rounds through
BigDecimal (exact decimal HALF_UP) while DuckDB multiplies in floating point
— on exact-half values (common for money: 2-decimal price x 2-decimal
discount ends in half-cents) they disagree.

`qround` instead uses floor(x * 10^n + 0.5) / 10^n on BOTH engines: every
step (float multiply by a power of ten, add, floor, correctly-rounded
divide) is identical IEEE arithmetic, so the two engines produce
bit-identical doubles — which is what an exact value-hash needs.

Spark side: qround(col, n). Oracle side: wrap the SQL expression with
sql_qround("expr", n). Both are half-up for positive values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qround(col: Column, n: int) -> Column:
    scale = float(10**n)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_qround(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
