"""Deterministic geotag derivation — shared between Spark and the DuckDB
correctness oracle.

The driver's relational test tables carry no coordinates, so spatial
queries derive (x, y) from integer ids with a Knuth multiplicative hash.
Every arithmetic step is exact or identically-rounded IEEE-754 double in
both engines (products stay < 2^53; the 2^32 divisor is a power of two),
and the final float32 cast rounds identically — so the SAME SQL TEXT,
evaluated by Spark (`F.expr`) and DuckDB, yields bit-identical float32
coordinates. That lockstep is what makes full value-hash oracles possible
for the spatial operators.

Coordinates land uniformly in the reference harness bounds [1000, 1100)
(main.cpp:60-61).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["geotag_x_sql", "geotag_y_sql", "geotag_x", "geotag_y"]

#: Knuth multiplicative hash constants (public-domain classics).
_AX = 2654435761
_AY = 2246822519
_CY = 1013904223


#: NB: every numeric literal is CAST to DOUBLE explicitly. Spark parses
#: bare `4294967296.0` as DECIMAL and then evaluates the whole chain in
#: BigDecimal — measured ~100 µs/row of JVM time + allocation storm (GC
#: collapse at 32 threads). With explicit doubles the expression is
#: whole-stage-codegen'd primitive math; values are identical in both
#: engines (the hash mod < 2^32 is exact in double, the divisor is a
#: power of two, and the final float32 cast rounds identically).


def geotag_x_sql(id_col: str) -> str:
    return (
        f"CAST(CAST(1000.0 AS DOUBLE) + CAST(100.0 AS DOUBLE)"
        f" * (CAST(({id_col} * {_AX}) % 4294967296 AS DOUBLE)"
        f" / CAST(4294967296 AS DOUBLE)) AS FLOAT)"
    )


def geotag_y_sql(id_col: str) -> str:
    return (
        f"CAST(CAST(1000.0 AS DOUBLE) + CAST(100.0 AS DOUBLE)"
        f" * (CAST(({id_col} * {_AY} + {_CY}) % 4294967296 AS DOUBLE)"
        f" / CAST(4294967296 AS DOUBLE)) AS FLOAT)"
    )


def geotag_x(id_col: str) -> Column:
    """Spark column — parses the exact oracle SQL text (JVM-side, no UDF)."""
    return F.expr(geotag_x_sql(id_col))


def geotag_y(id_col: str) -> Column:
    return F.expr(geotag_y_sql(id_col))
