"""Reference-parity debug printers / golden-line formatters.

Reproduces the reference's node dump format (``lqt_print_node``,
lqt.cpp:153-161: optional 32 bit-pairs + decimal uint64 key, then
``%.15f\\t%.15f\\t%d`` for x, y, payload key; ``lqt_print_nodes``
header, lqt.cpp:169-181) so a golden dump of a built tree is
``format_nodes(tbl).write.text(path)`` and diffs line-for-line against
the compiled reference's stdout.

The line renderer is a pandas UDF on purpose: C's ``%.15f`` prints the
exact binary value expanded to 15 decimals, which Python's ``%``
formatting matches byte-for-byte, while the JVM's ``Formatter`` pads
the *shortest round-trip* digits with zeros (e.g. 1023.456726074218**80**0
vs C's …**75**0) — a presentation-layer divergence no column expression
avoids. This is a debug/golden-dump utility, not a hot path; the batch
still moves through Arrow once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = ["node_line_udf", "format_nodes", "print_nodes"]


def node_line_udf(verbose: bool = False):
    """Pandas UDF (x, y, key, zkey) -> reference-format line."""

    @F.pandas_udf(StringType())
    def _fmt(x: pd.Series, y: pd.Series, key: pd.Series, zkey: pd.Series) -> pd.Series:
        out = []
        for xv, yv, kv, zv in zip(x, y, key, zkey):
            line = "%.15f\t%.15f\t%d" % (float(xv), float(yv), int(kv))
            if verbose:
                u = int(zv) & 0xFFFFFFFFFFFFFFFF  # uint64 bits of the key
                pairs = "".join(
                    f"{(u >> j) & 1}{(u >> (j - 1)) & 1} "
                    for j in range(63, 0, -2)
                )
                line = f"{pairs}{u} {line}"
            out.append(line)
        return pd.Series(out)

    return _fmt


def format_nodes(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    key_col: str = "key",
    zkey_col: str = "zkey",
    verbose: bool = False,
    order: bool = True,
) -> DataFrame:
    """Single-column ('line') DataFrame of reference-format node dumps,
    in tree order (zs, key) when ``order`` — write with ``.write.text``
    for a golden file, or collect for a diff."""
    fmt = node_line_udf(verbose)
    out = df.select(
        F.col("zs"),
        F.col(key_col),
        fmt(
            F.col(x_col).cast("double"),
            F.col(y_col).cast("double"),
            F.col(key_col).cast("long"),
            F.col(zkey_col),
        ).alias("line"),
    )
    if order:
        out = out.orderBy("zs", key_col)
    return out.select("line")


def print_nodes(df: DataFrame, verbose: bool = False, **cols) -> None:
    """Driver-side convenience twin of ``lqt_print_nodes`` (header +
    lines, lqt.cpp:169-181). Collects — small trees only."""
    print("linear quadtree: ")
    if verbose:
        print(" " * 12 * 8, end="")
    print("x\ty\tkey")
    for r in format_nodes(df, verbose=verbose, **cols).collect():
        print(r.line)
    print()
