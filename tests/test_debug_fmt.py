"""Reference-format node dump parity (lqt_print_node/lqt_print_nodes,
lqt.cpp:153-181): the Spark column formatter must byte-match C printf
for the %.15f coordinate rendering, the decimal uint64 key, and the
MSB-first bit-pairs."""

import numpy as np
import pandas as pd

from linear_quadtree_spark.config import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.debug import format_nodes
from linear_quadtree_spark.functions.encode import zorder_encode_np
from linear_quadtree_spark.operators.build import encode_points


def _c_line(x32, y32, key, zkey, verbose):
    # Python's % formatting matches C printf for these values: float32
    # coords in/near the bounds have exact decimal expansions of <= 15
    # fractional digits, so no rounding mode is exercised.
    line = "%.15f\t%.15f\t%d" % (float(x32), float(y32), key)
    if not verbose:
        return line
    pairs = "".join(
        f"{(int(zkey) >> j) & 1}{(int(zkey) >> (j - 1)) & 1} "
        for j in range(63, 0, -2)
    )
    return f"{pairs}{int(zkey)} {line}"


def test_format_matches_c_printf(spark):
    pdf = pd.DataFrame(
        {
            "x": np.float32([1050.0, 1000.0, 1099.999, 1023.4567, 500.0, 1075.5]),
            "y": np.float32([1050.0, 1000.0, 1099.999, 1081.25, 1050.0, 1025.125]),
        }
    )
    pdf["key"] = np.arange(len(pdf), dtype=np.int64)
    enc = encode_points(spark.createDataFrame(pdf), DEFAULT_BOUNDS)
    zkey, _ = zorder_encode_np(pdf.x.to_numpy(), pdf.y.to_numpy(), DEFAULT_BOUNDS)

    for verbose in (False, True):
        got = [r.line for r in format_nodes(enc, verbose=verbose).collect()]
        order = np.lexsort((pdf.key.to_numpy(), zkey.view(np.int64) ^ np.int64(-(2**63))))
        exp = [
            _c_line(pdf.x[i], pdf.y[i], int(pdf.key[i]), zkey[i], verbose)
            for i in order
        ]
        assert got == exp
