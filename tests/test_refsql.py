"""The DuckDB float32 emulation of the reference encode's first levels
(functions/refsql.py) is bit-exact against the verified numpy kernel —
this is what upgrades the zkey-prefix oracle queries (lqt_build_stats,
tile_stats) from rows-only to full value-hash checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from linear_quadtree_spark.config import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.encode import zorder_encode_np
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.functions.refsql import ref_prefix_cte_duck


def _kernel_prefix(x, y, levels):
    zkey, _ = zorder_encode_np(x, y, DEFAULT_BOUNDS)
    return (zkey >> np.uint64(64 - 2 * levels)).astype(np.int64)


@pytest.mark.parametrize("levels", [1, 2, 4, 6])
def test_geotag_family_exact(levels):
    """Every id the driver's geotag derivation can produce (covers all
    sf levels used by the correctness gate)."""
    con = duckdb.connect()
    sql = f"""
WITH ids AS (SELECT unnest(generate_series(0, 20000)) AS doc_id),
pts AS (SELECT doc_id, CAST({geotag_x_sql('doc_id')} AS DOUBLE) AS px,
               CAST({geotag_y_sql('doc_id')} AS DOUBLE) AS py FROM ids),
{ref_prefix_cte_duck('pts', levels, DEFAULT_BOUNDS)}
SELECT p.doc_id, p.px, p.py, r.pref
FROM pts p JOIN refenc r USING (doc_id) ORDER BY doc_id
"""
    df = con.execute(sql).fetch_df()
    x = df.px.to_numpy(np.float64).astype(np.float32)
    y = df.py.to_numpy(np.float64).astype(np.float32)
    assert (df.pref.to_numpy(np.int64) == _kernel_prefix(x, y, levels)).all()


@pytest.mark.parametrize("levels", [1, 4])
def test_adversarial_and_random_exact(levels):
    """Midlines (collapse), corners, out-of-bounds, boundary-adjacent,
    and seeded random float32 points — the emulation reproduces the
    ALGORITHM, so divergent snaps match too."""
    rng = np.random.default_rng(99)
    x = np.concatenate([
        (1000 + 100 * rng.random(20000)).astype(np.float32),
        np.float32([1050.0, 1050.0, 1025.0, 1075.0, 1000.0, 1100.0, 500.0,
                    299.999, 7.0, 1050.0, 1049.9999,
                    1006.25, 1006.2499, 1006.2501, 1012.5, 1043.75, 1093.75]),
    ])
    y = np.concatenate([
        (1000 + 100 * rng.random(20000)).astype(np.float32),
        np.float32([1050.0, 1025.0, 1025.0, 1075.0, 1000.0, 1100.0, 1050.0,
                    299.999, 14.0, 1033.3, 1050.0001,
                    1006.25, 1012.4999, 1012.5001, 1018.75, 1031.25, 1087.5]),
    ])
    con = duckdb.connect()
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(x)),
        "px": x.astype(np.float64),
        "py": y.astype(np.float64),
    })
    con.register("adv_df", pdf)
    sql = f"""
WITH pts AS (SELECT doc_id, px, py FROM adv_df),
{ref_prefix_cte_duck('pts', levels, DEFAULT_BOUNDS)}
SELECT doc_id, pref FROM refenc ORDER BY doc_id
"""
    got = con.execute(sql).fetch_df().pref.to_numpy(np.int64)
    assert (got == _kernel_prefix(x, y, levels)).all()
