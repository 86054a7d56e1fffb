"""Alternate cell index tests: cross-engine lockstep, agreement with the
reference-exact zkey prefix, and cell-algebra invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.functions.geocell import (
    cell_children_range,
    cell_neighbors,
    cell_parent_col,
    geocell_sql_duck,
    with_geocell,
)
from linear_quadtree_spark.functions.geotag import geotag_x_sql, geotag_y_sql
from linear_quadtree_spark.operators.build import encode_points
from linear_quadtree_spark.sources.synth import geotagged_docs

LEVEL = 8


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def test_geocell_lockstep(spark, sf_dir, duck):
    pts = geotagged_docs(spark, sf_dir)
    got = (
        with_geocell(pts, level=LEVEL)
        .select("doc_id", "geocell")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    exp = duck.execute(f"""
WITH pts AS (SELECT doc_id,
        {geotag_x_sql('doc_id')} AS x, {geotag_y_sql('doc_id')} AS y
    FROM documents)
SELECT doc_id, {geocell_sql_duck('x', 'y', DEFAULT_BOUNDS, LEVEL)} AS geocell
FROM pts ORDER BY doc_id
""").fetch_df()
    assert (got["geocell"].values == exp["geocell"].values).all()
    assert got["geocell"].between(0, 4**LEVEL - 1).all()


def test_geocell_agrees_with_zkey_prefix(spark, sf_dir):
    """Same bit layout as the zkey's top 2L bits: on uniform points the
    exact-double grid and the float32 quadtree descent agree except on
    boundary-degenerate points (>99%)."""
    pts = geotagged_docs(spark, sf_dir).select("doc_id", "x", "y")
    enc = encode_points(pts, DEFAULT_BOUNDS)
    both = with_geocell(enc, level=LEVEL).withColumn(
        "ztile", F.shiftrightunsigned("zkey", 64 - 2 * LEVEL)
    )
    n = both.count()
    agree = both.filter(F.col("geocell") == F.col("ztile")).count()
    assert agree / n > 0.99


def test_cell_algebra(spark):
    df = spark.createDataFrame([(0b110110,)], ["cell"])  # level-3 cell
    parent = df.select(cell_parent_col("cell", 3, 2).alias("p")).first().p
    assert parent == 0b1101
    lo, hi = cell_children_range(parent, 2, 3)
    assert lo <= 0b110110 < hi and hi - lo == 4
    # neighbors: interior cell has 8, corner cell has 3
    assert len(cell_neighbors(0b000000, 3)) == 3
    center = 0b110110  # some interior cell at level 3
    nbrs = cell_neighbors(center, 3)
    assert center not in nbrs and len(set(nbrs)) == len(nbrs)
