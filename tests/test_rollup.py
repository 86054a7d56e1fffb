"""tile_quality_rollup — the geospatial × webtext composite query:
cross-engine lockstep vs its DuckDB oracle, plus invariants tying it
back to its two constituent layers (curation membership and the
geo_tile_stats tile grid)."""

import duckdb
import pytest

import __spark_entry__ as entry
from linear_quadtree_spark.operators.text import curate_corpus
from linear_quadtree_spark.sources.synth import corpus_docs


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def test_rollup_lockstep(spark, sf_dir, duck):
    got = entry.queries()["tile_quality_rollup"](spark, sf_dir).toPandas()
    exp = duck.execute(entry.oracle_sql()["tile_quality_rollup"]).fetch_df()
    got = got.sort_values("tile", ignore_index=True)
    exp = exp.sort_values("tile", ignore_index=True)
    assert list(got.columns) == list(exp.columns)
    assert (got.values == exp.values).all()
    # tiles live on the 16x16 grid (mirror-doc geotags stay in bounds)
    assert got["tile"].between(0, 255).all()
    assert (got["n_en"] <= got["n_docs"]).all()


def test_rollup_conserves_curated_docs(spark, sf_dir):
    """Sum of per-tile doc counts == curated-corpus membership size:
    the rollup partitions exactly the curate_corpus output."""
    rolled = entry.queries()["tile_quality_rollup"](spark, sf_dir)
    total = rolled.groupBy().sum("n_docs").collect()[0][0]
    kept = curate_corpus(corpus_docs(spark, sf_dir)).count()
    assert total == kept > 0
