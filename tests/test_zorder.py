"""Generic z-order clustering (functions/zorder.py): key correctness
against a pure-Python interleave, and the actual data-skipping effect —
clustered parquet files must have tight per-file min-max stats on BOTH
clustered columns, so a range predicate prunes most files (what
Iceberg/Delta OPTIMIZE ZORDER BY buys; measured here on real parquet
footers, not claimed)."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from linear_quadtree_spark.functions.zorder import cluster_by_zorder, zorder_col

BITS = 10
DOMAIN = 1024  # synthetic columns live in [0, 1024)
COLS = [("a", 0.0, float(DOMAIN)), ("b", 0.0, float(DOMAIN))]


def _py_zval(a: int, b: int, bits: int = BITS) -> int:
    ia = min(DOMAIN - 1, max(0, int(a * (1 << bits) / DOMAIN)))
    ib = min(DOMAIN - 1, max(0, int(b * (1 << bits) / DOMAIN)))
    out = 0
    for i in range(bits):
        out |= ((ia >> i) & 1) << (2 * i)
        out |= ((ib >> i) & 1) << (2 * i + 1)
    return out


def _synth(spark, n=40000):
    # deterministic pseudo-random 2-D points (Knuth hashes, no RNG)
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 2654435761 % DOMAIN).cast("double").alias("a"),
        ((F.col("id") * 2246822519 + 1013904223) % DOMAIN).cast("double").alias("b"),
    )


def test_zorder_key_matches_python(spark):
    rows = zorder_col(_synth(spark, 500), COLS, BITS).collect()
    for r in rows:
        assert r["zval"] == _py_zval(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_clustering_prunes_files(spark, tmp_path):
    df = _synth(spark)
    n_files = 16
    clustered = cluster_by_zorder(df, COLS, BITS, num_partitions=n_files)
    unclustered = df.repartition(n_files)
    p_c, p_u = str(tmp_path / "clustered"), str(tmp_path / "unclustered")
    clustered.write.parquet(p_c)
    unclustered.write.parquet(p_u)

    def stats(path, col):
        """(min, max) of `col` per parquet file, from footers only."""
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    def files_hit(path, col, lo, hi):
        return sum(1 for mn, mx in stats(path, col) if mx >= lo and mn <= hi)

    # a 1/8-domain range predicate on EITHER clustered column should
    # touch a minority of clustered files but (almost) all random files
    for col in ("a", "b"):
        hit_c = files_hit(p_c, col, 0.0, DOMAIN / 8)
        hit_u = files_hit(p_u, col, 0.0, DOMAIN / 8)
        assert hit_u >= n_files - 1, f"random layout should not prune ({col})"
        assert hit_c <= n_files / 2, f"z-order layout must prune {col}: {hit_c}"

    # row preservation through the cluster shuffle
    assert spark.read.parquet(p_c).count() == df.count()
