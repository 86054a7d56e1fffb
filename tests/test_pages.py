"""Page-table round-trip invariants (north rule / input_hint): the build
must keep every payload column — in particular `text` per `url` —
byte-identical through encode → range-partition → sort → save → load,
and the saved layout must prune on zs ranges."""

import pyspark.sql.functions as F

from linear_quadtree_spark import DEFAULT_BOUNDS
from linear_quadtree_spark.operators.build import LQTTable
from linear_quadtree_spark.sources.pages import pages_table


def test_text_byte_identical_per_url_through_build(spark, sf_dir, tmp_path):
    pages = pages_table(spark, sf_dir)
    tbl = LQTTable.build(pages, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    path = str(tmp_path / "pages_lqt")
    tbl.save(path)
    loaded = LQTTable.load(spark, path, DEFAULT_BOUNDS, tiebreaker="doc_id")
    stored = loaded.main.unionByName(loaded.side)

    # row preservation
    assert stored.count() == pages.count()
    assert stored.select("url").distinct().count() == pages.count()

    # byte-identity: join back on url and compare text + html exactly
    j = stored.select("url", F.col("text").alias("t2"), F.col("html").alias("h2")).join(
        pages.select("url", "text", "html"), "url"
    )
    mismatches = j.filter(
        (F.col("t2") != F.col("text")) | (F.col("h2") != F.col("html"))
    ).count()
    assert mismatches == 0

    # and the html still contains the text verbatim (extraction parity)
    bad = stored.filter(
        ~F.expr("instr(CAST(html AS STRING), text) > 0")
    ).count()
    assert bad == 0


def test_saved_layout_is_zs_sorted_and_disjoint(spark, sf_dir, tmp_path):
    """The saved main relation keeps the build's range layout: files are
    zs-sorted runs (the reference's sorted array, lqt.h:21-25), which is
    what makes row-group pruning work on the sorted column."""
    pages = pages_table(spark, sf_dir)
    tbl = LQTTable.build(pages, DEFAULT_BOUNDS, tiebreaker="doc_id", persist=False)
    path = str(tmp_path / "pages_lqt2")
    tbl.save(path)
    loaded = spark.read.parquet(f"{path}/main")
    from pyspark.sql import Window

    # the invariant is per-FILE sortedness (the reader may pack several
    # files into one partition in arbitrary order); rows of one file are
    # contiguous and in file order within a read partition
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    viol = (
        loaded.select("zs", F.lag("zs").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("zs") < F.col("prev")))
        .count()
    )
    assert viol == 0


def test_single_partition_fast_path(spark):
    """num_partitions=1 takes the noblock fast path (reference
    lqt_create_cuda_noblock, lqt.cu:159-164): no range-sampling job,
    identical rows, globally sorted in one partition."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from linear_quadtree_spark.config import DEFAULT_BOUNDS
    from linear_quadtree_spark.operators.build import LQTTable

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "x": (1000 + 100 * rng.random(500)).astype(np.float32),
            "y": (1000 + 100 * rng.random(500)).astype(np.float32),
        }
    )
    pdf["key"] = np.arange(len(pdf), dtype=np.int64)
    tbl = LQTTable.build(
        spark.createDataFrame(pdf), DEFAULT_BOUNDS, tiebreaker="key",
        num_partitions=1, persist=False,
    )
    assert tbl.main.rdd.getNumPartitions() == 1
    rows = tbl.main.select("zs", "key").collect()
    zs = [r.zs for r in rows]
    assert zs == sorted(zs)
    n_side = tbl.side.count()
    assert len(rows) + n_side == len(pdf)
    tbl.unpersist()
