"""Substrate cache ownership across per-query release boundaries.

The driver sweeps ``__spark_entry__.queries()`` in one session; each
entry is wrapped by ``_scoped`` which calls ``release_caches()`` first.
The built LQT substrate must SURVIVE that sweep (it is shared by every
table-backed query) — ``_adopt_table`` transfers its persisted
relations out of the global registry into ``_TBL_CACHE`` ownership.
Regression: before the fix, the first ``release_caches()`` unpersisted
main/side/enc while ``_TBL_CACHE`` kept handing out the stale table, so
every table-backed query after the first silently re-ran the full
encode+sort lineage.
"""

import __spark_entry__ as entrymod
from linear_quadtree_spark.cache import release_caches, track, untrack


def test_substrate_survives_release_caches(spark, sf_dir):
    entrymod._TBL_CACHE.clear()
    tbl = entrymod._build_table(spark, sf_dir)
    assert tbl.main.storageLevel.useMemory or tbl.main.storageLevel.useDisk

    release_caches()  # what _scoped does at every query entry
    assert tbl.main.storageLevel.useMemory or tbl.main.storageLevel.useDisk, (
        "release_caches() must not unpersist the adopted substrate"
    )
    assert tbl.side.storageLevel.useMemory or tbl.side.storageLevel.useDisk

    # the cache returns the same live object, not a rebuild
    assert entrymod._build_table(spark, sf_dir) is tbl

    # doc and geo substrates of the SAME (app, sf_dir) coexist
    geo = entrymod._build_geo_table(spark, sf_dir)
    assert geo.main.storageLevel.useMemory or geo.main.storageLevel.useDisk
    assert tbl.main.storageLevel.useMemory or tbl.main.storageLevel.useDisk


def test_untrack_transfers_ownership(spark):
    df = track(spark.range(10).cache())
    df.count()
    assert untrack(df) == 1
    release_caches()
    assert df.storageLevel.useMemory, "untracked handle must not be released"
    df.unpersist()
    assert untrack(df) == 0  # already removed; identity-based, idempotent


def test_tile_counts_memo_heals_after_sibling_unpersist(spark, sf_dir):
    """Two tables over the SAME lineage share one plan-keyed CacheManager
    entry for their tile_counts substrate; the first table's unpersist()
    drops it for both. The memo must detect the dropped entry and
    re-persist instead of handing out an uncached handle that re-runs
    the corpus aggregate on every downstream action."""
    from linear_quadtree_spark import DEFAULT_BOUNDS
    from linear_quadtree_spark.operators.build import LQTTable
    from linear_quadtree_spark.functions.geotag import geotag_x, geotag_y

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = docs.select(
        "doc_id",
        geotag_x("doc_id").alias("x"),
        geotag_y("doc_id").alias("y"),
    )
    a = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id")
    b = LQTTable.build(pts, DEFAULT_BOUNDS, tiebreaker="doc_id")
    exp = a.tile_counts(4).count()
    got_b = b.tile_counts(4)
    assert got_b.count() == exp

    a.unpersist()  # drops the SHARED plan-keyed cache entry
    healed = b.tile_counts(4)
    assert healed.count() == exp
    assert healed.is_cached, (
        "memoized substrate must re-persist after a same-plan sibling's"
        " unpersist dropped the shared CacheManager entry"
    )
    b.unpersist()
