"""Linear-quadtree construction — the reference's signature pattern,
Spark-first.

Reference pipelines (`lqt_create*`, SURVEY §2.5) are all
``nodify → sortify [→ merge]``. The distributed shape is `lqt_create_cuda`
(lqt.cu:122-156): slice input into memory-sized blocks, encode+sort each,
k-way merge. In Spark:

* block planning (lqt.cu:127-139)   → ``repartitionByRange(N, zs)``
  (RangePartitioner IS the reference's own samplesort, samplesort.hh:53-120:
  sample → splitters → scatter → per-bin sort);
* per-block encode+sort             → pandas-UDF encode stage +
  ``sortWithinPartitions``;
* k-way merge (lqt.cu:65-91)        → free: range partitions are disjoint,
  so partition-ordered reads are globally ordered.

Tie semantics: the reference orders by location only, ties impl-defined
across its six sorters (SURVEY §2.3a); we always sort ``(zs, tiebreaker)``
for reproducibility.

Skew: midline collapse (SURVEY §1.3) plus real-world hot cells concentrate
equal zs values; RangePartitioner cannot split equal keys, so builds can
optionally salt the range key with a deterministic hash of the payload id,
which splits equal-zs runs across partitions while keeping global zs order
across partition boundaries.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linear_quadtree_spark.config import Bounds, DEFAULT_BOUNDS, MAX_SAFE_LEVEL
from linear_quadtree_spark.functions.encode import encode_struct_udf, tile_id_col
from linear_quadtree_spark.plans.cover import ZRange, cover_rect, ranges_to_predicate

__all__ = ["encode_points", "LQTTable", "STORE_SPLIT_LEVEL"]

#: Rows with zlvl < this go to the side relation at build time. Queries may
#: then plan covers at any level ≤ this and stay exact: main-table rows are
#: prefix-faithful through it, side-table rows are always fully scanned
#: (they are ~1% of uniform data; see encode.py).
STORE_SPLIT_LEVEL = 12


def encode_points(
    df: DataFrame,
    bounds: Bounds = DEFAULT_BOUNDS,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Add (zkey, zs, zlvl) columns — one Arrow round trip (SURVEY §4:
    compose fused outputs in a single UDF, the analog of the reference's
    on-device encode+sort fusion, lqt.cu:277-334)."""
    enc = encode_struct_udf(bounds)
    return (
        df.withColumn("_enc", enc(F.col(x_col).cast("float"), F.col(y_col).cast("float")))
        .withColumn("zkey", F.col("_enc.zkey"))
        .withColumn("zs", F.col("_enc.zs"))
        .withColumn("zlvl", F.col("_enc.zlvl"))
        .drop("_enc")
    )


@dataclass
class LQTTable:
    """A built linear quadtree over an arbitrary payload DataFrame.

    ``main``: zs-range-partitioned, (zs, tiebreaker)-sorted rows with
    zlvl >= STORE_SPLIT_LEVEL — the reference's sorted key/point array
    (lqt.h:21-25), distributed.
    ``side``: the prefix-unfaithful residue (midline collapse, out-of-
    bounds, float32 snap divergence below the split level). Tiny by
    construction; queries scan it exactly, so answers are exact.
    """

    main: DataFrame
    side: DataFrame
    bounds: Bounds
    x_col: str = "x"
    y_col: str = "y"
    tiebreaker: str | None = None
    build_metrics: dict = field(default_factory=dict)
    enc_cache: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the encoded staging cache and any persisted relations."""
        for df in (self.enc_cache, self.main, self.side):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        df: DataFrame,
        bounds: Bounds = DEFAULT_BOUNDS,
        x_col: str = "x",
        y_col: str = "y",
        tiebreaker: str | None = None,
        num_partitions: int | None = None,
        salt: int = 0,
        persist: bool = True,
    ) -> "LQTTable":
        """Encode + range-partition + sort — `lqt_create_cuda` re-expressed.

        ``salt > 0`` adds a deterministic payload-hash salt as a secondary
        range key: equal-zs runs (hot cells / midline collapse) split
        across up to ``salt`` partitions instead of hot-spotting one.
        """
        t0 = time.time()
        # Materialize the encode exactly ONCE. Without this, (a) Catalyst
        # pushes the zlvl filter beneath the projection so ArrowEvalPython
        # appears twice in one stage (UDF runs 2x/row), and (b) the
        # RangePartitioner's sampling pass plus the side-relation scan each
        # re-run the whole encode. Measured 5-7 full UDF passes per build;
        # with the cache it is one. At cluster scale this cache is the
        # encoded staging table (MEMORY_AND_DISK serialized ≈ its size on
        # disk); writing it to storage instead is the same plan shape.
        enc = encode_points(df, bounds, x_col, y_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # Eagerly materialize the staging cache BEFORE the range shuffle:
        # letting the RangePartitioner's sampling job populate it while
        # the same action's shuffle-map tasks compete for execution memory
        # evicts cache blocks mid-build (measured 2x wall). The count also
        # feeds the build metrics.
        n_rows = enc.count()
        main = enc.filter(F.col("zlvl") >= STORE_SPLIT_LEVEL)
        side = enc.filter(F.col("zlvl") < STORE_SPLIT_LEVEL)

        sort_cols = ["zs"] + ([tiebreaker] if tiebreaker else [])
        if num_partitions is None:
            # 2 partitions per core: one-task-per-slot waves convoy on
            # Python-worker startup and leave no room for stragglers; at
            # cluster scale partition count is sized by bytes instead
            # (~input_bytes / 256 MB), which the caller passes explicitly.
            num_partitions = max(2 * df.sparkSession.sparkContext.defaultParallelism, 2)
        if salt > 1:
            tb = tiebreaker or x_col
            main = main.withColumn("_salt", F.pmod(F.xxhash64(F.col(tb)), F.lit(salt)))
            main = main.repartitionByRange(num_partitions, "zs", "_salt").drop("_salt")
        else:
            main = main.repartitionByRange(num_partitions, "zs")
        main = main.sortWithinPartitions(*sort_cols)

        if persist:
            main = main.persist()
            side = side.persist()
        tbl = cls(
            main=main,
            side=side,
            bounds=bounds,
            x_col=x_col,
            y_col=y_col,
            tiebreaker=tiebreaker,
            build_metrics={"build_started": t0, "rows": n_rows,
                           "encode_secs": time.time() - t0},
            enc_cache=enc,
        )
        return tbl

    # ------------------------------------------------------------ persistence
    def save(self, path: str, mode: str = "overwrite") -> None:
        """Write as two parquet relations. At cluster scale this is the
        Iceberg writer (sorted files give min/max zs stats per file →
        partition pruning for range predicates); parquet is the sandbox
        drop-in with identical pruning semantics via row-group stats."""
        self.main.write.mode(mode).parquet(f"{path}/main")
        self.side.write.mode(mode).parquet(f"{path}/side")

    @classmethod
    def load(
        cls,
        spark,
        path: str,
        bounds: Bounds = DEFAULT_BOUNDS,
        x_col: str = "x",
        y_col: str = "y",
        tiebreaker: str | None = None,
    ) -> "LQTTable":
        return cls(
            main=spark.read.parquet(f"{path}/main"),
            side=spark.read.parquet(f"{path}/side"),
            bounds=bounds,
            x_col=x_col,
            y_col=y_col,
            tiebreaker=tiebreaker,
        )

    # ------------------------------------------------------------- candidates
    def candidates(self, ranges: list[ZRange]) -> DataFrame:
        """Conservative candidate rows for a predicate whose cover is
        ``ranges``: range-pruned main scan ∪ full side scan. The range
        predicate is plain comparisons on the sorted zs column → parquet
        row-group pruning / Iceberg file pruning at scale."""
        pruned = self.main.filter(ranges_to_predicate(ranges, F.col("zs")))
        return pruned.unionByName(self.side)

    def cover(self, x0: float, x1: float, y0: float, y1: float, max_level: int = 10,
              max_ranges: int = 256) -> list[ZRange]:
        if max_level > STORE_SPLIT_LEVEL:
            raise ValueError(
                f"cover level {max_level} exceeds store split level "
                f"{STORE_SPLIT_LEVEL}; side relation would be incomplete"
            )
        return cover_rect(x0, x1, y0, y1, self.bounds, max_level, max_ranges)

    # ------------------------------------------------------------------ stats
    def partition_metrics(self) -> DataFrame:
        """Per-partition lineage/metrics relation (north rule): partition id,
        row count, zs min/max — the distributed analog of the reference's
        per-block bookkeeping in lqt_create_cuda (lqt.cu:139-148)."""
        return (
            self.main.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("zs").alias("zs_min"),
                F.max("zs").alias("zs_max"),
                F.countDistinct("zkey").alias("distinct_zkeys"),
            )
        )

    def log_metrics(self, path: str, build_id: str) -> DataFrame:
        """Append this build's per-partition lineage/metrics rows to a
        metrics table (north rule: per-partition lineage + metrics logged
        durably; parquet append here, an Iceberg append at cluster scale).
        Returns what was written."""
        m = self.partition_metrics().withColumn("build_id", F.lit(build_id))
        for k in ("rows", "encode_secs"):
            if k in self.build_metrics:
                m = m.withColumn(f"build_{k}", F.lit(self.build_metrics[k]))
        m.write.mode("append").parquet(path)
        return m

    def tiles(self, zoom: int) -> DataFrame:
        """Rows with raster tile id at ``zoom`` — pure column expression
        (SURVEY §2.9): tile = zkey >>> (64-2z)."""
        full = self.main.unionByName(self.side)
        return full.withColumn("tile_id", tile_id_col(F.col("zkey"), zoom))
