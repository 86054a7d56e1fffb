"""linear_quadtree_spark — a from-scratch PySpark-native linear-quadtree
spatial-join + tiling engine.

Reference semantics: rob05c/linear-quadtree (a C++/CUDA construction kernel
that turns 2-D points into a sorted array of 64-bit Morton-style keys,
``lqt.h:21-25``, ``lqt.cpp:35-69``). This package re-expresses that pattern
Spark-first:

* key computation = vectorized numpy-float32 pandas UDF (Arrow batches),
  bit-exact to the reference encode (``lqt.cpp:47-66``);
* "sortify" (``lqt.cpp:116-146`` and the five other sorters) =
  ``repartitionByRange().sortWithinPartitions()`` — Spark's RangePartitioner
  is the reference's own samplesort (``samplesort.hh:53-120``) at cluster
  scale;
* the k-way block merge (``lqt.cu:65-91``) is free: range partitions are
  disjoint, so the globally sorted layout IS the merged tree;
* query operators the reference lacks (bbox scan, point-in-polygon join,
  kNN, raster tiles) are key-range algebra over the sorted zkey column,
  expressed as ordinary DataFrame plans that Catalyst optimizes.
"""

from linear_quadtree_spark.config import Bounds, DEFAULT_BOUNDS, DEPTH

__all__ = ["Bounds", "DEFAULT_BOUNDS", "DEPTH"]
__version__ = "0.1.0"
