from linear_quadtree_spark.plans.cover import ZRange, cover_rect, ranges_to_predicate

__all__ = ["ZRange", "cover_rect", "ranges_to_predicate"]
