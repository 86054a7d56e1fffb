from linear_quadtree_spark.operators.build import LQTTable, encode_points

__all__ = ["LQTTable", "encode_points"]
