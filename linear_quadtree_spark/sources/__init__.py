from linear_quadtree_spark.sources.synth import (
    geotagged_docs,
    knn_queries_df,
    knn_query_params,
    poly_params,
    polygons_df,
)

__all__ = [
    "geotagged_docs",
    "polygons_df",
    "poly_params",
    "knn_queries_df",
    "knn_query_params",
]
