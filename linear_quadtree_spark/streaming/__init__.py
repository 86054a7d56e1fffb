from linear_quadtree_spark.streaming.pipeline import (  # noqa: F401
    EVENTS_SCHEMA,
    hourly_counts_batch,
    hourly_counts_stream,
    read_events_stream,
    run_available_now,
    run_available_now_to_parquet,
)
from linear_quadtree_spark.streaming.tiles import (  # noqa: F401
    DOCS_SCHEMA,
    read_docs_stream,
    tile_counts_batch,
    tile_counts_stream,
)
from linear_quadtree_spark.streaming.sessionize import (  # noqa: F401
    sessionize_batch,
    sessionize_batch_sql_duck,
    sessionize_stream,
)
