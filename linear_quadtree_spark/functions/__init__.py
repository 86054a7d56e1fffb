from linear_quadtree_spark.functions.encode import (
    encode_struct_udf,
    tile_id_col,
    zorder_encode_np,
    zs_from_zkey,
)

__all__ = ["zorder_encode_np", "encode_struct_udf", "tile_id_col", "zs_from_zkey"]
