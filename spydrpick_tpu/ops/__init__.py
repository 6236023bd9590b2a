from spydrpick_tpu.ops.mi import mi_from_crosstabs, make_tile_mi_fn

__all__ = ["mi_from_crosstabs", "make_tile_mi_fn"]
