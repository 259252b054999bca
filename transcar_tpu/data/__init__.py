from transcar_tpu.data.gridmask import grid_mask

__all__ = ["grid_mask"]
