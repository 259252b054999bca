from transcar_tpu.data.gridmask import grid_mask
from transcar_tpu.data.infos import NuScenesInfos, cbgs_indices
from transcar_tpu.data.loader import PrefetchLoader, collate, pad_gt, prepare_sample
from transcar_tpu.data.radar import build_radar_tokens, load_radar_tokens

__all__ = [
    "grid_mask",
    "NuScenesInfos",
    "cbgs_indices",
    "PrefetchLoader",
    "collate",
    "pad_gt",
    "prepare_sample",
    "build_radar_tokens",
    "load_radar_tokens",
]
