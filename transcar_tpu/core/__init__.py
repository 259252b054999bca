from transcar_tpu.core import boxes, geometry
from transcar_tpu.core.config import (
    BackboneConfig,
    DataConfig,
    HeadConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    TransCARConfig,
    get_preset,
    list_presets,
)

__all__ = [
    "boxes",
    "geometry",
    "BackboneConfig",
    "DataConfig",
    "HeadConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "TransCARConfig",
    "get_preset",
    "list_presets",
]
