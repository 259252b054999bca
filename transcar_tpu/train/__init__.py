from transcar_tpu.train.loss import detr3d_loss
from transcar_tpu.train.optim import build_optimizer, lr_schedule

__all__ = ["detr3d_loss", "build_optimizer", "lr_schedule"]
