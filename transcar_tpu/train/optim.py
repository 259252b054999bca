"""Optimizer: AdamW with param groups, freeze mask, warmup+cosine schedule.

Parity targets:
  * AdamW lr 1.5e-5, weight_decay 0.01, backbone lr ×0.1
    (config detr3d_res101_gridmask.py:206-213).
  * grad clip max_norm 35 (L2) before the step (config :214).
  * linear warmup (4000 iters, ratio 1/3) into cosine annealing with
    min_lr_ratio 1e-3 (config :216-221).  mmcv anneals by epoch and scales
    the warmup factor multiplicatively into the regular lr; here the cosine
    runs continuously by step — same endpoints, smoother interior.
  * the TransCAR freeze (tools/train.py:238-252): backbone, neck, DETR3D
    decoder (incl. reference_points + query embedding) and camera cls/reg
    branches are frozen; only the head's fusion/final/radar params train.
    Frozen params are excluded from the step entirely (zero grad + no
    AdamW weight decay), matching ``requires_grad=False``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from transcar_tpu.core.config import OptimConfig

_FUSION_PREFIXES = ("fusion", "final_cls", "final_reg", "radar_")


def lr_schedule(cfg: OptimConfig, total_steps: int) -> optax.Schedule:
    """Linear warmup from lr·warmup_ratio, then cosine to lr·min_lr_ratio."""
    base = cfg.lr

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
        cos = cfg.min_lr_ratio + (1.0 - cfg.min_lr_ratio) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac))
        warm_frac = jnp.clip(step / jnp.maximum(cfg.warmup_iters, 1), 0, 1)
        warm = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * warm_frac
        return base * cos * warm

    return sched


def make_labels(params, freeze_camera: bool, backbone_lr_mult: float,
                frozen_stages: int = 1, norm_eval: bool = True):
    """Build the multi_transform label pytree.

    ``frozen_stages`` mirrors mmdet ResNet/VoVNet stage freezing
    (config detr3d_res101_gridmask.py:34 ``frozen_stages=1``): the stem
    and stages 1..frozen_stages get ``requires_grad=False`` in the
    reference, so in full-training (DETR3D) mode their conv kernels are
    labeled "frozen" here rather than trained at backbone lr·0.1.

    ``norm_eval``: the camera backbones freeze BN affine params
    (requires_grad=False, config :38-39); the LiDAR track trains them
    (``type='BN'``, pillar.py:65-80) — set norm_eval=False there.
    """

    def label(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        top = keys[0] if keys else ""
        # FrozenBN statistics are stored as params for checkpoint
        # round-tripping but are buffers in torch — never optimized
        if keys and keys[-1] in ("mean", "var"):
            return "frozen"
        if freeze_camera:
            # TransCAR mode: only head fusion/final/radar params train
            if top == "head" and len(keys) > 1 and keys[1].startswith(
                    _FUSION_PREFIXES):
                return "main"
            return "frozen"
        # DETR3D full training: backbone gets lr ×0.1; its frozen-BN affine
        # params never train (requires_grad=False, norm_eval config :38-39)
        if norm_eval and top == "backbone" and any(
                k == "bn" or k.startswith("bn") for k in keys[1:]):
            return "frozen"
        if top == "vfe":
            # ObjDGCNN: pts_voxel_encoder shares the SECOND lr×0.1 group
            # (pillar.py:286-291 custom_keys)
            return "backbone"
        if top == "backbone":
            # stem + layer1..layer{frozen_stages} (mmdet ResNet) /
            # stage2..stage{frozen_stages+1} (vovnet.py:353-364) are
            # requires_grad=False in the reference
            sub = keys[1] if len(keys) > 1 else ""
            if sub.startswith("stem") and frozen_stages >= 0:
                return "frozen"
            for s in range(1, frozen_stages + 1):
                if sub.startswith((f"layer{s}_", f"stage{s + 1}_")):
                    return "frozen"
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg: OptimConfig, params: Any, total_steps: int,
                    freeze_camera: bool | None = None,
                    frozen_stages: int = 1, norm_eval: bool = True
                    ) -> optax.GradientTransformation:
    if freeze_camera is None:
        freeze_camera = cfg.freeze_camera_branch
    sched = lr_schedule(cfg, total_steps)
    labels = make_labels(params, freeze_camera, cfg.backbone_lr_mult,
                         frozen_stages=frozen_stages, norm_eval=norm_eval)

    def adamw(lr_mult):
        return optax.adamw(
            lambda s: sched(s) * lr_mult,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay)

    frozen_mask = jax.tree_util.tree_map(lambda l: l == "frozen", labels)
    return optax.chain(
        # zero frozen grads BEFORE clipping so the clip norm matches a
        # requires_grad=False run
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.multi_transform(
            {
                "main": adamw(1.0),
                "backbone": adamw(cfg.backbone_lr_mult),
                "frozen": optax.set_to_zero(),
            },
            labels),
    )
