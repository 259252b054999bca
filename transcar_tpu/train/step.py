"""Jitted train/eval steps over a device mesh.

Replaces the reference's EpochBasedRunner iteration + DDP backward
(SURVEY.md §3.1): one jitted function computes forward, loss (with global
Hungarian matching), backward, clip and AdamW update; XLA inserts the
cross-device gradient reductions implied by the batch sharding.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from transcar_tpu.core.config import TransCARConfig
from transcar_tpu.eval.decode import nms_free_decode
from transcar_tpu.models.detector import TransCARDetector
from transcar_tpu.parallel.mesh import batch_sharding, replicated
from transcar_tpu.train.loss import detr3d_loss
from transcar_tpu.train.optim import build_optimizer


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # running BN statistics (LiDAR track trains its norms, pillar.py:65-80;
    # empty dict for the camera track whose BN is frozen)
    batch_stats: Any = {}


def _device_photometric(x: jnp.ndarray, p: jnp.ndarray,
                        perm: jnp.ndarray) -> jnp.ndarray:
    """PhotoMetricDistortionMultiViewImage's pixel math on device
    (transform_3d.py:139-180; choices drawn on host —
    data/pipeline.py::draw_photometric_params).  Everything here is
    elementwise fp32, so XLA fuses it into the normalize pass that
    follows — the host ships plain uint8 and does no float math at all
    (numpy's GIL-bound aug chain measured ~5 s/sample).

    x [B, N, H, W, 3] fp32 BGR; p [B, N, 5] = (brightness, mode,
    contrast_alpha, saturation_alpha, hue_deg); perm [B, N, 3] int32.
    Op order matches the reference: brightness → contrast(mode 1) →
    HSV → saturation → hue → BGR → contrast(mode 0) → channel swap.
    The HSV round trip runs unconditionally like the reference — it is
    NOT an identity for out-of-gamut (e.g. brightness-darkened
    all-negative) pixels, which collapse to grey via S = 0; the host
    path (pipeline.py::apply_photometric) matches exactly."""
    from transcar_tpu.data import pipeline as _pp

    bc5 = (slice(None), slice(None), None, None, None)  # [B,N]→[B,N,1,1,1]
    bc4 = (slice(None), slice(None), None, None)        # [B,N]→[B,N,1,1]
    x = x + p[..., 0][bc5]
    mode1 = (p[..., 1] == 1)[bc5]
    alpha = p[..., 2][bc5]
    x = x * jnp.where(mode1, alpha, 1.0)
    # BGR → HSV → BGR through the SAME converters as the host fallback
    # (data/pipeline.py, xp=jnp) — one implementation, no drift
    hsv = _pp._bgr2hsv(x, xp=jnp)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    s = s * p[..., 3][bc4]
    h = h + p[..., 4][bc4]                 # single wrap, like the reference
    h = jnp.where(h > 360.0, h - 360.0, h)
    h = jnp.where(h < 0.0, h + 360.0, h)
    x = _pp._hsv2bgr(jnp.stack([h, s, v], axis=-1), xp=jnp)
    x = x * jnp.where(mode1, 1.0, alpha)
    # per-image channel swap: gather along the last axis
    x = jnp.take_along_axis(x, perm[:, :, None, None, :], axis=-1)
    return x


def normalize_batch_images(batch: Dict[str, jnp.ndarray], dc) -> Dict:
    """On-device analog of [PhotoMetricDistortion (train) →]
    NormalizeMultiviewImage → PadMultiViewImage(0) for uint8-transferred
    batches (DataConfig.normalize_on_device — 4× fewer host→device
    bytes; data/loader.py::prepare_sample).

    No-op for float batches (bench/tests feed pre-normalized fp32).
    ``img_shape`` [B, 2] records the pre-pad content extent so padding
    stays exactly 0 in normalized space, matching the host pipeline's
    normalize-then-pad order (pipeline.py:47-56; the aug runs before
    the pad mask, so distorted padding is re-zeroed exactly)."""
    imgs = batch.get("images")
    if imgs is None or imgs.dtype != jnp.uint8:
        return batch
    x = imgs.astype(jnp.float32)
    pp = batch.get("photo_params")
    if pp is not None:
        x = _device_photometric(x, pp, batch["photo_perm"])
    if dc.to_rgb:
        x = x[..., ::-1]
    mean = jnp.asarray(dc.img_mean, jnp.float32)
    std = jnp.asarray(dc.img_std, jnp.float32)
    x = (x - mean) / std
    hw = batch.get("img_shape")
    if hw is not None:                         # zero the padded border
        rows = jnp.arange(x.shape[-3])[None, None, :, None]
        cols = jnp.arange(x.shape[-2])[None, None, None, :]
        mask = ((rows < hw[:, 0][:, None, None, None])
                & (cols < hw[:, 1][:, None, None, None]))
        x = x * mask[..., None].astype(x.dtype)
    out = dict(batch)
    out["images"] = x
    out.pop("photo_params", None)
    out.pop("photo_perm", None)
    return out


def apply_model(model, params, batch, train: bool, rngs=None,
                batch_stats=None, stop_camera_grad: bool = False):
    """Dispatch on batch modality: camera/fusion batches carry ``images``;
    LiDAR (ObjDGCNN) batches carry ``points``/``num_points``.

    With non-empty ``batch_stats`` and ``train=True``, returns
    (preds, new_batch_stats); otherwise just preds."""
    var = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        var["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (has_bn and train) else False
    if "points" in batch:
        out = model.apply(var, batch["points"], batch["num_points"],
                          deterministic=not train, rngs=rngs,
                          mutable=mutable)
    else:
        out = model.apply(var, batch["images"], batch["lidar2img"],
                          batch.get("radar_tokens"), train=train, rngs=rngs,
                          stop_camera_grad=stop_camera_grad and train,
                          mutable=mutable)
    if mutable:
        preds, new_vars = out
        return preds, new_vars["batch_stats"]
    return out


def init_state(cfg: TransCARConfig, model, sample_batch,
               total_steps: int, rng: jax.Array) -> Tuple[TrainState, Any]:
    """Initialize params + optimizer from an example (host-side) batch."""
    sample_batch = normalize_batch_images(sample_batch, cfg.data)
    if "points" in sample_batch:
        variables = model.init(rng, sample_batch["points"],
                               sample_batch["num_points"])
    else:
        variables = model.init(
            rng, sample_batch["images"], sample_batch["lidar2img"],
            sample_batch.get("radar_tokens"))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(cfg.train.optim, params, total_steps,
                         freeze_camera=cfg.train.optim.freeze_camera_branch
                         and cfg.model.head.with_radar_fusion,
                         frozen_stages=cfg.model.backbone.frozen_stages,
                         norm_eval=cfg.model.backbone.norm_eval)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state,
                      batch_stats), tx


def make_train_step(cfg: TransCARConfig, model, tx,
                    mesh=None):
    """Build the jitted train step.  ``batch`` leaves are sharded along the
    mesh's data axis; state is replicated."""

    # fusion-only training: the reference freezes the whole camera net
    # (requires_grad=False ⇒ torch builds no camera backward,
    # tools/train.py:238-252); cut the grad at the fusion input so XLA
    # doesn't either — trainable-param grads are unchanged
    stop_cam = (cfg.train.optim.freeze_camera_branch
                and cfg.model.head.with_radar_fusion)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        batch = normalize_batch_images(batch, cfg.data)
        step_rng = jax.random.fold_in(rng, state.step)
        gm_rng, do_rng = jax.random.split(step_rng)

        def loss_fn(params):
            out = apply_model(
                model, params, batch, train=True,
                rngs={"gridmask": gm_rng, "dropout": do_rng},
                batch_stats=state.batch_stats,
                stop_camera_grad=stop_cam)
            preds, new_stats = out if bool(state.batch_stats) else (out,
                                                                    {})
            losses = detr3d_loss(
                preds, batch["gt_boxes"], batch["gt_labels"],
                batch["num_gt"], cfg.model.head)
            return losses["total"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state,
                          new_stats), losses

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    # a single sharding per argument broadcasts over that pytree's leaves
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_aug_eval_step(cfg: TransCARConfig, model,
                       augs: Tuple[str, ...] = ("identity", "flip")):
    """Jitted test-time-augmentation inference (reference ``aug_test``,
    detr3d.py:195-219): backbone+FPN features are averaged over the
    augmented copies and the head runs ONCE on the first view's
    ``lidar2img`` (the reference uses ``img_metas[0]`` likewise).

    ``augs``: any of ``identity`` / ``flip`` (horizontal image flip).
    The aug copies are built ON DEVICE from the normal eval batch —
    one wire transfer, A backbone passes fused into one jit.  Feature
    averaging follows the reference verbatim, including averaging the
    flipped view's features UNALIGNED with the original's (it never
    mirrors them back — kept for parity, like the broken h-flip the
    pipeline documents)."""
    known = {"identity", "flip"}
    bad = set(augs) - known
    if bad:
        raise ValueError(f"unknown aug(s) {sorted(bad)}; pick from "
                         f"{sorted(known)}")

    def aug_step(params, batch, batch_stats=None):
        batch = normalize_batch_images(batch, cfg.data)
        imgs = batch["images"]                      # [B, N, H, W, 3]
        stack = [imgs if a == "identity" else imgs[:, :, :, ::-1, :]
                 for a in augs]
        images_augs = jnp.stack(stack)              # [A, B, N, H, W, 3]
        var = {"params": params}
        if batch_stats:
            var["batch_stats"] = batch_stats
        preds = model.apply(var, images_augs, batch["lidar2img"],
                            batch.get("radar_tokens"),
                            method="aug_forward")
        return nms_free_decode(preds, cfg.model.head)

    return jax.jit(aug_step)


def make_eval_step(cfg: TransCARConfig, model, mesh=None):
    """Jitted inference + NMS-free decode.  ``batch_stats`` (running BN
    averages, LiDAR track) rides as an optional extra argument."""

    def eval_step(params, batch, batch_stats=None):
        batch = normalize_batch_images(batch, cfg.data)
        preds = apply_model(model, params, batch, train=False,
                            batch_stats=batch_stats)
        return nms_free_decode(preds, cfg.model.head)

    if mesh is None:
        return jax.jit(eval_step)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    jitted = jax.jit(eval_step, in_shardings=(rep, bs, rep),
                     out_shardings=bs)

    # pjit requires the arity of in_shardings to match the call; fill the
    # optional batch_stats with an empty (leafless) pytree when absent
    def eval_step_mesh(params, batch, batch_stats=None):
        return jitted(params, batch,
                      {} if batch_stats is None else batch_stats)

    return eval_step_mesh
