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


def apply_model(model, params, batch, train: bool, rngs=None):
    """Dispatch on batch modality: camera/fusion batches carry ``images``;
    LiDAR (ObjDGCNN) batches carry ``points``/``num_points``."""
    var = {"params": params}
    if "points" in batch:
        return model.apply(var, batch["points"], batch["num_points"],
                           deterministic=not train, rngs=rngs)
    return model.apply(var, batch["images"], batch["lidar2img"],
                       batch.get("radar_tokens"), train=train, rngs=rngs)


def init_state(cfg: TransCARConfig, model, sample_batch,
               total_steps: int, rng: jax.Array) -> Tuple[TrainState, Any]:
    """Initialize params + optimizer from an example (host-side) batch."""
    if "points" in sample_batch:
        variables = model.init(rng, sample_batch["points"],
                               sample_batch["num_points"])
    else:
        variables = model.init(
            rng, sample_batch["images"], sample_batch["lidar2img"],
            sample_batch.get("radar_tokens"))
    params = variables["params"]
    tx = build_optimizer(cfg.train.optim, params, total_steps,
                         freeze_camera=cfg.train.optim.freeze_camera_branch
                         and cfg.model.head.with_radar_fusion,
                         frozen_stages=cfg.model.backbone.frozen_stages)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state), tx


def make_train_step(cfg: TransCARConfig, model, tx,
                    mesh=None):
    """Build the jitted train step.  ``batch`` leaves are sharded along the
    mesh's data axis; state is replicated."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        gm_rng, do_rng = jax.random.split(step_rng)

        def loss_fn(params):
            preds = apply_model(
                model, params, batch, train=True,
                rngs={"gridmask": gm_rng, "dropout": do_rng})
            losses = detr3d_loss(
                preds, batch["gt_boxes"], batch["gt_labels"],
                batch["num_gt"], cfg.model.head)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), losses

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


def make_eval_step(cfg: TransCARConfig, model, mesh=None):
    """Jitted inference + NMS-free decode."""

    def eval_step(params, batch):
        preds = apply_model(model, params, batch, train=False)
        return nms_free_decode(preds, cfg.model.head)

    if mesh is None:
        return jax.jit(eval_step)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(eval_step, in_shardings=(rep, bs), out_shardings=bs)
