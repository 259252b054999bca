"""Full-res flagship TRAIN step on v5e: fusion-only (reference recipe,
stop_camera_grad) vs full backward.  In-jit loop protocol."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.train.step import init_state, make_train_step

ITERS = 5


def run(tag, freeze, dcn_impl="auto", remat="auto"):
    import dataclasses
    cfg = ge._tiny_cfg()
    optim = dataclasses.replace(cfg.train.optim,
                                freeze_camera_branch=freeze)
    bb = dataclasses.replace(cfg.model.backbone, dcn_impl=dcn_impl,
                             remat=remat)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, backbone=bb),
        train=dataclasses.replace(cfg.train, optim=optim))
    model = build_model(cfg, training=True)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 928, 1600,
                           cfg.model.head.num_radar_tokens, max_gt=32)
    state, tx = init_state(cfg, model, batch, total_steps=100,
                           rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    key = jax.random.PRNGKey(1)
    state, losses = step(state, batch_j, key)          # compile
    float(losses["total"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, losses = step(state, batch_j, key)
    lt = float(losses["total"])                        # hard sync
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: {dt * 1e3:.0f} ms/step ({1.0 / dt:.2f} samples/s, "
          f"loss {lt:.3f})", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    run("full backward, pallas DCN vjp ", False, dcn_impl="pallas")
    run("fusion-only (stop_camera_grad)", True)
    try:
        # remat=off trades HBM for no block recompute on the backward;
        # may OOM at full res — measured, not assumed
        run("full backward, remat off     ", False, dcn_impl="pallas",
            remat="off")
    except Exception as e:
        print(f"full backward, remat off: failed ({type(e).__name__}) "
              f"- does not fit", flush=True)


if __name__ == "__main__":
    main()
