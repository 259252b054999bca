"""TRAIN-step batch family at full res on v5e: fusion-only (the
reference's production recipe — frozen camera net, tools/train.py:238-252)
at bs 1/2/4, plus full-backbone remat-off at bs2 (HBM permitting).

Per-device batch scaling here is the direct projector for dp-mesh
training throughput: a dp-N mesh runs this exact per-device program with
gradient psums riding ICI (parallel/sharding.py), so samples/s/chip at
bs k ~ the per-chip rate of a dp mesh fed k samples per device.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.train.step import init_state, make_train_step

ITERS = 5


def run(tag, freeze, bs, remat="auto"):
    import dataclasses
    cfg = ge._tiny_cfg()
    optim = dataclasses.replace(cfg.train.optim,
                                freeze_camera_branch=freeze)
    bb = dataclasses.replace(cfg.model.backbone, remat=remat)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, backbone=bb),
        train=dataclasses.replace(cfg.train, optim=optim))
    model = build_model(cfg, training=True)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, bs, 6, 928, 1600,
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
    print(f"{tag} bs{bs}: {dt * 1e3:.0f} ms/step ({bs / dt:.2f} samples/s, "
          f"loss {lt:.3f})", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    for bs in (1, 2, 4):
        try:
            run("fusion-only train", True, bs)
        except Exception as e:     # noqa: BLE001 — record and continue
            print(f"fusion-only train bs{bs}: failed "
                  f"({type(e).__name__})", flush=True)
    try:
        run("full-backbone train, remat off", False, 2, remat="off")
    except Exception as e:         # noqa: BLE001 — HBM may not fit
        print(f"full-backbone remat-off bs2: failed ({type(e).__name__}) "
              f"- does not fit", flush=True)


if __name__ == "__main__":
    main()
