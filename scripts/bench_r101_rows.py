"""Full-model A/B for DCN rows_per_step (grid coarsening, per-row bands).

Block-level deltas through the axon relay are noisy (CLAUDE.md); ship
defaults from FULL-MODEL best-of-3 runs.  Usage:
    python scripts/bench_r101_rows.py [rows ...]   (default: 1 4 8)
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model


def run(variant, rows, b):
    cfg = ge._tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, backbone=dataclasses.replace(
                cfg.model.backbone, dcn_rows_per_step=rows,
                dcn_variant=variant)))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    n, h, w = 6, 928, 1600
    batch = ge._fake_batch(rng, b, n, h, w, cfg.model.head.num_radar_tokens)
    images = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    radar = jnp.asarray(batch["radar_tokens"])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, l2i, radar)

    @jax.jit
    def infer(params, images, l2i, radar):
        return model.apply(params, images, l2i, radar)

    def sync(out):
        return float(jnp.sum(out["all_bbox_preds"][..., 0]))

    for _ in range(3):
        sync(infer(params, images, l2i, radar))
    best = 0.0
    for _ in range(3):                       # best-of-3
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(params, images, l2i, radar)
        sync(out)
        best = max(best, iters * b / (time.perf_counter() - t0))
    print(f"r101 {variant}-rows{rows} bs{b}: {best:.2f} samples/s "
          f"(best of 3)", flush=True)


def main():
    combos = [("banded", 1), ("onedot", 1)]
    if len(sys.argv) > 1:
        combos = [(v, int(r)) for v, r in
                  (a.split(":") for a in sys.argv[1:])]
    print("devices:", jax.devices(), flush=True)
    for variant, rows in combos:
        for b in (1, 2):
            run(variant, rows, b)


if __name__ == "__main__":
    main()
