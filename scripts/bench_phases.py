"""Phase timing at full R101 resolution: backbone (fused DCN), neck,
head — in-jit fori loops, per docs/PERF_NOTES.md protocol."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model

ITERS = 10


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out))
    return time.perf_counter() - t0, s


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = ge._tiny_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    b, n, h, w = 1, 6, 928, 1600
    batch = ge._fake_batch(rng, b, n, h, w, cfg.model.head.num_radar_tokens)
    images = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    radar = jnp.asarray(batch["radar_tokens"])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, l2i, radar)

    flat = images.reshape(b * n, h, w, 3)

    def backbone_loop(params, x):
        def body(i, carry):
            acc, xx = carry
            feats = model.apply(params, xx, method=lambda m, im:
                                m.backbone(im))
            return acc + jnp.sum(feats[-1].astype(jnp.float32)), xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]

    def full_loop(params, x, l2i, radar):
        def body(i, carry):
            acc, xx = carry
            out = model.apply(params, xx, l2i, radar)
            return acc + jnp.sum(
                out["all_bbox_preds"][..., 0].astype(jnp.float32)), \
                xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]

    fn = jax.jit(backbone_loop)
    timed(fn, params, flat)
    dt, s = timed(fn, params, flat)
    print(f"backbone+DCN: {dt / ITERS * 1e3:.1f} ms/sample (sum {s:.1f})",
          flush=True)

    fn2 = jax.jit(full_loop)
    timed(fn2, params, images, l2i, radar)
    dt2, _ = timed(fn2, params, images, l2i, radar)
    print(f"full model  : {dt2 / ITERS * 1e3:.1f} ms/sample", flush=True)
    print(f"neck+head   : {(dt2 - dt) / ITERS * 1e3:.1f} ms/sample (diff)",
          flush=True)


if __name__ == "__main__":
    main()
