"""On-chip check of the BATCHED banded msdeform backward (round 5: the
per-sample K1/K2 loop became one batched pallas call each, with K1's
value blocks band-windowed like the forward) plus pillar/voxel train
step timing at bs1 AND bs2 — the anti-scaling row VERDICT r4 item 2
targets on the training side.

  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/probe_msdeform_bwd_batch.py > /tmp/msd_bwd.log 2>&1 \
      < /dev/null & disown
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from transcar_tpu.ops.msdeform import ms_deform_attn_core
from transcar_tpu.ops.pallas_msdeform import pallas_msdeform_encoder_ad
from transcar_tpu.utils.compile_cache import enable_persistent_cache

SHAPES = [(64, 64), (32, 32), (16, 16)]
HEADS, D, P = 8, 32, 4
BAND = 16


def _enc_inputs(rng, b, max_cells=1.5):
    s = sum(h * w for h, w in SHAPES)
    value = rng.normal(size=(b, s, HEADS, D)).astype(np.float32)
    refs = []
    for hl, wl in SHAPES:
        ry = (np.arange(hl) + 0.5) / hl
        rx = (np.arange(wl) + 0.5) / wl
        g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)
        refs.append(g.reshape(-1, 2))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    norm = np.array([[wl, hl] for hl, wl in SHAPES], np.float32)
    off = rng.uniform(-max_cells, max_cells,
                      (b, s, HEADS, len(SHAPES), P, 2)).astype(np.float32)
    loc = ref + off / norm[None, None, None, :, None, :]
    wgt = rng.uniform(0, 1, (b, s, HEADS, len(SHAPES), P)).astype(
        np.float32)
    wgt = wgt / wgt.sum(axis=(-2, -1), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc.astype(np.float32)),
            jnp.asarray(wgt))


def grad_check():
    shapes = tuple(SHAPES)

    def loss_k(v, lo, w):
        return jnp.sum(jnp.sin(pallas_msdeform_encoder_ad(
            v, shapes, lo, w, BAND) * 3.0))

    def loss_o(v, lo, w):
        return jnp.sum(jnp.sin(ms_deform_attn_core(
            v, shapes, lo, w) * 3.0))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))
    go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2)))
    ok = True
    for b in (1, 2):
        rng = np.random.default_rng(b)
        value, loc, wgt = _enc_inputs(rng, b=b)
        g_got = gk(value, loc, wgt)
        g_ref = go(value, loc, wgt)
        for name, a, r in zip(("d_value", "d_loc", "d_weights"),
                              g_got, g_ref):
            a, r = np.asarray(a), np.asarray(r)
            scale = max(np.abs(r).max(), 1e-6)
            rel = np.abs(a - r).max() / scale
            row_ok = rel < 3e-2 and np.abs(r).max() > 1e-4
            print(f"bs{b} {name}: max rel dev {rel:.2e} "
                  f"{'OK' if row_ok else 'MISMATCH'}", flush=True)
            ok = ok and row_ok
    return ok


def train_scaling(preset):
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import init_state, make_train_step

    cfg = get_preset(preset)
    rng = np.random.default_rng(0)
    pc = cfg.model.head.pc_range
    n_max = cfg.data.max_points
    rates = {}
    for b in (1, 2):
        pts = np.zeros((b, n_max, 5), np.float32)
        pts[:, :, 0] = rng.uniform(pc[0], pc[3], (b, n_max))
        pts[:, :, 1] = rng.uniform(pc[1], pc[4], (b, n_max))
        pts[:, :, 2] = rng.uniform(pc[2], pc[5], (b, n_max))
        pts[:, :, 3] = rng.uniform(0, 255, (b, n_max))
        pts[:, :, 4] = rng.uniform(0, 0.45, (b, n_max))
        mg = cfg.data.max_gt_boxes
        gt = np.ones((b, mg, 9), np.float32)
        gt[:, :, :2] = rng.uniform(-40, 40, (b, mg, 2))
        gt[:, :, 3:6] = rng.uniform(0.5, 6, (b, mg, 3))
        batch = {"points": pts,
                 "num_points": np.full((b,), int(n_max * 0.9), np.int32),
                 "gt_boxes": gt,
                 "gt_labels": rng.integers(0, 10,
                                           (b, mg)).astype(np.int32),
                 "num_gt": np.full((b,), 9, np.int32)}
        model = build_model(cfg, training=True)
        state, tx = init_state(cfg, model, batch, total_steps=100,
                               rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx)
        batch_j = jax.device_put(batch)
        state = jax.device_put(state)
        box = {"s": state}

        def one():
            box["s"], losses = step(box["s"], batch_j,
                                    jax.random.PRNGKey(1))
            return losses

        for _ in range(2):
            float(one()["total"])
        iters = 6
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = one()
        float(out["total"])
        dt = (time.perf_counter() - t0) / iters
        rates[b] = b / dt
        print(f"{preset} train bs{b}: {dt * 1e3:.1f} ms/step = "
              f"{rates[b]:.2f} samples/s", flush=True)
    print(f"{preset} train bs2/bs1 throughput ratio: "
          f"{rates[2] / rates[1]:.2f}x", flush=True)


def main():
    import bench as _bench
    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    ok = grad_check()
    for preset in ("objdgcnn_pillar", "objdgcnn_voxel"):
        try:
            train_scaling(preset)
        except Exception as e:  # noqa: BLE001 — record and continue
            import traceback
            print(f"{preset} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
            ok = False
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
