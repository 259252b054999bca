"""On-chip PERF probe for the banded msdeform encoder kernel at the real
pillar encoder geometry (levels 256²/128²/64²/32², c=256, P=4, band 16).

Round-5 history: the first windowed variant (two-chunk value blocks with a
per-band-row two-load + select) regressed the full pillar model 324.5 →
742 ms bs1 — the select starved the MXU (round 4's whole-level form ran
the (q0,v0) pairs at ~175 TFLOP/s, FLOP-bound).  The scratch-window
variant copies the chunk pair into VMEM scratch once per chunk switch and
keeps the round-4 single-load band loop.  This probe times one full
encoder layer (all 16 pairs) at bs1/bs2 so kernel-variant verdicts don't
need a 15-min full-model compile.

  setsid nohup python scripts/probe_msdeform_perf.py \
      > /tmp/msd_perf.log 2>&1 < /dev/null & disown
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from transcar_tpu.ops.pallas_msdeform import pallas_msdeform_encoder
from transcar_tpu.utils.compile_cache import enable_persistent_cache

SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32)]
HEADS, D, P = 8, 32, 4
BAND = 16


def _enc_inputs(rng, b):
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
    off = rng.uniform(-2.0, 2.0,
                      (b, s, HEADS, len(SHAPES), P, 2)).astype(np.float32)
    loc = ref + off / norm[None, None, None, :, None, :]
    wgt = rng.uniform(0, 1, (b, s, HEADS, len(SHAPES), P)).astype(
        np.float32)
    wgt = wgt / wgt.sum(axis=(-2, -1), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(wgt))


def main():
    import bench as _bench
    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    shapes = tuple(SHAPES)
    kfn = jax.jit(lambda v, lo, w: pallas_msdeform_encoder(
        v, shapes, lo, w, band=BAND))
    for b in (1, 2):
        rng = np.random.default_rng(b)
        value, loc, wgt = _enc_inputs(rng, b)
        t0 = time.perf_counter()
        out = kfn(value, loc, wgt)
        _ = float(jnp.sum(out))
        print(f"bs{b}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        for _ in range(3):
            _ = float(jnp.sum(kfn(value, loc, wgt)))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = kfn(value, loc, wgt)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"bs{b}: encoder layer {dt * 1e3:.1f} ms "
              f"({b / dt:.2f} samples/s-layer)", flush=True)
    print("RESULT: DONE", flush=True)


if __name__ == "__main__":
    main()
