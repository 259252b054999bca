"""On-chip correctness probe for the WINDOWED banded msdeform forward
(round-5 change: value blocks are two m-row chunks riding the grid's
batch axis instead of whole revisited levels — scripts/probe history in
docs/PERF_NOTES.md).  Interpret-mode tests can't catch Mosaic-only
lowering faults, so before benching: compare the real-chip kernel vs
the XLA oracle at production-like c=256 with window-triggering levels,
at bs1 AND bs2 (bs2 is the whole point of the change).

  setsid nohup python scripts/probe_msdeform_window.py \
      > /tmp/msd_window.log 2>&1 < /dev/null & disown
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from transcar_tpu.ops.msdeform import ms_deform_attn_core
from transcar_tpu.ops.pallas_msdeform import (_window_rows,
                                              pallas_msdeform_encoder)
from transcar_tpu.utils.compile_cache import enable_persistent_cache

SHAPES = [(64, 64), (32, 32), (16, 16)]
HEADS, D, P = 8, 32, 4
BAND = 16


def _enc_inputs(rng, b, max_cells=2.0):
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


def main():
    import bench as _bench
    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    for hv, _ in SHAPES:
        print(f"level hv={hv}: window m={_window_rows(hv, BAND)}",
              flush=True)
    shapes = tuple(SHAPES)
    kfn = jax.jit(lambda v, lo, w: pallas_msdeform_encoder(
        v, shapes, lo, w, band=BAND))
    ofn = jax.jit(lambda v, lo, w: ms_deform_attn_core(v, shapes, lo, w))
    ok = True
    for b in (1, 2):
        rng = np.random.default_rng(b)
        value, loc, wgt = _enc_inputs(rng, b=b, max_cells=2.0)
        got = np.asarray(kfn(value, loc, wgt))
        want = np.asarray(ofn(value, loc, wgt))
        diff = np.abs(got - want)
        print(f"bs{b}: mean|Δ|={diff.mean():.2e} max|Δ|={diff.max():.2e} "
              f"q999={np.quantile(diff, 0.999):.2e}", flush=True)
        row_ok = diff.mean() < 5e-3 and diff.max() < 8e-2
        ok = ok and row_ok
        print(f"bs{b}: {'OK' if row_ok else 'MISMATCH'}", flush=True)
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
