"""Pair-level A/B of the banded msdeform encoder kernel's value-block
strategies on the real chip (round-5 regression hunt).

Full-model evidence: round 4's whole-level blocks gave pillar 324.5 ms
bs1; the round-5 two-chunk window with per-band-row select gave 742 ms;
the scratch-window rework still probes 237 ms/encoder-layer vs ~80 in
round 4.  This isolates WHERE: times the dominant (q0,v0) 256² pair and
one full encoder layer under TRANSCAR_MSDEF_WINDOW = 0 (whole level,
round-4 form), 16 (scratch window, auto), 64 (coarser chunks, fewer
switches).  bs1 only — m=0 at bs>1 takes the serialized fallback path
by design.

  setsid nohup python scripts/probe_msdeform_pairs.py \
      > /tmp/msd_pairs.log 2>&1 < /dev/null & disown
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import transcar_tpu.ops.pallas_msdeform as pm
from transcar_tpu.utils.compile_cache import enable_persistent_cache

SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32)]
HEADS, D, P = 8, 32, 4
BAND = 16


def _pair_inputs(rng, hq, wq, hv, wv):
    c = HEADS * D
    value = rng.normal(size=(1, hv, wv, c)).astype(np.float32)
    ry = (np.arange(hq) + 0.5) / hq
    rx = (np.arange(wq) + 0.5) / wq
    g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1).reshape(-1, 2)
    ref = g[None, :, None, None, :]                  # [1, nl, 1, 1, 2]
    off = rng.uniform(-2.0, 2.0, (1, hq * wq, HEADS, P, 2)).astype(
        np.float32)
    loc = ref + off / np.array([wv, hv], np.float32)
    wgt = (np.ones((1, hq * wq, HEADS, P)) / P).astype(np.float32)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(wgt)


def timeit(fn, *args, iters=10, warmup=3):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out))
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        s += float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s += float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    import bench as _bench
    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)

    hq = wq = hv = wv = 256
    rng = np.random.default_rng(0)
    value, loc, wgt = _pair_inputs(rng, hq, wq, hv, wv)

    for mode in ("16", "0", "64"):
        os.environ["TRANSCAR_MSDEF_WINDOW"] = mode

        def pair(v, lo, w):
            vt = v.astype(jnp.bfloat16)
            omp = pm._omp_precompute(lo, w, hq, wq, hv, wv)
            return pm._enc_pair(vt, omp, hq, wq, hv, wv, HEADS, D, P,
                                BAND, False)

        try:
            dt, cs = timeit(jax.jit(pair), value, loc, wgt)
            print(f"pair00 256x256 window={mode}: {dt * 1e3:.1f} ms "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pair00 window={mode} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)

    # full encoder layer, window on/off
    shapes = tuple(SHAPES)
    s = sum(h * w for h, w in shapes)
    evalue = jnp.asarray(rng.normal(size=(1, s, HEADS, D)), jnp.float32)
    refs = []
    for hl, wl in shapes:
        ry = (np.arange(hl) + 0.5) / hl
        rx = (np.arange(wl) + 0.5) / wl
        g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)
        refs.append(g.reshape(-1, 2))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    norm = np.array([[wl, hl] for hl, wl in shapes], np.float32)
    off = rng.uniform(-2, 2, (1, s, HEADS, len(shapes), P, 2))
    eloc = jnp.asarray(ref + off / norm[None, None, None, :, None, :],
                       jnp.float32)
    ewgt = np.random.default_rng(1).uniform(
        0, 1, (1, s, HEADS, len(shapes), P)).astype(np.float32)
    ewgt = jnp.asarray(ewgt / ewgt.sum(axis=(-2, -1), keepdims=True))
    for mode in ("16", "0"):
        os.environ["TRANSCAR_MSDEF_WINDOW"] = mode

        def layer(v, lo, w):
            return pm.pallas_msdeform_encoder(v, shapes, lo, w, band=BAND)

        try:
            dt, cs = timeit(jax.jit(layer), evalue, eloc, ewgt)
            print(f"encoder layer window={mode}: {dt * 1e3:.1f} ms "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"layer window={mode} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
    print("RESULT: DONE", flush=True)


if __name__ == "__main__":
    main()
