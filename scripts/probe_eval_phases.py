"""Decompose the end-to-end evaluate() cost per sample (bench_eval_e2e
measured 5264 ms/sample bs1 through the axon relay vs ~124 ms model-only
— this isolates where the other ~5 s lives).

Phases measured independently on the SAME on-disk dataset:
  A. loader-only epoch (host decode + wire format, prefetch thread)
  B. A + device_put of every batch leaf + sync (adds relay transfer)
  C. B + eval_step + pull outputs, fully serial (adds compute + pull)
  D. full evaluate() (the shipped one-deep pipeline) for reference

Usage: python scripts/probe_eval_phases.py [--samples 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_eval_e2e import make_dataset  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--preset", default="transcar_r101")
    ap.add_argument("--root", default="/tmp/eval_e2e_data")
    args = ap.parse_args()

    make_dataset(args.root, args.samples)

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.data.infos import NuScenesInfos
    from transcar_tpu.data.loader import PrefetchLoader
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.loop import evaluate
    from transcar_tpu.train.step import make_eval_step
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)

    cfg = get_preset(args.preset, {"data.data_root": args.root})
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    fake = ge._fake_batch(rng, 1, 6, cfg.data.img_hw[0], cfg.data.img_hw[1],
                          cfg.model.head.num_radar_tokens)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(fake["images"]),
        jnp.asarray(fake["lidar2img"]),
        jnp.asarray(fake["radar_tokens"]))["params"]

    tok_rng = np.random.default_rng(1)
    radar_cache = {}

    def radar_fn(token):
        if token not in radar_cache:
            r = np.full((cfg.model.head.num_radar_tokens, 36), 500.0,
                        np.float32)
            r[:40] = tok_rng.normal(size=(40, 36)).astype(np.float32)
            r[:40, 0:2] *= 30.0
            radar_cache[token] = r
        return radar_cache[token]

    dataset = NuScenesInfos(
        os.path.join(cfg.data.data_root, cfg.data.ann_val),
        class_names=cfg.data.class_names, test_mode=True,
        data_root=cfg.data.data_root)
    n = min(args.samples, len(dataset))
    idx = np.arange(n)

    def new_loader():
        return PrefetchLoader(dataset, cfg.data, batch_size=1,
                              training=False, indices=idx,
                              radar_fn=radar_fn, modality="camera")

    # ---- A: loader only (warm one epoch first for page cache) ----
    for _ in new_loader().epoch(0):
        pass
    t0 = time.perf_counter()
    nbytes = 0
    for batch in new_loader().epoch(0):
        nbytes += sum(np.asarray(v).nbytes for v in batch.values())
    a = (time.perf_counter() - t0) / n * 1e3
    print(f"A loader-only          : {a:8.0f} ms/sample "
          f"({nbytes / n / 1e6:.1f} MB/sample wire)", flush=True)

    # ---- B: + device_put + sync ----
    # warm the tiny slice+sum sync program first: its FIRST call compiles
    # through the axon remote-compile service (minutes), which contaminated
    # the per-sample figure when timed cold (measured 30.4 s/sample vs
    # ~0.7 s of actual puts)
    warm = next(iter(new_loader().epoch(0)))
    float(jnp.sum(jax.device_put(warm["lidar2img"])[..., 0]))
    t0 = time.perf_counter()
    for batch in new_loader().epoch(0):
        dev = {k: jax.device_put(v) for k, v in batch.items()}
        for v in dev.values():
            v.block_until_ready()
        # relay-safe sync: pull one scalar
        float(jnp.sum(dev["lidar2img"][..., 0]))
    b = (time.perf_counter() - t0) / n * 1e3
    print(f"B + device_put + sync  : {b:8.0f} ms/sample", flush=True)

    # per-leaf put timing on one batch (roundtrip structure)
    batch = next(iter(new_loader().epoch(0)))
    for k, v in sorted(batch.items(),
                       key=lambda kv: -np.asarray(kv[1]).nbytes):
        v = np.asarray(v)
        t0 = time.perf_counter()
        for _ in range(3):
            d = jax.device_put(v)
            d.block_until_ready()
        dt = (time.perf_counter() - t0) / 3 * 1e3
        print(f"    put {k:16s} {v.nbytes / 1e6:7.2f} MB  {dt:7.0f} ms",
              flush=True)

    # ---- C: serial put + eval_step + pull ----
    eval_step = make_eval_step(cfg, model)
    # compile
    out = eval_step(params, batch)
    {k: np.asarray(v) for k, v in out.items()}
    t0 = time.perf_counter()
    for batch in new_loader().epoch(0):
        out = eval_step(params, batch)
        out = {k: np.asarray(v) for k, v in out.items()}
    c = (time.perf_counter() - t0) / n * 1e3
    print(f"C serial step + pull   : {c:8.0f} ms/sample", flush=True)

    # pull-only cost on the last out
    out = eval_step(params, batch)
    for v in out.values():
        v.block_until_ready()
    float(jnp.sum(out["scores"]))
    t0 = time.perf_counter()
    for _ in range(3):
        {k: np.asarray(v) for k, v in out.items()}
    print(f"    pull outputs       : {(time.perf_counter() - t0) / 3 * 1e3:8.0f} ms",
          flush=True)

    # ---- D: full evaluate() ----
    evaluate(cfg, params, radar_fn=radar_fn, max_samples=1,
             out_path="/tmp/probe_eval_warm.json", _eval_step=eval_step,
             _dataset=dataset)
    t0 = time.perf_counter()
    evaluate(cfg, params, radar_fn=radar_fn, max_samples=n,
             out_path="/tmp/probe_eval_full.json", _eval_step=eval_step,
             _dataset=dataset)
    d = (time.perf_counter() - t0) / n * 1e3
    print(f"D full evaluate()      : {d:8.0f} ms/sample", flush=True)


if __name__ == "__main__":
    main()
