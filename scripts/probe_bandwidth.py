"""R101 HBM-bandwidth audit + bf16 head-input A/B — VERDICT r4 item 6.

Decomposes the flagship's ~59 GB/sample bytes-accessed (XLA cost
analysis) by component — backbone, FPN, head — then A/Bs
``head_input_dtype`` float32 vs bfloat16 (halves the FPN-map byte
streams the head's sampling gathers read) at bs1/bs2/bs4, best-of-3.

Run detached:
  setsid nohup python scripts/probe_bandwidth.py > /tmp/bandwidth.log \
      2>&1 < /dev/null & disown
"""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.utils.compile_cache import enable_persistent_cache

N, H, W = 6, 928, 1600


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (c.get("bytes accessed", 0.0) / 1e9,
            c.get("flops", 0.0) / 1e12)


def bench_model(cfg, b, iters=15):
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, b, N, H, W, cfg.model.head.num_radar_tokens)
    images = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    radar = jnp.asarray(batch["radar_tokens"])
    params = jax.device_put(
        jax.jit(model.init)(jax.random.PRNGKey(0), images, l2i, radar))

    @jax.jit
    def infer(params, images, l2i, radar):
        return model.apply(params, images, l2i, radar)

    def sync(o):
        return float(jnp.sum(o["all_bbox_preds"][..., 0]))

    best = np.inf
    for _ in range(3):
        for _ in range(2):
            sync(infer(params, images, l2i, radar))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(params, images, l2i, radar)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    cfg = ge._tiny_cfg()   # full-size flagship
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, N, H, W, cfg.model.head.num_radar_tokens)
    images = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    radar = jnp.asarray(batch["radar_tokens"])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, l2i,
                                    radar)
    params = variables["params"]

    # ---- component decomposition (lower+compile only, no execution) ---
    gb, tf = cost(lambda p, i, l, r: model.apply({"params": p}, i, l, r),
                  params, images, l2i, radar)
    print(f"full model: {gb:.1f} GB, {tf:.2f} TFLOP", flush=True)

    det = model   # TransCARDetector
    x = images.reshape(N, H, W, 3)

    def backbone_only(p, x):
        return det.apply({"params": p}, x,
                         method=lambda m, xx: m.backbone(xx))

    gb_b, tf_b = cost(backbone_only, params, x)
    print(f"backbone:   {gb_b:.1f} GB, {tf_b:.2f} TFLOP", flush=True)

    def bb_neck(p, x):
        return det.apply({"params": p}, x,
                         method=lambda m, xx: m.neck(m.backbone(xx)))

    gb_bn, tf_bn = cost(bb_neck, params, x)
    print(f"backbone+fpn: {gb_bn:.1f} GB, {tf_bn:.2f} TFLOP "
          f"(fpn ≈ {gb_bn - gb_b:.1f} GB)", flush=True)
    print(f"head ≈ {gb - gb_bn:.1f} GB, {tf - tf_bn:.2f} TFLOP "
          f"(by difference; jit boundaries shift fusion, so approximate)",
          flush=True)

    # ---- head-input dtype A/B at bs1/bs2/bs4 --------------------------
    for dt in ("float32", "bfloat16"):
        bb = dataclasses.replace(cfg.model.backbone, head_input_dtype=dt)
        c2 = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone=bb))
        m2 = build_model(c2)
        gb2, _ = cost(lambda p, i, l, r: m2.apply({"params": p}, i, l, r),
                      params, images, l2i, radar)
        print(f"head_input={dt}: {gb2:.1f} GB/sample", flush=True)
        for b in (1, 2, 4):
            try:
                dtb = bench_model(c2, b)
                print(f"head_input={dt} bs{b}: {dtb * 1e3:.1f} ms = "
                      f"{b / dtb:.2f} samples/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"head_input={dt} bs{b}: FAILED "
                      f"({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
