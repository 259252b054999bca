"""Model-family throughput sweep (fused DCN v2): R101 bs1/bs2, VoVNet
bs1/bs2 — updates the PERF_NOTES table."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.core.config import get_preset
from transcar_tpu.models.detector import build_model


def run(tag, cfg, b):
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
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, images, l2i, radar)
    sync(out)
    dt = time.perf_counter() - t0
    print(f"{tag} bs{b}: {iters * b / dt:.2f} samples/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    r101 = ge._tiny_cfg()
    vov = get_preset("transcar_vovnet_trainval")
    run("transcar_r101 ", r101, 2)
    run("transcar_vovnet", vov, 1)
    run("transcar_vovnet", vov, 2)
    for bs in (4, 8):              # find the throughput knee; may OOM
        for tag, cfg in (("transcar_r101 ", r101), ("transcar_vovnet", vov)):
            try:
                run(tag, cfg, bs)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"{tag} bs{bs}: failed ({type(e).__name__})",
                      flush=True)
    # opt-in int8 serving mode (ops/int8.py): measured, never default
    import dataclasses
    bb = dataclasses.replace(vov.model.backbone, quantize="int8")
    vov_q = dataclasses.replace(
        vov, model=dataclasses.replace(vov.model, backbone=bb))
    for b in (1, 2):
        try:
            run("transcar_vovnet int8", vov_q, b)
        except Exception as e:     # noqa: BLE001 — record and continue
            print(f"transcar_vovnet int8 bs{b}: failed "
                  f"({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
