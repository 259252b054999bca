"""--aug-test cost at real shape on TPU — VERDICT r4 item 6.

tests/test_aug_test.py pins the wiring at tiny CPU shapes; this measures
what the mode COSTS at the flagship's production shape (6×928×1600,
identity+flip — reference aug_test, detr3d.py:195-219) against the plain
eval step, plus the submission-level delta on the same synthetic batch
(how much the unaligned-average quirk moves the boxes).

  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/bench_aug_test.py > /tmp/aug_bench.log 2>&1 \
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


def bench(fn, sync, iters=10, warmup=3):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import __graft_entry__ as ge
    import bench as _bench
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import make_aug_eval_step, make_eval_step
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)

    cfg = ge._tiny_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 928, 1600,
                           cfg.model.head.num_radar_tokens)
    # eval-path batches carry uint8 images (loader contract); both steps
    # normalize on device
    batch = dict(batch)
    batch["images"] = np.clip(
        (batch["images"] * 30 + 128), 0, 255).astype(np.uint8)
    batch_j = jax.device_put(batch)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["images"], jnp.float32),
        jnp.asarray(batch["lidar2img"]),
        jnp.asarray(batch["radar_tokens"]))["params"]

    plain = make_eval_step(cfg, model)
    aug = make_aug_eval_step(cfg, model, augs=("identity", "flip"))

    def sync(o):
        return float(jnp.sum(o["boxes"]))

    dt_plain = bench(lambda: plain(params, batch_j), sync)
    print(f"plain eval bs1: {dt_plain * 1e3:.1f} ms = "
          f"{1 / dt_plain:.2f} samples/s", flush=True)
    dt_aug = bench(lambda: aug(params, batch_j), sync)
    print(f"aug (identity+flip) bs1: {dt_aug * 1e3:.1f} ms = "
          f"{1 / dt_aug:.2f} samples/s ({dt_aug / dt_plain:.2f}x plain)",
          flush=True)

    # output delta on the same batch: how far the unaligned flip-average
    # moves the decoded boxes/scores vs plain eval
    o_plain = plain(params, batch_j)
    o_aug = aug(params, batch_j)
    k = 50
    db = float(np.abs(np.asarray(o_plain["boxes"])[:, :k]
                      - np.asarray(o_aug["boxes"])[:, :k]).max())
    ds = float(np.abs(np.asarray(o_plain["scores"])[:, :k]
                      - np.asarray(o_aug["scores"])[:, :k]).max())
    print(f"top-{k} decode delta vs plain: box max|Δ| {db:.4f}, "
          f"score max|Δ| {ds:.4f}", flush=True)
    print("RESULT: PASS", flush=True)


if __name__ == "__main__":
    main()
