"""Host→device transfer probe: fp32 normalized batch vs uint8 +
on-device normalize (DataConfig.normalize_on_device), full flagship
shapes 6×928×1600×3.

Times device_put + (for uint8) the jitted normalize, synced by a scalar
pull.  The uint8 route moves 27 MB/sample instead of 107 MB.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.core.config import DataConfig
from transcar_tpu.train.step import normalize_batch_images

ITERS = 10


def main():
    print("devices:", jax.devices(), flush=True)
    dc = DataConfig()
    rng = np.random.default_rng(0)
    for b in (1, 2):
        f32 = rng.normal(size=(b, 6, 928, 1600, 3)).astype(np.float32)
        u8 = rng.integers(0, 256, (b, 6, 928, 1600, 3)).astype(np.uint8)
        hw = np.tile(np.asarray([[900, 1600]], np.int32), (b, 1))

        @jax.jit
        def norm(u8, hw):
            out = normalize_batch_images(
                {"images": u8, "img_shape": hw}, dc)
            return out["images"]

        def sync(x):
            return float(jnp.sum(x[..., 0, 0, 0].astype(jnp.float32)))

        sync(jax.device_put(f32)); sync(norm(jax.device_put(u8),
                                             jax.device_put(hw)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            sync(jax.device_put(f32))
        t_f32 = (time.perf_counter() - t0) / ITERS * 1e3
        t0 = time.perf_counter()
        for _ in range(ITERS):
            sync(norm(jax.device_put(u8), jax.device_put(hw)))
        t_u8 = (time.perf_counter() - t0) / ITERS * 1e3
        mb = f32.nbytes / 1e6
        print(f"bs{b}: fp32 put {t_f32:.1f} ms ({mb:.0f} MB) | "
              f"uint8 put+norm {t_u8:.1f} ms ({u8.nbytes / 1e6:.0f} MB)",
              flush=True)


if __name__ == "__main__":
    main()
