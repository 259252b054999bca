"""VoVNet-99 perf campaign (VERDICT r2 weak #3): per-stage timing at the
submission config's real shapes (6 cams x 928x1600), in-jit loop protocol.

Stage shapes (stem stride 4, maxpool between stages):
  stem   6 x 928x1600x3  -> 232x400x128
  stage2 6 x 232x400x128 -> 232x400x256   (1 OSA block,  ch 128)
  stage3 6 x 116x200x256 -> 116x200x512   (3 OSA blocks, ch 160)
  stage4 6 x  58x100x512 ->  58x100x768   (9 OSA blocks, ch 192)
  stage5 6 x  29x 50x768 ->  29x 50x1024  (3 OSA blocks, ch 224)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN
from transcar_tpu.models.vovnet import OSABlock, V99_SPEC, VoVNet

ITERS = 10


def timed_loop(make_apply, params, x):
    def loop(params, x):
        def body(i, carry):
            acc, xx = carry
            out = make_apply(params, xx)
            return acc + jnp.sum(out.astype(jnp.float32)), xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]

    fn = jax.jit(loop)
    t0 = time.perf_counter()
    float(fn(params, x)[0])
    compile_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(fn(params, x)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3, compile_dt, s


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        x = ConvBN(64, kernel=3, stride=2, padding=1, dtype=x.dtype,
                   name="stem1")(x)
        x = ConvBN(64, kernel=3, stride=1, padding=1, dtype=x.dtype,
                   name="stem2")(x)
        return ConvBN(128, kernel=3, stride=2, padding=1, dtype=x.dtype,
                      name="stem3")(x)


class Stage(nn.Module):
    si: int

    @nn.compact
    def __call__(self, x):
        spec = V99_SPEC
        for b in range(spec["block_per_stage"][self.si]):
            x = OSABlock(spec["stage_conv_ch"][self.si],
                         spec["stage_out_ch"][self.si],
                         spec["layer_per_block"], identity=(b > 0),
                         name=f"b{b}")(x)
        return x


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    stem = Stem()
    x = jnp.asarray(rng.normal(size=(6, 928, 1600, 3)), jnp.float32)
    p = stem.init(key, x)
    ms, cdt, _ = timed_loop(lambda p, x: stem.apply(p, x), p, x)
    print(f"stem: {ms:.1f} ms (compile {cdt:.0f}s)", flush=True)

    shapes = [(232, 400, 128), (116, 200, 256), (58, 100, 512),
              (29, 50, 768)]
    total = ms
    for si, (h, w, c) in enumerate(shapes):
        mod = Stage(si=si)
        x = jnp.asarray(rng.normal(size=(6, h, w, c)), jnp.bfloat16)
        p = mod.init(key, x)
        ms, cdt, _ = timed_loop(lambda p, x, m=mod: m.apply(p, x), p, x)
        nb = V99_SPEC["block_per_stage"][si]
        print(f"stage{si + 2} ({nb} blocks @ {h}x{w}, ch "
              f"{V99_SPEC['stage_conv_ch'][si]}): {ms:.1f} ms "
              f"(compile {cdt:.0f}s)", flush=True)
        total += ms
    print(f"sum of stages: {total:.1f} ms", flush=True)

    bb = VoVNet()
    x = jnp.asarray(rng.normal(size=(6, 928, 1600, 3)), jnp.float32)
    p = bb.init(key, x)
    ms, cdt, _ = timed_loop(lambda p, x: bb.apply(p, x)[-1], p, x)
    print(f"full VoVNet backbone: {ms:.1f} ms (compile {cdt:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
