"""VoVNet op-level ablation (round 3): where do 109 ms of backbone go?

bench_vovnet.py measured stem 13.6 / stage2 18.3 / stage3 31.5 /
stage4 39.6 / stage5 6.2 ms against a ~30 ms compute roofline — this
probes individual ops at stage2 shapes (the worst MFU) to find the
bottleneck.  In-jit fori_loop protocol (docs/PERF_NOTES.md).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN, FrozenBN
from transcar_tpu.models.vovnet import OSABlock, eSE

ITERS = 10


def timed_loop(apply_fn, params, x):
    def loop(params, x):
        def body(i, carry):
            acc, xx = carry
            out = apply_fn(params, xx)
            return acc + jnp.sum(out.astype(jnp.float32)), xx + 1e-3
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]

    fn = jax.jit(loop)
    t0 = time.perf_counter()
    float(fn(params, x)[0])
    cdt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(params, x)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3, cdt


def report(name, ms, cdt, ideal_ms):
    print(f"{name}: {ms:.2f} ms (ideal {ideal_ms:.2f}, "
          f"{100 * ideal_ms / max(ms, 1e-9):.0f}% MFU-proxy, "
          f"compile {cdt:.0f}s)", flush=True)


class ConvOnly(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.ch, (3, 3), padding=[(1, 1)] * 2,
                       use_bias=False, dtype=x.dtype, name="c")(x)


class Conv5Chain(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        for i in range(5):
            x = ConvBN(self.ch, kernel=3, padding=1, dtype=x.dtype,
                       name=f"c{i}")(x)
        return x


class ConcatReduce(nn.Module):
    """concat six [.., 128] pieces -> 1x1 768->256 ConvBN (OSA tail)."""

    @nn.compact
    def __call__(self, x):
        pieces = [x * (i + 1.0) for i in range(6)]
        y = jnp.concatenate(pieces, axis=-1)
        return ConvBN(256, kernel=1, dtype=x.dtype, name="r")(y)


class SplitReduce(nn.Module):
    """same math as ConcatReduce but as a sum of six 1x1 convs — no
    768-channel intermediate is ever materialized."""

    @nn.compact
    def __call__(self, x):
        pieces = [x * (i + 1.0) for i in range(6)]
        acc = None
        for i, p in enumerate(pieces):
            y = nn.Conv(256, (1, 1), use_bias=False, dtype=x.dtype,
                        name=f"r{i}")(p)
            acc = y if acc is None else acc + y
        return nn.relu(FrozenBN(256, name="bn")(acc))


class ESEOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return eSE(256, name="e")(x)


class StemPlain(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        x = ConvBN(64, kernel=3, stride=2, padding=1, dtype=x.dtype,
                   name="s1")(x)
        x = ConvBN(64, kernel=3, stride=1, padding=1, dtype=x.dtype,
                   name="s2")(x)
        return ConvBN(128, kernel=3, stride=2, padding=1, dtype=x.dtype,
                      name="s3")(x)


class StemS2D(nn.Module):
    """stem1 as space-to-depth: [H, W, 3] -> [H/2, W/2, 12] then a 2x2
    conv (timing probe; the exact-weight mapping exists but timing only
    needs the shape)."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        x = x.astype(jnp.bfloat16)
        x = ConvBN(64, kernel=2, stride=1, padding=1, dtype=x.dtype,
                   name="s1")(x)[:, :h // 2, :w // 2]
        x = ConvBN(64, kernel=3, stride=1, padding=1, dtype=x.dtype,
                   name="s2")(x)
        return ConvBN(128, kernel=3, stride=2, padding=1, dtype=x.dtype,
                      name="s3")(x)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x128 = jnp.asarray(rng.normal(size=(6, 232, 400, 128)), jnp.bfloat16)
    x256 = jnp.asarray(rng.normal(size=(6, 232, 400, 256)), jnp.bfloat16)
    ximg = jnp.asarray(rng.normal(size=(6, 928, 1600, 3)), jnp.float32)

    px = 6 * 232 * 400
    tf = 197e12
    conv_ideal = px * 9 * 128 * 128 * 2 / tf * 1e3

    for name, mod, x, ideal in [
        ("conv3x3 128->128 @232x400", ConvOnly(128), x128, conv_ideal),
        ("ConvBN+relu same", ConvBN(128, kernel=3, padding=1,
                                    dtype=jnp.bfloat16), x128, conv_ideal),
        ("5x ConvBN chain", Conv5Chain(128), x128, 5 * conv_ideal),
        ("concat6 -> 1x1 768->256", ConcatReduce(), x128,
         px * 768 * 256 * 2 / tf * 1e3),
        ("split-sum 6x 1x1 128->256", SplitReduce(), x128,
         px * 768 * 256 * 2 / tf * 1e3),
        ("eSE @256", ESEOnly(), x256, 0.3),
        ("full OSA stage2 block", OSABlock(128, 256, 5), x128,
         5 * conv_ideal + px * 768 * 256 * 2 / tf * 1e3),
        ("stem plain", StemPlain(), ximg, 1.35),
        ("stem s2d", StemS2D(), ximg, 1.35),
    ]:
        p = mod.init(key, x)
        try:
            ms, cdt = timed_loop(lambda p, x, m=mod: m.apply(p, x), p, x)
            report(name, ms, cdt, ideal)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
