"""VoVNet probe round 2: calibrate the in-jit-loop protocol overhead and
re-measure OSA internals against it.

probe_vovnet_ops.py found chained ConvBNs at ~91% MFU-proxy (0.91 ms
marginal at stage2 shapes) while LONE ops appear 3-4 ms slower than
roofline — suggesting a fixed per-iteration cost (carry perturbation +
output reduction + layout transitions at the loop boundary).  This probe
measures that floor directly (nop body) and times OSA variants so real
op costs = measured − floor.
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


class Nop(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class ConvN(nn.Module):
    n: int
    ch: int = 128

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = ConvBN(self.ch, kernel=3, padding=1, dtype=x.dtype,
                       name=f"c{i}")(x)
        return x


class WarmConcatReduce(nn.Module):
    """conv (to give the input a conv-produced layout) then the OSA
    concat-1x1 tail."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(128, kernel=3, padding=1, dtype=x.dtype, name="w")(x)
        pieces = [x * (i + 1.0) for i in range(6)]
        y = jnp.concatenate(pieces, axis=-1)
        return ConvBN(256, kernel=1, dtype=x.dtype, name="r")(y)


class OSANoESE(nn.Module):
    @nn.compact
    def __call__(self, x):
        outputs = [x]
        for i in range(5):
            x = ConvBN(128, kernel=3, padding=1, dtype=x.dtype,
                       name=f"conv{i}")(x)
            outputs.append(x)
        y = jnp.concatenate(outputs, axis=-1)
        return ConvBN(256, kernel=1, dtype=x.dtype, name="concat")(y)


class OSASplitReduce(nn.Module):
    """OSA with the 1x1 reduce computed as a sum of per-piece 1x1 convs
    (no 768-ch concat materialized) + eSE."""

    @nn.compact
    def __call__(self, x):
        outputs = [x]
        for i in range(5):
            x = ConvBN(128, kernel=3, padding=1, dtype=x.dtype,
                       name=f"conv{i}")(x)
            outputs.append(x)
        acc = None
        for i, p in enumerate(outputs):
            y = nn.Conv(256, (1, 1), use_bias=False, dtype=x.dtype,
                        name=f"r{i}")(p)
            acc = y if acc is None else acc + y
        y = nn.relu(FrozenBN(256, name="bn")(acc))
        return eSE(256, name="ese")(y)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x128 = jnp.asarray(rng.normal(size=(6, 232, 400, 128)), jnp.bfloat16)
    x768s4 = jnp.asarray(rng.normal(size=(6, 58, 100, 768)), jnp.bfloat16)

    for name, mod, x in [
        ("nop @232x400x128", Nop(), x128),
        ("nop @58x100x768", Nop(), x768s4),
        ("10x ConvBN chain @232x400", ConvN(10), x128),
        ("warm concat6 -> 1x1 768->256", WarmConcatReduce(), x128),
        ("OSA stage2, no eSE", OSANoESE(), x128),
        ("OSA stage2, split-reduce + eSE", OSASplitReduce(), x128),
        ("OSA stage2 reference", OSABlock(128, 256, 5), x128),
        ("OSA stage4 identity blk (768ch)", OSABlock(192, 768, 5,
                                                     identity=True),
         x768s4),
    ]:
        p = mod.init(key, x)
        try:
            ms, cdt = timed_loop(lambda p, x, m=mod: m.apply(p, x), p, x)
            print(f"{name}: {ms:.2f} ms (compile {cdt:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
