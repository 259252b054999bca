"""A/B the fused Pallas OSA tail vs the XLA concat path on v5e, per
stage shapes and full VoVNet backbone.  In-jit loop protocol; nop floor
is ~2.5-2.9 ms/iter at these tensor sizes (probe_vovnet_ops2.py)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.vovnet import OSABlock, VoVNet

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
    s0 = float(fn(params, x)[0])
    cdt = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(fn(params, x)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3, cdt, s


CASES = [  # (tag, stage_ch, concat_ch, identity, shape)
    ("stage2 blk", 128, 256, False, (6, 232, 400, 128)),
    ("stage3 blk0", 160, 512, False, (6, 116, 200, 256)),
    ("stage4 blk0", 192, 768, False, (6, 58, 100, 512)),
    ("stage4 blk+id", 192, 768, True, (6, 58, 100, 768)),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for tag, sc, cc, ident, shape in CASES:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        ref = OSABlock(sc, cc, 5, identity=ident, reduce_impl="xla")
        p = ref.init(key, x)
        res = {}
        for impl in ("xla", "pallas"):
            mod = OSABlock(sc, cc, 5, identity=ident, reduce_impl=impl)
            try:
                ms, cdt, s = timed_loop(
                    lambda p, x, m=mod: m.apply(p, x), p, x)
                res[impl] = (ms, s)
                print(f"{tag} [{impl}]: {ms:.2f} ms (compile {cdt:.0f}s, "
                      f"sum {s:.1f})", flush=True)
            except Exception as e:
                print(f"{tag} [{impl}]: FAILED {str(e)[:160]}", flush=True)
        if len(res) == 2:
            dx = abs(res["xla"][1] - res["pallas"][1])
            print(f"{tag}: checksum |d| = {dx:.3f}", flush=True)

    for impl in ("xla", "pallas"):
        bb = VoVNet(reduce_impl=impl)
        x = jnp.asarray(rng.normal(size=(6, 928, 1600, 3)), jnp.float32)
        p = bb.init(key, x)
        ms, cdt, s = timed_loop(lambda p, x, m=bb: m.apply(p, x)[-1], p, x)
        print(f"full VoVNet [{impl}]: {ms:.1f} ms (compile {cdt:.0f}s, "
              f"sum {s:.1f})", flush=True)


if __name__ == "__main__":
    main()
