"""Pallas fused masked attention vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU for bench/serving)."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.attention import multihead_attention
from transcar_tpu.ops.pallas_attention import masked_mha_pallas

E, H = 64, 4


def _params(rng):
    p = {}
    for n in ("wq", "wk", "wv", "wo"):
        p[n] = jnp.asarray(rng.normal(size=(E, E)).astype(np.float32) * 0.1)
        p["b" + n[1:]] = jnp.asarray(
            rng.normal(size=(E,)).astype(np.float32) * 0.1)
    return p


def test_pallas_matches_xla_masked():
    rng = np.random.default_rng(0)
    b, q, t = 2, 150, 200                  # deliberately unaligned
    params = _params(rng)
    qx = jnp.asarray(rng.normal(size=(b, q, E)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(b, t, E)).astype(np.float32))
    keep = rng.uniform(size=(b, q, t)) < 0.2
    keep[:, 0] = True                      # one fully-visible row
    keep[:, 5] = False                     # one fully-masked row
    keep = jnp.asarray(keep)

    ref = multihead_attention(qx, kv, kv, params, H, mask=~keep)
    ours = masked_mha_pallas(qx, kv, kv, params, H, keep, interpret=True)

    # compare only gated (≥1 visible) rows — fully-masked rows are garbage
    # in both paths and gated off by the caller
    gate = np.asarray(jnp.any(keep, axis=-1))
    np.testing.assert_allclose(np.asarray(ours)[gate], np.asarray(ref)[gate],
                               rtol=2e-4, atol=2e-4)


def test_pallas_unmasked_rows_match_dense():
    rng = np.random.default_rng(1)
    b, q, t = 1, 64, 128
    params = _params(rng)
    qx = jnp.asarray(rng.normal(size=(b, q, E)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(b, t, E)).astype(np.float32))
    keep = jnp.ones((b, q, t), bool)
    ref = multihead_attention(qx, kv, kv, params, H)
    ours = masked_mha_pallas(qx, kv, kv, params, H, keep, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
