"""Fused Pallas DCN vs the exact XLA path: bit-compatible whenever offsets
stay inside the static window (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.dcn import modulated_deform_conv
from transcar_tpu.ops.pallas_dcn import modulated_deform_conv_fast


def _case(rng, n, h, w, cin, cout, off_scale):
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., :18] = rng.uniform(-off_scale, off_scale, (n, h, w, 18))
    om[..., 18:] = rng.normal(size=(n, h, w, 9))
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
    return jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight)


def _exact(x, om, weight):
    return jax.vmap(lambda a, b: modulated_deform_conv(a, b, weight))(x, om)


def test_fast_matches_exact_within_window():
    rng = np.random.default_rng(0)
    x, om, weight = _case(rng, 2, 13, 18, 8, 16, off_scale=2.5)
    ref = np.asarray(_exact(x, om, weight))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, c_max=3, tile_rows=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fast_zero_offsets_exact():
    rng = np.random.default_rng(1)
    x, om, weight = _case(rng, 1, 9, 12, 4, 8, off_scale=0.0)
    ref = np.asarray(_exact(x, om, weight))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, c_max=2, tile_rows=3, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fast_clamps_large_offsets():
    """Out-of-window offsets are clamped — equals the exact path run on
    pre-clamped offsets."""
    rng = np.random.default_rng(2)
    x, om, weight = _case(rng, 1, 8, 10, 4, 8, off_scale=6.0)
    om_clamped = np.asarray(om).copy()
    om_clamped[..., :18] = np.clip(om_clamped[..., :18], -2, 2)
    ref = np.asarray(_exact(x, jnp.asarray(om_clamped), weight))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, c_max=2, tile_rows=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
