"""Banded one-hot-matmul Pallas DCN vs the exact XLA path (oracle), in
interpret mode on CPU: exact whenever |Δy| ≤ band_radius (Δx unrestricted),
zero-contribution for out-of-band vertical samples, and fully exact when
the band covers the image."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.dcn import modulated_deform_conv
from transcar_tpu.ops.pallas_dcn import modulated_deform_conv_fast


def _case(rng, n, h, w, cin, cout, offy_scale, offx_scale):
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = rng.uniform(-offy_scale, offy_scale, (n, h, w, 9))
    om[..., 1:18:2] = rng.uniform(-offx_scale, offx_scale, (n, h, w, 9))
    om[..., 18:] = rng.normal(size=(n, h, w, 9))
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(cout,)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight), \
        jnp.asarray(bias)


def _exact(x, om, weight, bias):
    return jax.vmap(
        lambda a, b: modulated_deform_conv(a, b, weight, bias))(x, om)


def test_banded_matches_exact_within_band():
    rng = np.random.default_rng(0)
    # band = 2·3+5 = 11 < h: a genuine band; |Δy| ≤ 2.5 < band_radius
    x, om, weight, bias = _case(rng, 2, 16, 18, 8, 16,
                                offy_scale=2.5, offx_scale=2.5)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, bias, band_radius=3, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_banded_large_x_offsets_exact():
    """Horizontal offsets are never approximated — the column one-hot
    spans the full row, so |Δx| up to the image width stays exact."""
    rng = np.random.default_rng(1)
    x, om, weight, bias = _case(rng, 1, 12, 20, 4, 8,
                                offy_scale=1.5, offx_scale=9.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, bias, band_radius=2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_banded_full_band_exact_any_offsets():
    """When the band covers the whole image (h ≤ 2R+5) the kernel is
    exact for arbitrary offsets, including samples off the image."""
    rng = np.random.default_rng(2)
    x, om, weight, bias = _case(rng, 1, 9, 12, 4, 8,
                                offy_scale=7.0, offx_scale=7.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, bias, band_radius=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_banded_zero_offsets_is_plain_conv():
    rng = np.random.default_rng(3)
    x, om, weight, bias = _case(rng, 1, 10, 12, 4, 8,
                                offy_scale=0.0, offx_scale=0.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_fast(
        x, om, weight, bias, band_radius=2, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_banded_out_of_band_taps_vanish():
    """A tap whose vertical sample leaves the band contributes zero —
    the documented approximation (== sampling outside the image)."""
    rng = np.random.default_rng(4)
    n, h, w, cin, cout = 1, 20, 10, 4, 4
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = 9.0          # Δy = 9 ≫ band_radius 2 everywhere
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    out = np.asarray(modulated_deform_conv_fast(
        jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight),
        band_radius=2, interpret=True))
    # interior rows: every tap out-of-band → output exactly zero
    np.testing.assert_allclose(out[:, 5:8], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# separable kernel (x one-hot on MXU, y band reduction on VPU)
# ---------------------------------------------------------------------------

from transcar_tpu.ops.pallas_dcn import modulated_deform_conv_sep


def test_separable_matches_exact_within_band():
    rng = np.random.default_rng(5)
    # B=24 → exact for |Δy| ≤ 3 (B/2 − 9); h > B so a genuine band
    x, om, weight, bias = _case(rng, 2, 48, 18, 8, 16,
                                offy_scale=3.0, offx_scale=6.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_sep(
        x, om, weight, bias, band_rows=24, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_separable_full_band_exact_any_offsets():
    """band_rows ≥ padded image height → exact for arbitrary offsets."""
    rng = np.random.default_rng(6)
    x, om, weight, bias = _case(rng, 1, 15, 12, 4, 8,
                                offy_scale=9.0, offx_scale=9.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_sep(
        x, om, weight, bias, band_rows=16, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_separable_zero_offsets_is_plain_conv():
    rng = np.random.default_rng(7)
    x, om, weight, bias = _case(rng, 1, 33, 12, 4, 8,
                                offy_scale=0.0, offx_scale=0.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(modulated_deform_conv_sep(
        x, om, weight, bias, band_rows=16, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_separable_out_of_band_taps_vanish():
    rng = np.random.default_rng(8)
    n, h, w, cin, cout = 1, 40, 10, 4, 4
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = 21.0         # Δy = 21 ≫ band coverage everywhere
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    out = np.asarray(modulated_deform_conv_sep(
        jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight),
        band_rows=16, interpret=True))
    # interior rows: every tap out-of-band → output exactly zero
    np.testing.assert_allclose(out[:, 16:20], 0.0, atol=1e-6)
