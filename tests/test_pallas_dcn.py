"""Fused Pallas DCNv2 kernel vs the exact XLA path (oracle), in interpret
mode on CPU: exact whenever |Δy| is within the band guarantee (Δx
unrestricted), zero-contribution for out-of-band vertical samples, and
fully exact when the band covers the image."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transcar_tpu.ops.dcn import modulated_deform_conv
from transcar_tpu.ops.pallas_dcn import fused_deform_conv


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


@pytest.mark.parametrize("variant", ["banded", "onedot"])
@pytest.mark.parametrize("rows", [1, 2, 4, 3])
def test_fused_matches_exact_within_band(rows, variant):
    rng = np.random.default_rng(0)
    # B=16 → exact |Δy| ≤ 6 for ANY rows (per-row band pipeline);
    # h > B so a genuine band; rows=3 leaves a ragged padded tail chunk;
    # W=18 → the onedot variant pads W' to 24 (zero columns must vanish)
    x, om, weight, bias = _case(rng, 2, 40, 18, 8, 16,
                                offy_scale=5.0, offx_scale=7.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(fused_deform_conv(
        x, om, weight, bias, band_rows=16, rows_per_step=rows,
        variant=variant, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_full_band_exact_any_offsets():
    """band_rows ≥ image height → exact for arbitrary offsets."""
    rng = np.random.default_rng(1)
    x, om, weight, bias = _case(rng, 1, 15, 12, 4, 8,
                                offy_scale=9.0, offx_scale=9.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(fused_deform_conv(
        x, om, weight, bias, band_rows=16, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_zero_offsets_is_plain_conv():
    rng = np.random.default_rng(2)
    x, om, weight, bias = _case(rng, 1, 33, 12, 4, 8,
                                offy_scale=0.0, offx_scale=0.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(fused_deform_conv(
        x, om, weight, bias, band_rows=12, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_cout_differs_from_cin():
    rng = np.random.default_rng(3)
    x, om, weight, bias = _case(rng, 2, 24, 10, 8, 24,
                                offy_scale=2.0, offx_scale=2.0)
    ref = np.asarray(_exact(x, om, weight, bias))
    out = np.asarray(fused_deform_conv(
        x, om, weight, bias, band_rows=12, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_out_of_band_taps_vanish():
    """A tap whose vertical sample leaves the band contributes zero —
    the documented approximation (== sampling outside the image)."""
    rng = np.random.default_rng(4)
    n, h, w, cin, cout = 1, 40, 10, 4, 4
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = 21.0         # Δy = 21 ≫ band coverage everywhere
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    out = np.asarray(fused_deform_conv(
        jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight),
        band_rows=16, interpret=True))
    # interior rows: every tap out-of-band → output exactly zero
    np.testing.assert_allclose(out[:, 16:20], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# backward (custom VJP) vs the exact path's autodiff
# ---------------------------------------------------------------------------

from transcar_tpu.ops.pallas_dcn import fused_deform_conv_ad


def test_fused_vjp_matches_exact_autodiff():
    """d_x, d_offset_mask and d_weight from the transposed-one-hot-matmul
    backward kernel match jax.grad through the exact gather path (within
    the band, where forward outputs agree)."""
    rng = np.random.default_rng(9)
    n, h, w, cin, cout = 2, 24, 10, 8, 12
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = rng.uniform(-3.0, 3.0, (n, h, w, 9))
    om[..., 1:18:2] = rng.uniform(-5.0, 5.0, (n, h, w, 9))
    om[..., 18:] = rng.normal(size=(n, h, w, 9))
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
    cot = rng.normal(size=(n, h, w, cout)).astype(np.float32)

    def loss_exact(x, om, wt):
        out = jax.vmap(lambda a, b: modulated_deform_conv(a, b, wt))(x, om)
        return jnp.sum(out * cot)

    args = (jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight))
    ge = jax.grad(loss_exact, argnums=(0, 1, 2))(*args)
    # rows_per_step is exactness-neutral (per-row band centering matches
    # the backward's): grads must match the exact oracle for every value
    for rows in (1, 4):
        def loss_fused(x, om, wt, rows=rows):
            out = fused_deform_conv_ad(x, om, wt, 16, rows, True)
            return jnp.sum(out * cot)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
        for name, a, b in zip(("d_x", "d_offset_mask", "d_weight"), ge, gf):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3,
                err_msg=f"{name} rows={rows}")


def test_fused_vjp_band24_matches_exact_autodiff():
    """Band 24 — the full-backbone-training auto-widen
    (models/detector.py::FULL_TRAIN_MIN_BAND) — through the streamed
    band loop: grads match exact autodiff for offsets within its
    |Δy| ≤ 10 guarantee on an image taller than the band."""
    rng = np.random.default_rng(11)
    n, h, w, cin, cout = 1, 40, 10, 8, 8
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = rng.uniform(-9.0, 9.0, (n, h, w, 9))
    om[..., 1:18:2] = rng.uniform(-6.0, 6.0, (n, h, w, 9))
    om[..., 18:] = rng.normal(size=(n, h, w, 9))
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
    cot = rng.normal(size=(n, h, w, cout)).astype(np.float32)

    def loss_exact(x, om, wt):
        out = jax.vmap(lambda a, b: modulated_deform_conv(a, b, wt))(x, om)
        return jnp.sum(out * cot)

    def loss_fused(x, om, wt):
        out = fused_deform_conv_ad(x, om, wt, 24, 1, True)
        return jnp.sum(out * cot)

    args = (jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight))
    ge = jax.grad(loss_exact, argnums=(0, 1, 2))(*args)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("d_x", "d_offset_mask", "d_weight"), ge, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3,
            err_msg=name)


def test_fused_vjp_out_of_band_grads_are_zero():
    """Taps outside the band contribute zero forward AND backward (the
    gradient is exactly the gradient of the banded forward)."""
    rng = np.random.default_rng(10)
    n, h, w, cin, cout = 1, 40, 8, 4, 4
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    om = np.zeros((n, h, w, 27), np.float32)
    om[..., 0:18:2] = 21.0         # all taps far out of band
    weight = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)

    def loss(x, om, wt):
        out = fused_deform_conv_ad(x, om, wt, 16, 1, True)
        return jnp.sum(out[:, 16:20] ** 2)

    gx, gom, gw = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(om), jnp.asarray(weight))
    np.testing.assert_allclose(np.asarray(gx), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), 0.0, atol=1e-6)
    # mask grads vanish too (sampled is zero), offset grads vanish (no
    # tap in range)
    np.testing.assert_allclose(np.asarray(gom)[:, 16:20], 0.0, atol=1e-6)
