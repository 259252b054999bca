"""Banded Pallas MSDeformAttn encoder kernel vs the XLA oracle.

The oracle (ops/msdeform.ms_deform_attn_core) is itself
torch-parity-tested (tests/test_dgcnn.py); here the kernel must match
it exactly (within the bf16 value cast) wherever vertical samples stay
inside the row band — the encoder's operating regime (reference points
are the queries' own cell centers; mmcv's init spreads points ≤ 4
cells) — and degrade to zero-contribution for out-of-band taps, the
same contract as the DCN kernel band.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transcar_tpu.ops.msdeform import ms_deform_attn_core
from transcar_tpu.ops.pallas_msdeform import pallas_msdeform_encoder

SHAPES = [(16, 16), (8, 8), (4, 4)]
HEADS, D, P = 4, 8, 2


def _enc_inputs(rng, b, max_cells=2.0):
    """Encoder-style inputs: each query's reference is its own cell
    center (same normalized point at every level), offsets ≤ max_cells
    value-level cells."""
    s = sum(h * w for h, w in SHAPES)
    value = rng.normal(size=(b, s, HEADS, D)).astype(np.float32)
    refs = []
    for hl, wl in SHAPES:
        ry = (np.arange(hl) + 0.5) / hl
        rx = (np.arange(wl) + 0.5) / wl
        g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)
        refs.append(g.reshape(-1, 2))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    norm = np.array([[wl, hl] for hl, wl in SHAPES], np.float32)
    off = rng.uniform(-max_cells, max_cells,
                      (b, s, HEADS, len(SHAPES), P, 2)).astype(np.float32)
    loc = ref + off / norm[None, None, None, :, None, :]
    wgt = rng.uniform(0, 1, (b, s, HEADS, len(SHAPES), P)).astype(
        np.float32)
    wgt = wgt / wgt.sum(axis=(-2, -1), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc.astype(np.float32)),
            jnp.asarray(wgt))


def test_kernel_matches_oracle_in_band():
    rng = np.random.default_rng(0)
    value, loc, wgt = _enc_inputs(rng, b=2, max_cells=2.0)
    want = ms_deform_attn_core(value, SHAPES, loc, wgt)
    got = pallas_msdeform_encoder(value, SHAPES, loc, wgt, band=8,
                                  interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_kernel_exact_at_fp32_scale_of_band():
    """Tighter check against bf16 noise: tiny values keep the bf16 cast
    nearly exact, so any STRUCTURAL error (wrong band row, head/point
    ordering, mask placement) shows up far above tolerance."""
    rng = np.random.default_rng(1)
    value, loc, wgt = _enc_inputs(rng, b=1, max_cells=1.0)
    want = np.asarray(ms_deform_attn_core(value, SHAPES, loc, wgt))
    got = np.asarray(pallas_msdeform_encoder(value, SHAPES, loc, wgt,
                                             band=8, interpret=True))
    # a structural error (wrong band row, head/point ordering, mask
    # placement) shifts MANY elements by O(1); the bf16 value cast only
    # produces small, zero-mean noise (cancellation makes pure
    # per-element relative bounds meaningless)
    diff = np.abs(got - want)
    assert float(diff.mean()) < 5e-3, float(diff.mean())
    assert float(diff.max()) < 5e-2, float(diff.max())
    assert float(np.quantile(diff, 0.999)) < 2e-2


def test_out_of_band_taps_contribute_zero():
    """A query whose vertical offset leaves the band loses that tap
    (exact-zero contribution), everything else unchanged — the DCN-band
    contract."""
    rng = np.random.default_rng(2)
    value, loc, wgt = _enc_inputs(rng, b=1, max_cells=0.5)
    loc2 = np.asarray(loc).copy()
    # push one tap of query 0 far below the band (level 0: +12 rows)
    loc2[0, 0, 0, 0, 0, 1] += 12.0 / 16.0
    loc2 = jnp.asarray(loc2)

    got = np.asarray(pallas_msdeform_encoder(value, SHAPES, loc2, wgt,
                                             band=8, interpret=True))
    # oracle with that tap's weight zeroed == kernel's band semantics
    wgt_z = np.asarray(wgt).copy()
    wgt_z[0, 0, 0, 0, 0] = 0.0
    want = np.asarray(ms_deform_attn_core(value, SHAPES, loc2,
                                          jnp.asarray(wgt_z)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_horizontal_offsets_unbounded_and_edges_exact():
    """Horizontal taps are never banded: huge x offsets fall off the map
    as exact zeros (grid_sample zero padding), matching the oracle."""
    rng = np.random.default_rng(3)
    value, loc, wgt = _enc_inputs(rng, b=1, max_cells=1.0)
    loc2 = np.asarray(loc).copy()
    loc2[0, 5, :, :, :, 0] += 0.9           # push x far right (off-map)
    loc2[0, 6, :, :, :, 0] -= 0.9           # off-map left
    loc2 = jnp.asarray(loc2)
    want = ms_deform_attn_core(value, SHAPES, loc2, wgt)
    got = pallas_msdeform_encoder(value, SHAPES, loc2, wgt, band=8,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_window_chunks_always_cover_the_band():
    """The two-chunk value window must cover every query row's band at
    every (H_q, H_v) pairing the model can produce — the BlockSpec index
    maps and the kernel body both lean on this invariant."""
    from transcar_tpu.ops.pallas_msdeform import (_enc_band_start,
                                                  _window_chunk,
                                                  _window_rows)
    for band in (8, 16, 24):
        for hv in (16, 32, 64, 128, 256, 512):
            if hv < band:
                continue
            m = _window_rows(hv, band)
            if m == 0:
                continue
            assert m >= band and hv % m == 0 and hv >= 2 * m
            for hq in (16, 32, 64, 128, 256, 512):
                for r in range(hq):
                    s = int(_enc_band_start(r, hq, hv, band))
                    k = int(_window_chunk(r, hq, hv, band, m))
                    assert 0 <= k <= hv // m - 2, (band, hv, hq, r)
                    assert k * m <= s, (band, hv, hq, r, s, k)
                    assert s + band <= (k + 2) * m, (band, hv, hq, r)


def test_custom_vjp_grads_match_xla_oracle_in_band():
    """d_value / d_locations / d_weights of the banded custom VJP equal
    jax.grad of the exact XLA oracle wherever every vertical tap stays
    in band (the same regime the forward tests pin)."""
    from transcar_tpu.ops.pallas_msdeform import pallas_msdeform_encoder_ad

    rng = np.random.default_rng(5)
    value, loc, wgt = _enc_inputs(rng, b=2, max_cells=1.5)
    shapes = tuple(SHAPES)

    def loss_oracle(v, lo, w):
        out = ms_deform_attn_core(v, shapes, lo, w)
        return jnp.sum(jnp.sin(out * 3.0))

    def loss_kernel(v, lo, w):
        out = pallas_msdeform_encoder_ad(v, shapes, lo, w, 8, True)
        return jnp.sum(jnp.sin(out * 3.0))

    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2))(value, loc, wgt)
    g_got = jax.grad(loss_kernel, argnums=(0, 1, 2))(value, loc, wgt)
    for name, a, b in zip(("d_value", "d_loc", "d_weights"),
                          g_got, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2 * scale,
                                   err_msg=name)
        assert np.abs(b).max() > 1e-4, f"{name} vacuous"


def test_custom_vjp_structural_exactness_small_values():
    """Tiny values keep the bf16 cast nearly exact: any STRUCTURAL
    backward error (wrong band row, head/point mixing, missed query
    range in the d_value kernel) shows up far above the tolerance."""
    from transcar_tpu.ops.pallas_msdeform import pallas_msdeform_encoder_ad

    rng = np.random.default_rng(9)
    value, loc, wgt = _enc_inputs(rng, b=1, max_cells=1.0)
    value = value * 1e-3
    shapes = tuple(SHAPES)

    def loss_oracle(v, lo, w):
        return jnp.sum(ms_deform_attn_core(v, shapes, lo, w) ** 2)

    def loss_kernel(v, lo, w):
        return jnp.sum(
            pallas_msdeform_encoder_ad(v, shapes, lo, w, 8, True) ** 2)

    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2))(value, loc, wgt)
    g_got = jax.grad(loss_kernel, argnums=(0, 1, 2))(value, loc, wgt)
    for name, a, b in zip(("d_value", "d_loc", "d_weights"),
                          g_got, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-2,
                                   err_msg=name)


def test_head_group_split_matches_oracle(monkeypatch):
    """The VMEM-budgeted head-group split (hg > 1) must be numerically
    invisible.  Tests run at small shapes where `_enc_hgroups` always
    picks the full stack, so force a 2-way split (and a 4-way = fully
    per-head-pair split) and compare against the XLA oracle — a wrong
    group/omp row offset or head-channel ownership shows up here."""
    import transcar_tpu.ops.pallas_msdeform as pm

    rng = np.random.default_rng(7)
    value, loc, wgt = _enc_inputs(rng, b=2, max_cells=2.0)
    want = ms_deform_attn_core(value, SHAPES, loc, wgt)
    for forced in (2, 4):
        monkeypatch.setattr(pm, "_enc_hgroups",
                            lambda *a, _f=forced, **k: _f)
        got = pm.pallas_msdeform_encoder(value, SHAPES, loc, wgt,
                                         band=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"hgroups={forced}")
