"""Whole-block fused OSA kernel vs an XLA oracle (interpret mode, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.pallas_osa_block import osa_block_fused


def _affine(rng, c):
    return (jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32))


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _oracle(x, conv_ws, conv_affs, red_ws, raff):
    pieces = [x]
    for k, (s, b) in zip(conv_ws, conv_affs):
        x = jnp.maximum(_conv(x, k) * s + b, 0.0)
        pieces.append(x)
    y = jnp.concatenate(pieces, axis=-1)
    wcat = jnp.concatenate(red_ws, axis=0)[None, None]
    y = jax.lax.conv_general_dilated(
        y, wcat, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jnp.maximum(y * raff[0] + raff[1], 0.0)
    return out, out.astype(jnp.float64).sum((1, 2))


def test_osa_block_fused_matches_oracle():
    rng = np.random.default_rng(0)
    n, h, w, c0, ch, cr, nconv = 2, 10, 12, 24, 16, 32, 3
    x = jnp.asarray(rng.normal(size=(n, h, w, c0)), jnp.float32)
    conv_ws, conv_affs = [], []
    cin = c0
    for _ in range(nconv):
        conv_ws.append(jnp.asarray(
            rng.normal(size=(3, 3, cin, ch)) * 0.15, jnp.float32))
        conv_affs.append(_affine(rng, ch))
        cin = ch
    red_ws = [jnp.asarray(rng.normal(size=(c, cr)) * 0.1, jnp.float32)
              for c in [c0] + [ch] * nconv]
    raff = _affine(rng, cr)

    ref, ref_sums = _oracle(x, conv_ws, conv_affs, red_ws, raff)
    # whole image, and chunked with halo (2 and 5 chunks of the 10 rows)
    for rows in (None, 5, 2):
        out, sums = osa_block_fused(x, conv_ws, conv_affs, red_ws, raff,
                                    rows_per_chunk=rows, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"{rows}")
        np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums),
                                   rtol=1e-3, atol=1e-3, err_msg=f"{rows}")
