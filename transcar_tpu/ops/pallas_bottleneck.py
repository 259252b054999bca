"""Fused ResNet bottleneck as one Pallas kernel (inference path).

R101 layer1/layer2 bottlenecks measure ~12-33% MFU under XLA at
232x400/116x200 (scripts/probe_r101_layer1.py): with 64/128-channel
intermediates the blocks are HBM-bound, and XLA still runs ~2.4x over
the bandwidth bound.  This kernel keeps the 1x1 -> 3x3 -> 1x1 chain's
intermediates in VMEM — HBM traffic collapses to one read of x and one
write of the output.

Same machinery as ops/pallas_osa_block.py: row-chunks as zero-ringed
padded flat buffers, the 3x3 as nine static sublane-shifted slices, ring
columns re-zeroed, one halo row per chunk (only conv2 needs neighbors).
Covers stride-1 blocks (plain 3x3, caffe-style puts the stride on conv1
of the first block of later stages — those keep XLA), with or without a
1x1 downsample projection on the identity path.

Semantics oracle: models/resnet.py Bottleneck
(tests/test_pallas_bottleneck.py).  Forward-only; training keeps XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


VMEM_BUDGET = 40e6


def _chunk_bytes(r, w, cin, cm, cout):
    """Calibrated scoped-VMEM model for one grid step: in/out double
    buffers + the fp32 value temporaries (h3/ident/out) + chain pieces.
    Measured 71 MB at (29, 400, 256, 64, 256) vs model 74 MB."""
    return (w + 2) * r * (6 * cin + 14 * cout + 20 * cm)


def _pick_rows(h: int, w: int, cin: int, cm: int, cout: int):
    """Chunk rows for the fused bottleneck: the largest divisor of h
    with >= 8 rows (halo overhead <= 25%) that fits the VMEM budget.
    Returns the row count, or None when no acceptable chunking exists
    (caller falls back to XLA)."""
    for r in sorted((d for d in range(8, h + 1) if h % d == 0),
                    reverse=True):
        if _chunk_bytes(r, w, cin, cm, cout) <= VMEM_BUDGET:
            return r
    return None


def _kernel(x_ref, mask_ref, w1_ref, a1_ref, w2_ref, a2_ref, w3_ref,
            a3_ref, wd_ref, ad_ref, o_ref, *, r, halo, w, guard,
            has_ds):
    """One (image, row-chunk) grid step.

    x_ref:  [1, 1, Rhp, Cin] padded flat chunk; mask_ref [1, M, 1]
    w1 [Cin, Cm], w2 [9, Cm, Cm], w3 [Cm, Cout], wd [Cin, Cout] (or w1
    again when has_ds=False); aN [2, C*] folded BN affines.
    o_ref: [1, 1, r*(w+2), Cout]
    """
    wp = w + 2
    m = (r + 2 * halo) * wp
    start = guard + wp
    c0 = guard + (halo + 1) * wp
    rc = r * wp
    mask = mask_ref[0]

    # conv1 (1x1) + bn + relu over the computed range (incl. halo row)
    h1 = jax.lax.dot_general(
        x_ref[0, 0, start:start + m, :], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 * a1_ref[0:1, :] + a1_ref[1:2, :], 0.0)
    h1 = (h1 * mask).astype(x_ref.dtype)            # zero ring cols

    # re-embed into a padded value so conv2's shifts see zeros outside
    pad0 = wp + 8
    h1p = jnp.concatenate(
        [jnp.zeros((pad0, h1.shape[-1]), h1.dtype), h1,
         jnp.zeros((pad0, h1.shape[-1]), h1.dtype)], axis=0)

    # conv2 (3x3) + bn + relu over the center rows
    acc = None
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        s = pad0 + (c0 - start) + dy * wp + dx
        d = jax.lax.dot_general(
            h1p[s:s + rc, :], w2_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    cmask = mask[c0 - start:c0 - start + rc, :]
    h2 = jnp.maximum(acc * a2_ref[0:1, :] + a2_ref[1:2, :], 0.0)
    h2 = (h2 * cmask).astype(x_ref.dtype)

    # conv3 (1x1) + bn, identity (or downsample) add, final relu
    h3 = jax.lax.dot_general(
        h2, w3_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h3 = h3 * a3_ref[0:1, :] + a3_ref[1:2, :]
    xc = x_ref[0, 0, c0:c0 + rc, :]
    if has_ds:
        ident = jax.lax.dot_general(
            xc, wd_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ident = ident * ad_ref[0:1, :] + ad_ref[1:2, :]
    else:
        ident = xc.astype(jnp.float32)
    out = jnp.maximum(h3 + ident, 0.0) * cmask
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_chunk",
                                             "interpret"))
def bottleneck_fused(x, w1, aff1, w2, aff2, w3, aff3,
                     wd=None, affd=None,
                     rows_per_chunk: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused stride-1 bottleneck: relu(bn3(conv3(relu(bn2(conv2(
    relu(bn1(conv1(x)))))))) + identity-or-downsample).

    Args:
      x: [N, H, W, Cin].
      w1 [1,1,Cin,Cm] or [Cin,Cm]; w2 [3,3,Cm,Cm]; w3 [1,1,Cm,Cout] or
        [Cm,Cout]; wd optional [1,1,Cin,Cout] downsample projection.
      affN/affd: ([C] scale, [C] bias) folded FrozenBN affines.
      rows_per_chunk: image rows per grid step (must divide H; None =
        whole image).
    Returns: [N, H, W, Cout] in x's dtype.
    """
    n, h, w, cin = x.shape
    wp = w + 2
    r = h if rows_per_chunk is None else rows_per_chunk
    if h % r:
        raise ValueError(f"rows_per_chunk {r} must divide H {h}")
    nc = h // r
    halo = 1 if nc > 1 else 0
    guard = ((wp + 1 + 7) // 8) * 8
    rhp = 2 * guard + (r + 2 * halo + 2) * wp
    rhp = ((rhp + 7) // 8) * 8
    m = (r + 2 * halo) * wp
    dtype = x.dtype

    w1 = w1.reshape(cin, -1).astype(dtype)
    cm = w1.shape[-1]
    w2 = w2.reshape(9, cm, cm).astype(dtype)
    w3 = w3.reshape(cm, -1).astype(dtype)
    cout = w3.shape[-1]
    has_ds = wd is not None
    if has_ds:
        wd = wd.reshape(cin, cout).astype(dtype)
        ad = jnp.stack([affd[0].astype(jnp.float32),
                        affd[1].astype(jnp.float32)])
    else:
        if cin != cout:
            raise ValueError("identity path needs cin == cout")
        wd = jnp.zeros((cin, cout), dtype)
        ad = jnp.zeros((2, cout), jnp.float32)
    affs = [jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])
            for a, b in (aff1, aff2, aff3)]

    base = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    base = base.reshape(n, (h + 2) * wp, cin)
    top = guard + halo * wp
    base = jnp.pad(base, ((0, 0), (top, rhp), (0, 0)))
    if nc > 1:
        xov = jnp.stack([base[:, c * r * wp:c * r * wp + rhp]
                         for c in range(nc)], axis=1)
    else:
        xov = base[:, None, :rhp]

    jj = jnp.arange(m, dtype=jnp.int32) % wp
    col_ok = (jj >= 1) & (jj <= w)
    qq = (jnp.arange(nc, dtype=jnp.int32)[:, None] * r - halo + 1
          + (jnp.arange(m, dtype=jnp.int32) // wp)[None, :])
    mask = (col_ok[None, :] & (qq >= 1) & (qq <= h))
    mask = mask.astype(jnp.float32)[:, :, None]

    out = pl.pallas_call(
        functools.partial(_kernel, r=r, halo=halo, w=w, guard=guard,
                          has_ds=has_ds),
        grid=(n, nc),
        in_specs=[
            pl.BlockSpec((1, 1, rhp, cin), lambda ni, ci: (ni, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda ni, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(affs[0].shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda ni, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(affs[1].shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(affs[2].shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ad.shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r * wp, cout),
                               lambda ni, ci: (ni, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nc, r * wp, cout), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xov, mask, w1, affs[0], w2, affs[1], w3, affs[2], wd, ad)

    out = out.reshape(n, h, wp, cout)[:, :, 1:w + 1, :]
    return out
