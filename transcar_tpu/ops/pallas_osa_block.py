"""Whole OSA block as ONE Pallas kernel (inference path).

Extends ops/pallas_osa.py (which fuses only the concat-reduce tail): here
the 5-conv chain ALSO runs in-kernel, so a block's intermediate conv
outputs never touch HBM — traffic collapses to ~one read of x and one
write of the output.

Formulation: each row-chunk of the image lives as a zero-ringed padded
flat buffer [(rows)*(W+2), C] with guard rows.  A 3x3/pad-1 conv is nine
static sublane-shifted slices of that buffer, each contracted
[M, Cin] x [Cin, Cout] on the MXU with fp32 accumulation — the shifts
index the flat buffer at offsets dy*(W+2)+dx, and ring columns are
re-zeroed after every conv so shifted reads reproduce zero padding
exactly.  Chunks carry a halo of n_convs rows (each conv invalidates one
edge row; the final center rows stay exact), built by an overlapped
pre-copy outside the kernel.  Each chain output goes to a VMEM scratch
(cheap ref slices for the next conv's taps) and is immediately folded
into the concat-reduce accumulator (sum_i y_i @ Wr_i); per-image channel
sums for the eSE gate accumulate across chunks (see pallas_osa.py).

Semantics oracle: the XLA OSA math (tests/test_pallas_osa_block.py,
chunked vs whole-image vs oracle).  Forward-only; training keeps the XLA
path (VoVNet is frozen in the TransCAR recipe, tools/train.py:238-252).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, mask_ref, *refs, n_convs, r, halo, w, guard):
    """One (image, row-chunk) grid step.

    x_ref:    [1, 1, Rhp, C0]  padded flat chunk (halo rows + guards)
    mask_ref: [1, M, 1]        1.0 at real (row, column) positions of
              this chunk's computed range; 0.0 at ring columns AND at
              rows outside the image (edge chunks compute rows past the
              image border whose ``relu(bias)`` would otherwise leak
              into the next conv's zero padding)
    refs:     n_convs x (w9 [9, Cin, Cout], aff [2, Cout])
              then (n_convs + 1) x wr [C_i, Cr]
              then raff [2, Cr]
              then outputs o_ref [1, 1, r*(w+2), Cr], sums_ref [1, 8, Cr]
              then scratch s_ref [Rhp, Ch]
    """
    conv_ws = refs[0:2 * n_convs:2]
    conv_affs = refs[1:2 * n_convs:2]
    red_ws = refs[2 * n_convs:3 * n_convs + 1]
    raff_ref = refs[3 * n_convs + 1]
    o_ref = refs[3 * n_convs + 2]
    sums_ref = refs[3 * n_convs + 3]
    s_ref = refs[3 * n_convs + 4]

    wp = w + 2
    m = (r + 2 * halo) * wp         # computed rows (incl. decaying edges)
    start = guard + wp              # first computed row in the buffer
    c0 = guard + (halo + 1) * wp    # first *center* row (exact region)
    rc = r * wp
    mask = mask_ref[0]              # [M, 1]

    # scratch guards/rings must be zero; per-conv stores cover only the
    # computed range, so zero them once
    @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                             pl.program_id(1) == 0))
    def _zero_scratch():
        s_ref[...] = jnp.zeros(s_ref.shape, s_ref.dtype)

    # reduce acc over the center rows, seeded by piece0 = x itself
    racc = jax.lax.dot_general(
        x_ref[0, 0, c0:c0 + rc, :], red_ws[0][...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [rc, Cr]

    for i in range(n_convs):
        w9 = conv_ws[i]
        acc = None
        for k in range(9):
            dy, dx = k // 3 - 1, k % 3 - 1
            s = start + dy * wp + dx
            src = (x_ref[0, 0, s:s + m, :] if i == 0
                   else s_ref[s:s + m, :])
            d = jax.lax.dot_general(
                src, w9[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        aff = conv_affs[i]
        y = jnp.maximum(acc * aff[0:1, :] + aff[1:2, :], 0.0)
        y = (y * mask).astype(s_ref.dtype)          # re-zero ring cols
        racc = racc + jax.lax.dot_general(
            y[c0 - start:c0 - start + rc, :], red_ws[i + 1][...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if i + 1 < n_convs:                         # stage for next conv
            s_ref[start:start + m, :] = y

    out = racc * raff_ref[0:1, :] + raff_ref[1:2, :]
    out = jnp.maximum(out, 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init_sums():
        sums_ref[...] = jnp.zeros(sums_ref.shape, sums_ref.dtype)

    cmask = mask[c0 - start:c0 - start + rc, :]
    sums_ref[0, 0:1, :] += jnp.sum(out * cmask, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("rows_per_chunk",
                                             "interpret"))
def osa_block_fused(x, conv_w9s, conv_affines, reduce_ws, reduce_affine,
                    rows_per_chunk: int | None = None,
                    interpret: bool = False):
    """Fused OSA block: 5-conv ConvBN-ReLU chain + concat-free reduce +
    eSE channel sums.

    Args:
      x: [N, H, W, C0].
      conv_w9s: list of [3, 3, Cin_i, Cout_i] conv kernels (chain order).
      conv_affines: list of ([Cout_i] scale, [Cout_i] bias) folded
        FrozenBN affines, one per chain conv.
      reduce_ws: list of [C_i, Cr] splits of the 1x1 reduce kernel
        (piece order: x, then each chain output).
      reduce_affine: ([Cr] scale, [Cr] bias) for the reduce ConvBN.
      rows_per_chunk: image rows per grid step (must divide H; None =
        whole image).  Chunks < H carry a halo of n_convs rows each side;
        smaller chunks cost halo recompute but cap VMEM.
    Returns:
      ([N, H, W, Cr] output after ReLU (pre-eSE-gate), in x's dtype,
       [N, Cr] fp32 per-image channel sums of the output at real pixels).
    """
    n, h, w, c0 = x.shape
    wp = w + 2
    n_convs = len(conv_w9s)
    r = h if rows_per_chunk is None else rows_per_chunk
    if h % r:
        raise ValueError(f"rows_per_chunk {r} must divide H {h}")
    nc = h // r
    halo = n_convs if nc > 1 else 0
    guard = ((wp + 1 + 7) // 8) * 8
    rhp = 2 * guard + (r + 2 * halo + 2) * wp
    rhp = ((rhp + 7) // 8) * 8
    m = (r + 2 * halo) * wp
    cr = reduce_ws[0].shape[-1]
    dtype = x.dtype

    # padded flat base: guard+halo zeros | (H+2)*wp pf rows | halo+guard
    base = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    base = base.reshape(n, (h + 2) * wp, c0)
    top = guard + halo * wp
    base = jnp.pad(base, ((0, 0), (top, rhp), (0, 0)))
    if nc > 1:   # overlapped chunk copies (halo rows duplicated)
        xov = jnp.stack([base[:, c * r * wp:c * r * wp + rhp]
                         for c in range(nc)], axis=1)
    else:
        xov = base[:, None, :rhp]

    jj = jnp.arange(m, dtype=jnp.int32) % wp
    col_ok = (jj >= 1) & (jj <= w)                        # [m]
    # per-chunk row validity: computed row t of chunk c is padded-frame
    # row q = c*r - halo + 1 + t//wp; real image rows are 1 <= q <= h
    qq = (jnp.arange(nc, dtype=jnp.int32)[:, None] * r - halo + 1
          + (jnp.arange(m, dtype=jnp.int32) // wp)[None, :])
    mask = (col_ok[None, :] & (qq >= 1) & (qq <= h))
    mask = mask.astype(jnp.float32)[:, :, None]           # [nc, m, 1]

    ins = [xov, mask]
    in_specs = [
        pl.BlockSpec((1, 1, rhp, c0), lambda ni, ci: (ni, ci, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, 1), lambda ni, ci: (ci, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w9, (s, b) in zip(conv_w9s, conv_affines):
        k33 = w9.reshape(9, w9.shape[-2], w9.shape[-1]).astype(dtype)
        aff = jnp.stack([s.astype(jnp.float32), b.astype(jnp.float32)])
        ins += [k33, aff]
        in_specs += [
            pl.BlockSpec(k33.shape, lambda ni, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda ni, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    for wr in reduce_ws:
        ins.append(wr.astype(dtype))
        in_specs.append(pl.BlockSpec(wr.shape, lambda ni, ci: (0, 0),
                                     memory_space=pltpu.VMEM))
    raff = jnp.stack([reduce_affine[0].astype(jnp.float32),
                      reduce_affine[1].astype(jnp.float32)])
    ins.append(raff)
    in_specs.append(pl.BlockSpec(raff.shape, lambda ni, ci: (0, 0),
                                 memory_space=pltpu.VMEM))

    ch = conv_w9s[0].shape[-1]
    out, sums = pl.pallas_call(
        functools.partial(_kernel, n_convs=n_convs, r=r, halo=halo, w=w,
                          guard=guard),
        grid=(n, nc),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, r * wp, cr),
                         lambda ni, ci: (ni, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            # revisited across ci — accumulates the per-image sums
            pl.BlockSpec((1, 8, cr), lambda ni, ci: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nc, r * wp, cr), dtype),
            jax.ShapeDtypeStruct((n, 8, cr), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rhp, ch), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)

    out = out.reshape(n, h, wp, cr)[:, :, 1:w + 1, :]
    return out, sums[:, 0, :]
