"""Fused DCNv2 as a Pallas TPU kernel (N2) — the shift-select formulation.

The XLA path (ops/dcn.py) materializes a [P, 2, 2, C] gathered tensor in
HBM (~320 MB per stage-3 block) because Mosaic currently lacks dynamic
VMEM gather (probed; see docs/PERF_NOTES.md).  This kernel avoids gathers
entirely: with per-tap offsets clamped to a static window ``|Δ| ≤ c_max``,
every bilinear source pixel lies within a static shift range of the output
pixel, so sampling becomes a sum over *static* shifts of the VMEM-resident
input tile weighted by per-pixel select fields:

    sampled_k(p) = Σ_{a,b} w_{k,a,b}(p) · x[p + t_k + (a, b)]
    w_{k,a,b}(p) = [⌊Δy⌋=a](1-fy) + [⌊Δy⌋=a-1]fy) × (same for x) × m_k(p)

Per-cell FMA passes are predicated with ``pl.when`` on "any pixel uses this
cell", so the common small-offset case skips most of the window.  The
9·C-per-pixel sampled block then feeds the im2col matmul on the MXU without
ever leaving VMEM.

Semantics: identical to ops/dcn.modulated_deform_conv (and mmcv DCNv2)
whenever every offset satisfies ``|Δ| ≤ c_max``; larger offsets are clamped
(the exact path remains the default — BackboneConfig.dcn_fast_window).
Zero padding at image borders is preserved by zero-padding the input tile.
Forward-only (the TransCAR flagship freezes the backbone; training the
camera net uses the XLA path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, om_ref, w_ref, o_ref, sampled_ref, *, th, w_out, cin,
            cout, c_max, pad):
    """x_ref: [1, Hp, Wp, Cin] zero-padded full image (VMEM);
    om_ref: [1, TH, W, 32] offset+mask tile (27 used, padded to 32);
    w_ref: [9·Cin, Cout]; o_ref: [1, TH, W, Cout];
    sampled_ref: [TH·W, 9·Cin] fp32 accumulator scratch.

    Structure notes (three iterations measured, see docs/PERF_NOTES.md):
    per-tap register-carried accumulation with the source-row loop rolled
    (dynamic H starts are fine) and the W shift unrolled (Mosaic requires
    static sublane starts).  A fully unrolled variant (576 cond regions)
    wedges the Mosaic compiler; a shared-load absolute-shift variant with
    scratch RMW accumulation is 2.5× slower (VMEM read-modify-write
    dominates); per-row lax.cond predication was a wash and is omitted."""
    i = pl.program_id(1)
    om = om_ref[0].astype(jnp.float32)
    row0 = i * th                      # top output row of this tile
    span = 2 * c_max + 2               # shift cells per axis

    for k in range(9):                 # static taps (static channel slices)
        ty = k // 3 - 1
        tx = k % 3 - 1
        dy = jnp.clip(om[..., 2 * k], -c_max, c_max)        # [TH, W]
        dx = jnp.clip(om[..., 2 * k + 1], -c_max, c_max)
        mk = jax.nn.sigmoid(om[..., 18 + k])
        a0 = jnp.floor(dy)
        b0 = jnp.floor(dx)
        fy = dy - a0
        fx = dx - b0
        a0 = a0.astype(jnp.int32)
        b0 = b0.astype(jnp.int32)

        def row_body(ai, acc, ty=ty, tx=tx, a0=a0, b0=b0, fy=fy, fx=fx,
                     mk=mk):
            a = ai - c_max
            wy = jnp.where(a0 == a, 1.0 - fy,
                           jnp.where(a0 == a - 1, fy, 0.0))
            for b in range(-c_max, c_max + 2):
                wx = jnp.where(b0 == b, 1.0 - fx,
                               jnp.where(b0 == b - 1, fx, 0.0))
                wab = wy * wx * mk                          # [TH, W]
                src = x_ref[0,
                            pl.ds(row0 + pad + ty + a, th),
                            pad + tx + b:pad + tx + b + w_out, :]
                acc = acc + wab[..., None] * src.astype(jnp.float32)
            return acc

        acc = jax.lax.fori_loop(
            0, span, row_body, jnp.zeros((th, w_out, cin), jnp.float32))
        sampled_ref[:, k * cin:(k + 1) * cin] = acc.reshape(
            th * w_out, cin)

    out = jax.lax.dot_general(
        sampled_ref[:].astype(x_ref.dtype), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(th, w_out, cout).astype(o_ref.dtype)



@functools.partial(jax.jit,
                   static_argnames=("c_max", "tile_rows", "interpret"))
def modulated_deform_conv_fast(x: jnp.ndarray, offset_mask: jnp.ndarray,
                               weight: jnp.ndarray,
                               c_max: int = 3, tile_rows: int = 8,
                               interpret: bool = False) -> jnp.ndarray:
    """Batched fused DCNv2, stride 1 / pad 1 / dilation 1 (the ResNet case).

    Args:
      x: [N, H, W, Cin]; offset_mask: [N, H, W, 27] raw conv_offset output;
      weight: [3, 3, Cin, Cout].
    Returns:
      [N, H, W, Cout] (float32 accumulate, cast back to x.dtype).
    """
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    pad = c_max + 2                       # tap(±1) + shift(±c_max) + bilin +1
    th = tile_rows
    n_tiles = pl.cdiv(h, th)
    h_pad = n_tiles * th

    xp = jnp.pad(x, ((0, 0), (pad, pad + (h_pad - h)), (pad, pad),
                     (0, 0)))
    om = jnp.pad(offset_mask, ((0, 0), (0, h_pad - h), (0, 0), (0, 5)))
    w2 = weight.reshape(9 * cin, cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w_out=w, cin=cin, cout=cout,
                          c_max=c_max, pad=pad),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, h_pad + 2 * pad, w + 2 * pad, cin),
                         lambda ni, ti: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 32), lambda ni, ti: (ni, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout),
                               lambda ni, ti: (ni, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th * w, 9 * cin), jnp.float32)],
        interpret=interpret,
    )(xp, om, w2)
    return out[:, :h]
