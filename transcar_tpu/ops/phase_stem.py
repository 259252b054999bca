"""Phase-form (space-to-depth on WEIGHTS) stem reformulation.

Big-spatial convs run at 14-30% MFU under XLA on v5e
(docs/PERF_NOTES.md stem probes): the VoVNet stem costs ~11 ms real vs a
~1.4 ms roofline, and an input-side space-to-depth loses outright (the
[928,1600] transpose is catastrophic).  This module instead re-expresses
the stem CONVS on a phase grid — every conv's output pixels are grouped
by parity into channel blocks, so all convs run at the downsampled
232x400 resolution with >=256 channels, shapes where XLA measures
85-91% MFU — by scattering the ORIGINAL weights into larger kernels.
Pure reassociation of the same arithmetic: params and checkpoints are
untouched, outputs match to fp tolerance.

VoVNet stem (3x3/64 s2 -> 3x3/64 -> 3x3/128 s2, vovnet.py:229-247):
  stem1': conv [5,5,3,256]  stride 4, pad 1  -> [232,400,256] phases
  stem2': 4 x conv [2,2,256,64] (one per output phase, asymmetric pad)
          -> concat [232,400,256] phases
  stem3': conv [2,2,256,128] pad (1,0) -> [232,400,128]  (normal layout:
          the stride-2 output grid coincides with the phase grid)

ResNet stem (7x7/64 s2 + maxpool 3x3 s2, resnet.py:132-135):
  stem':  conv [9,9,3,256] stride 4, pad 3 -> [464/2, 800/2, 256] phases
  pool':  elementwise max of 9 phase-selected shifts -> [232,400,64]

Derivations: output phase (py,px) at phase-pixel (A,B) is original
output pixel (2A+py, 2B+px); matching input-tap indices against a
stride-4 (or phase-space stride-1) conv gives the scatter rules below.
Oracle-tested against the plain convs in tests/test_phase_stem.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp



def _scatter_stem1(w, ksize=None):
    """[k,k,Cin,Co] stride-2 conv -> [K,K,Cin,4*Co] stride-4 conv whose
    output channel block (py*2+px)*Co is output phase (py,px).

    Tap mapping a = 2*py + u; k=3 -> K=5 pad (1,0); k=7 -> K=9 pad
    (3,2).  jnp-only (tracer-safe under jit).
    """
    k = w.shape[0]
    kk = ksize if ksize is not None else k + 2
    cin, co = w.shape[2], w.shape[3]
    out = jnp.zeros((kk, kk, cin, 4 * co), w.dtype)
    for py in range(2):
        for px in range(2):
            for u in range(k):
                for v in range(k):
                    a, b = 2 * py + u, 2 * px + v
                    if a < kk and b < kk:
                        blk = (py * 2 + px) * co
                        out = out.at[a, b, :, blk:blk + co].set(w[u, v])
    return out


def _scatter_stem2(w, py, px):
    """[3,3,C,Co] stride-1 conv -> the output-phase-(py,px) kernel
    [2,2,4C,Co] over the phase layout (in-channel block (py',px')*C)."""
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * c, co), w.dtype)
    for ap in range(2):
        for bp in range(2):
            for pyi in range(2):
                for pxi in range(2):
                    u = 2 * ap + py + pyi - 1
                    v = 2 * bp + px + pxi - 1
                    if 0 <= u <= 2 and 0 <= v <= 2:
                        blk = (pyi * 2 + pxi) * c
                        out = out.at[ap, bp, blk:blk + c].set(w[u, v])
    return out


def _scatter_stem3(w):
    """[3,3,C,Co] stride-2 conv on the phase layout -> [2,2,4C,Co]
    (output grid == phase grid, normal layout out)."""
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * c, co), w.dtype)
    for ap in range(2):
        for bp in range(2):
            for pyi in range(2):
                for pxi in range(2):
                    u, v = 2 * ap + pyi - 1, 2 * bp + pxi - 1
                    if 0 <= u <= 2 and 0 <= v <= 2:
                        blk = (pyi * 2 + pxi) * c
                        out = out.at[ap, bp, blk:blk + c].set(w[u, v])
    return out


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _tile4(v, dtype):
    return jnp.concatenate([v.astype(dtype)] * 4)


def vovnet_phase_stem(x, w1, aff1, w2, aff2, w3, aff3):
    """Phase-form VoVNet stem.  x: [N, H, W, 3] (H, W divisible by 4);
    w1 [3,3,3,64], w2 [3,3,64,64], w3 [3,3,64,128] the ORIGINAL kernels;
    affN = (scale, bias) folded FrozenBN affines.  Returns
    [N, H//4, W//4, 128] matching stem3(stem2(stem1(x)))."""
    dt = w1.dtype
    s1, b1 = aff1
    y = _conv(x.astype(dt), _scatter_stem1(w1), 4, [(1, 0), (1, 0)])
    y = jnp.maximum(y * _tile4(s1, dt) + _tile4(b1, dt), 0.0)

    s2, b2 = aff2
    s2, b2 = s2.astype(dt), b2.astype(dt)
    pieces = []
    for py in range(2):
        for px in range(2):
            p = _conv(y, _scatter_stem2(w2, py, px), 1,
                      [(1 - py, py), (1 - px, px)])
            pieces.append(p * s2 + b2)
    y = jnp.maximum(jnp.concatenate(pieces, axis=-1), 0.0)  # [*,*,256]

    s3, b3 = aff3
    y = _conv(y, _scatter_stem3(w3), 1, [(1, 0), (1, 0)])
    return jnp.maximum(y * s3.astype(dt) + b3.astype(dt), 0.0)


def resnet_phase_stem(x, w, aff):
    """Phase-form ResNet stem: 7x7/64 stride-2 conv + BN/ReLU + maxpool
    3x3 stride-2 pad 1.  x: [N, H, W, 3]; w [7,7,3,64].  Returns
    [N, H//4, W//4, 64] matching max_pool(relu(bn(conv(x))))."""
    dt = w.dtype
    s, b = aff
    y = _conv(x.astype(dt), _scatter_stem1(w, ksize=9), 4,
              [(3, 2), (3, 2)])
    y = jnp.maximum(y * _tile4(s, dt) + _tile4(b, dt), 0.0)

    # maxpool 3x3 s2: out(A,B) = max_{u,v in -1..1} conv_out[2A+u, 2B+v];
    # original row 2A+u = 2(A+r)+q with q = u mod 2, r = (u-q)//2, so the
    # window is a max over phase-selected shifts (r, q) in
    # {(-1,1), (0,0), (0,1)} per axis
    n, hh, ww, _ = y.shape
    c = y.shape[-1] // 4
    neg = jnp.asarray(-jnp.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=neg)
    taps = [(-1, 1), (0, 0), (0, 1)]
    out = None
    for r, q in taps:
        for rb, qb in taps:
            blk = (q * 2 + qb) * c
            t = yp[:, r + 1:r + 1 + hh, rb + 1:rb + 1 + ww, blk:blk + c]
            out = t if out is None else jnp.maximum(out, t)
    return out
