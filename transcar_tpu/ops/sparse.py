"""Sparse 3D convolution, TPU-native (N7 of SURVEY.md §2.4).

The reference's voxel-variant ObjDGCNN uses spconv/mmcv CUDA sparse
convolutions inside mmdet3d's ``SparseEncoder``
(configs/obj_dgcnn/voxel.py:34-43).  CUDA sparse conv builds hash-table
"rulebooks"; the TPU-native equivalent here is a dense lookup table:

  * active sites live in fixed [V_max] buffers (features, (z, y, x) coords,
    count) — the output of ops/voxelize.hard_voxelize;
  * neighbor lookup: scatter each site's ROW INDEX into a dense
    [grid+1] int32 table once per site set, then every kernel offset is
    one flat gather (miss → V_max, which indexes a zero row).  An
    earlier sort + ``searchsorted`` formulation was the voxel track's
    dominant cost on TPU — its binary-search lowers to a while loop of
    dynamic gathers, ~10.3 ms × 27 offsets × 12 blocks ≈ 2.1 s/forward
    (trace attribution, docs/PERF_NOTES.md round 4); the table is one
    scatter + flat gathers and removes the sort entirely;
  * submanifold conv (SubMConv3d): output sites = input sites; gather the
    K=27 neighbors and contract with the kernel on the MXU;
  * strided sparse conv (SparseConv3d k=3 s=2 p=1): each input contributes
    to up to 2³ downsampled sites (o·2 + t = i, t ∈ [-1, 1]); the output
    site set is their deduplicated union (dense mark grid + cumsum
    compaction — linear-id ascending, the same order and ``out_max``
    cap semantics as the previous sort-unique), then a gather-contract
    like the submanifold case.

Everything jits with static shapes; batching via vmap.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MISS = 2 ** 30   # plain int: keep module import backend-free


def _linearize(coords: jnp.ndarray, grid: Tuple[int, int, int],
               valid: jnp.ndarray) -> jnp.ndarray:
    """(z, y, x) int coords → linear ids; invalid → MISS sentinel."""
    gz, gy, gx = grid
    inside = ((coords[:, 0] >= 0) & (coords[:, 0] < gz)
              & (coords[:, 1] >= 0) & (coords[:, 1] < gy)
              & (coords[:, 2] >= 0) & (coords[:, 2] < gx))
    lin = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    return jnp.where(valid & inside, lin, MISS)


def _kernel_offsets(k: int = 3) -> np.ndarray:
    r = np.arange(k) - k // 2
    return np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)


def _site_table(coords: jnp.ndarray, valid: jnp.ndarray,
                grid: Tuple[int, int, int], v: int) -> jnp.ndarray:
    """Dense [gz·gy·gx + 1] int32 lookup: linear id → buffer row (v for
    empty cells; the last slot absorbs out-of-grid queries)."""
    g = grid[0] * grid[1] * grid[2]
    lin = _linearize(coords, grid, valid)
    return jnp.full((g + 1,), v, jnp.int32).at[
        jnp.minimum(lin, g)].set(
        jnp.where(valid, jnp.arange(v, dtype=jnp.int32), v))


@partial(jax.jit, static_argnames=("grid",))
def subm_conv(feats: jnp.ndarray, coords: jnp.ndarray,
              num_voxels: jnp.ndarray, weight: jnp.ndarray,
              grid: Tuple[int, int, int]) -> jnp.ndarray:
    """Submanifold 3×3×3 conv: [V, Cin] → [V, Cout] on the same sites.

    weight: [27, Cin, Cout] (kernel offsets in _kernel_offsets order).
    """
    v, cin = feats.shape
    g = grid[0] * grid[1] * grid[2]
    valid = jnp.arange(v) < num_voxels
    table = _site_table(coords, valid, grid, v)

    feats_z = jnp.concatenate(
        [feats * valid[:, None], jnp.zeros((1, cin), feats.dtype)], axis=0)

    offsets = jnp.asarray(_kernel_offsets(), jnp.int32)       # [27, 3]
    out = jnp.zeros((v, weight.shape[-1]), jnp.float32)
    for k in range(offsets.shape[0]):
        nb = coords + offsets[k]
        nb_lin = _linearize(nb, grid, valid)
        src = table[jnp.minimum(nb_lin, g)]                   # v → zero row
        gathered = jnp.take(feats_z, src, axis=0)             # [V, Cin]
        out = out + jax.lax.dot_general(
            gathered, weight[k].astype(gathered.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (out * valid[:, None]).astype(feats.dtype)


@partial(jax.jit, static_argnames=("grid", "out_max"))
def sparse_conv_down(feats: jnp.ndarray, coords: jnp.ndarray,
                     num_voxels: jnp.ndarray, weight: jnp.ndarray,
                     grid: Tuple[int, int, int], out_max: int):
    """SparseConv3d k=3, stride 2, pad 1: new (halved-grid) site set.

    Returns (out_feats [out_max, Cout], out_coords [out_max, 3],
    out_count).  Output sites: every o with o·2 + t = i for some active i
    and t ∈ [-1, 1]³; per-dim candidates floor((i±1)/2) → ≤8 per input.
    """
    v, cin = feats.shape
    valid = jnp.arange(v) < num_voxels
    out_grid = tuple((g + 1) // 2 for g in grid)

    # candidate output sites: per dim, o with 2o + t = i (t ∈ [-1, 1] and
    # i − t even) → i even: {i/2}; i odd: {(i−1)/2, (i+1)/2}
    parity = coords & 1
    half = jnp.stack([(coords - parity) // 2, (coords + parity) // 2],
                     axis=-1)
    cands = []
    for bz in range(2):
        for by in range(2):
            for bx in range(2):
                cands.append(jnp.stack(
                    [half[:, 0, bz], half[:, 1, by], half[:, 2, bx]],
                    axis=1))
    cand = jnp.concatenate(cands, axis=0)                     # [8V, 3]
    cand_valid = jnp.tile(valid, 8)
    cand_lin = _linearize(cand, out_grid, cand_valid)

    # dedup: mark a dense grid, compact by cumsum — linear-id ascending,
    # the same enumeration order (and out_max cap) as sort-unique,
    # without the sort
    g_out = out_grid[0] * out_grid[1] * out_grid[2]
    mark = jnp.zeros((g_out + 1,), bool).at[
        jnp.minimum(cand_lin, g_out)].set(cand_valid)
    mark = mark.at[g_out].set(False)
    slot = jnp.cumsum(mark.astype(jnp.int32)) - 1
    n_out = jnp.minimum(jnp.sum(mark), out_max)

    out_lin = jnp.full((out_max + 1,), MISS, jnp.int32)
    write = jnp.where(mark & (slot < out_max), slot, out_max)
    out_lin = out_lin.at[write].set(
        jnp.arange(g_out + 1, dtype=jnp.int32))
    out_lin = out_lin[:out_max]
    gy, gx = out_grid[1], out_grid[2]
    oz = out_lin // (gy * gx)
    oy = (out_lin // gx) % gy
    ox = out_lin % gx
    out_coords = jnp.where(
        (out_lin != MISS)[:, None],
        jnp.stack([oz, oy, ox], axis=1).astype(jnp.int32), 0)

    # gather inputs at i = 2o + t for each kernel offset
    g_in = grid[0] * grid[1] * grid[2]
    table = _site_table(coords, valid, grid, v)
    feats_z = jnp.concatenate(
        [feats * valid[:, None], jnp.zeros((1, cin), feats.dtype)], axis=0)
    out_valid = out_lin != MISS

    offsets = jnp.asarray(_kernel_offsets(), jnp.int32)
    out = jnp.zeros((out_max, weight.shape[-1]), jnp.float32)
    for k in range(offsets.shape[0]):
        src_coord = out_coords * 2 + offsets[k]
        src_lin = _linearize(src_coord, grid, out_valid)
        src = table[jnp.minimum(src_lin, g_in)]
        gathered = jnp.take(feats_z, src, axis=0)
        out = out + jax.lax.dot_general(
            gathered, weight[k].astype(gathered.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = (out * out_valid[:, None]).astype(feats.dtype)
    return out, out_coords, n_out.astype(jnp.int32)
