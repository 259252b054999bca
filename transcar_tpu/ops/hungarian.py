"""Jit-compatible Hungarian matching (N5 of SURVEY.md §2.4).

The reference moves the [900, num_gt] cost matrix to the CPU and calls
scipy's C++ Jonker–Volgenant solver every decoder layer of every step
(hungarian_assigner_3d.py:108-125) — a device→host→device round trip.  Here
the solver runs *on device inside jit*: a shortest-augmenting-path LAP over
a statically padded [G_max, Q] matrix using ``lax.fori_loop`` /
``lax.while_loop`` with vectorized column scans.

Padded GT rows get uniform (zero) cost: a uniform row contributes a constant
to any assignment, so the restriction of the global optimum to real rows is
itself optimal for the real rows — the matched cost equals scipy's optimum
(tie permutations may differ; tests compare matched total cost, SURVEY §7
hard-part #1).

A ``pure_callback`` path to scipy (or the bundled C++ LAPJV, see
transcar_tpu/native) is provided as a host fallback and test oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# plain float: a module-scope jnp scalar would initialize the
# XLA backend at import time and break jax.distributed.initialize
_INF = float(np.finfo(np.float32).max) / 4


@partial(jax.jit, static_argnames=())
def hungarian_match(cost_qg: jnp.ndarray, num_gt: jnp.ndarray):
    """Solve min-cost assignment of GTs to queries.

    Rows are solved only up to ``num_gt`` (early termination): the JV
    shortest-augmenting-path invariant makes the first-n-rows solution
    optimal for those rows, and padded rows cannot influence real ones.
    Under vmap the row loop runs max(num_gt)-over-the-batch iterations
    instead of always G_max — the dominant cost at nuScenes gt counts
    (~10-40 real boxes « the 128-slot static pad).

    Args:
      cost_qg: [Q, G_max] float cost (rows: queries, cols: gt slots).
      num_gt: scalar int — number of real GTs (≤ G_max); padded slots are
        never solved.
    Returns:
      (matched_query, valid): [G_max] int32 query index per gt slot — Q
      (an out-of-range scatter-drop sentinel) at padded slots — and
      [G_max] bool validity (slot < num_gt).
    """
    cost = cost_qg.T.astype(jnp.float32)             # [G, Q], rows = gts
    # scipy's solver RAISES on non-finite entries ("matrix contains
    # invalid numeric entries"); inside jit we sanitize instead — a NaN
    # cost (exploded predictions mid-training) otherwise breaks the
    # Dijkstra invariant (NaN < x is False, so no column ever improves
    # `shortest`) and the while_loop below spins FOREVER once every
    # column is scanned without reaching a free one.  The big-M is 1e7,
    # not fp32-max: dual potentials absorb matched costs, and fp32
    # addition at 1e30 would erase the finite-scale costs of every later
    # row sharing a column with a poisoned one (eps(1e7) ≈ 1 keeps the
    # degraded regime sane); legitimate focal+L1 costs are ≤ ~1e3.
    cost = jnp.clip(jnp.nan_to_num(cost, nan=1e7, posinf=1e7,
                                   neginf=-1e7), -1e7, 1e7)
    g_max, q = cost.shape
    row_ids = jnp.arange(g_max)
    valid = row_ids < num_gt

    def solve_row(cur_row, state):
        u, v, col4row, row4col = state

        shortest = jnp.full((q,), _INF)
        path = jnp.full((q,), -1, jnp.int32)
        sr = jnp.zeros((g_max,), bool)
        sc = jnp.zeros((q,), bool)

        def dijkstra_cond(s):
            # the iteration bound is a termination backstop: with finite
            # costs and num_gt ≤ q a free column is reached within q
            # scans (each iteration marks one new column), so the bound
            # never binds on sane inputs
            return (s[0] == -1) & (s[1] < q)

        def dijkstra_body(s):
            sink, it, i, min_val, sr, sc, shortest, path = s
            sr = sr.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v
            lower = (~sc) & (reduced < shortest)
            shortest = jnp.where(lower, reduced, shortest)
            path = jnp.where(lower, i, path)
            masked = jnp.where(sc, _INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            new_sink = jnp.where(row4col[j] == -1, j, jnp.int32(-1))
            next_i = jnp.where(new_sink == -1, row4col[j], i)
            return new_sink, it + 1, next_i, min_val, sr, sc, shortest, path

        sink, _, _, min_val, sr, sc, shortest, path = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body,
            (jnp.int32(-1), jnp.int32(0), cur_row.astype(jnp.int32),
             jnp.float32(0.0), sr, sc, shortest, path))

        # potential updates (scipy rectangular_lsap.cpp semantics)
        u = u.at[cur_row].add(min_val)
        others = sr & (row_ids != cur_row)
        safe_cols = jnp.clip(col4row, 0, q - 1)
        u = jnp.where(others, u + min_val - shortest[safe_cols], u)
        v = jnp.where(sc, v - (min_val - shortest), v)

        # augment along the alternating path.  ``sink == -1`` only when
        # the bounded Dijkstra bailed (degenerate inputs) — skip the
        # augmentation and leave the row unmatched rather than follow a
        # corrupt path; the iteration bound (a path alternates through at
        # most g_max rows) is the same never-binds-on-sane-inputs backstop
        def aug_cond(s):
            return (~s[0]) & (s[1] <= g_max)

        def aug_body(s):
            _, it, j, col4row, row4col = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            next_j = col4row[i]
            col4row = col4row.at[i].set(j)
            return i == cur_row, it + 1, next_j, col4row, row4col

        _, _, _, col4row, row4col = jax.lax.while_loop(
            aug_cond, aug_body,
            (sink == -1, jnp.int32(0), sink, col4row, row4col))
        return u, v, col4row, row4col

    def row_cond(s):
        return s[0] < num_gt

    def row_body(s):
        cur_row, state = s[0], s[1:]
        return (cur_row + 1,) + solve_row(cur_row, state)

    init = (jnp.int32(0),
            jnp.zeros((g_max,), jnp.float32),
            jnp.zeros((q,), jnp.float32),
            jnp.full((g_max,), -1, jnp.int32),
            jnp.full((q,), -1, jnp.int32))
    _, _, _, col4row, _ = jax.lax.while_loop(row_cond, row_body, init)
    return jnp.where(valid, col4row, q), valid


def hungarian_match_callback(cost_qg: jnp.ndarray, num_gt: jnp.ndarray):
    """Host fallback via ``jax.pure_callback`` → scipy (test oracle; same
    device→host hop the reference pays every layer)."""
    from scipy.optimize import linear_sum_assignment

    g_max = cost_qg.shape[1]

    def host(cost, n):
        n = int(n)
        out = np.full((g_max,), -1, np.int32)
        if n > 0:
            rows, cols = linear_sum_assignment(np.asarray(cost[:, :n]))
            out[cols] = rows.astype(np.int32)
        return out

    matched = jax.pure_callback(
        host, jax.ShapeDtypeStruct((g_max,), jnp.int32), cost_qg, num_gt,
        vmap_method="sequential")
    valid = jnp.arange(g_max) < num_gt
    return jnp.where(valid, matched, cost_qg.shape[0]), valid


def hungarian_match_native(cost_qg: jnp.ndarray, num_gt: jnp.ndarray):
    """Host fallback via the bundled C++ LAPJV (transcar_tpu/native) —
    one native call per solve, no scipy dependency on the hot path."""
    from transcar_tpu import native

    g_max = cost_qg.shape[1]

    def host(cost, n):
        return native.lapjv(np.ascontiguousarray(cost.T), int(n))

    matched = jax.pure_callback(
        host, jax.ShapeDtypeStruct((g_max,), jnp.int32), cost_qg, num_gt,
        vmap_method="sequential")
    valid = jnp.arange(g_max) < num_gt
    return jnp.where(valid, matched, cost_qg.shape[0]), valid
