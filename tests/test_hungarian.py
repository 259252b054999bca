"""Hungarian solver: matched cost must equal scipy's optimum
(hungarian_assigner_3d.py:117-121 is the reference path; ties may permute,
so we compare total matched cost — SURVEY.md §7 hard-part #1)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from transcar_tpu.ops.hungarian import hungarian_match, hungarian_match_callback


def _matched_cost(cost, matched, valid):
    total = 0.0
    for g in range(len(matched)):
        if valid[g]:
            total += cost[matched[g], g]
    return total


def test_matches_scipy_optimum_various_sizes():
    rng = np.random.default_rng(0)
    for q, g, gmax in [(16, 5, 8), (64, 20, 32), (900, 37, 128),
                       (900, 128, 128), (10, 1, 4)]:
        cost = rng.normal(size=(q, gmax)).astype(np.float32) * 10
        matched, valid = hungarian_match(jnp.asarray(cost), jnp.int32(g))
        matched, valid = np.asarray(matched), np.asarray(valid)
        assert valid.sum() == g
        # one-to-one over real gts
        assert len(set(matched[:g])) == g
        rows, cols = linear_sum_assignment(cost[:, :g])
        ref_cost = cost[rows, cols].sum()
        ours_cost = _matched_cost(cost, matched, valid)
        np.testing.assert_allclose(ours_cost, ref_cost, rtol=1e-4, atol=1e-3)


def test_zero_gt():
    cost = jnp.zeros((16, 8))
    matched, valid = hungarian_match(cost, jnp.int32(0))
    assert not np.asarray(valid).any()


def test_callback_path_agrees():
    rng = np.random.default_rng(1)
    cost = rng.normal(size=(50, 16)).astype(np.float32)
    m1, v1 = hungarian_match(jnp.asarray(cost), jnp.int32(9))
    m2, v2 = hungarian_match_callback(jnp.asarray(cost), jnp.int32(9))
    c1 = _matched_cost(cost, np.asarray(m1), np.asarray(v1))
    c2 = _matched_cost(cost, np.asarray(m2), np.asarray(v2))
    np.testing.assert_allclose(c1, c2, rtol=1e-5)


def test_vmap_over_batch():
    rng = np.random.default_rng(2)
    costs = rng.normal(size=(3, 40, 16)).astype(np.float32)
    ngts = jnp.asarray([4, 16, 0], dtype=jnp.int32)
    matched, valid = jax.vmap(hungarian_match)(jnp.asarray(costs), ngts)
    for b, g in enumerate([4, 16, 0]):
        assert np.asarray(valid)[b].sum() == g
        if g:
            rows, cols = linear_sum_assignment(costs[b, :, :g])
            ref = costs[b][rows, cols].sum()
            ours = _matched_cost(costs[b], np.asarray(matched)[b],
                                 np.asarray(valid)[b])
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_native_lapjv_matches_scipy():
    from transcar_tpu import native
    from transcar_tpu.ops.hungarian import hungarian_match_native
    rng = np.random.default_rng(5)
    # direct binding
    for r, c in [(1, 5), (8, 20), (64, 900)]:
        cost = rng.normal(size=(r, c)).astype(np.float32) * 10
        col4row = native.lapjv(cost)
        rows, cols = linear_sum_assignment(cost)
        np.testing.assert_allclose(cost[np.arange(r), col4row].sum(),
                                   cost[rows, cols].sum(), rtol=1e-5)
    # batched binding
    costs = rng.normal(size=(3, 16, 40)).astype(np.float32)
    nper = np.asarray([16, 7, 0], np.int32)
    out = native.lapjv_batched(costs, nper)
    for b, n in enumerate(nper):
        if n == 0:
            assert (out[b] == -1).all()
            continue
        rows, cols = linear_sum_assignment(costs[b, :n])
        np.testing.assert_allclose(costs[b, np.arange(n), out[b, :n]].sum(),
                                   costs[b][rows, cols].sum(), rtol=1e-5)
    # jax callback path
    cost = rng.normal(size=(50, 16)).astype(np.float32)
    m, v = hungarian_match_native(jnp.asarray(cost), jnp.int32(9))
    m2, v2 = hungarian_match(jnp.asarray(cost), jnp.int32(9))
    c1 = _matched_cost(cost, np.asarray(m), np.asarray(v))
    c2 = _matched_cost(cost, np.asarray(m2), np.asarray(v2))
    np.testing.assert_allclose(c1, c2, rtol=1e-4)


def test_nonfinite_costs_terminate_and_match_sanitized_scipy():
    """Regression: a NaN anywhere in the cost matrix used to spin the
    on-device Dijkstra forever (NaN < x is False -> no column ever improves
    ``shortest`` -> after q scans the loop re-selects a taken column with
    sink still -1, unkillable inside jit).  Exploded mid-training
    predictions produce exactly such costs; scipy RAISES on them, the
    device solver must sanitize and terminate.

    Poisoned entries here cannot be in any optimum (whole queries are
    poisoned, with more finite queries than gts), so the matched cost must
    EQUAL scipy's on the clamped matrix — graceful degradation, not just
    termination."""
    rng = np.random.default_rng(11)
    cost = rng.normal(size=(30, 12)).astype(np.float32) * 5
    cost[20:, :] = np.nan                 # queries 20-24: NaN
    cost[25:, :] = np.inf                 # queries 25-29: +inf
    cost[22, 3] = -np.inf
    m, v = hungarian_match(jnp.asarray(cost), jnp.int32(12))
    m, v = np.asarray(m), np.asarray(v)
    assert v.all() and (m < 30).all()      # terminated, all slots matched
    assert len(np.unique(m)) == 12         # one-to-one
    clamped = np.clip(np.nan_to_num(cost, nan=1e7, posinf=1e7,
                                    neginf=-1e7), -1e7, 1e7)
    rows, cols = linear_sum_assignment(clamped.T.astype(np.float64))
    np.testing.assert_allclose(
        clamped.T[np.arange(12), m].astype(np.float64).sum(),
        clamped.T.astype(np.float64)[rows, cols].sum(), rtol=1e-6)


def test_all_nan_cost_terminates():
    """Worst case: EVERY entry NaN (fully-exploded step).  The solver must
    still terminate with a one-to-one assignment (any permutation is
    equally optimal on the clamped uniform matrix)."""
    cost = jnp.full((16, 8), jnp.nan, jnp.float32)
    m, v = hungarian_match(cost, jnp.int32(8))
    m, v = np.asarray(m), np.asarray(v)
    assert v.all() and (m < 16).all()
    assert len(np.unique(m)) == 8
