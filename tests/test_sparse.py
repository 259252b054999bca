"""Sparse 3D conv vs brute-force dict oracles (spconv semantics:
SubMConv3d preserves sites; SparseConv3d k3 s2 p1 creates the union of
contributed downsampled sites)."""
import numpy as np
import jax.numpy as jnp

from transcar_tpu.ops.sparse import (_kernel_offsets, sparse_conv_down,
                                     subm_conv)

GRID = (8, 12, 12)


def _sites(rng, n, v_max, cin):
    # unique random active sites
    all_lin = rng.choice(GRID[0] * GRID[1] * GRID[2], size=n, replace=False)
    coords = np.stack([all_lin // (GRID[1] * GRID[2]),
                       (all_lin // GRID[2]) % GRID[1],
                       all_lin % GRID[2]], axis=1).astype(np.int32)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    coords_pad = np.zeros((v_max, 3), np.int32)
    feats_pad = np.zeros((v_max, cin), np.float32)
    coords_pad[:n] = coords
    feats_pad[:n] = feats
    return feats_pad, coords_pad, n, {tuple(c): f
                                      for c, f in zip(coords, feats)}


def test_subm_conv_matches_bruteforce():
    rng = np.random.default_rng(0)
    cin, cout, v_max, n = 8, 16, 64, 40
    feats, coords, n, table = _sites(rng, n, v_max, cin)
    weight = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2

    out = np.asarray(subm_conv(jnp.asarray(feats), jnp.asarray(coords),
                               jnp.int32(n), jnp.asarray(weight), GRID))
    offs = _kernel_offsets()
    for i in range(n):
        ref = np.zeros(cout)
        for k, t in enumerate(offs):
            nb = tuple(coords[i] + t)
            if nb in table:
                ref += table[nb] @ weight[k]
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)
    assert (out[n:] == 0).all()


def test_sparse_conv_down_matches_bruteforce():
    rng = np.random.default_rng(1)
    cin, cout, v_max, n = 4, 8, 64, 30
    feats, coords, n, table = _sites(rng, n, v_max, cin)
    weight = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2

    of, oc, on = sparse_conv_down(
        jnp.asarray(feats), jnp.asarray(coords), jnp.int32(n),
        jnp.asarray(weight), GRID, out_max=128)
    of, oc, on = np.asarray(of), np.asarray(oc), int(on)

    # oracle: output site o active iff ∃ input at 2o + t
    offs = _kernel_offsets()
    out_grid = tuple((g + 1) // 2 for g in GRID)
    expected = {}
    for i in table:
        for t in offs:
            o = np.asarray(i) - t
            if (o % 2 == 0).all():
                o = o // 2
                if ((o >= 0).all()
                        and (o < np.asarray(out_grid)).all()):
                    expected.setdefault(tuple(o), np.zeros(cout))
    for o in expected:
        acc = np.zeros(cout)
        for k, t in enumerate(offs):
            src = tuple(np.asarray(o) * 2 + t)
            if src in table:
                acc += table[src] @ weight[k]
        expected[o] = acc

    got = {tuple(oc[j]): of[j] for j in range(on)}
    assert set(got) == set(expected), (
        len(got), len(expected))
    for o in expected:
        np.testing.assert_allclose(got[o], expected[o], rtol=1e-4,
                                   atol=1e-4)
