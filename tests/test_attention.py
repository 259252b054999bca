"""MHA parity vs torch ``nn.MultiheadAttention`` (the reference's attention,
detr3d_head.py:129,578), incl. boolean attn_mask and the gather/scatter
row-update equivalence."""
import numpy as np
import jax.numpy as jnp
import torch

from transcar_tpu.ops.attention import multihead_attention, masked_cross_attention

E, H = 64, 8


def _make_params(rng, torch_mha):
    w = torch_mha.in_proj_weight.detach().numpy()
    b = torch_mha.in_proj_bias.detach().numpy()
    wo = torch_mha.out_proj.weight.detach().numpy()
    bo = torch_mha.out_proj.bias.detach().numpy()
    return {
        "wq": jnp.asarray(w[:E].T), "bq": jnp.asarray(b[:E]),
        "wk": jnp.asarray(w[E:2 * E].T), "bk": jnp.asarray(b[E:2 * E]),
        "wv": jnp.asarray(w[2 * E:].T), "bv": jnp.asarray(b[2 * E:]),
        "wo": jnp.asarray(wo.T), "bo": jnp.asarray(bo),
    }


def test_mha_matches_torch_unmasked_and_masked():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    mha.eval()
    params = _make_params(rng, mha)

    lq, lk = 30, 50
    q = rng.normal(size=(1, lq, E)).astype(np.float32)
    kv = rng.normal(size=(1, lk, E)).astype(np.float32)
    # a mask with some fully-visible and some partially-masked rows,
    # no fully-masked rows (torch would NaN there)
    mask = rng.uniform(size=(lq, lk)) < 0.4
    mask[:, 0] = False

    ours = multihead_attention(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), params, H,
        mask=jnp.asarray(mask))
    tq = torch.from_numpy(q.transpose(1, 0, 2))
    tkv = torch.from_numpy(kv.transpose(1, 0, 2))
    with torch.no_grad():
        ref, _ = mha(tq, tkv, tkv, attn_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(
        np.asarray(ours)[0], ref.numpy()[:, 0], rtol=2e-5, atol=2e-5)

    with torch.no_grad():
        ref_unmasked, _ = mha(tq, tkv, tkv)
    ours_unmasked = multihead_attention(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), params, H)
    np.testing.assert_allclose(
        np.asarray(ours_unmasked)[0], ref_unmasked.numpy()[:, 0],
        rtol=2e-5, atol=2e-5)


def test_gated_update_equals_reference_gather_scatter():
    """The reference gathers rows with ≥1 visible token, attends, scatters
    back (detr3d_head.py:573-581).  Our gate must reproduce that exactly."""
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    mha.eval()
    params = _make_params(rng, mha)

    lq, lk = 40, 25
    q = rng.normal(size=(1, lq, E)).astype(np.float32)
    kv = rng.normal(size=(1, lk, E)).astype(np.float32)
    keep = rng.uniform(size=(lq, lk)) < 0.15   # some rows fully masked
    keep[5] = False
    keep[17] = False

    attn_out, gate = masked_cross_attention(
        jnp.asarray(q), jnp.asarray(kv), params, H,
        keep_mask=jnp.asarray(keep)[None])
    updated = jnp.asarray(q) + attn_out       # residual update

    # reference restated: gather visible rows, run torch MHA, scatter
    vis = np.where(keep.any(axis=1))[0]
    tq = torch.from_numpy(q[0][vis][:, None, :])
    tkv = torch.from_numpy(kv.transpose(1, 0, 2))
    with torch.no_grad():
        tgt2, _ = mha(tq, tkv, tkv,
                      attn_mask=torch.from_numpy(~keep[vis]))
    ref = q[0].copy()
    ref[vis] = ref[vis] + tgt2[:, 0].numpy()

    assert np.asarray(gate)[0, 5, 0] == 0.0
    np.testing.assert_allclose(np.asarray(updated)[0], ref, rtol=2e-5,
                               atol=2e-5)
