"""DETR3D decoder-layer parity vs a torch restatement of mmcv's
DetrTransformerDecoderLayer + Detr3DCrossAtten
(detr3d_transformer.py:218-422; layer order config :65-82), with identical
weights — covers the query_pos add conventions, residual sources, the
[cams, points, levels] weight reshape order, feature sampling, and the
position-encoder residual."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from transcar_tpu.core.config import PC_RANGE
from transcar_tpu.models.detr3d import Detr3DDecoderLayer

E, HEADS, Q, NCAM, NLVL = 64, 4, 24, 6, 4
IMG_HW = (64, 96)


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


def _ln(x, p):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]),
                        eps=1e-5)


def _mha_torch(p, q, k, v):
    mha = torch.nn.MultiheadAttention(E, HEADS, dropout=0.0)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.cat(
            [_t(p["wq"]).T, _t(p["wk"]).T, _t(p["wv"]).T], 0))
        mha.in_proj_bias.copy_(torch.cat(
            [_t(p["bq"]), _t(p["bk"]), _t(p["bv"])], 0))
        mha.out_proj.weight.copy_(_t(p["wo"]).T)
        mha.out_proj.bias.copy_(_t(p["bo"]))
    mha.eval()
    with torch.no_grad():
        out, _ = mha(q[:, None], k[:, None], v[:, None])
    return out[:, 0]


def _pos_encoder_torch(x, p):
    for i in range(2):
        x = x @ _t(p[f"linear{i}"]["kernel"]) + _t(p[f"linear{i}"]["bias"])
        x = F.layer_norm(x, (x.shape[-1],), _t(p[f"ln{i}"]["scale"]),
                         _t(p[f"ln{i}"]["bias"]), eps=1e-5)
        x = F.relu(x)
    return x


def _inverse_sigmoid_t(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def _torch_layer(p, query, query_pos, ref01, feats, l2i, pc):
    """One decoder layer restated (self_attn, norm, cross_attn, norm, ffn,
    norm) with Detr3DCrossAtten feature sampling."""
    q = _t(query)[0]
    pos = _t(query_pos)[0]
    # self attention: q/k get pos, v doesn't; residual = pre-pos query
    attn = _mha_torch(p["self_attn"], q + pos, q + pos, q)
    q = _ln(q + attn, p["norm1"])

    # cross attention
    ca = p["cross_attn"]
    inp_residual = q
    qp = q + pos
    w = qp @ _t(ca["attention_weights"]["kernel"]) + _t(
        ca["attention_weights"]["bias"])
    w = w.view(Q, NCAM, 1, NLVL)          # cams, points, levels order

    lo = torch.tensor(pc[:3])
    hi = torch.tensor(pc[3:])
    ref = _t(ref01)[0]
    ref_m = ref * (hi - lo) + lo
    pts = torch.cat([ref_m, torch.ones(Q, 1)], -1)        # [Q, 4]
    cam_pts = torch.einsum("nij,qj->nqi", _t(l2i)[0], pts)
    eps = 1e-5
    vis = cam_pts[..., 2] > eps
    uv = cam_pts[..., :2] / cam_pts[..., 2:3].clamp(min=eps)
    uv[..., 0] /= IMG_HW[1]
    uv[..., 1] /= IMG_HW[0]
    grid = (uv - 0.5) * 2
    vis &= ((grid[..., 0] > -1) & (grid[..., 0] < 1)
            & (grid[..., 1] > -1) & (grid[..., 1] < 1))

    sampled = []
    for f in feats:                        # f: [1, N, H, W, E] numpy
        ft = _t(f)[0].permute(0, 3, 1, 2)  # [N, E, H, W]
        s = F.grid_sample(ft, grid[:, :, None, :], align_corners=False)
        sampled.append(s[..., 0].permute(0, 2, 1))        # [N, Q, E]
    samp = torch.stack(sampled, 2)         # [N, Q, L, E]
    # vis is [N, Q] → [Q, N, 1, 1] via a real transpose (a reshape of the
    # [N, Q] layout scrambles (q, cam) pairs — caught once the fixture
    # geometry produced nonzero visibility)
    wsig = torch.sigmoid(w) * vis.permute(1, 0)[:, :, None, None]
    fused = torch.einsum("nqle,qnpl->qe", samp,
                         wsig.reshape(Q, NCAM, 1, NLVL))
    out = fused @ _t(ca["output_proj"]["kernel"]) + _t(
        ca["output_proj"]["bias"])
    pos_feat = _pos_encoder_torch(_inverse_sigmoid_t(ref),
                                  ca["position_encoder"])
    q = out + inp_residual + pos_feat
    q = _ln(q, p["norm2"])

    ffn = F.relu(q @ _t(p["ffn"]["linear1"]["kernel"])
                 + _t(p["ffn"]["linear1"]["bias"]))
    ffn = ffn @ _t(p["ffn"]["linear2"]["kernel"]) + _t(
        p["ffn"]["linear2"]["bias"])
    q = _ln(q + ffn, p["norm3"])
    return q


def test_decoder_layer_matches_torch():
    rng = np.random.default_rng(0)
    layer = Detr3DDecoderLayer(embed_dims=E, num_heads=HEADS, ffn_dims=2 * E,
                               num_cams=NCAM, num_points=1,
                               num_levels=NLVL, pc_range=PC_RANGE)
    query = rng.normal(size=(1, Q, E)).astype(np.float32)
    query_pos = rng.normal(size=(1, Q, E)).astype(np.float32)
    ref01 = rng.uniform(0.1, 0.9, (1, Q, 3)).astype(np.float32)
    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    feats = [rng.normal(size=(1, NCAM, h, w, E)).astype(np.float32)
             for h, w in shapes]
    # VALID outward-ring geometry (tests/geom.py): with the old
    # forward-less ring every projection was masked and this parity
    # compared zeros against zeros for the sampled-feature term
    from tests.geom import camera_ring_l2i

    l2i = camera_ring_l2i(NCAM, IMG_HW[0], IMG_HW[1])[None]

    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(query),
                        jnp.asarray(query_pos), jnp.asarray(ref01),
                        [jnp.asarray(f) for f in feats], jnp.asarray(l2i),
                        IMG_HW)
    # randomize the zero-initialized attention weights so the test is
    # non-trivial
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    p["cross_attn"]["attention_weights"]["kernel"] = rng.normal(
        size=p["cross_attn"]["attention_weights"]["kernel"].shape
    ).astype(np.float32) * 0.3
    params = {"params": jax.tree_util.tree_map(jnp.asarray, p)}

    with jax.default_matmul_precision("highest"):
        ours = layer.apply(params, jnp.asarray(query),
                           jnp.asarray(query_pos), jnp.asarray(ref01),
                           [jnp.asarray(f) for f in feats],
                           jnp.asarray(l2i), IMG_HW)
    ref = _torch_layer(p, query, query_pos, ref01, feats, l2i, PC_RANGE)
    np.testing.assert_allclose(np.asarray(ours)[0], ref.numpy(),
                               rtol=2e-3, atol=2e-4)
