"""Camera-only head parity: the full TransCARHead decoder loop (query
split, sigmoid reference init, per-layer coords with pre-update references,
detached iterative refinement — detr3d_transformer.py:117-214 +
detr3d_head.py:263-298) vs a torch restatement with identical weights,
composed with the already-parity-tested decoder layer."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from transcar_tpu.core.config import HeadConfig
from transcar_tpu.models.head import TransCARHead
from tests.test_decoder_parity import (_ln, _mha_torch, _pos_encoder_torch,
                                       _inverse_sigmoid_t, _t)

E, HEADS, Q, NCAM, NLVL, NL = 64, 4, 20, 6, 4, 2
IMG_HW = (64, 96)
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _mlp_t(x, p, layer_norm, n=3):
    for i in range(n):
        x = x @ _t(p[f"linear{i}"]["kernel"]) + _t(p[f"linear{i}"]["bias"])
        if i < n - 1:
            if layer_norm:
                x = F.layer_norm(x, (x.shape[-1],),
                                 _t(p[f"ln{i}"]["scale"]),
                                 _t(p[f"ln{i}"]["bias"]), eps=1e-5)
            x = F.relu(x)
    return x


def _torch_layer(p, q, pos, ref01, feats, l2i):
    """Decoder layer restated (same math as tests/test_decoder_parity)."""
    attn = _mha_torch(p["self_attn"], q + pos, q + pos, q)
    q = _ln(q + attn, p["norm1"])

    ca = p["cross_attn"]
    inp_residual = q
    qp = q + pos
    w = (qp @ _t(ca["attention_weights"]["kernel"])
         + _t(ca["attention_weights"]["bias"])).view(Q, NCAM, 1, NLVL)

    lo = torch.tensor(PC[:3])
    hi = torch.tensor(PC[3:])
    ref_m = _t(ref01) * (hi - lo) + lo
    pts = torch.cat([ref_m, torch.ones(Q, 1)], -1)
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
    for f in feats:
        ft = _t(f)[0].permute(0, 3, 1, 2)
        s = F.grid_sample(ft, grid[:, :, None, :], align_corners=False)
        sampled.append(s[..., 0].permute(0, 2, 1))
    samp = torch.stack(sampled, 2)                 # [N, Q, L, E]
    wsig = torch.sigmoid(w) * vis.permute(1, 0).reshape(Q, NCAM, 1, 1)
    fused = torch.einsum("nqle,qnpl->qe", samp,
                         wsig.reshape(Q, NCAM, 1, NLVL))
    out = fused @ _t(ca["output_proj"]["kernel"]) + _t(
        ca["output_proj"]["bias"])
    pos_feat = _pos_encoder_torch(_inverse_sigmoid_t(_t(ref01)),
                                  ca["position_encoder"])
    q = _ln(out + inp_residual + pos_feat, p["norm2"])
    ffn = F.relu(q @ _t(p["ffn"]["linear1"]["kernel"])
                 + _t(p["ffn"]["linear1"]["bias"]))
    ffn = ffn @ _t(p["ffn"]["linear2"]["kernel"]) + _t(
        p["ffn"]["linear2"]["bias"])
    return _ln(q + ffn, p["norm3"])


def test_camera_head_matches_torch():
    rng = np.random.default_rng(0)
    cfg = HeadConfig(num_query=Q, embed_dims=E, num_heads=HEADS,
                     ffn_dims=2 * E, num_decoder_layers=NL,
                     with_radar_fusion=False, pc_range=PC)
    head = TransCARHead(cfg)
    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    feats = [rng.normal(size=(1, NCAM, h, w, E)).astype(np.float32)
             for h, w in shapes]
    # VALID outward-ring geometry (tests/geom.py): the old forward-less
    # ring masked every projection, making the sampled-feature term of
    # this parity comparison vacuous (zeros vs zeros)
    from tests.geom import camera_ring_l2i

    l2i = camera_ring_l2i(NCAM, IMG_HW[0], IMG_HW[1])[None]

    params = head.init(jax.random.PRNGKey(3),
                       [jnp.asarray(f) for f in feats], jnp.asarray(l2i),
                       IMG_HW)
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    # randomize zero-init sampling weights for a non-trivial test
    for lid in range(NL):
        p[f"decoder_layer{lid}"]["cross_attn"]["attention_weights"][
            "kernel"] = rng.normal(size=(E, NCAM * NLVL)).astype(
            np.float32) * 0.3
    params = {"params": jax.tree_util.tree_map(jnp.asarray, p)}

    with jax.default_matmul_precision("highest"):
        out = head.apply(params, [jnp.asarray(f) for f in feats],
                         jnp.asarray(l2i), IMG_HW)

    # torch restatement of the head loop
    emb = _t(p["query_embedding"])
    pos = emb[:, :E]
    q = emb[:, E:]
    ref = torch.sigmoid(
        pos @ _t(p["reference_points"]["kernel"])
        + _t(p["reference_points"]["bias"]))
    lo = torch.tensor(PC[:3])
    hi = torch.tensor(PC[3:])
    for lid in range(NL):
        q = _torch_layer(p[f"decoder_layer{lid}"], q, pos,
                         ref.detach().numpy(), feats, l2i)
        tmp = _mlp_t(q, p[f"reg_branch{lid}"], layer_norm=False)
        cls = _mlp_t(q, p[f"cls_branch{lid}"], layer_norm=True)
        ref_logit = _inverse_sigmoid_t(ref)
        xy = torch.sigmoid(tmp[:, 0:2] + ref_logit[:, 0:2])
        z = torch.sigmoid(tmp[:, 4:5] + ref_logit[:, 2:3])
        coord = torch.cat([
            xy * (hi[:2] - lo[:2]) + lo[:2], tmp[:, 2:4],
            z * (hi[2] - lo[2]) + lo[2], tmp[:, 5:]], dim=-1)
        ref = torch.cat([xy, z], dim=-1).detach()

        np.testing.assert_allclose(
            np.asarray(out["all_cls_scores"][lid][0]), cls.detach().numpy(),
            rtol=3e-3, atol=3e-4, err_msg=f"cls layer {lid}")
        np.testing.assert_allclose(
            np.asarray(out["all_bbox_preds"][lid][0]),
            coord.detach().numpy(), rtol=3e-3, atol=3e-4,
            err_msg=f"coord layer {lid}")
