"""Full TransCAR fusion-stage parity: our ``TransCARHead.fuse`` vs a torch
restatement of the reference math (detr3d_head.py:526-729) running with
IDENTICAL weights — covering radar encoders, masked MHA with the row
gather/scatter update, FFN/norms, per-layer final heads, reference chaining
and the z-denorm no-op quirk."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from transcar_tpu.core.config import HeadConfig
from transcar_tpu.models.head import TransCARHead

E, HEADS, Q, T = 64, 4, 32, 48
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _np(x):
    return np.asarray(x)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _mlp_t(x, p, ln_eps=1e-5, layer_norm=False, n=3):
    """Torch restatement of the MLP module (Linear[-LN]-ReLU ×2 + Linear)."""
    for i in range(n):
        x = x @ _t(p[f"linear{i}"]["kernel"]) + _t(p[f"linear{i}"]["bias"])
        if i < n - 1:
            if layer_norm:
                x = F.layer_norm(x, (x.shape[-1],),
                                 _t(p[f"ln{i}"]["scale"]),
                                 _t(p[f"ln{i}"]["bias"]), eps=ln_eps)
            x = F.relu(x)
    return x


def _encoder_t(x, p, layer_norm):
    """radar pos/feat encoders: all layers activated (final_activation)."""
    n = len([k for k in p if k.startswith("linear")])
    for i in range(n):
        x = x @ _t(p[f"linear{i}"]["kernel"]) + _t(p[f"linear{i}"]["bias"])
        if layer_norm:
            x = F.layer_norm(x, (x.shape[-1],), _t(p[f"ln{i}"]["scale"]),
                             _t(p[f"ln{i}"]["bias"]), eps=1e-5)
        x = F.relu(x)
    return x


def _mha_t(p, heads):
    mha = torch.nn.MultiheadAttention(E, heads, dropout=0.0)
    with torch.no_grad():
        w = torch.cat([_t(p["wq"]).T, _t(p["wk"]).T, _t(p["wv"]).T], 0)
        b = torch.cat([_t(p["bq"]), _t(p["bk"]), _t(p["bv"])], 0)
        mha.in_proj_weight.copy_(w)
        mha.in_proj_bias.copy_(b)
        mha.out_proj.weight.copy_(_t(p["wo"]).T)
        mha.out_proj.bias.copy_(_t(p["bo"]))
    mha.eval()
    return mha


def _ln_t(x, p):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]),
                        eps=1e-5)


def _torch_fusion(hp, query, ref01, tmp_cam, radar_tokens, clamps, pc):
    """The reference fusion restated in torch (detr3d_head.py:526-729)."""
    lo = np.asarray(pc[:3], np.float32)
    hi = np.asarray(pc[3:], np.float32)
    q = _t(query)[0]                       # [Q, E]
    radar = _t(radar_tokens)               # [1, T, 36]
    radar_emb = (_encoder_t(radar[..., :3], hp["radar_pos_encoder"], True)
                 + _encoder_t(radar, hp["radar_feat_encoder"], False))[0]

    ref = _t(ref01)[0]                     # [Q, 3]
    ref_m = ref * _t(hi - lo) + _t(lo)
    centers = ref_m[:, :2].clone()
    base_z = ref[:, 2:3].clone()           # z-denorm no-op quirk
    tmp = _t(tmp_cam)[0]                   # [Q, 10]

    outs_cls, outs_coord = [], []
    for i, clamp in enumerate(clamps):
        # mask (reference lines 549-571)
        length = tmp[:, 3].exp()
        s, c = -tmp[:, 6], -tmp[:, 7]
        front = centers.clone()
        rear = centers.clone()
        front[:, 0] += length * 0.25 * s
        front[:, 1] += length * 0.25 * c
        rear[:, 0] -= length * 0.25 * s
        rear[:, 1] -= length * 0.25 * c
        radar_xy = radar[0, :, :2]
        d = torch.cdist(centers[None], radar_xy[None])[0]
        df = torch.cdist(front[None], radar_xy[None])[0]
        dr = torch.cdist(rear[None], radar_xy[None])[0]
        radii = torch.clamp((length / 2.0)[:, None].repeat(1, T),
                            min=clamp[0], max=clamp[1])
        ignore = ~((d < radii) | (df < radii) | (dr < radii))

        rows = torch.where((~ignore).any(dim=1))[0]
        mha = _mha_t(hp[f"fusion{i}_attn"], HEADS)
        q_in = q[rows][:, None, :]
        with torch.no_grad():
            tgt2, _ = mha(q_in, radar_emb[:, None, :], radar_emb[:, None, :],
                          attn_mask=ignore[rows])
        q = q.clone()
        q[rows] = q[rows] + tgt2[:, 0]
        q = _ln_t(q, hp[f"fusion{i}_norm2"])
        ffn = F.relu(q @ _t(hp[f"fusion{i}_linear1"]["kernel"])
                     + _t(hp[f"fusion{i}_linear1"]["bias"]))
        ffn = ffn @ _t(hp[f"fusion{i}_linear2"]["kernel"]) + _t(
            hp[f"fusion{i}_linear2"]["bias"])
        q = _ln_t(q + ffn, hp[f"fusion{i}_norm3"])

        cls = _mlp_t(q, hp[f"final_cls{i}"], layer_norm=True)
        reg = _mlp_t(q, hp[f"final_reg{i}"], layer_norm=False)
        coord = reg.clone()
        coord[:, 0:2] += centers
        coord[:, 4:5] += base_z
        outs_cls.append(cls)
        outs_coord.append(coord)
        centers = coord[:, 0:2].clone()
        base_z = coord[:, 4:5].clone()
        tmp = coord
    return outs_cls, outs_coord


def test_fuse_matches_torch_restatement():
    cfg = HeadConfig(num_query=Q, embed_dims=E, num_heads=HEADS,
                     ffn_dims=2 * E, num_decoder_layers=1,
                     num_radar_tokens=T, pc_range=PC)
    head = TransCARHead(cfg)
    rng = np.random.default_rng(0)
    query = rng.normal(size=(1, Q, E)).astype(np.float32)
    ref01 = rng.uniform(0.2, 0.8, (1, Q, 3)).astype(np.float32)
    tmp_cam = rng.normal(size=(1, Q, 10)).astype(np.float32)
    tmp_cam[..., 0:2] = (ref01[..., 0:2] * 102.4 - 51.2)
    tmp_cam[..., 3] = rng.uniform(0.3, 2.0, (1, Q))
    radar = np.full((1, T, 36), 500.0, np.float32)
    nreal = 30
    radar[0, :nreal] = rng.normal(size=(nreal, 36)).astype(np.float32)
    radar[0, :nreal, 0:2] = rng.uniform(-50, 50, (nreal, 2))

    params = head.init(
        jax.random.PRNGKey(0), jnp.asarray(query), jnp.asarray(ref01),
        jnp.asarray(tmp_cam), jnp.asarray(radar),
        method=TransCARHead.fuse)
    with jax.default_matmul_precision("highest"):
        out = head.apply(params, jnp.asarray(query), jnp.asarray(ref01),
                         jnp.asarray(tmp_cam), jnp.asarray(radar),
                         method=TransCARHead.fuse)

    hp = jax.tree_util.tree_map(np.asarray, params["params"])
    t_cls, t_coord = _torch_fusion(
        hp, query, ref01, tmp_cam, radar, cfg.fusion_radius_clamps, PC)

    for i in range(3):
        np.testing.assert_allclose(
            _np(out["all_cls_scores"][i][0]), t_cls[i].numpy(),
            rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(
            _np(out["all_bbox_preds"][i][0]), t_coord[i].numpy(),
            rtol=5e-4, atol=5e-4)
