"""Checkpoint converter test: a synthetic reference-layout state_dict must
convert into EXACTLY the flax param tree of TransCARDetector (same paths,
same shapes), with only the known-dead reference params left unused."""
import numpy as np
import jax
import pytest

from transcar_tpu.core.config import BackboneConfig, HeadConfig, ModelConfig
from transcar_tpu.models import TransCARDetector
from transcar_tpu.train.convert import convert_detr3d_checkpoint

E = 256


def _synthetic_reference_sd(num_layers=2, num_fusion=3,
                            blocks=(3, 4, 23, 3),
                            with_dcn=(False, False, True, True)):
    """Random state_dict with the reference's torch key layout + shapes
    (detr3d_head.py:74-246, mmdet ResNet/FPN conventions)."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(k, *shape):
        sd[k] = rng.normal(size=shape).astype(np.float32)

    def add_bn(k, c):
        for s, sh in (("weight", c), ("bias", c), ("running_mean", c),
                      ("running_var", c)):
            add(f"{k}.{s}", sh)

    def add_conv(k, o, i, kh, kw, bias=False):
        add(f"{k}.weight", o, i, kh, kw)
        if bias:
            add(f"{k}.bias", o)

    def add_lin(k, o, i):
        add(f"{k}.weight", o, i)
        add(f"{k}.bias", o)

    # ResNet-101
    p = "img_backbone"
    add_conv(f"{p}.conv1", 64, 3, 7, 7)
    add_bn(f"{p}.bn1", 64)
    planes = 64
    inc = 64
    for s, nb in enumerate(blocks):
        for b in range(nb):
            tp = f"{p}.layer{s + 1}.{b}"
            add_conv(f"{tp}.conv1", planes, inc if b == 0 else planes * 4,
                     1, 1)
            add_bn(f"{tp}.bn1", planes)
            add_conv(f"{tp}.conv2", planes, planes, 3, 3)
            if with_dcn[s]:
                add_conv(f"{tp}.conv2.conv_offset", 27, planes, 3, 3,
                         bias=True)
            add_bn(f"{tp}.bn2", planes)
            add_conv(f"{tp}.conv3", planes * 4, planes, 1, 1)
            add_bn(f"{tp}.bn3", planes * 4)
            if b == 0:
                add_conv(f"{tp}.downsample.0", planes * 4,
                         inc if s == 0 else planes * 2, 1, 1)
                add_bn(f"{tp}.downsample.1", planes * 4)
        inc = planes * 4
        planes *= 2

    # FPN: 3 laterals (C3..C5) + 4 fpn convs (3 + 1 extra)
    for i, c in enumerate((512, 1024, 2048)):
        add_conv(f"img_neck.lateral_convs.{i}.conv", 256, c, 1, 1, bias=True)
    for i in range(4):
        add_conv(f"img_neck.fpn_convs.{i}.conv", 256, 256, 3, 3, bias=True)

    # head
    h = "pts_bbox_head"
    add(f"{h}.query_embedding.weight", 900, 2 * E)
    add_lin(f"{h}.transformer.reference_points", 3, E)
    for l in range(num_layers):
        dl = f"{h}.transformer.decoder.layers.{l}"
        add(f"{dl}.attentions.0.attn.in_proj_weight", 3 * E, E)
        add(f"{dl}.attentions.0.attn.in_proj_bias", 3 * E)
        add_lin(f"{dl}.attentions.0.attn.out_proj", E, E)
        add_lin(f"{dl}.attentions.1.attention_weights", 24, E)
        add_lin(f"{dl}.attentions.1.output_proj", E, E)
        add_lin(f"{dl}.attentions.1.position_encoder.0", E, 3)
        add_lin(f"{dl}.attentions.1.position_encoder.1", E, E)  # LN (1D ok)
        sd[f"{dl}.attentions.1.position_encoder.1.weight"] = (
            rng.normal(size=E).astype(np.float32))
        add_lin(f"{dl}.attentions.1.position_encoder.3", E, E)
        sd[f"{dl}.attentions.1.position_encoder.4.weight"] = (
            rng.normal(size=E).astype(np.float32))
        add(f"{dl}.attentions.1.position_encoder.4.bias", E)
        add_lin(f"{dl}.ffns.0.layers.0.0", 512, E)
        add_lin(f"{dl}.ffns.0.layers.1", E, 512)
        for ni in range(3):
            sd[f"{dl}.norms.{ni}.weight"] = rng.normal(size=E).astype(
                np.float32)
            add(f"{dl}.norms.{ni}.bias", E)
        # branches
        cb = f"{h}.cls_branches.{l}"
        add_lin(f"{cb}.0", E, E)
        sd[f"{cb}.1.weight"] = rng.normal(size=E).astype(np.float32)
        add(f"{cb}.1.bias", E)
        add_lin(f"{cb}.3", E, E)
        sd[f"{cb}.4.weight"] = rng.normal(size=E).astype(np.float32)
        add(f"{cb}.4.bias", E)
        add_lin(f"{cb}.6", 10, E)
        rb = f"{h}.reg_branches.{l}"
        add_lin(f"{rb}.0", E, E)
        add_lin(f"{rb}.2", E, E)
        add_lin(f"{rb}.4", 10, E)

    # radar encoders + fusion
    add_lin(f"{h}.radar_position_encoder.0", E, 3)
    sd[f"{h}.radar_position_encoder.1.weight"] = rng.normal(size=E).astype(
        np.float32)
    add(f"{h}.radar_position_encoder.1.bias", E)
    add_lin(f"{h}.radar_position_encoder.3", E, E)
    sd[f"{h}.radar_position_encoder.4.weight"] = rng.normal(size=E).astype(
        np.float32)
    add(f"{h}.radar_position_encoder.4.bias", E)
    add_lin(f"{h}.radar_feat_encoder.0", 64, 36)
    add_lin(f"{h}.radar_feat_encoder.2", 128, 64)
    add_lin(f"{h}.radar_feat_encoder.4", E, 128)
    for i in range(num_fusion):
        sfx = "" if i == 0 else ("2", "3")[i - 1]
        usfx = "" if i == 0 else ("_2", "_3")[i - 1]
        add(f"{h}.rf_multihead_attn{sfx}.in_proj_weight", 3 * E, E)
        add(f"{h}.rf_multihead_attn{sfx}.in_proj_bias", 3 * E)
        add_lin(f"{h}.rf_multihead_attn{sfx}.out_proj", E, E)
        add_lin(f"{h}.rf_linear1{usfx}", 512, E)
        add_lin(f"{h}.rf_linear2{usfx}", E, 512)
        for nm in (f"rf_norm2{usfx}", f"rf_norm3{usfx}"):
            sd[f"{h}.{nm}.weight"] = rng.normal(size=E).astype(np.float32)
            add(f"{h}.{nm}.bias", E)
        fc = f"{h}.final_cls{sfx}"
        add_lin(f"{fc}.0", E, E)
        sd[f"{fc}.1.weight"] = rng.normal(size=E).astype(np.float32)
        add(f"{fc}.1.bias", E)
        add_lin(f"{fc}.3", E, E)
        sd[f"{fc}.4.weight"] = rng.normal(size=E).astype(np.float32)
        add(f"{fc}.4.bias", E)
        add_lin(f"{fc}.6", 10, E)
        fr = f"{h}.final_reg{sfx}"
        add_lin(f"{fr}.0", E, E)
        add_lin(f"{fr}.2", E, E)
        add_lin(f"{fr}.4", 10, E)

    # dead reference params that must land in "unused"
    add_lin(f"{h}.attention_weights2", 24, E)
    add_lin(f"{h}.output_proj2", E, E)
    sd[f"{h}.rf_norm1.weight"] = rng.normal(size=E).astype(np.float32)
    add(f"{h}.rf_norm1.bias", E)
    add(f"{h}.code_weights", 10)
    return sd


@pytest.mark.slow
def test_converted_tree_matches_flax_init():
    sd = _synthetic_reference_sd(num_layers=2)
    params, report = convert_detr3d_checkpoint(sd, num_decoder_layers=2)
    assert not report["missing"], report["missing"][:10]
    for k in report["unused"]:
        assert ("attention_weights2" in k or "output_proj2" in k
                or "rf_norm1" in k or "code_weights" in k), k

    cfg = ModelConfig(
        backbone=BackboneConfig(compute_dtype=None),
        head=HeadConfig(num_decoder_layers=2),
        use_grid_mask=False)
    model = TransCARDetector(cfg)
    images = np.zeros((1, 6, 64, 96, 3), np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, 6, 1, 1))
    radar = np.full((1, 32, 36), 500.0, np.float32)
    init_params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, l2i, radar)
    )["params"]

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = tuple(v.shape)
        return out

    got = flatten(params)
    want = flatten(jax.tree_util.tree_map(lambda x: x, init_params))
    missing_in_ckpt = set(want) - set(got)
    extra_in_ckpt = set(got) - set(want)
    assert not missing_in_ckpt, sorted(missing_in_ckpt)[:8]
    assert not extra_in_ckpt, sorted(extra_in_ckpt)[:8]
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def _synthetic_vovnet_sd():
    """VoVNet-99 torch key layout (vovnet.py naming with '/'-keys)."""
    from transcar_tpu.models.vovnet import V99_SPEC
    rng = np.random.default_rng(1)
    sd = {}

    def add_convbn(key, o, i, k):
        sd[f"{key}/conv.weight"] = rng.normal(size=(o, i, k, k)).astype(
            np.float32)
        for s, sh in (("weight", o), ("bias", o), ("running_mean", o),
                      ("running_var", o)):
            sd[f"{key}/norm.{s}"] = rng.normal(size=sh).astype(np.float32)

    p = "img_backbone"
    stem = V99_SPEC["stem"]
    add_convbn(f"{p}.stem.stem_1", stem[0], 3, 3)
    add_convbn(f"{p}.stem.stem_2", stem[1], stem[0], 3)
    add_convbn(f"{p}.stem.stem_3", stem[2], stem[1], 3)
    in_ch = stem[2]
    for si in range(4):
        stage = si + 2
        sc = V99_SPEC["stage_conv_ch"][si]
        oc = V99_SPEC["stage_out_ch"][si]
        for b in range(V99_SPEC["block_per_stage"][si]):
            mod = f"{p}.stage{stage}.OSA{stage}_{b + 1}"
            cur = in_ch if b == 0 else oc
            for l in range(V99_SPEC["layer_per_block"]):
                add_convbn(f"{mod}.layers.{l}.OSA{stage}_{b + 1}_{l}", sc,
                           cur, 3)
                cur = sc
            concat_in = (in_ch if b == 0 else oc) + 5 * sc
            add_convbn(f"{mod}.concat.OSA{stage}_{b + 1}_concat", oc,
                       concat_in, 1)
            sd[f"{mod}.ese.fc.weight"] = rng.normal(
                size=(oc, oc, 1, 1)).astype(np.float32)
            sd[f"{mod}.ese.fc.bias"] = rng.normal(size=oc).astype(np.float32)
        in_ch = oc
    return sd


@pytest.mark.slow
def test_vovnet_conversion_matches_flax_init():
    import jax.numpy as jnp
    from transcar_tpu.models.vovnet import VoVNet
    from transcar_tpu.train.convert import _Tree, _convert_vovnet

    sd = _synthetic_vovnet_sd()
    t = _Tree(sd)
    _convert_vovnet(t)
    assert not t.missing, t.missing[:8]
    assert not [k for k in sd if k not in t.used]

    model = VoVNet(compute_dtype=None)
    x = np.zeros((1, 64, 96, 3), np.float32)
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))["params"]

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = tuple(v.shape)
        return out

    got = flatten(t.params["backbone"])
    want = flatten(init)
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
