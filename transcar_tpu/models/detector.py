"""Top-level detector: 6-cam batch → backbone → FPN → TransCAR head.

Parity target: ``Detr3D`` (projects/mmdet3d_plugin/models/detectors/
detr3d.py): the [B, N, 3, H, W] → [B·N, 3, H, W] reshape around the backbone
(:39-66, NHWC here), on-device GridMask in train mode (:53-54), fp16-like
compute boundary (backbone bf16 → head fp32, the @auto_fp16/out_fp32 analog
:68-72).

Unlike the reference, radar featurization happens in the input pipeline and
arrives as a ``radar_tokens`` tensor — the model is a pure function.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.core.config import ModelConfig, TransCARConfig
from transcar_tpu.data.gridmask import grid_mask
from transcar_tpu.models.fpn import FPN
from transcar_tpu.models.head import TransCARHead
from transcar_tpu.models.resnet import ResNet
from transcar_tpu.models.vovnet import VoVNet


class TransCARDetector(nn.Module):
    cfg: ModelConfig
    dcn_impl: str = "exact"   # resolved by build_model (never "auto" here)
    dcn_band_rows: Optional[int] = None   # override (build_model auto-widen)
    dcn_rows_per_step: Optional[int] = None   # override (build_model passes
                                              # the configured value for
                                              # training and inference alike;
                                              # exactness is rows-independent)
    osa_reduce_impl: str = "xla"   # VoVNet OSA tail (resolved by
                                   # build_model; never "auto" here)
    stem_impl: str = "xla"         # stem formulation (resolved by
                                   # build_model; never "auto" here)
    block_impl: str = "xla"        # ResNet bottleneck formulation
                                   # (resolved by build_model)
    backbone_remat: bool = True    # rematerialize backbone blocks
                                   # (resolved by build_model: only when a
                                   # camera backward is actually built)
    backbone_quantize: str = "none"   # "int8" serving mode (resolved by
                                      # build_model; never set in training)

    def setup(self):
        bc = self.cfg.backbone
        if bc.kind in ("resnet101", "resnet50"):
            self.backbone = ResNet(
                depth=int(bc.kind[6:]), with_dcn=bc.with_dcn,
                remat=self.backbone_remat,
                compute_dtype=bc.compute_dtype, dcn_impl=self.dcn_impl,
                dcn_band_rows=self.dcn_band_rows or bc.dcn_band_rows,
                dcn_rows_per_step=(self.dcn_rows_per_step
                                   or bc.dcn_rows_per_step),
                dcn_variant=bc.dcn_variant,
                stem_impl=self.stem_impl,
                block_impl=self.block_impl,
                quantize=self.backbone_quantize,
                name="backbone")
        elif bc.kind == "vovnet99":
            self.backbone = VoVNet(
                compute_dtype=bc.compute_dtype,
                reduce_impl=self.osa_reduce_impl,
                remat=self.backbone_remat,
                stem_impl=self.stem_impl,
                quantize=self.backbone_quantize, name="backbone")
        else:
            raise ValueError(f"unknown backbone {bc.kind!r}")
        self.neck = FPN(
            in_channels=bc.fpn_in_channels,
            out_channels=bc.fpn_out_channels,
            start_level=bc.fpn_start_level,
            num_outs=bc.fpn_num_outs,
            add_extra_convs=bc.fpn_add_extra_convs,
            relu_before_extra_convs=bc.fpn_relu_before_extra_convs,
            name="neck")
        self.head = TransCARHead(self.cfg.head, name="head")

    def __call__(self, images: jnp.ndarray, lidar2img: jnp.ndarray,
                 radar_tokens: Optional[jnp.ndarray] = None,
                 train: bool = False, stop_camera_grad: bool = False):
        """Args:
          images: [B, N, H, W, 3] normalized images (fp32, NHWC).
          lidar2img: [B, N, 4, 4].
          radar_tokens: [B, T, 36] (required when head has radar fusion).
          stop_camera_grad: fusion-only training — no camera backward is
            built (the reference's requires_grad=False freeze semantics,
            tools/train.py:238-252; see models/head.py).
        Returns:
          head output dict (all_cls_scores / all_bbox_preds).
        """
        b, n, h, w, _ = images.shape
        x = images.reshape(b * n, h, w, 3)
        if self.cfg.use_grid_mask and train:
            x = grid_mask(x, self.make_rng("gridmask"))
        feats = self.backbone(x)
        feats = self.neck(feats)
        head_dt = jnp.dtype(self.cfg.backbone.head_input_dtype)
        mlvl = [
            f.reshape(b, n, *f.shape[1:]).astype(head_dt) for f in feats
        ]
        return self.head(mlvl, lidar2img, (h, w), radar_tokens,
                         deterministic=not train,
                         stop_camera_grad=stop_camera_grad)

    def aug_forward(self, images_augs: jnp.ndarray, lidar2img: jnp.ndarray,
                    radar_tokens: Optional[jnp.ndarray] = None):
        """Test-time augmentation: average backbone+neck features over the
        augmented copies, then run the head once (``aug_test_pts``,
        detr3d.py:195-209).

        images_augs: [A, B, N, H, W, 3] (A augmented views of the batch).
        """
        a, b, n, h, w, _ = images_augs.shape
        head_dt = jnp.dtype(self.cfg.backbone.head_input_dtype)
        feats_per_aug = None
        for ai in range(a):
            x = images_augs[ai].reshape(b * n, h, w, 3)
            feats = self.neck(self.backbone(x))
            feats = [f.reshape(b, n, *f.shape[1:]).astype(head_dt)
                     for f in feats]
            if feats_per_aug is None:
                feats_per_aug = feats
            else:
                feats_per_aug = [acc + f
                                 for acc, f in zip(feats_per_aug, feats)]
        mlvl = [f / a for f in feats_per_aug]
        return self.head(mlvl, lidar2img, (h, w), radar_tokens,
                         deterministic=True)


# widened band for full-backbone training (trainable conv_offset): exact
# |Δy| ≤ 10 px — double the typical trained-DCN offset tail — so the banded
# kernel's gradient dead zone (zero output AND zero gradient past the band,
# ops/pallas_dcn.py) sits far from where offsets ever train to
FULL_TRAIN_MIN_BAND = 24


def camera_branch_trains(cfg: TransCARConfig) -> bool:
    """True when DCN conv_offset params receive gradients: the TransCAR
    recipe freezes the whole camera net (tools/train.py:238-252), so only
    the camera-only full-training track (freeze_camera_branch=False or no
    fusion head) trains them."""
    return not (cfg.train.optim.freeze_camera_branch
                and cfg.model.head.with_radar_fusion)


def resolve_dcn_impl(cfg: TransCARConfig, training: bool = False) -> str:
    """Resolve BackboneConfig.dcn_impl="auto": the fused Pallas kernel
    (ops/pallas_dcn.py; custom-VJP backward, so it serves training too —
    full-backbone step 642 ms vs 36.6 s with XLA's scatter backward, and
    identical loss at matched inputs) on TPU; CPU meshes keep the exact
    XLA gather.  ``dcn_impl="exact"`` opts out.

    Full-backbone training (trainable conv_offset) keeps the kernel but
    :func:`resolve_dcn_band` auto-widens the band, because a tap past the
    band gets zero output AND zero gradient — an offset that drifted out
    could never be pulled back in.  Band-overflow telemetry
    (models/resnet.py DCNConv ``sow``) audits the margin at run time."""
    impl = cfg.model.backbone.dcn_impl
    if impl != "auto":
        return impl
    import jax

    del training  # the kernel differentiates; same resolution either way
    return "pallas" if jax.default_backend() == "tpu" else "exact"


def resolve_dcn_band(cfg: TransCARConfig, training: bool = False) -> int:
    """Band for the Pallas DCN kernel.  Frozen-camera (TransCAR recipe)
    configs use the configured band (default exact |Δy| ≤ 5 px);
    full-backbone-training configs auto-widen to ``FULL_TRAIN_MIN_BAND``
    (exact ≤ 10 px) so the trainable offset branch keeps gradients over
    the range offsets realistically reach (mmcv DCNv2 is exact for
    arbitrary offsets, detr3d_res101_gridmask.py:41-42).

    The widening keys on the CONFIG, not the ``training`` flag: the
    mid-training val hook (train/loop.py::run_val) and any later test of
    a full-train config must sample the same taps the training forward
    used — an eval at the narrow band would silently zero taps in the
    (5, 10] px range that trained offsets legitimately reach."""
    del training  # band must agree between a config's train and eval
    band = cfg.model.backbone.dcn_band_rows
    if camera_branch_trains(cfg) and any(cfg.model.backbone.with_dcn):
        band = max(band, FULL_TRAIN_MIN_BAND)
    return band


def build_model(cfg: TransCARConfig, training: bool = False):
    """Camera/fusion presets → TransCARDetector; ``lidar_encoder`` presets
    (objdgcnn_{pillar,voxel}) → ObjDGCNN.  ``training`` selects the
    autodiff-able DCN path (see :func:`resolve_dcn_impl`) and the
    full-training band widening (:func:`resolve_dcn_band`)."""
    m = cfg.model
    if m.lidar_encoder:
        from transcar_tpu.models.dgcnn import ObjDGCNN

        # banded Pallas encoder attention on TPU — inference AND
        # training (custom-VJP banded backward, ops/pallas_msdeform.py;
        # the XLA encoder backward OOMs at 59.7 GB and chunked
        # constructs fault the v5e worker).  CPU meshes keep the
        # autodiff-able XLA gather.  The band keys on the CONFIG, not
        # ``training`` — every ObjDGCNN preset trains the encoder, so
        # eval must sample the same taps the training forward used
        # (same invariant as :func:`resolve_dcn_band`).
        msd = "pallas" if jax.default_backend() == "tpu" else "xla"
        enc_band = m.encoder_band_rows
        if enc_band <= 0:
            enc_band = 24 if msd == "pallas" else 16
        else:
            # the kernel clips band starts to [0, H_v - band] per level —
            # a band wider than the SMALLEST level's rows makes that
            # upper bound negative (out-of-range slice); odd values break
            # the band/2 centering.  (On the xla path band is unused —
            # exact full gather — but a config invalid for the TPU kernel
            # should fail everywhere, not only when it reaches a chip.)
            h_min = m.bev_hw[0] >> (m.head.num_levels - 1)
            if enc_band % 2 or enc_band < 4 or enc_band > h_min:
                raise ValueError(
                    f"model.encoder_band_rows={enc_band} must be an even "
                    f"value in [4, {h_min}] (smallest encoder level's "
                    f"rows, bev_hw[0]={m.bev_hw[0]} over "
                    f"{m.head.num_levels} levels)")
        return ObjDGCNN(
            m.head, encoder=m.lidar_encoder, voxel_size=m.voxel_size,
            max_points=m.max_points_per_voxel, max_voxels=m.max_voxels,
            bev_hw=m.bev_hw, sparse_shape=m.sparse_shape,
            compute_dtype=m.lidar_compute_dtype,
            encoder_msdeform_impl=msd, encoder_band=enc_band,
            sparse_impl=m.sparse_impl)
    # rows_per_step (grid coarsening): the forward's per-row pipeline
    # and the Pallas backward center the band with the same per-row
    # formula, so the knob is exactness-neutral for training and
    # inference alike (ops/pallas_dcn.py)
    rows = m.backbone.dcn_rows_per_step
    on_tpu_infer = not training and jax.default_backend() == "tpu"
    osa = m.backbone.osa_reduce_impl
    if osa == "auto":
        # forward-only kernel: training keeps the autodiff-able XLA tail
        osa = "pallas" if on_tpu_infer else "xla"
    stem = m.backbone.stem_impl
    if stem == "auto":
        # phase stem stays opt-in: it wins in ISOLATION (VoVNet stem
        # 13.0 → 10.2 ms, scripts/bench_phase_stem.py) but LOSES at the
        # full-model level (9.01 vs 9.16 samples/s bs1; two independent
        # runs agree — docs/PERF_NOTES.md "context beats isolation").
        # The R101 7×7 phase form loses everywhere (9.4 → 13.5).
        stem = "xla"
    blk = m.backbone.block_impl
    if blk == "auto":
        # measured NEGATIVE on the flagship (8.05 → 7.48 samples/s): at
        # the VMEM-feasible r=8 chunking, halo recompute + the
        # overlapped pre-copy cost more than XLA's path saves.  The
        # kernel stays an explicit opt-in experiment.
        blk = "xla"
    # remat trades HBM for recompute on the BACKWARD — it has nothing to
    # buy at inference or under the frozen-camera recipe (stop_gradient:
    # no camera backward is ever built), while its checkpoint boundaries
    # block XLA layout propagation between blocks and insert pure
    # data-formatting copies (~20 ms/sample on the flagship, 16% of the
    # step — jax.profiler trace, docs/PERF_NOTES.md round-3 remat note).
    # "auto": rematerialize only when a camera backward actually exists.
    if m.backbone.remat == "auto":
        remat = training and camera_branch_trains(cfg)
    else:
        remat = m.backbone.remat == "on"
    # int8 is a serving-only accuracy-for-speed trade: training always
    # runs the fp path (quantization would change gradients AND the
    # round/clip ops have no useful derivative)
    quant = "none" if training else m.backbone.quantize
    return TransCARDetector(m, dcn_impl=resolve_dcn_impl(cfg, training),
                            dcn_band_rows=resolve_dcn_band(cfg, training),
                            dcn_rows_per_step=rows,
                            osa_reduce_impl=osa, stem_impl=stem,
                            block_impl=blk, backbone_remat=remat,
                            backbone_quantize=quant)
