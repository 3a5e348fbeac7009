"""ROI heads: box path + DensePose path, static shapes.

Rebuilds (citations into /root/reference):
* StandardROIHeads box path — detectron2/modeling/roi_heads/build.py:558-612
* FastRCNNConvFCHead (2 FC) — roi_heads/box_head.py:27-119
* FastRCNNOutputLayers + fast_rcnn_inference — roi_heads/fast_rcnn.py
* DensePoseROIHeads + Decoder — densepose/modeling/roi_heads/roi_head.py
* DensePoseV1ConvXHead — densepose/modeling/roi_heads/v1convx.py
* DensePoseDeepLabHead (ASPP) — densepose/modeling/roi_heads/deeplab.py
* DensePoseChartPredictor — densepose/modeling/predictors/chart.py
* ...WithConfidencePredictor — predictors/chart_with_confidence.py (the
  confidence deconv weights are *declared* so WC checkpoints load, but like
  the reference the forward computes only SIUV — confidences are dropped,
  chart_with_confidence.py:91-109)

Static-shape re-design: the box stage always processes the full
POST_NMS_TOPK proposal set, detections are a fixed TEST.DETECTIONS_PER_IMAGE
slots + ``num_valid``; the DensePose stage runs on all detection slots (a
bucketed two-stage dispatch in predictor.py trims that for speed).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..checkpoint.spec import (
    Spec, conv_spec, conv_transpose_spec, gn_spec, linear_spec,
)
from ..ops import (
    apply_deltas, conv2d, conv_transpose2d, group_norm, linear,
    resize_bilinear, roi_align_multilevel, roi_align_single,
)
from ..ops.nms import nms_mask
from ..ops.roi_align import assign_boxes_to_levels

_NEG = -1e30


def feature_strides(cfg) -> Dict[str, int]:
    """Feature-name -> stride map from the configured backbone (FPN: p2..p6
    strides 4..64; HRFPN: p1..p5 strides 4..64)."""
    from .backbones import backbone_fns
    return backbone_fns(cfg)[2](cfg)


# ---------------------------------------------------------------------------
# specs
# ---------------------------------------------------------------------------

def _backbone_out_channels(cfg) -> int:
    name = cfg.MODEL.BACKBONE.NAME
    if name == "build_hrfpn_backbone":
        return cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS
    if name == "build_resnet_backbone":
        # C4: channels of the single in_feature (e.g. res4 -> 1024 for R50)
        feat = cfg.MODEL.RPN.IN_FEATURES[0]
        stage = int(feat[3:])
        if cfg.MODEL.RESNETS.DEPTH >= 50:
            return cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * (2 ** (stage - 2))
        return 64 * (2 ** (stage - 2))
    return cfg.MODEL.FPN.OUT_CHANNELS


def box_head_spec(cfg, prefix: str = "roi_heads") -> Spec:
    spec: Spec = {}
    in_ch = _backbone_out_channels(cfg)
    res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    num_fc = cfg.MODEL.ROI_BOX_HEAD.NUM_FC
    fc_dim = cfg.MODEL.ROI_BOX_HEAD.FC_DIM
    num_conv = cfg.MODEL.ROI_BOX_HEAD.NUM_CONV
    conv_dim = cfg.MODEL.ROI_BOX_HEAD.CONV_DIM
    d = in_ch
    for k in range(num_conv):
        conv_spec(spec, f"{prefix}.box_head.conv{k + 1}", d, conv_dim, 3, bias=True)
        d = conv_dim
    flat = d * res * res
    for k in range(num_fc):
        linear_spec(spec, f"{prefix}.box_head.fc{k + 1}", flat if k == 0 else fc_dim, fc_dim)
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    cls_agnostic = cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG
    nreg = 1 if cls_agnostic else num_classes
    linear_spec(spec, f"{prefix}.box_predictor.cls_score", fc_dim, num_classes + 1)
    linear_spec(spec, f"{prefix}.box_predictor.bbox_pred", fc_dim, nreg * 4)
    return spec


def decoder_spec(cfg, prefix: str = "roi_heads.decoder") -> Spec:
    """Panoptic-FPN style decoder (densepose roi_head.py:22-79). Module names
    follow the reference's add_module(in_feature) registration: p2.0, p3.0,
    p4.{0,2}, p5.{0,2,4} + predictor."""
    spec: Spec = {}
    in_features = cfg.MODEL.ROI_HEADS.IN_FEATURES
    conv_dims = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS
    num_classes = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES
    common_stride = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_COMMON_STRIDE
    norm = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NORM
    in_ch = _backbone_out_channels(cfg)
    strides = feature_strides(cfg)
    for f in in_features:
        stride = strides[f]
        length = max(1, int(math.log2(stride) - math.log2(common_stride)))
        has_up = stride != common_stride
        for k in range(length):
            idx = k * 2 if has_up else k
            conv_spec(spec, f"{prefix}.{f}.{idx}", in_ch if k == 0 else conv_dims,
                      conv_dims, 3, bias=not norm, norm=norm)
    conv_spec(spec, f"{prefix}.predictor", conv_dims, num_classes, 1, bias=True)
    return spec


def densepose_head_spec(cfg, prefix: str = "roi_heads.densepose_head") -> Spec:
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME
    hidden = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM
    ksize = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL
    n_convs = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
    in_ch = (cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES
             if cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_ON
             else _backbone_out_channels(cfg))
    spec: Spec = {}
    if name == "DensePoseV1ConvXHead":
        d = in_ch
        for i in range(n_convs):
            conv_spec(spec, f"{prefix}.body_conv_fcn{i + 1}", d, hidden, ksize, bias=True)
            d = hidden
    elif name == "DensePoseDeepLabHead":
        norm = cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NORM
        assert not cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NONLOCAL_ON, \
            "NonLocal block is off in every shipped config (NONLOCAL_ON=0)"
        out = in_ch  # ASPP out_channels = n_channels = input_channels (deeplab.py:33)
        # ASPP branch 0: 1x1 conv + GN
        conv_spec(spec, f"{prefix}.ASPP.convs.0.0", in_ch, out, 1, bias=False)
        gn_spec(spec, f"{prefix}.ASPP.convs.0.1", out)
        # branches 1..3: dilated 3x3 + GN
        for i in range(1, 4):
            conv_spec(spec, f"{prefix}.ASPP.convs.{i}.0", in_ch, out, 3, bias=False)
            gn_spec(spec, f"{prefix}.ASPP.convs.{i}.1", out)
        # branch 4: global pool + 1x1 conv + GN (indices 1, 2 in the Sequential)
        conv_spec(spec, f"{prefix}.ASPP.convs.4.1", in_ch, out, 1, bias=False)
        gn_spec(spec, f"{prefix}.ASPP.convs.4.2", out)
        # projection
        conv_spec(spec, f"{prefix}.ASPP.project.0", 5 * out, out, 1, bias=False)
        d = out
        for i in range(n_convs):
            conv_spec(spec, f"{prefix}.body_conv_fcn{i + 1}", d, hidden, ksize,
                      bias=not norm, norm=norm)
            d = hidden
    else:
        raise ValueError(f"Unknown densepose head: {name}")
    return spec


def densepose_predictor_spec(cfg, prefix: str = "roi_heads.densepose_predictor") -> Spec:
    if cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME == "DensePoseEmbeddingPredictor":
        from .cse import embedding_predictor_spec
        return embedding_predictor_spec(cfg, prefix)
    dim_in = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM
    n_segm = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_COARSE_SEGM_CHANNELS
    patches = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_PATCHES + 1
    k = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL
    spec: Spec = {}
    conv_transpose_spec(spec, f"{prefix}.ann_index_lowres", dim_in, n_segm, k)
    conv_transpose_spec(spec, f"{prefix}.index_uv_lowres", dim_in, patches, k)
    conv_transpose_spec(spec, f"{prefix}.u_lowres", dim_in, patches, k)
    conv_transpose_spec(spec, f"{prefix}.v_lowres", dim_in, patches, k)
    pred_name = cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME
    if pred_name == "DensePoseChartWithConfidencePredictor":
        # confidence deconvs exist so WC checkpoints load; outputs dropped
        # (chart_with_confidence.py:50-109)
        if cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED:
            conv_transpose_spec(spec, f"{prefix}.sigma_2_lowres", dim_in, patches, k)
            if cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE == "indep_aniso":
                conv_transpose_spec(spec, f"{prefix}.kappa_u_lowres", dim_in, patches, k)
                conv_transpose_spec(spec, f"{prefix}.kappa_v_lowres", dim_in, patches, k)
        if cfg.MODEL.ROI_DENSEPOSE_HEAD.SEGM_CONFIDENCE.ENABLED:
            conv_transpose_spec(spec, f"{prefix}.fine_segm_confidence_lowres", dim_in, 1, k)
            conv_transpose_spec(spec, f"{prefix}.coarse_segm_confidence_lowres", dim_in, 1, k)
    return spec


def roi_heads_spec(cfg, prefix: str = "roi_heads") -> Spec:
    spec = box_head_spec(cfg, prefix)
    if cfg.MODEL.DENSEPOSE_ON:
        if cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_ON:
            spec.update(decoder_spec(cfg, f"{prefix}.decoder"))
        spec.update(densepose_head_spec(cfg, f"{prefix}.densepose_head"))
        spec.update(densepose_predictor_spec(cfg, f"{prefix}.densepose_predictor"))
        if cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS:
            from .cse import embedder_spec
            spec.update(embedder_spec(cfg, f"{prefix}.embedder"))
    return spec


# ---------------------------------------------------------------------------
# box path
# ---------------------------------------------------------------------------

def box_stage_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Box head + fast_rcnn inference.

    Returns (boxes (D,4) f32, scores (D,), classes (D,) int32, valid (D,))
    with D = TEST.DETECTIONS_PER_IMAGE, score-descending.
    """
    in_features: List[str] = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    sampling = cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO
    aligned = cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE == "ROIAlignV2"
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    cls_agnostic = cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG
    score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
    topk = cfg.TEST.DETECTIONS_PER_IMAGE
    weights = tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS)

    strides = feature_strides(cfg)
    feats = [features[f] for f in in_features]
    scales = [1.0 / strides[f] for f in in_features]
    min_lvl = int(-math.log2(scales[0]))
    max_lvl = int(-math.log2(scales[-1]))
    levels = assign_boxes_to_levels(proposals, min_lvl, max_lvl)
    pooled = roi_align_multilevel(feats, proposals, levels, scales,
                                  (res, res), sampling, aligned)  # (R, res, res, C)

    r = pooled.shape[0]
    # NHWC -> NCHW flatten order to match torch's Flatten over (C, H, W)
    x = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(r, -1)
    num_fc = cfg.MODEL.ROI_BOX_HEAD.NUM_FC
    for k in range(num_fc):
        x = jax.nn.relu(linear(x, p[f"{prefix}.box_head.fc{k + 1}.weight"],
                               p[f"{prefix}.box_head.fc{k + 1}.bias"]))
    scores_logits = linear(x, p[f"{prefix}.box_predictor.cls_score.weight"],
                           p[f"{prefix}.box_predictor.cls_score.bias"])
    deltas = linear(x, p[f"{prefix}.box_predictor.bbox_pred.weight"],
                    p[f"{prefix}.box_predictor.bbox_pred.bias"])

    probs = jax.nn.softmax(scores_logits.astype(jnp.float32), axis=-1)
    boxes = apply_deltas(deltas, proposals, weights)  # (R, nreg*4) fp32

    # fast_rcnn_inference_single_image (fast_rcnn.py:86-141).
    # NOTE: the reference's clip_boxes result there is discarded (line
    # "clip_boxes(boxes, image_shape)" has no assignment), so detection boxes
    # are NOT clipped at this stage — mirrored here by not clipping.
    fg_scores = probs[:, :-1]                              # (R, K)
    nreg = 1 if cls_agnostic else num_classes
    boxes = boxes.reshape(r, nreg, 4)
    if nreg == 1:
        boxes = jnp.broadcast_to(boxes, (r, num_classes, 4))

    finite = jnp.isfinite(boxes).all(axis=(1, 2)) & jnp.isfinite(probs).all(axis=1)
    valid = proposal_valid & finite

    flat_scores = fg_scores.reshape(-1)                    # (R*K,)
    flat_boxes = boxes.reshape(-1, 4)
    flat_cls = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (r,))
    flat_valid = jnp.repeat(valid, num_classes) & (flat_scores > score_thresh)

    if num_classes == 1:
        keep = nms_mask(flat_boxes, flat_scores, flat_valid, nms_thresh)
    else:
        from ..ops.nms import batched_nms_mask
        keep = batched_nms_mask(flat_boxes, flat_scores, flat_cls, flat_valid, nms_thresh)

    sel_scores = jnp.where(keep & flat_valid, flat_scores, _NEG)
    k_out = min(topk, sel_scores.shape[0])
    out_scores, out_idx = jax.lax.top_k(sel_scores, k_out)
    out_boxes = flat_boxes[out_idx]
    out_cls = flat_cls[out_idx]
    out_valid = out_scores > _NEG / 2
    if k_out < topk:
        padn = topk - k_out
        out_boxes = jnp.concatenate([out_boxes, jnp.zeros((padn, 4), jnp.float32)])
        out_scores = jnp.concatenate([out_scores, jnp.full((padn,), _NEG, jnp.float32)])
        out_cls = jnp.concatenate([out_cls, jnp.zeros((padn,), jnp.int32)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((padn,), bool)])
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return out_boxes, out_scores, out_cls, out_valid


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decoder_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    cfg,
    prefix: str = "roi_heads.decoder",
) -> jnp.ndarray:
    """Sum of per-level conv(+2x bilinear upsample) chains at common stride,
    then a 1x1 predictor (densepose roi_head.py:71-79)."""
    in_features: List[str] = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    common_stride = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_COMMON_STRIDE
    strides = feature_strides(cfg)
    from ..ops.roi_align import _on_tpu
    # TPU: shift-add scale-2 upsample (measured -0.6 ms/frame end to end;
    # fp32-accumulated — differs from the lerp resize only at reassociation
    # level), and the per-chain FINAL upsamples merge into one shared
    # upsample of the half-resolution sum (upsampling is linear:
    # up(x)+up(y) == up(x+y) up to fp reassociation) — two fewer
    # common-stride-sized HBM round trips. CPU keeps the reference's
    # per-chain formulation, the torch-twin-exact form.
    import os
    on_tpu = _on_tpu()
    share_up = on_tpu and not os.environ.get("DENSEPOSE_TPU_DECODER_PERCHAIN_UP")
    acc = None       # at common stride
    acc_half = None  # at 2x common stride, one shared upsample pending

    def up2x(x):
        if on_tpu:
            from ..ops.resize import upsample2x_bilinear
            return upsample2x_bilinear(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        return resize_bilinear(x, (h, w), scale=(2.0, 2.0))

    for f in in_features:
        stride = strides[f]
        length = max(1, int(math.log2(stride) - math.log2(common_stride)))
        has_up = stride != common_stride
        x = features[f]
        for k in range(length):
            idx = k * 2 if has_up else k
            x = jax.nn.relu(conv2d(x, p[f"{prefix}.{f}.{idx}.weight"],
                                   p.get(f"{prefix}.{f}.{idx}.bias"), padding=1))
            if has_up and not (share_up and k == length - 1):
                x = up2x(x)
        if has_up and share_up:
            acc_half = x if acc_half is None else acc_half + x
        else:
            acc = x if acc is None else acc + x
    if acc_half is not None:
        x = up2x(acc_half)
        acc = x if acc is None else acc + x
    return conv2d(acc, p[f"{prefix}.predictor.weight"], p[f"{prefix}.predictor.bias"])


# ---------------------------------------------------------------------------
# densepose heads
# ---------------------------------------------------------------------------

def _int8_calibrated(p: Dict, prefix: str) -> bool:
    """Static int8 scales present? (predictor.calibrate_int8 adds them)."""
    return f"{prefix}.body_conv_fcn1.qweight" in p


def _stacked_int8_chain(p: Dict, x: jnp.ndarray, cfg, prefix: str,
                        norm: str = "") -> jnp.ndarray:
    """The stacked convs as a statically-calibrated s8 chain
    (ops/conv.py::conv2d_int8_chain): activations stay s8/s32 between
    layers, one requant multiply per layer, no dynamic scale reductions.
    With GN (DeepLab) each link dequantizes for the norm and requantizes
    with the next layer's static scale; the GN link materializes the
    dequantized tensor at the chain's compute dtype and uses one-pass GN
    statistics so both stat reductions fuse into the conv epilogue
    (ops/norms.py::group_norm_onepass — the two-pass form costs an extra
    full-tensor pass per layer, measured ~0.22 ms/layer at 100 slots)."""
    from ..ops.conv import conv2d_int8_chain, quant_act_s8
    from ..ops.norms import group_norm_onepass
    n = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
    pad = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL // 2
    dtype = x.dtype
    names = [f"{prefix}.body_conv_fcn{i + 1}" for i in range(n)]
    scales = [p[f"{nm}.in_scale"] for nm in names]

    q = quant_act_s8(x, scales[0])
    for i, nm in enumerate(names):
        last = i == n - 1
        if norm == "GN":
            y = conv2d_int8_chain(q, scales[i], p[f"{nm}.qweight"],
                                  p[f"{nm}.wscale"], p.get(f"{nm}.bias"),
                                  padding=pad, out_scale=None, relu=False,
                                  out_dtype=dtype)
            y = group_norm_onepass(y, p[f"{nm}.norm.weight"],
                                   p[f"{nm}.norm.bias"], 32)
            y = jax.nn.relu(y)
            if last:
                return y.astype(dtype)
            q = quant_act_s8(y, scales[i + 1])
        else:
            out = conv2d_int8_chain(q, scales[i], p[f"{nm}.qweight"],
                                    p[f"{nm}.wscale"], p.get(f"{nm}.bias"),
                                    padding=pad,
                                    out_scale=None if last else scales[i + 1])
            if last:
                return out.astype(dtype)
            q = out
    raise AssertionError("unreachable")


def _v1convx_forward(p: Dict, x: jnp.ndarray, cfg, prefix: str) -> jnp.ndarray:
    n = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
    pad = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL // 2
    if getattr(cfg.TPU, "INT8_HEAD", False):
        # quantized serving mode: the stacked convs are ~80% of the
        # per-detection FLOPs; s8 runs at 2x the bf16 MXU rate. With
        # calibrated static scales the whole chain stays in the integer
        # domain; before calibration, per-layer dynamic quantization.
        if _int8_calibrated(p, prefix):
            return _stacked_int8_chain(p, x, cfg, prefix)
        from ..ops.conv import conv2d_int8
        for i in range(n):
            x = jax.nn.relu(conv2d_int8(
                x, p[f"{prefix}.body_conv_fcn{i + 1}.weight"],
                p[f"{prefix}.body_conv_fcn{i + 1}.bias"], padding=pad))
        return x
    for i in range(n):
        x = jax.nn.relu(conv2d(x, p[f"{prefix}.body_conv_fcn{i + 1}.weight"],
                               p[f"{prefix}.body_conv_fcn{i + 1}.bias"], padding=pad))
    return x


def _aspp_branch(p: Dict, x, prefix: str, conv_idx: int, gn_idx: int,
                 padding: int = 0, dilation: int = 1):
    w = p[f"{prefix}.{conv_idx}.weight"]
    if (dilation > 1 and padding == dilation and w.shape[0] == 3
            and w.shape[1] == 3
            and dilation >= x.shape[-3] and dilation >= x.shape[-2]):
        # A 3x3 conv whose dilation >= both ROI dims only ever samples its
        # CENTER tap in-bounds (the rate-56 ASPP branch, reference
        # deeplab.py:34, on 28x28 pooled ROIs: the +-56 taps always land in
        # zero padding). The center-tap 1x1 conv computes the same result
        # (off-center taps contribute exact zeros) at 1/9 the FLOPs and
        # without the 140x140 padded domain. Shape-static decision.
        y = conv2d(x, w[1:2, 1:2])
    else:
        y = conv2d(x, w, padding=padding, dilation=dilation)
    y = group_norm(y, p[f"{prefix}.{gn_idx}.weight"], p[f"{prefix}.{gn_idx}.bias"], 32)
    return jax.nn.relu(y)


def _deeplab_aspp(p: Dict, x: jnp.ndarray, cfg, prefix: str) -> jnp.ndarray:
    """ASPP (rates 6, 12, 56 — deeplab.py:34) through its 1x1 projection."""
    a = f"{prefix}.ASPP.convs"
    branches = [
        _aspp_branch(p, x, f"{a}.0", 0, 1),
        _aspp_branch(p, x, f"{a}.1", 0, 1, padding=6, dilation=6),
        _aspp_branch(p, x, f"{a}.2", 0, 1, padding=12, dilation=12),
        _aspp_branch(p, x, f"{a}.3", 0, 1, padding=56, dilation=56),
    ]
    # pooling branch: global avg pool -> 1x1 conv -> GN -> ReLU -> upsample
    g = x.mean(axis=(-3, -2), keepdims=True)
    g = conv2d(g, p[f"{a}.4.1.weight"])
    g = group_norm(g, p[f"{a}.4.2.weight"], p[f"{a}.4.2.bias"], 32)
    g = jax.nn.relu(g)
    g = jnp.broadcast_to(g, branches[0].shape)  # bilinear resize of 1x1 == broadcast
    branches.append(g)

    y = jnp.concatenate(branches, axis=-1)
    return jax.nn.relu(conv2d(y, p[f"{prefix}.ASPP.project.0.weight"]))


def _deeplab_forward(p: Dict, x: jnp.ndarray, cfg, prefix: str) -> jnp.ndarray:
    """ASPP + stacked GN convs."""
    n = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
    pad = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL // 2
    norm = cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NORM

    y = _deeplab_aspp(p, x, cfg, prefix)

    if getattr(cfg.TPU, "INT8_HEAD", False):
        if _int8_calibrated(p, prefix):
            return _stacked_int8_chain(p, y, cfg, prefix, norm=norm)
        from ..ops.conv import conv2d_int8 as _conv
    else:
        _conv = conv2d
    for i in range(n):
        name = f"{prefix}.body_conv_fcn{i + 1}"
        y = _conv(y, p[f"{name}.weight"], p.get(f"{name}.bias"), padding=pad)
        if norm == "GN":
            y = group_norm(y, p[f"{name}.norm.weight"], p[f"{name}.norm.bias"], 32)
        y = jax.nn.relu(y)
    return y


def densepose_head_forward(p: Dict, x: jnp.ndarray, cfg,
                           prefix: str = "roi_heads.densepose_head") -> jnp.ndarray:
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME
    if name == "DensePoseV1ConvXHead":
        return _v1convx_forward(p, x, cfg, prefix)
    if name == "DensePoseDeepLabHead":
        return _deeplab_forward(p, x, cfg, prefix)
    raise ValueError(name)


def densepose_predictor_forward(
    p: Dict,
    x: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads.densepose_predictor",
) -> Dict[str, jnp.ndarray]:
    """4 deconv heads + 2x bilinear upsample -> SIUV maps (chart.py:76-90),
    NHWC: (N, Hout, Wout, C). CSE configs dispatch to the embedding
    predictor (models/cse.py)."""
    if cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME == "DensePoseEmbeddingPredictor":
        from .cse import embedding_predictor_forward
        return embedding_predictor_forward(p, x, cfg, prefix)
    k = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL
    up = float(cfg.MODEL.ROI_DENSEPOSE_HEAD.UP_SCALE)
    pad = int(k / 2 - 1)

    # TPU.INT8_PREDICTOR: the four chart deconvs as one calibrated s8
    # matmul pass (confidence heads, if emitted, stay fp on the same x)
    int8p = (getattr(cfg.TPU, "INT8_PREDICTOR", False)
             and f"{prefix}.in_scale" in p
             and f"{prefix}.ann_index_lowres.qweight" in p)
    if int8p:
        from ..ops.conv import conv_transpose2d_int8_chain, quant_act_s8
        s_in = p[f"{prefix}.in_scale"]
        qx = quant_act_s8(x, s_in)

    def head(name):
        if int8p and f"{prefix}.{name}.qweight" in p:
            y = conv_transpose2d_int8_chain(
                qx, s_in, p[f"{prefix}.{name}.qweight"],
                p[f"{prefix}.{name}.wscale"], p[f"{prefix}.{name}.bias"],
                stride=2, padding=pad, kernel_size=k).astype(x.dtype)
        else:
            y = conv_transpose2d(x, p[f"{prefix}.{name}.weight"],
                                 p[f"{prefix}.{name}.bias"],
                                 stride=2, padding=pad, kernel_size=k)
        h, w = int(y.shape[-3] * up), int(y.shape[-2] * up)
        return resize_bilinear(y, (h, w), scale=(up, up))

    def heads_merged(names):
        """The parallel deconv heads share the same input, kernel geometry
        and upsample, so run them as ONE conv_transpose with the output
        channels concatenated (2+25+25+25 -> 77, one padded-to-128 MXU pass
        instead of four tiny-N passes) + one bilinear resize, then split.
        Channelwise-independent: the deconv is bitwise identical per channel
        to the separate heads; the up==2.0 branch swaps resize_bilinear
        (lerp in compute dtype) for upsample2x_bilinear (fp32 accumulation),
        which for bf16 inputs matches the separate heads only up to
        fp32-accumulated upsample rounding (~2e-4 abs on logits)."""
        b_cat = jnp.concatenate([p[f"{prefix}.{n}.bias"] for n in names], axis=-1)
        # (A polyphase-decomposed variant of this deconv measured SLOWER —
        # 2.85 vs 2.33 ms — the interleave relayouts cost more than the
        # dilated lowering; ops/conv.py::conv_transpose2d_polyphase kept
        # for reference.)
        if int8p and all(f"{prefix}.{n}.qweight" in p for n in names):
            qw_cat = jnp.concatenate(
                [p[f"{prefix}.{n}.qweight"] for n in names], axis=-1)
            ws_cat = jnp.concatenate(
                [p[f"{prefix}.{n}.wscale"] for n in names], axis=-1)
            y = conv_transpose2d_int8_chain(
                qx, s_in, qw_cat, ws_cat, b_cat,
                stride=2, padding=pad, kernel_size=k).astype(x.dtype)
        else:
            w_cat = jnp.concatenate(
                [p[f"{prefix}.{n}.weight"] for n in names], axis=-1)
            y = conv_transpose2d(x, w_cat, b_cat, stride=2, padding=pad,
                                 kernel_size=k)
        if up == 2.0:
            # Slice the four heads out at the deconv's 56^2 resolution and
            # shift-add-upsample each separately: bitwise identical per
            # channel to upsample-then-slice (the upsample is channelwise),
            # but the slices read/write 4x less HBM — measured -2.9 ms/frame
            # worst case (27.6 vs 25.6 fps end to end).
            from ..ops.resize import upsample2x_bilinear
            outs, s = [], 0
            for n in names:
                c = p[f"{prefix}.{n}.bias"].shape[0]
                outs.append(upsample2x_bilinear(y[..., s:s + c]))
                s += c
            return outs
        h, w = int(y.shape[-3] * up), int(y.shape[-2] * up)
        y = resize_bilinear(y, (h, w), scale=(up, up))
        outs, s = [], 0
        for n in names:
            c = p[f"{prefix}.{n}.bias"].shape[0]
            outs.append(y[..., s:s + c])
            s += c
        return outs

    from ..ops.roi_align import _on_tpu
    if _on_tpu():
        # TPU-only routing: the concatenated conv_transpose aborts the
        # XLA:CPU backend under a GSPMD mesh compile (observed crash in
        # backend_compile); CPU keeps the four separate heads.
        cs, fs, uu, vv = heads_merged(
            ["ann_index_lowres", "index_uv_lowres", "u_lowres", "v_lowres"])
    else:
        cs, fs, uu, vv = (head("ann_index_lowres"), head("index_uv_lowres"),
                          head("u_lowres"), head("v_lowres"))
    out = {
        "coarse_segm": cs,
        "fine_segm": fs,
        "u": uu,
        "v": vv,
    }
    # Beyond-reference opt-in: the reference *loads* the WC confidence deconv
    # weights but never runs them (chart_with_confidence.py:91-109, README:9
    # "no confidence estimation"). TPU.EMIT_CONFIDENCES=True runs them and
    # emits the raw upsampled maps (interpretation — e.g. softplus + eps as
    # in upstream detectron2 losses — is left to the consumer).
    if (getattr(cfg.TPU, "EMIT_CONFIDENCES", False)
            and cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME
            == "DensePoseChartWithConfidencePredictor"):
        if cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED:
            out["sigma_2"] = head("sigma_2_lowres")
            if cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE == "indep_aniso":
                out["kappa_u"] = head("kappa_u_lowres")
                out["kappa_v"] = head("kappa_v_lowres")
        if cfg.MODEL.ROI_DENSEPOSE_HEAD.SEGM_CONFIDENCE.ENABLED:
            out["fine_segm_confidence"] = head("fine_segm_confidence_lowres")
            out["coarse_segm_confidence"] = head("coarse_segm_confidence_lowres")
    return out


def _densepose_pooled(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads",
) -> jnp.ndarray:
    """Decoder (optional) -> ROIAlign on the given boxes: the head's input."""
    in_features: List[str] = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    res = cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION
    sampling = cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO
    aligned = cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_TYPE == "ROIAlignV2"
    use_decoder = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_ON
    strides = feature_strides(cfg)

    if use_decoder:
        sem = decoder_forward(p, features, cfg, f"{prefix}.decoder")
        scale = 1.0 / strides[in_features[0]]
        return roi_align_single(sem, boxes, scale, (res, res), sampling, aligned)
    feats = [features[f] for f in in_features]
    scales = [1.0 / strides[f] for f in in_features]
    min_lvl = int(-math.log2(scales[0]))
    max_lvl = int(-math.log2(scales[-1]))
    levels = assign_boxes_to_levels(boxes, min_lvl, max_lvl)
    return roi_align_multilevel(feats, boxes, levels, scales,
                                (res, res), sampling, aligned)


def densepose_stage_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads",
) -> Dict[str, jnp.ndarray]:
    """Decoder (optional) -> ROIAlign -> head -> predictor, on given boxes
    (densepose roi_head.py:126-158)."""
    pooled = _densepose_pooled(p, features, boxes, cfg, prefix)
    head_out = densepose_head_forward(p, pooled, cfg, f"{prefix}.densepose_head")
    return densepose_predictor_forward(p, head_out, cfg, f"{prefix}.densepose_predictor")


def densepose_stacked_calibration(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads",
    stat: str = "max",
) -> jnp.ndarray:
    """fp walk of decoder -> pooler -> stacked head convs, returning the
    per-layer INPUT statistic (n_stacked,) — ``stat="max"`` (max-abs, the
    data that sets the static int8 activation scales in
    predictor.calibrate_int8) or ``stat="sat"`` (fraction outside the
    installed clip range; predictor.saturation_report)."""
    from ..ops.conv import act_stat
    hp = f"{prefix}.densepose_head"
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME
    n = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
    pad = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL // 2
    x = _densepose_pooled(p, features, boxes, cfg, prefix)
    norm = ""
    if name == "DensePoseDeepLabHead":
        norm = cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NORM
        # ASPP stays fp in int8 mode; chain input is its projection output
        x = _deeplab_aspp(p, x, cfg, hp)
    stats = []
    for i in range(n):
        nm = f"{hp}.body_conv_fcn{i + 1}"
        stats.append(act_stat(x, stat, p, f"{nm}.in_scale"))
        x = conv2d(x, p[f"{nm}.weight"], p.get(f"{nm}.bias"), padding=pad)
        if norm == "GN":
            x = group_norm(x, p[f"{nm}.norm.weight"], p[f"{nm}.norm.bias"], 32)
        x = jax.nn.relu(x)
    if getattr(cfg.TPU, "INT8_PREDICTOR", False):
        # one extra slot: the head OUTPUT stat = the chart predictor's
        # deconv input site (calibrate_int8 consumes the max)
        stats.append(act_stat(x, stat, p,
                              f"{prefix}.densepose_predictor.in_scale"))
    return jnp.stack(stats)


def roi_heads_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads",
):
    """Full ROI-heads pass: box stage then DensePose on the detections."""
    boxes, scores, classes, valid = box_stage_forward(
        p, features, proposals, proposal_valid, cfg, prefix)
    out = {
        "pred_boxes": boxes,
        "scores": scores,
        "pred_classes": classes,
        "valid": valid,
    }
    if cfg.MODEL.DENSEPOSE_ON:
        dp = densepose_stage_forward(p, features, boxes, cfg, prefix)
        for k, v in dp.items():
            out[f"pred_densepose_{k}"] = v
    return out
