"""Res5ROIHeads — the C4 R-CNN variant (functional).

Equivalent of /root/reference/detectron2/modeling/roi_heads/build.py:198-356:
single-level ROI pooling on res4, a res5 bottleneck stage as the per-region
feature extractor, global average pool, then FastRCNNOutputLayers. Marked
[vestigial] for DensePose in SURVEY.md section 2.4 (no DensePose config uses
C4) but part of the framework surface; usable with
MODEL.BACKBONE.NAME=build_resnet_backbone + MODEL.ROI_HEADS.NAME=Res5ROIHeads.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..checkpoint.spec import Spec, conv_spec, linear_spec
from ..ops import linear, roi_align_single
from .roi_heads import _NEG
from ..ops import apply_deltas
from ..ops.nms import batched_nms_mask, nms_mask


def res5_spec(cfg, prefix: str = "roi_heads") -> Spec:
    spec: Spec = {}
    norm = cfg.MODEL.RESNETS.NORM
    num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
    width = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
    bottleneck = num_groups * width * 8
    out_channels = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * 8
    in_ch = out_channels // 2
    for i in range(3):
        b_in = in_ch if i == 0 else out_channels
        name = f"{prefix}.res5.{i}"
        conv_spec(spec, f"{name}.conv1", b_in, bottleneck, 1, bias=False, norm=norm)
        conv_spec(spec, f"{name}.conv2", bottleneck, bottleneck, 3, bias=False, norm=norm)
        conv_spec(spec, f"{name}.conv3", bottleneck, out_channels, 1, bias=False, norm=norm)
        if b_in != out_channels:
            conv_spec(spec, f"{name}.shortcut", b_in, out_channels, 1, bias=False, norm=norm)
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    nreg = 1 if cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG else num_classes
    linear_spec(spec, f"{prefix}.box_predictor.cls_score", out_channels, num_classes + 1)
    linear_spec(spec, f"{prefix}.box_predictor.bbox_pred", out_channels, nreg * 4)
    return spec


def res5_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Box path: pool res4 -> res5 stage -> avgpool -> predict -> NMS.
    Returns (boxes, scores, classes, valid) with D = DETECTIONS_PER_IMAGE."""
    from .resnet import _bottleneck

    in_feature = cfg.MODEL.ROI_HEADS.IN_FEATURES[0]
    res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    sampling = cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO
    aligned = cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE == "ROIAlignV2"
    stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
    topk = cfg.TEST.DETECTIONS_PER_IMAGE
    weights = tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS)

    x = roi_align_single(features[in_feature], proposals, 1.0 / 16,
                         (res, res), sampling, aligned)
    for i in range(3):
        stride = 2 if i == 0 else 1
        has_shortcut = i == 0
        x = _bottleneck(p, f"{prefix}.res5.{i}", x, stride, stride_in_1x1, 1,
                        has_shortcut)
    x = x.mean(axis=(-3, -2))  # global average pool

    scores_logits = linear(x, p[f"{prefix}.box_predictor.cls_score.weight"],
                           p[f"{prefix}.box_predictor.cls_score.bias"])
    deltas = linear(x, p[f"{prefix}.box_predictor.bbox_pred.weight"],
                    p[f"{prefix}.box_predictor.bbox_pred.bias"])
    probs = jax.nn.softmax(scores_logits.astype(jnp.float32), axis=-1)
    boxes = apply_deltas(deltas, proposals, weights)

    r = boxes.shape[0]
    nreg = boxes.shape[-1] // 4
    fg = probs[:, :-1]
    boxes = boxes.reshape(r, nreg, 4)
    if nreg == 1:
        boxes = jnp.broadcast_to(boxes, (r, num_classes, 4))
    flat_scores = fg.reshape(-1)
    flat_boxes = boxes.reshape(-1, 4)
    flat_cls = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (r,))
    flat_valid = jnp.repeat(proposal_valid, num_classes) & (flat_scores > score_thresh)
    if num_classes == 1:
        keep = nms_mask(flat_boxes, flat_scores, flat_valid, nms_thresh)
    else:
        keep = batched_nms_mask(flat_boxes, flat_scores, flat_cls, flat_valid, nms_thresh)
    sel = jnp.where(keep & flat_valid, flat_scores, _NEG)
    k_out = min(topk, sel.shape[0])
    out_scores, out_idx = jax.lax.top_k(sel, k_out)
    out_valid = out_scores > _NEG / 2
    return (flat_boxes[out_idx], jnp.where(out_valid, out_scores, 0.0),
            flat_cls[out_idx], out_valid)
