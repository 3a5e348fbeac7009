"""Mask R-CNN mask head (functional).

Equivalent of MaskRCNNConvUpsampleHead + mask_rcnn_inference
(/root/reference/detectron2/modeling/roi_heads/mask_head.py:29-209). All
shipped DensePose configs set MASK_ON=False (the head is vestigial there —
SURVEY.md section 2.4), but the capability is part of the framework: enable
with MODEL.MASK_ON=True.

Layout: NUM_CONV 3x3 convs (+ReLU) -> 2x deconv (k2 s2) -> 1x1 predictor
(K or 1 channels). Inference applies sigmoid and selects the predicted
class's mask per detection.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..checkpoint.spec import ParamSpec, Spec, conv_spec
from ..ops import conv2d, conv_transpose2d, roi_align_multilevel
from ..ops.roi_align import assign_boxes_to_levels


def mask_head_spec(cfg, prefix: str = "roi_heads.mask_head") -> Spec:
    spec: Spec = {}
    in_ch = cfg.MODEL.FPN.OUT_CHANNELS
    conv_dim = cfg.MODEL.ROI_MASK_HEAD.CONV_DIM
    num_conv = cfg.MODEL.ROI_MASK_HEAD.NUM_CONV
    num_classes = 1 if cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK \
        else cfg.MODEL.ROI_HEADS.NUM_CLASSES
    d = in_ch
    for k in range(num_conv):
        conv_spec(spec, f"{prefix}.mask_fcn{k + 1}", d, conv_dim, 3, bias=True)
        d = conv_dim
    spec[f"{prefix}.deconv.weight"] = ParamSpec((d, conv_dim, 2, 2), "convT")
    spec[f"{prefix}.deconv.bias"] = ParamSpec((conv_dim,), "vec")
    conv_spec(spec, f"{prefix}.predictor", conv_dim, num_classes, 1, bias=True)
    return spec


def mask_head_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    pred_classes: jnp.ndarray,
    cfg,
    strides: Dict[str, int],
    prefix: str = "roi_heads.mask_head",
) -> jnp.ndarray:
    """Returns per-detection sigmoid mask probabilities (N, 2*res, 2*res)."""
    in_features: List[str] = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    res = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
    sampling = cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO
    aligned = cfg.MODEL.ROI_MASK_HEAD.POOLER_TYPE == "ROIAlignV2"
    num_conv = cfg.MODEL.ROI_MASK_HEAD.NUM_CONV

    feats = [features[f] for f in in_features]
    scales = [1.0 / strides[f] for f in in_features]
    min_lvl = int(-math.log2(scales[0]))
    max_lvl = int(-math.log2(scales[-1]))
    levels = assign_boxes_to_levels(boxes, min_lvl, max_lvl)
    x = roi_align_multilevel(feats, boxes, levels, scales, (res, res), sampling, aligned)

    for k in range(num_conv):
        x = jax.nn.relu(conv2d(x, p[f"{prefix}.mask_fcn{k + 1}.weight"],
                               p[f"{prefix}.mask_fcn{k + 1}.bias"], padding=1))
    x = jax.nn.relu(conv_transpose2d(x, p[f"{prefix}.deconv.weight"],
                                     p[f"{prefix}.deconv.bias"], stride=2, padding=0,
                                     kernel_size=2))
    logits = conv2d(x, p[f"{prefix}.predictor.weight"], p[f"{prefix}.predictor.bias"])
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    # select the predicted class channel per detection (mask_rcnn_inference)
    if probs.shape[-1] == 1:
        return probs[..., 0]
    idx = jnp.clip(pred_classes, 0, probs.shape[-1] - 1)
    return jnp.take_along_axis(probs, idx[:, None, None, None], axis=-1)[..., 0]
