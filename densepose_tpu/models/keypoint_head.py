"""Keypoint R-CNN head (functional).

Equivalent of KRCNNConvDeconvUpsampleHead + keypoint_rcnn_inference
(/root/reference/detectron2/modeling/roi_heads/keypoint_head.py) and
``heatmaps_to_keypoints`` (structures.py:34-104). Vestigial in every
DensePose config (KEYPOINT_ON=False) but part of the framework surface.

Device side produces fixed-size heatmaps; the per-ROI bicubic-resize argmax
extraction of ``heatmaps_to_keypoints`` is inherently per-box dynamic, so it
runs host-side (numpy) like the reference runs it outside the hot loop.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.spec import ParamSpec, Spec, conv_spec
from ..ops import conv2d, conv_transpose2d, resize_bilinear, roi_align_multilevel
from ..ops.roi_align import assign_boxes_to_levels


def keypoint_head_spec(cfg, prefix: str = "roi_heads.keypoint_head") -> Spec:
    spec: Spec = {}
    d = cfg.MODEL.FPN.OUT_CHANNELS
    dims = list(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS)
    nkp = cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS
    for i, c in enumerate(dims):
        conv_spec(spec, f"{prefix}.conv_fcn{i + 1}", d, c, 3, bias=True)
        d = c
    spec[f"{prefix}.score_lowres.weight"] = ParamSpec((d, nkp, 4, 4), "convT")
    spec[f"{prefix}.score_lowres.bias"] = ParamSpec((nkp,), "vec")
    return spec


def keypoint_head_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    cfg,
    strides: Dict[str, int],
    prefix: str = "roi_heads.keypoint_head",
) -> jnp.ndarray:
    """Returns keypoint heatmap logits (N, 4*res, 4*res, K)."""
    in_features: List[str] = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    res = cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION
    sampling = cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO
    aligned = cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_TYPE == "ROIAlignV2"
    dims = list(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS)

    feats = [features[f] for f in in_features]
    scales = [1.0 / strides[f] for f in in_features]
    min_lvl = int(-math.log2(scales[0]))
    max_lvl = int(-math.log2(scales[-1]))
    levels = assign_boxes_to_levels(boxes, min_lvl, max_lvl)
    x = roi_align_multilevel(feats, boxes, levels, scales, (res, res), sampling, aligned)

    for i in range(len(dims)):
        x = jax.nn.relu(conv2d(x, p[f"{prefix}.conv_fcn{i + 1}.weight"],
                               p[f"{prefix}.conv_fcn{i + 1}.bias"], padding=1))
    x = conv_transpose2d(x, p[f"{prefix}.score_lowres.weight"],
                         p[f"{prefix}.score_lowres.bias"], stride=2, padding=1,
                         kernel_size=4)
    h, w = x.shape[-3] * 2, x.shape[-2] * 2
    return resize_bilinear(x, (h, w), scale=(2.0, 2.0))


def _resize_bicubic_np(x: np.ndarray, out_hw) -> np.ndarray:
    """(H, W, C) -> (h, w, C): torch ``F.interpolate(mode="bicubic",
    align_corners=False)`` semantics — cubic convolution kernel with
    a = -0.75, half-pixel source mapping, replicate borders, no value
    clamping (bicubic may overshoot, exactly like torch)."""
    h_in, w_in = x.shape[:2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x.astype(np.float32)

    a = -0.75

    def weights(t):
        # t: distances of the 4 taps from the source point, shape (n, 4)
        t = np.abs(t)
        w1 = ((a + 2) * t - (a + 3)) * t * t + 1          # |t| <= 1
        w2 = ((a * t - 5 * a) * t + 8 * a) * t - 4 * a    # 1 < |t| < 2
        return np.where(t <= 1, w1, np.where(t < 2, w2, 0.0))

    def axis(in_size, out_size):
        ratio = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * ratio - 0.5
        base = np.floor(src).astype(np.int64)
        frac = src - base
        taps = base[:, None] + np.arange(-1, 3)[None, :]   # (out, 4)
        dist = frac[:, None] - np.arange(-1, 3)[None, :]
        return np.clip(taps, 0, in_size - 1), weights(dist).astype(np.float32)

    yi, yw = axis(h_in, h_out)
    xi, xw = axis(w_in, w_out)
    # tap-wise accumulation keeps peak memory at one (h_out, w_out, C) map
    # (a stacked-taps formulation spikes ~4x per axis on person-sized ROIs)
    rows = np.zeros((h_out, w_in) + x.shape[2:], dtype=np.float32)
    for tap in range(4):
        rows += x[yi[:, tap]] * yw[:, tap][:, None, None]
    out = np.zeros((h_out, w_out) + x.shape[2:], dtype=np.float32)
    for tap in range(4):
        out += rows[:, xi[:, tap]] * xw[:, tap][None, :, None]
    return out


def heatmaps_to_keypoints_np(maps: np.ndarray, rois: np.ndarray) -> np.ndarray:
    """Host-side keypoint extraction (structures.py:34-104 semantics incl.
    the per-ROI bicubic resize): maps (N, K, H, W) logits,
    rois (N, 4) -> (N, K, 4) of (x, y, logit, score)."""
    n, k = maps.shape[:2]
    out = np.zeros((n, k, 4), dtype=np.float32)
    for i in range(n):
        x0, y0, x1, y1 = rois[i]
        w = max(x1 - x0, 1.0)
        h = max(y1 - y0, 1.0)
        wc = int(np.ceil(w))
        hc = int(np.ceil(h))
        roi_map = _resize_bicubic_np(
            np.transpose(maps[i], (1, 2, 0)).astype(np.float32), (hc, wc))
        pooled = maps[i]
        for kp in range(k):
            m = roi_map[..., kp]
            pos = m.argmax()
            yy, xx = np.unravel_index(pos, m.shape)
            max_score = m.max()
            exp_full = np.exp(m - max_score)
            exp_pool = np.exp(pooled[kp] - max_score)
            score = exp_full[yy, xx] / exp_pool.sum()
            out[i, kp, 0] = (xx + 0.5) * (w / wc) + x0
            out[i, kp, 1] = (yy + 0.5) * (h / hc) + y0
            out[i, kp, 2] = m[yy, xx]
            out[i, kp, 3] = score
    return out
