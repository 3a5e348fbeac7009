"""RPN with static shapes.

Rebuild of /root/reference/detectron2/modeling/proposal_generator/{rpn.py,
proposal_utils.py}. The reference's data-dependent filtering (boolean masks,
``keep`` index vectors) becomes fixed-size top-k + validity masks:

* per level: top-k (k = min(H*W*A, PRE_NMS_TOPK_TEST)) on objectness, decode
  only those k boxes (equivalent to the reference's decode-all-then-gather,
  rpn.py:343-392, but cheaper),
* clip with the reference's swapped (W, H) tuple (rpn.py:320 +
  structures.py:107 — kept bit-for-bit, see ops/boxes.py),
* per-level NMS exactly as the reference's level-id batched NMS
  (proposal_utils.py:126): levels are padded to a common K and vmapped,
* global top POST_NMS_TOPK_TEST by score -> (K, 4) proposals + valid mask.

Anchors are host-generated numpy constants (ops/anchors.py) since every
compile has static feature sizes.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..checkpoint.spec import Spec, conv_spec
from ..ops import apply_deltas, clip_boxes_wh_swapped, conv2d, nonempty_boxes
from ..ops.anchors import anchors_for_levels
from ..ops.nms import nms_mask

_NEG = -1e30


def num_cell_anchors(cfg) -> int:
    sizes = cfg.MODEL.ANCHOR_GENERATOR.SIZES
    ars = cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS
    s0 = sizes[0] if isinstance(sizes[0], (list, tuple)) else sizes
    a0 = ars[0] if isinstance(ars[0], (list, tuple)) else ars
    return len(s0) * len(a0)


def rpn_spec(cfg, prefix: str = "proposal_generator.rpn_head") -> Spec:
    from .roi_heads import _backbone_out_channels
    in_channels = _backbone_out_channels(cfg)
    a = num_cell_anchors(cfg)
    spec: Spec = {}
    conv_spec(spec, f"{prefix}.conv", in_channels, in_channels, 3, bias=True)
    conv_spec(spec, f"{prefix}.objectness_logits", in_channels, a, 1, bias=True)
    conv_spec(spec, f"{prefix}.anchor_deltas", in_channels, a * 4, 1, bias=True)
    return spec


def rpn_forward(
    p: Dict,
    features: Dict[str, jnp.ndarray],
    image_size_hw: Tuple[int, int],
    cfg,
    prefix: str = "proposal_generator.rpn_head",
    anchor_valid_hw: Tuple = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """features: HWC maps for cfg.MODEL.RPN.IN_FEATURES levels.
    image_size_hw: (H_pad, W_pad) of the network input — static ints in the
    per-shape graphs; traced scalars in the geometry-bucketed graph (the
    clip is a value op, so dynamic bounds compile fine).

    ``anchor_valid_hw``: optional traced (H, W) bound for the geometry-
    bucketed path (rcnn.py::forward_bucketed): anchors whose centers fall
    beyond it (i.e. grid positions that only exist because of bucket
    padding) are masked to -inf objectness BEFORE top-k, so the proposal
    pool matches what the minimally-padded per-shape graph would consider.

    Returns (proposals (K,4) f32, objectness (K,), valid (K,) bool) with
    K = POST_NMS_TOPK_TEST, sorted by objectness descending.
    """
    in_features: List[str] = list(cfg.MODEL.RPN.IN_FEATURES)
    pre_topk = cfg.MODEL.RPN.PRE_NMS_TOPK_TEST
    post_topk = cfg.MODEL.RPN.POST_NMS_TOPK_TEST
    nms_thresh = cfg.MODEL.RPN.NMS_THRESH
    min_box_size = float(cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE)
    weights = tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS)
    h_pad, w_pad = image_size_hw

    from .roi_heads import feature_strides
    strides_map = feature_strides(cfg)
    feats = [features[f] for f in in_features]
    grid_sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
    strides = [strides_map[f] for f in in_features]
    anchors = anchors_for_levels(
        grid_sizes, strides,
        cfg.MODEL.ANCHOR_GENERATOR.SIZES, cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        cfg.MODEL.ANCHOR_GENERATOR.OFFSET)

    # serving-mode int8 for the shared 3x3 head conv (per-level calibrated
    # input scales; the tiny 1x1 logit/delta convs stay fp)
    int8 = (bool(getattr(cfg.TPU, "INT8_RPN", False))
            and f"{prefix}.conv.qweight" in p)

    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    max_k = max(min(a.shape[0], pre_topk) for a in anchors)
    for fname, feat, anc in zip(in_features, feats, anchors):
        if int8:
            from ..ops.conv import conv2d_int8_chain
            from ..ops.conv import quant_act_s8
            s_in = p[f"{prefix}.conv.in_scale_{fname}"]
            t = conv2d_int8_chain(
                quant_act_s8(feat, s_in), s_in, p[f"{prefix}.conv.qweight"],
                p[f"{prefix}.conv.wscale"], p[f"{prefix}.conv.bias"],
                padding=1, relu=True, out_scale=None).astype(feat.dtype)
        else:
            t = jax.nn.relu(conv2d(feat, p[f"{prefix}.conv.weight"],
                                   p[f"{prefix}.conv.bias"], padding=1))
        # one fused 1x1 conv for objectness (A ch) + deltas (4A ch): each
        # output channel's dot over the 256 inputs is computed independently
        # either way, but fusing halves the reads of the 33 MB/level head
        # feature ``t`` (the FLOPs here are trivial; the reads are not)
        a_ch = p[f"{prefix}.objectness_logits.bias"].shape[0]
        w_cat = jnp.concatenate([p[f"{prefix}.objectness_logits.weight"],
                                 p[f"{prefix}.anchor_deltas.weight"]], axis=-1)
        b_cat = jnp.concatenate([p[f"{prefix}.objectness_logits.bias"],
                                 p[f"{prefix}.anchor_deltas.bias"]])
        both = conv2d(t, w_cat, b_cat)
        logits = both[..., :a_ch]
        deltas = both[..., a_ch:]
        hwa = logits.shape[-3] * logits.shape[-2] * logits.shape[-1]
        logits = logits.reshape(hwa)                    # (H*W*A,), order (y,x,a)
        deltas = deltas.reshape(hwa, 4)                 # channel = a*4+d -> (HWA, 4)

        if anchor_valid_hw is not None:
            vh, vw = anchor_valid_hw
            anc_j = jnp.asarray(anc)
            cx = (anc_j[:, 0] + anc_j[:, 2]) * 0.5
            cy = (anc_j[:, 1] + anc_j[:, 3]) * 0.5
            avalid = (cx < vw) & (cy < vh)
            logits = jnp.where(avalid, logits.astype(jnp.float32), _NEG)

        k = min(hwa, pre_topk)
        top_scores, top_idx = jax.lax.top_k(logits.astype(jnp.float32), k)
        top_deltas = deltas[top_idx]
        top_anchors = jnp.asarray(anc)[top_idx]
        boxes = apply_deltas(top_deltas, top_anchors, weights)  # fp32

        # pad every level to a common K so the per-level NMS vmaps
        pad = max_k - k
        if pad:
            boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), jnp.float32)])
            top_scores = jnp.concatenate([top_scores, jnp.full((pad,), _NEG, jnp.float32)])
        valid = jnp.arange(max_k) < k
        if anchor_valid_hw is not None:
            # masked (pad-region) anchors can still enter the top-k when a
            # level has fewer unmasked anchors than pre_topk — kill them
            valid = valid & (top_scores > _NEG / 2)
        lvl_boxes.append(boxes)
        lvl_scores.append(top_scores)
        lvl_valid.append(valid)

    boxes = jnp.stack(lvl_boxes)     # (L, K, 4)
    scores = jnp.stack(lvl_scores)   # (L, K)
    valid = jnp.stack(lvl_valid)     # (L, K)

    # validity: finite boxes/scores (proposal_utils.py:102-110)
    finite = jnp.isfinite(boxes).all(-1) & jnp.isfinite(scores)
    valid = valid & finite

    # clip with the reference's swapped (W, H) convention (rpn.py:320)
    boxes = clip_boxes_wh_swapped(boxes, (w_pad, h_pad))
    valid = valid & nonempty_boxes(boxes, min_box_size)

    # per-level NMS == the reference's level-offset batched NMS
    keep = jax.vmap(nms_mask, in_axes=(0, 0, 0, None))(boxes, scores, valid, nms_thresh)

    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = jnp.where(keep & valid, scores, _NEG).reshape(-1)

    k_out = min(post_topk, flat_scores.shape[0])
    out_scores, out_idx = jax.lax.top_k(flat_scores, k_out)
    out_boxes = flat_boxes[out_idx]
    out_valid = out_scores > _NEG / 2
    if k_out < post_topk:
        padn = post_topk - k_out
        out_boxes = jnp.concatenate([out_boxes, jnp.zeros((padn, 4), jnp.float32)])
        out_scores = jnp.concatenate([out_scores, jnp.full((padn,), _NEG, jnp.float32)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((padn,), bool)])
    return out_boxes, out_scores, out_valid
