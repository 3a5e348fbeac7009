"""Box tensor ops, mirroring /root/reference/detectron2/structures.py and
modeling/box_regression.py with fixed shapes.

All functions take/return (K, 4) XYXY float arrays; decoding is always done
in fp32 regardless of the pipeline compute dtype, reproducing the reference's
fp32 islands (box_regression.py:84, nms.py:19-20).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def clip_boxes(boxes: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Clamp x to [0, size[1]] and y to [0, size[0]] — structures.py:107-112.

    NOTE the reference indexes the size tuple as (.., [1]=x-range, [0]=y-range)
    i.e. it expects (H, W); ``detector_postprocess`` passes (H, W) so clipping
    is correct there, but the RPN passes (W, H) (rpn.py:320) which swaps the
    clamp ranges. Use ``clip_boxes_wh_swapped`` to reproduce the RPN path
    bit-for-bit.
    """
    x1 = jnp.clip(boxes[..., 0], 0, size_hw[1])
    y1 = jnp.clip(boxes[..., 1], 0, size_hw[0])
    x2 = jnp.clip(boxes[..., 2], 0, size_hw[1])
    y2 = jnp.clip(boxes[..., 3], 0, size_hw[0])
    return jnp.stack((x1, y1, x2, y2), axis=-1)


def clip_boxes_wh_swapped(boxes: jnp.ndarray, size_wh) -> jnp.ndarray:
    """The RPN proposal clip exactly as the reference executes it:
    find_top_rpn_proposals receives image_size == (W, H) (rpn.py:320) and
    clip_boxes then clamps x to H and y to W (structures.py:107-112). This is
    a reference quirk kept for output parity."""
    return clip_boxes(boxes, size_wh)


def nonempty_boxes(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """structures.py:115-122: width/height >= threshold."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= threshold) & (hs >= threshold)


def boxes_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def apply_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float],
    scale_clamp: float = DEFAULT_SCALE_CLAMP,
) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas (box_regression.py:74-112).

    deltas: (K, k*4); boxes: (K, 4). Always computed in fp32 (the reference
    upcasts with ``deltas.float()``). Returns shape of ``deltas``.
    """
    orig_shape = deltas.shape
    deltas = deltas.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)

    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = deltas[:, 2::4] / ww
    dh = deltas[:, 3::4] / wh

    dw = jnp.minimum(dw, scale_clamp)
    dh = jnp.minimum(dh, scale_clamp)

    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = jnp.exp(dw) * widths[:, None]
    pred_h = jnp.exp(dh) * heights[:, None]

    x1 = pred_ctr_x - 0.5 * pred_w
    y1 = pred_ctr_y - 0.5 * pred_h
    x2 = pred_ctr_x + 0.5 * pred_w
    y2 = pred_ctr_y + 0.5 * pred_h
    pred = jnp.stack((x1, y1, x2, y2), axis=-1)
    return pred.reshape(orig_shape)


def scale_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """structures.py:132-140 (functional, not in-place)."""
    return boxes * jnp.asarray([scale_x, scale_y, scale_x, scale_y],
                               dtype=boxes.dtype)


def matched_pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of two equal-length box sets (structures.py:8-31)."""
    area_a = boxes_area(a)
    area_b = boxes_area(b)
    lt = jnp.maximum(a[:, :2], b[:, :2])
    rb = jnp.minimum(a[:, 2:], b[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) x (N, 4) -> (M, N) IoU, torchvision box_iou convention
    (area = (x2-x1)*(y2-y1), no +1)."""
    area_a = boxes_area(a)
    area_b = boxes_area(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
