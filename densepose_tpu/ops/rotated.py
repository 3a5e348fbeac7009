"""Rotated boxes: delta transform + rotated NMS.

The reference declares ``nms_rotated`` but it calls a compiled extension that
does not exist in that repo (``torch.ops.detectron2.nms_rotated``,
layers/nms.py:86 — nonfunctional, SURVEY.md section 7.4). This module
provides *working* implementations:

* ``apply_deltas_rotated`` — Box2BoxTransformRotated.apply_deltas
  (box_regression.py:115-224) on (x_ctr, y_ctr, w, h, angle_deg) boxes,
* ``apply_deltas_linear`` — Box2BoxTransformLinear.apply_deltas (FCOS-style,
  box_regression.py:226-303),
* ``nms_rotated_mask`` — greedy rotated NMS using exact convex-polygon
  intersection IoU, fixed shapes, same suppression-matrix fixed point as
  ops/nms.py.

The rotated IoU computes the Sutherland–Hodgman clip of one rectangle
against the other, vectorized over all (K, K) pairs.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def apply_deltas_rotated(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float, float],
    scale_clamp: float = _DEFAULT_SCALE_CLAMP,
) -> jnp.ndarray:
    """deltas (K, 5), boxes (K, 5) as (cx, cy, w, h, angle_deg)."""
    deltas = deltas.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    wx, wy, ww, wh, wa = weights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[:, 3] / wh, scale_clamp)
    da = deltas[:, 4] / wa

    cx = dx * boxes[:, 2] + boxes[:, 0]
    cy = dy * boxes[:, 3] + boxes[:, 1]
    w = jnp.exp(dw) * boxes[:, 2]
    h = jnp.exp(dh) * boxes[:, 3]
    ang = da * 180.0 / math.pi + boxes[:, 4]
    ang = (ang + 180.0) % 360.0 - 180.0
    return jnp.stack([cx, cy, w, h, ang], axis=-1)


def apply_deltas_linear(deltas: jnp.ndarray, boxes: jnp.ndarray,
                        normalize_by_size: bool = True) -> jnp.ndarray:
    """FCOS-style (l, t, r, b) distances -> XYXY (box_regression.py:266-303)."""
    deltas = jax.nn.relu(deltas.astype(jnp.float32))
    boxes = boxes.astype(jnp.float32)
    ctr_x = 0.5 * (boxes[:, 0] + boxes[:, 2])
    ctr_y = 0.5 * (boxes[:, 1] + boxes[:, 3])
    if normalize_by_size:
        sw = boxes[:, 2] - boxes[:, 0]
        sh = boxes[:, 3] - boxes[:, 1]
        deltas = deltas * jnp.stack([sw, sh, sw, sh], axis=-1)
    return jnp.stack([ctr_x - deltas[:, 0], ctr_y - deltas[:, 1],
                      ctr_x + deltas[:, 2], ctr_y + deltas[:, 3]], axis=-1)


def _box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 5) -> (K, 4, 2) corner points, CCW."""
    cx, cy, w, h, a = [boxes[:, i] for i in range(5)]
    t = a * (math.pi / 180.0)
    c, s = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    x = cx[:, None] + dx * c[:, None] - dy * s[:, None]
    y = cy[:, None] + dx * s[:, None] + dy * c[:, None]
    return jnp.stack([x, y], axis=-1)


def _polygon_area(pts: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace over the first n_valid points of pts (..., P, 2)."""
    p = pts.shape[-2]
    idx = jnp.arange(p)
    valid = idx < n_valid[..., None]
    nxt = (idx + 1) % jnp.maximum(n_valid[..., None], 1)
    x, y = pts[..., 0], pts[..., 1]
    x2 = jnp.take_along_axis(x, nxt, axis=-1)
    y2 = jnp.take_along_axis(y, nxt, axis=-1)
    cross = x * y2 - x2 * y
    return 0.5 * jnp.abs(jnp.where(valid, cross, 0.0).sum(-1))


def _clip_polygon(pts, n_valid, a, b):
    """Clip polygons (..., P, 2) by half-plane left of segment a->b
    (Sutherland-Hodgman step). P doubles the capacity bound; callers allocate
    enough padding. a, b: (..., 2)."""
    p = pts.shape[-2]
    idx = jnp.arange(p)
    nxt = (idx + 1) % jnp.maximum(n_valid[..., None], 1)
    cur = pts
    nxt_pts = jnp.take_along_axis(pts, nxt[..., None], axis=-2)

    d = (b - a)[..., None, :]
    side = lambda q: d[..., 0] * (q[..., 1] - a[..., None, 1]) - d[..., 1] * (q[..., 0] - a[..., None, 0])
    s_cur = side(cur)
    s_nxt = side(nxt_pts)

    denom = s_cur - s_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + (nxt_pts - cur) * t[..., None]

    valid_edge = idx < n_valid[..., None]
    keep_cur = (s_cur >= 0) & valid_edge
    add_inter = ((s_cur >= 0) != (s_nxt >= 0)) & valid_edge

    # emit up to 2 points per edge: cur (if inside) then intersection (if cross)
    out_pts = jnp.concatenate([cur, inter], axis=-2)          # (..., 2P, 2)
    out_keep = jnp.concatenate([keep_cur, add_inter], axis=-1)
    # interleave by stable ordering: edge i contributes slots i and P+i; we
    # need order (cur_0, int_0, cur_1, int_1, ...) -> build gather index
    order = jnp.stack([jnp.arange(p), jnp.arange(p) + p], axis=1).reshape(-1)
    out_pts = out_pts[..., order, :]
    out_keep = out_keep[..., order]

    # compact: sort kept points to the front, preserving order
    rank = jnp.cumsum(out_keep.astype(jnp.int32), axis=-1) - 1
    cap = out_pts.shape[-2]
    compact = jnp.zeros_like(out_pts)
    scatter_idx = jnp.where(out_keep, rank, cap - 1)
    compact = jnp.take_along_axis(
        out_pts,
        jnp.argsort(jnp.where(out_keep, rank, cap + rank + 1), axis=-1)[..., None],
        axis=-2)
    new_n = out_keep.sum(-1)
    return compact, new_n


def rotated_pairwise_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """(M, 5) x (N, 5) exact rotated IoU via polygon clipping."""
    m, n = b1.shape[0], b2.shape[0]
    c1 = _box_corners(b1)  # (M, 4, 2)
    c2 = _box_corners(b2)  # (N, 4, 2)

    # broadcast to pairs: clip c1 by each edge of c2
    pts = jnp.broadcast_to(c1[:, None], (m, n, 4, 2))
    # pad capacity: each of 4 clips can add points; 4 -> 8 max for rect/rect
    pad = jnp.zeros((m, n, 12, 2))
    pts = jnp.concatenate([pts, pad], axis=-2)  # capacity 16
    n_valid = jnp.full((m, n), 4)

    for e in range(4):
        a = jnp.broadcast_to(c2[None, :, e], (m, n, 2))
        b = jnp.broadcast_to(c2[None, :, (e + 1) % 4], (m, n, 2))
        # ensure CCW orientation of clip polygon: corners are CCW in math
        # coords; the half-plane test in _clip_polygon keeps the left side
        pts16, n_valid = _clip_polygon(pts, n_valid, a, b)
        pts = pts16[..., : pts.shape[-2], :]

    inter = _polygon_area(pts, n_valid)
    area1 = (b1[:, 2] * b1[:, 3])[:, None]
    area2 = (b2[:, 2] * b2[:, 3])[None, :]
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_rotated_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Greedy rotated NMS keep-mask (fixed shapes), replacing the reference's
    nonfunctional torch.ops.detectron2.nms_rotated."""
    k = boxes.shape[0]
    s = jnp.where(valid, scores.astype(jnp.float32), -1e30)
    order = jnp.argsort(-s, stable=True)
    b = boxes[order].astype(jnp.float32)
    v = valid[order]

    iou = rotated_pairwise_iou(b, b)
    row = jnp.arange(k)[:, None]
    col = jnp.arange(k)[None, :]
    suppress = (iou > iou_threshold) & (col < row) & v[None, :] & v[:, None]

    def body(state):
        keep, _ = state
        return v & ~jnp.any(suppress & keep[None, :], axis=1), keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    keep0 = v
    keep, _ = jax.lax.while_loop(cond, body, (body((keep0, ~keep0))[0], keep0))
    return jnp.zeros((k,), dtype=bool).at[order].set(keep)
