"""Pallas TPU kernel: exact greedy NMS in one pass.

The XLA formulation (ops/nms.py) iterates a (K, K) suppression-matrix fixed
point — each sweep re-reads the K^2 mask. This kernel instead runs the
*sequential* greedy algorithm the way the hardware likes it: the 4 coordinate
rows live in VMEM as (1, K) vectors, a single fori_loop walks the score
order, and each step is one K-wide VPU IoU row + a masked row update of the
suppression vector held in VMEM scratch. No K x K matrix is ever
materialized, and the result is exactly torchvision's greedy semantics
(strict ``>`` threshold, (x2-x1)*(y2-y1) areas) in one kernel launch.

A box can only be suppressed by an *earlier* kept box, so ``suppressed[i]``
is final before iteration i reads it; the keep mask is simply
``valid & ~suppressed`` at the end.

Inputs must already be score-sorted (the caller sorts and scatters back —
see ops/nms.py::nms_mask dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, sup_ref, *,
                iou_threshold: float, k: int, classed: bool):
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    cls = boxes_ref[4:5, :] if classed else None
    areas = (x2 - x1) * (y2 - y1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid = valid_ref[0:1, :]

    sup_ref[0:1, :] = jnp.zeros((1, k), jnp.float32)

    def body(i, _):
        # Mosaic forbids dynamic lane indexing, so scalar reads of lane i are
        # one-hot masked reductions — still pure K-wide VPU work.
        onehot = (col == i).astype(jnp.float32)

        def sel(vec):
            return jnp.sum(vec * onehot)

        sup_row = sup_ref[0:1, :]
        keep_i = (sel(valid) > 0.5) & (sel(sup_row) < 0.5)
        bx1 = sel(x1)
        by1 = sel(y1)
        bx2 = sel(x2)
        by2 = sel(y2)
        area_i = (bx2 - bx1) * (by2 - by1)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = areas + area_i - inter
        iou = jnp.where(union > 0, inter / union, 0.0)

        hit = keep_i & (iou > iou_threshold) & (col > i)
        if classed:
            # class-offset batched NMS: only same-class boxes suppress
            hit = hit & (cls == sel(cls))
        sup_ref[0:1, :] = jnp.where(hit, 1.0, sup_row)
        return 0

    jax.lax.fori_loop(0, k, body, 0)
    keep_ref[0:1, :] = jnp.where((valid > 0.5) & (sup_ref[0:1, :] < 0.5), 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_keep_pallas(boxes_sorted: jnp.ndarray, valid_sorted: jnp.ndarray,
                    iou_threshold: float,
                    classes_sorted: jnp.ndarray = None) -> jnp.ndarray:
    """boxes_sorted: (K, 4) fp32 score-descending; valid_sorted: (K,) bool.
    ``classes_sorted`` (K,) optional: class-aware (batched) NMS — boxes of
    different classes never suppress each other. Returns keep mask (K,) bool
    in the sorted order."""
    k = boxes_sorted.shape[0]
    classed = classes_sorted is not None
    boxes_t = boxes_sorted.astype(jnp.float32).T  # (4, K)
    if classed:
        boxes_t = jnp.concatenate(
            [boxes_t, classes_sorted.astype(jnp.float32)[None, :]], axis=0)
    valid_f = valid_sorted.astype(jnp.float32)[None, :]  # (1, K)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=float(iou_threshold), k=k,
                          classed=classed),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
    )(boxes_t, valid_f)
    return keep[0] > 0.5
