"""DensePoseDataFilter equivalent (train-time proposal filtering).

The reference keeps an IoU-based filter that selects proposals overlapping
ground truth above FG_IOU_THRESHOLD for DensePose training
(/root/reference/densepose/modeling/filter.py — [vestigial] at inference,
SURVEY.md section 2.5). Provided as a fixed-shape masked selection so the
surface exists for future training support.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.boxes import pairwise_iou


def densepose_data_filter_mask(
    proposal_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_iou_threshold: float = 0.7,
) -> jnp.ndarray:
    """Mask of proposals whose best-IoU ground-truth box exceeds the
    threshold. proposal_boxes (P, 4); gt_boxes (G, 4) with gt_valid (G,)."""
    iou = pairwise_iou(proposal_boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    return iou.max(axis=1) >= fg_iou_threshold
