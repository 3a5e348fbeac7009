"""Matcher + label subsampling (functional, fixed shapes).

Equivalents of /root/reference/detectron2/modeling/matcher.py (IoU-threshold
assignment with low-quality-match promotion) and modeling/sampling.py
(subsample_labels). Both are train-time utilities that the reference keeps
constructed-but-unused at inference (SURVEY.md section 2.4 [vestigial]); they
are provided here as working, jittable functions so the framework covers the
same surface (and so future training support has its core pieces).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def match_quality(
    iou_matrix: jnp.ndarray,
    thresholds: List[float],
    labels: List[int],
    allow_low_quality_matches: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """iou_matrix: (G, P) gt x predicted. Returns (matches (P,) int32 index of
    best gt, match_labels (P,) int8 in {-1, 0, 1})."""
    matched_vals = iou_matrix.max(axis=0)
    matches = iou_matrix.argmax(axis=0).astype(jnp.int32)

    match_labels = jnp.full(matched_vals.shape, labels[-1], dtype=jnp.int8)
    edges = [0.0] + list(thresholds) + [float("inf")]
    for (lo, hi), lab in zip(zip(edges[:-1], edges[1:]), labels):
        in_range = (matched_vals >= lo) & (matched_vals < hi)
        match_labels = jnp.where(in_range, jnp.int8(lab), match_labels)

    if allow_low_quality_matches:
        # for each gt, predictions tying its best IoU are promoted to fg
        highest_per_gt = iou_matrix.max(axis=1, keepdims=True)
        promote = (iou_matrix == highest_per_gt).any(axis=0) & (matched_vals > 0)
        match_labels = jnp.where(promote, jnp.int8(1), match_labels)
    return matches, match_labels


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int,
    rng_key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-size random fg/bg subsample (sampling.py:12-54 semantics with
    static output sizes): returns (pos_mask, neg_mask) over `labels`. The
    selected counts follow the reference's min(num_pos_target, available)
    rule; selection is uniform without replacement via random-key sorting."""
    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    num_pos_target = int(num_samples * positive_fraction)
    kp, kn = jax.random.split(rng_key)

    def pick(mask, target, key):
        n_avail = mask.sum()
        n_take = jnp.minimum(target, n_avail)
        # random priority; non-candidates sink to the bottom
        pri = jax.random.uniform(key, mask.shape)
        pri = jnp.where(mask, pri, -1.0)
        order = jnp.argsort(-pri)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        return mask & (rank < n_take), n_take

    pos_mask, n_pos = pick(positive, num_pos_target, kp)
    neg_mask, _ = pick(negative, num_samples - n_pos, kn)
    return pos_mask, neg_mask
