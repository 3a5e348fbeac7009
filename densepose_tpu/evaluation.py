"""Evaluation: COCO-style box AP + expected-results checking.

The reference carries accuracy targets in its configs
(``TEST.EXPECTED_RESULTS``, e.g.
configs/quick_schedules/densepose_rcnn_R_50_FPN_inference_acc_test.yaml:8)
but ships NO evaluator to compute them (SURVEY.md section 4). This module
supplies the missing harness:

* ``coco_box_ap``: the standard 101-point interpolated AP over IoU
  thresholds .50:.05:.95 (and AP50/AP75), matched greedily per image by
  score like pycocotools,
* ``check_expected_results``: compares computed metrics against the config's
  ``TEST.EXPECTED_RESULTS`` tuples ``[task, metric, value, tolerance]``.

DensePose GPS/GPSm require SMPL mesh geodesics (external data); the hook is
defined so a mesh-equipped deployment can plug them in.

Pure numpy — evaluation is host-side bookkeeping, not TPU work.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def _box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def _ap_from_matches(scores, matched, n_gt) -> float:
    """101-point interpolated AP (pycocotools convention)."""
    if n_gt == 0:
        return float("nan")
    order = np.argsort(-scores, kind="stable")
    tp = matched[order]
    fp = ~tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # precision envelope
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    rec_points = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, rec_points, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    prec_at = np.where(idx < len(precision), prec_at, 0.0)
    return float(prec_at.mean())


def coco_box_ap(
    predictions: Sequence[Dict[str, np.ndarray]],
    ground_truth: Sequence[np.ndarray],
) -> Dict[str, float]:
    """predictions: per image {"pred_boxes" (N,4), "scores" (N,)};
    ground_truth: per image (M, 4) boxes (single category, like DensePose's
    person-only setting). Returns {"AP", "AP50", "AP75"} in percent."""
    aps = []
    for thresh in IOU_THRESHOLDS:
        all_scores, all_matched = [], []
        n_gt_total = 0
        for pred, gt in zip(predictions, ground_truth):
            boxes = np.asarray(pred["pred_boxes"], dtype=np.float64).reshape(-1, 4)
            scores = np.asarray(pred["scores"], dtype=np.float64).reshape(-1)
            gt = np.asarray(gt, dtype=np.float64).reshape(-1, 4)
            n_gt_total += len(gt)
            if len(boxes) == 0:
                continue
            matched = np.zeros(len(boxes), dtype=bool)
            if len(gt):
                iou = _box_iou_matrix(boxes, gt)
                taken = np.zeros(len(gt), dtype=bool)
                for i in np.argsort(-scores, kind="stable"):
                    j = int(np.argmax(np.where(taken, -1.0, iou[i])))
                    if not taken[j] and iou[i, j] >= thresh:
                        matched[i] = True
                        taken[j] = True
            all_scores.append(scores)
            all_matched.append(matched)
        if not all_scores:
            aps.append(float("nan"))
            continue
        aps.append(_ap_from_matches(np.concatenate(all_scores),
                                    np.concatenate(all_matched), n_gt_total))
    aps = np.asarray(aps)
    return {
        "AP": float(np.nanmean(aps) * 100),
        "AP50": float(aps[0] * 100),
        "AP75": float(aps[5] * 100),
    }


def check_expected_results(
    results: Dict[str, Dict[str, float]],
    expected: Sequence[Tuple[str, str, float, float]],
) -> List[str]:
    """Compare metrics against TEST.EXPECTED_RESULTS entries
    ``[task, metric, value, tolerance]`` (config.py:661-665 key; never read by
    the reference). Returns a list of failure strings (empty == pass)."""
    failures = []
    for task, metric, value, tol in expected:
        got = results.get(task, {}).get(metric)
        if got is None:
            failures.append(f"{task}/{metric}: metric not computed")
        elif abs(got - value) > tol:
            failures.append(f"{task}/{metric}: got {got:.4f}, expected "
                            f"{value:.4f} +/- {tol}")
    return failures
