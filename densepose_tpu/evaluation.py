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

* ``densepose_ap``: the DensePose COCO protocol — per GT-annotated point,
  look up the predicted (part, U, V) at that point inside the matched
  detection, convert point pairs to a surface distance, score the instance
  pair with GPS = mean_i exp(-d_i^2 / (2 kappa^2)), optionally blend with
  the coarse-mask IoU for GPSm = sqrt(GPS * mIoU), and run the same
  .50:.05:.95 greedy AP machinery with GPS(m) in place of IoU.

Surface distance is pluggable: exact geodesic evaluation needs the SMPL
mesh geodesic tables (external data files upstream DensePose downloads;
pass ``geodist=`` a callable built from them). Without them,
``planar_uv_distance`` — per-part planar UV distance, 0 cross-part credit —
keeps the harness runnable offline; it is a documented stand-in, not the
official metric.

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


def planar_uv_distance(i1, u1, v1, i2, u2, v2) -> np.ndarray:
    """Stand-in surface distance when SMPL geodesic tables are absent:
    Euclidean distance in the part's planar UV chart when the part labels
    agree, a fixed large distance otherwise. Scale roughly matches the
    geodesic tables (charts span ~1 unit)."""
    same = np.asarray(i1) == np.asarray(i2)
    d = np.hypot(np.asarray(u1) - np.asarray(u2), np.asarray(v1) - np.asarray(v2))
    return np.where(same & (np.asarray(i1) > 0), d, 3.0)


# upstream DensePose point-similarity bandwidth (densepose_coco_evaluation:
# ogps = exp(-d^2 / (2 k^2)) with k = 0.255)
GPS_KAPPA = 0.255


def _instance_gps(labels: np.ndarray, uv: np.ndarray, box_xywh: np.ndarray,
                  ann: Dict, geodist, kappa: float) -> float:
    """GPS between one detection's DensePose output and one GT annotation.

    labels: (H, W) int part labels on the box grid; uv: (2, H, W) in [0, 1];
    box_xywh: detection box; ann: GT dict with ``bbox`` (xywh) and dp_x/dp_y
    (point coords in 0..255 relative to the GT box, the COCO DensePose
    convention), dp_I/dp_U/dp_V."""
    dp_x = np.asarray(ann["dp_x"], dtype=np.float64)
    if dp_x.size == 0:
        return float("nan")
    dp_y = np.asarray(ann["dp_y"], dtype=np.float64)
    gx, gy, gw, gh = [float(v) for v in ann["bbox"]]
    # GT points in image coords
    px = gx + dp_x * gw / 255.0
    py = gy + dp_y * gh / 255.0
    # ... located on the detection's output grid
    bx, by, bw, bh = [float(v) for v in box_xywh]
    h, w = labels.shape
    ix = np.clip(((px - bx) / max(bw, 1e-6) * w).astype(np.int64), 0, w - 1)
    iy = np.clip(((py - by) / max(bh, 1e-6) * h).astype(np.int64), 0, h - 1)
    pred_i = labels[iy, ix]
    pred_u = uv[0, iy, ix]
    pred_v = uv[1, iy, ix]
    d = geodist(np.asarray(ann["dp_I"]), np.asarray(ann["dp_U"]),
                np.asarray(ann["dp_V"]), pred_i, pred_u, pred_v)
    return float(np.mean(np.exp(-np.asarray(d) ** 2 / (2 * kappa ** 2))))


def rle_decode(rle: Dict) -> np.ndarray:
    """Decode a COCO RLE dict {counts, size} to a binary (h, w) mask.
    Handles both uncompressed (list of ints) and compressed (the pycocotools
    LEB128-style string) counts; column-major run order per the COCO spec."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, bytes):
        decoded, i = [], 0
        while i < len(counts):
            x, k, more = 0, 0, True
            while more:
                c = counts[i] - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                i += 1
                k += 1
                if not more and (c & 0x10):
                    x |= -1 << (5 * k)
            if len(decoded) > 2:
                x += decoded[-2]
            decoded.append(x)
        counts = decoded
    vals = np.zeros(sum(counts), dtype=bool)
    pos, v = 0, False
    for run in counts:
        if v:
            vals[pos:pos + run] = True
        pos += run
        v = not v
    return vals.reshape(w, h).T  # column-major


def _gt_mask_from_ann(ann: Dict):
    """GT foreground mask for GPSm: ``mask`` (binary array) or COCO
    ``dp_masks`` (list of per-part RLEs on a 256x256 grid; union)."""
    if "mask" in ann:
        return np.asarray(ann["mask"], dtype=bool)
    if "dp_masks" in ann:
        parts = [rle_decode(r) for r in ann["dp_masks"] if r]
        if parts:
            out = parts[0]
            for m in parts[1:]:
                out = out | m
            return out
    return None


def _mask_iou(labels: np.ndarray, box_xywh, gt_mask: np.ndarray, gt_box) -> float:
    """IoU between the detection's foreground (labels > 0) and the GT mask
    (binary array on the GT box), both rasterized on the detection grid."""
    h, w = labels.shape
    bx, by, bw, bh = [float(v) for v in box_xywh]
    gx, gy, gw_, gh_ = [float(v) for v in gt_box]
    ys = (np.arange(h) + 0.5) / h * bh + by
    xs = (np.arange(w) + 0.5) / w * bw + bx
    my = ((ys - gy) / max(gh_, 1e-6) * gt_mask.shape[0]).astype(np.int64)
    mx = ((xs - gx) / max(gw_, 1e-6) * gt_mask.shape[1]).astype(np.int64)
    inside = ((my >= 0) & (my < gt_mask.shape[0]))[:, None] & \
             ((mx >= 0) & (mx < gt_mask.shape[1]))[None, :]
    myc = np.clip(my, 0, gt_mask.shape[0] - 1)
    mxc = np.clip(mx, 0, gt_mask.shape[1] - 1)
    gt_on_grid = gt_mask[myc][:, mxc].astype(bool) & inside
    fg = labels > 0
    union = (fg | gt_on_grid).sum()
    return float((fg & gt_on_grid).sum() / union) if union else 0.0


def densepose_ap(
    predictions: Sequence[Dict[str, np.ndarray]],
    annotations: Sequence[List[Dict]],
    mode: str = "gps",
    geodist=planar_uv_distance,
    kappa: float = GPS_KAPPA,
) -> Dict[str, float]:
    """DensePose AP with GPS (or GPSm) as the match similarity.

    predictions: per image, the extractor's view of the outputs —
    ``pred_boxes_xywh`` (N,4), ``scores`` (N,), ``labels`` list of (H,W) part
    maps, ``uv`` list of (2,H,W) maps. annotations: per image, list of GT
    dicts (``bbox`` xywh, dp_x/dp_y/dp_I/dp_U/dp_V; for GPSm a GT mask on the
    ``bbox`` grid as binary ``mask`` or COCO ``dp_masks`` per-part RLEs —
    without one, GPSm degrades to GPS for that instance). GT entries without
    dp points are ignore regions: detections overlapping them (IoU >= 0.5)
    count neither as TP nor FP. Returns {"AP", "AP50", "AP75"} in percent.
    """
    assert mode in ("gps", "gpsm"), mode
    per_image_sim = []  # (scores (N,), sim (N, M), det_ignore (N,))
    n_gt_total = 0
    for pred, anns in zip(predictions, annotations):
        boxes = np.asarray(pred["pred_boxes_xywh"], dtype=np.float64).reshape(-1, 4)
        scores = np.asarray(pred["scores"], dtype=np.float64).reshape(-1)
        # GTs without dp points are IGNORE regions (upstream sets
        # gt['ignore'] for them): detections on those people count neither
        # as TP nor FP
        dp_anns = [a for a in anns if len(np.atleast_1d(a.get("dp_x", ())))]
        ign_boxes = np.array([a["bbox"] for a in anns
                              if not len(np.atleast_1d(a.get("dp_x", ())))],
                             dtype=np.float64).reshape(-1, 4)
        n_gt_total += len(dp_anns)
        det_ignore = np.zeros(len(boxes), dtype=bool)
        if len(ign_boxes) and len(boxes):
            a_xyxy = boxes.copy()
            a_xyxy[:, 2:] += a_xyxy[:, :2]
            b_xyxy = ign_boxes.copy()
            b_xyxy[:, 2:] += b_xyxy[:, :2]
            iou = _box_iou_matrix(a_xyxy, b_xyxy)
            det_ignore = iou.max(axis=1) >= 0.5
        sim = np.zeros((len(boxes), len(dp_anns)))
        for di in range(len(boxes)):
            for gi, ann in enumerate(dp_anns):
                g = _instance_gps(pred["labels"][di], pred["uv"][di],
                                  boxes[di], ann, geodist, kappa)
                if mode == "gpsm":
                    gt_mask = _gt_mask_from_ann(ann)
                    if gt_mask is not None:
                        miou = _mask_iou(pred["labels"][di], boxes[di],
                                         gt_mask, ann["bbox"])
                        g = float(np.sqrt(max(g, 0.0) * miou))
                    # no GT mask -> GPSm degrades to GPS (never inflated)
                sim[di, gi] = 0.0 if np.isnan(g) else g
        per_image_sim.append((scores, sim, det_ignore))

    aps = []
    for thresh in IOU_THRESHOLDS:
        all_scores, all_matched = [], []
        for scores, sim, det_ignore in per_image_sim:
            matched = np.zeros(len(scores), dtype=bool)
            taken = np.zeros(sim.shape[1], dtype=bool)
            for i in np.argsort(-scores, kind="stable"):
                if sim.shape[1]:
                    j = int(np.argmax(np.where(taken, -1.0, sim[i])))
                    if not taken[j] and sim[i, j] >= thresh:
                        matched[i] = True
                        taken[j] = True
            # unmatched detections on ignore regions leave the pool
            keep = matched | ~det_ignore
            all_scores.append(scores[keep])
            all_matched.append(matched[keep])
        if n_gt_total == 0:
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
