"""Pure-numpy golden references for ops whose torch implementation lives in
torchvision (not installed here): roi_align and nms. Implemented straight
from the documented torchvision algorithm so our XLA kernels can be tested
without the reference's binaries.
"""

import math

import numpy as np


def bilinear_interpolate(feat, y, x):
    """feat: (H, W, C). torchvision border rule."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], dtype=np.float64)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    return (
        feat[y_low, x_low] * hy * hx
        + feat[y_low, x_high] * hy * lx
        + feat[y_high, x_low] * ly * hx
        + feat[y_high, x_high] * ly * lx
    )


def roi_align_np(feat, boxes, spatial_scale, output_size, sampling_ratio, aligned):
    """feat: (H, W, C); boxes: (M, 4) xyxy. Returns (M, oh, ow, C)."""
    oh, ow = output_size
    m = boxes.shape[0]
    c = feat.shape[-1]
    out = np.zeros((m, oh, ow, c), dtype=np.float64)
    offset = 0.5 if aligned else 0.0
    for i in range(m):
        x1, y1, x2, y2 = [float(v) for v in boxes[i]]
        start_w = x1 * spatial_scale - offset
        start_h = y1 * spatial_scale - offset
        end_w = x2 * spatial_scale - offset
        end_h = y2 * spatial_scale - offset
        roi_w = end_w - start_w
        roi_h = end_h - start_h
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_h = roi_h / oh
        bin_w = roi_w / ow
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / oh))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / ow))
        count = max(gh * gw, 1)
        for ph in range(oh):
            for pw in range(ow):
                acc = np.zeros(c, dtype=np.float64)
                for iy in range(gh):
                    yy = start_h + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = start_w + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += bilinear_interpolate(feat, yy, xx)
                out[i, ph, pw] = acc / count
    return out


def nms_np(boxes, scores, iou_threshold):
    """Greedy NMS, torchvision semantics. Returns kept indices score-sorted."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        for jdx in order:
            if suppressed[jdx] or jdx == idx:
                continue
            xx1 = max(boxes[idx, 0], boxes[jdx, 0])
            yy1 = max(boxes[idx, 1], boxes[jdx, 1])
            xx2 = min(boxes[idx, 2], boxes[jdx, 2])
            yy2 = min(boxes[idx, 3], boxes[jdx, 3])
            inter = max(xx2 - xx1, 0.0) * max(yy2 - yy1, 0.0)
            union = areas[idx] + areas[jdx] - inter
            iou = inter / union if union > 0 else 0.0
            if iou > iou_threshold:
                suppressed[jdx] = True
    return np.array(keep, dtype=np.int64)
