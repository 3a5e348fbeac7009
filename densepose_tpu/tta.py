"""Test-time augmentation (multi-scale + horizontal flip).

The reference ships a TTA config
(configs/quick_schedules/densepose_rcnn_R_50_FPN_TTA_inference_acc_test.yaml,
keys defined at detectron2/config.py:677-680) with expected ``bbox_TTA`` /
``densepose_*_TTA`` AP numbers — but contains NO TTA implementation (upstream
detectron2's ``GeneralizedRCNNWithTTA`` was not carried over). This module
supplies the capability:

* the detector (stage 1) runs on every (min_size, flip) view; each view's
  detections are mapped back to original-image coordinates (flip: x -> W - x),
* all views' detections are merged with class-aware NMS at the config's test
  threshold and reduced to the top ``TEST.DETECTIONS_PER_IMAGE`` — mirroring
  upstream's ``_merge_detections``,
* the DensePose head (stage 2) then runs on the *merged* boxes on every
  non-flipped view and the SIUV logit maps are averaged — mirroring upstream
  DensePose TTA's ``_reduce_pred_densepose``. Flipped views contribute to box
  merging only: mapping flipped chart outputs back requires the
  ``densepose_UV_symmetry_transforms.mat`` tables, external data neither this
  repo nor the reference ships.

Every view is a separate static-shape jit (one compile per (H, W, min_size,
flip) bucket) — TTA trades compile count for accuracy, exactly like the
reference's per-shape TorchScript specializations would.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.rcnn import compute_resize
from .ops.nms import batched_nms_mask


def merge_detections(boxes: jnp.ndarray, scores: jnp.ndarray,
                     classes: jnp.ndarray, valid: jnp.ndarray,
                     nms_thresh: float, topk: int):
    """Class-aware NMS over the concatenated per-view detections, keep the
    ``topk`` best by score (fixed-size output + validity mask)."""
    keep = batched_nms_mask(boxes, scores, classes, valid, nms_thresh)
    s = jnp.where(keep, scores, -1e30)
    order = jnp.argsort(-s, stable=True)[:topk]
    return (boxes[order], scores[order], classes[order],
            keep[order] & valid[order])


class TTAPredictor:
    """Wraps a DensePosePredictor with TEST.AUG multi-scale/flip inference.

    Same calling convention as the base predictor: ``__call__(image)`` returns
    the device output dict; ``predict_numpy`` / ``numpy_outputs`` match.
    """

    def __init__(self, base):
        self.base = base
        cfg = base.cfg
        aug = cfg.TEST.AUG
        self.min_sizes: List[int] = [int(s) for s in aug.MIN_SIZES]
        self.max_size: int = int(aug.MAX_SIZE)
        self.flip: bool = bool(aug.FLIP)
        self.nms_thresh = float(cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST)
        self.topk = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.densepose_on = bool(cfg.MODEL.DENSEPOSE_ON)
        self._s1_cache: Dict[Tuple, callable] = {}
        self._s2_cache: Dict[Tuple, callable] = {}
        self._merge = jax.jit(partial(
            merge_detections, nms_thresh=self.nms_thresh, topk=self.topk))

    # -- per-view pieces ----------------------------------------------------
    def _stage1(self, shape_hw, min_size):
        key = (shape_hw, min_size)
        fn = self._s1_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self.base.model.forward_stage1,
                                 compute_dtype=self.base.compute_dtype,
                                 min_size=min_size, max_size=self.max_size))
            self._s1_cache[key] = fn
        return fn

    def _stage2(self, shape_hw, min_size):
        key = (shape_hw, min_size)
        fn = self._s2_cache.get(key)
        if fn is None:
            fn = jax.jit(self.base.model.forward_densepose)
            self._s2_cache[key] = fn
        return fn

    # -- full TTA forward ---------------------------------------------------
    def __call__(self, image_bgr_u8: np.ndarray) -> Dict[str, jnp.ndarray]:
        h0, w0 = image_bgr_u8.shape[:2]
        img = jnp.asarray(image_bgr_u8)
        img_flip = img[:, ::-1, :]

        all_boxes, all_scores, all_classes, all_valid = [], [], [], []
        view_feats = []  # (features, view_scale w1/w0 x h1/h0) per non-flipped view
        for ms in self.min_sizes:
            s1 = self._stage1((h0, w0), ms)
            res, feats, _ = s1(self.base.params, img)
            all_boxes.append(res["pred_boxes"])
            all_scores.append(res["scores"])
            all_classes.append(res["pred_classes"])
            all_valid.append(res["valid"])
            _, h1, w1 = compute_resize(h0, w0, ms, self.max_size)
            view_feats.append((feats, (h1 / h0, w1 / w0)))
            if self.flip:
                res_f, _, _ = s1(self.base.params, img_flip)
                bf = res_f["pred_boxes"]
                # unflip: x1 = W - x2', x2 = W - x1'
                bf = jnp.stack([w0 - bf[:, 2], bf[:, 1],
                                w0 - bf[:, 0], bf[:, 3]], axis=1)
                all_boxes.append(bf)
                all_scores.append(res_f["scores"])
                all_classes.append(res_f["pred_classes"])
                all_valid.append(res_f["valid"])

        boxes, scores, classes, valid = self._merge(
            jnp.concatenate(all_boxes), jnp.concatenate(all_scores),
            jnp.concatenate(all_classes), jnp.concatenate(all_valid))

        result = {
            "image_size": jnp.asarray([h0, w0], jnp.int32),
            "pred_boxes": boxes,
            "scores": scores,
            "pred_classes": classes,
            "valid": valid,
            "num_instances": valid.sum().astype(jnp.int32),
        }

        if self.densepose_on:
            acc = None
            for (feats, (sy, sx)), ms in zip(view_feats, self.min_sizes):
                boxes_net = boxes * jnp.asarray([sx, sy, sx, sy], jnp.float32)
                dp = self._stage2((h0, w0), ms)(self.base.params, feats, boxes_net)
                dp = {k: v.astype(jnp.float32) for k, v in dp.items()}
                acc = dp if acc is None else {
                    k: acc[k] + dp[k] for k in acc}
            n = float(len(view_feats))
            result.update({k: v / n for k, v in acc.items()})
        return result

    def predict_numpy(self, image_bgr_u8: np.ndarray) -> Dict[str, np.ndarray]:
        return self.base.numpy_outputs(self(image_bgr_u8))

    def numpy_outputs(self, outputs):
        return self.base.numpy_outputs(outputs)
