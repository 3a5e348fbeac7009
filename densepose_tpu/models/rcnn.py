"""GeneralizedRCNN meta-architecture: one pure, jittable function.

Replaces the reference's TorchScript'd module pipeline
(DefaultPredictor.forward -> GeneralizedRCNN.inference,
engine/defaults.py:65-97 + meta_arch/rcnn.py:110-197) with a single
``predict(params, image_u8)`` pure function compiled per static input-shape
bucket. All of preprocess (resize+normalize+pad), backbone, RPN, ROI heads
and postprocess live in one XLA program — exactly the fusion the reference
tried to get from ``torch.jit.script``, but with static shapes end-to-end.

Preprocess parity notes:
* the resize uses torch's scale-factor coordinate rule AND is quantized to
  uint8, because the reference feeds the raw uint8 tensor through
  F.interpolate (defaults.py:87-89) — verified to round-to-nearest,
* normalization/padding follow preprocess_image (rcnn.py:156-181):
  (x - pixel_mean) / pixel_std, zero-pad H,W up to size_divisibility 32.

Postprocess mirrors detector_postprocess (postprocessing.py:11-61): boxes
are rescaled from resized+padded coords to the original resolution, empty
boxes dropped (via the validity mask), then clipped with the correct (H, W)
order. DensePose maps ride along per detection slot.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.spec import Spec
from ..ops import clip_boxes, nonempty_boxes, resize_bilinear
from .fpn import fpn_forward, fpn_spec
from .roi_heads import roi_heads_forward, roi_heads_spec
from .rpn import rpn_forward, rpn_spec

SIZE_DIVISIBILITY = 32  # FPN max stride (fpn.py:116)


def build_model(cfg) -> "GeneralizedRCNN":
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN", cfg.MODEL.META_ARCHITECTURE
    return GeneralizedRCNN(cfg)


def compute_resize(h: int, w: int, min_size: int, max_size: int) -> Tuple[float, int, int]:
    """DefaultPredictor resize rule (defaults.py:85-89): one scale k, output
    floor(h*k) x floor(w*k)."""
    k = min(min_size / min(h, w), max_size / max(h, w))
    return k, int(h * k), int(w * k)


def pad_to_divisible(h: int, w: int, div: int = SIZE_DIVISIBILITY) -> Tuple[int, int]:
    return (int(math.ceil(h / div) * div), int(math.ceil(w / div) * div))


class GeneralizedRCNN:
    """Static-config wrapper producing pure forward functions.

    Not a stateful module: parameters are always passed in. The class only
    holds the frozen config and derived static facts.
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, dtype=np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, dtype=np.float32)
        self.input_format = cfg.INPUT.FORMAT
        self.min_size = cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST

    # -- spec ---------------------------------------------------------------
    def spec(self) -> Spec:
        spec = fpn_spec(self.cfg)
        spec.update(rpn_spec(self.cfg))
        spec.update(roi_heads_spec(self.cfg))
        return spec

    # -- forward pieces -----------------------------------------------------
    def preprocess(self, image_u8: jnp.ndarray, orig_hw: Tuple[int, int],
                   compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, Tuple[int, int], Tuple[int, int]]:
        """image_u8: (H0, W0, 3) uint8 BGR. Returns (padded image (Hp,Wp,3),
        (h1, w1) resized size, (Hp, Wp))."""
        h0, w0 = orig_hw
        k, h1, w1 = compute_resize(h0, w0, self.min_size, self.max_size)
        hp, wp = pad_to_divisible(h1, w1)

        x = image_u8.astype(jnp.float32)
        if self.input_format == "RGB":
            # reference flips BGR->RGB channel order (defaults.py:81-83)
            x = x[..., ::-1]
        x = resize_bilinear(x, (h1, w1), scale=(k, k))
        # reference resizes the uint8 tensor -> quantized output
        x = jnp.clip(jnp.round(x), 0, 255)
        x = (x - self.pixel_mean) / self.pixel_std
        x = jnp.pad(x, ((0, hp - h1), (0, wp - w1), (0, 0)))
        return x.astype(compute_dtype), (h1, w1), (hp, wp)

    def forward(self, params: Dict, image_u8: jnp.ndarray,
                compute_dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        """Full single-image inference. image_u8 shape is static per compile."""
        cfg = self.cfg
        h0, w0 = image_u8.shape[0], image_u8.shape[1]
        x, (h1, w1), (hp, wp) = self.preprocess(image_u8, (h0, w0), compute_dtype)

        features = fpn_forward(params, x, cfg)
        proposals, obj_logits, pvalid = rpn_forward(params, features, (hp, wp), cfg)
        out = roi_heads_forward(params, features, proposals, pvalid, cfg)

        # detector_postprocess (postprocessing.py:11-61): image_size stored as
        # (W, H) == padded size; scales divide out the padding
        scale_x = w0 / w1
        scale_y = h0 / h1
        boxes = out["pred_boxes"]
        boxes = boxes * jnp.asarray([scale_x, scale_y, scale_x, scale_y], jnp.float32)
        keep = nonempty_boxes(boxes)
        valid = out["valid"] & keep
        boxes = clip_boxes(boxes, (h0, w0))

        result = {
            "image_size": jnp.asarray([h0, w0], jnp.int32),
            "pred_boxes": boxes,
            "scores": out["scores"],
            "pred_classes": out["pred_classes"],
            "valid": valid,
            "num_instances": valid.sum().astype(jnp.int32),
        }
        for key in ("pred_densepose_coarse_segm", "pred_densepose_fine_segm",
                    "pred_densepose_u", "pred_densepose_v"):
            if key in out:
                result[key] = out[key]
        return result

    # -- jit entry ----------------------------------------------------------
    def jit_forward(self, compute_dtype=jnp.float32):
        """Returns a jitted fn(params, image_u8). One compile per image shape
        (the shape bucket cache lives in predictor.DensePosePredictor)."""
        fwd = partial(self.forward, compute_dtype=compute_dtype)
        return jax.jit(fwd)
