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
from .backbones import backbone_fns
from .roi_heads import roi_heads_spec
from .rpn import rpn_forward, rpn_spec

SIZE_DIVISIBILITY = 32  # FPN max stride (fpn.py:116)


def size_divisibility(cfg) -> int:
    """FPN: 32 (fpn.py:116). HRFPN: 64 — its stride-64 pyramid level is
    consumed by the Decoder, so exact size relations must hold through the
    avg-pool pyramid (the floor there would otherwise desync the decoder's
    2x-upsample chain)."""
    if cfg.MODEL.BACKBONE.NAME == "build_hrfpn_backbone":
        return 64
    return SIZE_DIVISIBILITY


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

    def augment_params_host(self, params) -> None:
        """Host-side derived-parameter pass, run once after load (before
        dtype cast / device_put): adds precomputed alternates the forward
        prefers when present. Currently: HRNet width-packed branch-conv
        kernels (models/hrnet.py::hrnet_wpack_augment). Mutates in place;
        no-op for other backbones."""
        import os
        if os.environ.get("DENSEPOSE_HRNET_NO_HOST_OPT"):
            return  # A/B escape hatch: measure the un-optimized graph
        if self.cfg.MODEL.BACKBONE.NAME == "build_hrfpn_backbone":
            from .hrnet import hrnet_host_optimize
            hrnet_host_optimize(params, self.cfg)

    # -- spec ---------------------------------------------------------------
    def spec(self) -> Spec:
        bb_spec, _, _ = backbone_fns(self.cfg)
        spec = bb_spec(self.cfg)
        spec.update(rpn_spec(self.cfg))
        if self.cfg.MODEL.ROI_HEADS.NAME == "Res5ROIHeads":
            from .res5_roi_heads import res5_spec
            spec.update(res5_spec(self.cfg))
        else:
            spec.update(roi_heads_spec(self.cfg))
        return spec

    # -- forward pieces -----------------------------------------------------
    def preprocess(self, image_u8: jnp.ndarray, orig_hw: Tuple[int, int],
                   compute_dtype=jnp.float32, min_size: int = None,
                   max_size: int = None) -> Tuple[jnp.ndarray, Tuple[int, int], Tuple[int, int]]:
        """image_u8: (H0, W0, 3) uint8 BGR. Returns (padded image (Hp,Wp,3),
        (h1, w1) resized size, (Hp, Wp)). ``min_size``/``max_size`` override
        the config's test resolution (static values; used by TTA views)."""
        h0, w0 = orig_hw
        k, h1, w1 = compute_resize(h0, w0, min_size or self.min_size,
                                   max_size or self.max_size)
        hp, wp = pad_to_divisible(h1, w1, size_divisibility(self.cfg))

        import os
        if not os.environ.get("DENSEPOSE_TPU_SMALLC_PREPROCESS"):
            # DEFAULT: packed W*C form — every step full-lane (see resize_
            # bilinear_packed). Bit-exact to the smallc path below — same
            # taps, same fp32 arithmetic (tests/test_ops.py::
            # test_packed_preprocess_bit_exact); on-chip A/B: 30.6 -> 30.4
            # ms/frame end-to-end. Normalize/pad run on the merged axis and
            # the final (Hp, Wp, 3) view is a free reshape.
            from ..ops.resize import resize_bilinear_packed
            x = image_u8
            if self.input_format == "RGB":
                x = x[..., ::-1]  # defaults.py:81-83
            y = resize_bilinear_packed(x, (h1, w1), scale=(k, k))
            y = y.reshape(h1, w1 * 3)
            y = jnp.clip(jnp.round(y), 0, 255)
            mean = jnp.asarray(np.tile(self.pixel_mean, w1), jnp.float32)
            std = jnp.asarray(np.tile(self.pixel_std, w1), jnp.float32)
            y = (y - mean) / std
            y = jnp.pad(y, ((0, hp - h1), (0, (wp - w1) * 3)))
            return (y.astype(compute_dtype).reshape(hp, wp, 3),
                    (h1, w1), (hp, wp))

        x = image_u8.astype(jnp.float32)
        if self.input_format == "RGB":
            # reference flips BGR->RGB channel order (defaults.py:81-83)
            x = x[..., ::-1]
        from ..ops.resize import resize_bilinear_smallc
        # 3-channel W-axis gathers waste 125/128 lanes; the transposed-pass
        # variant is bit-exact and much faster (ops/resize.py)
        x = resize_bilinear_smallc(x, (h1, w1), scale=(k, k))
        # reference resizes the uint8 tensor -> quantized output
        x = jnp.clip(jnp.round(x), 0, 255)
        x = (x - self.pixel_mean) / self.pixel_std
        x = jnp.pad(x, ((0, hp - h1), (0, wp - w1), (0, 0)))
        return x.astype(compute_dtype), (h1, w1), (hp, wp)

    def forward_stage1(self, params: Dict, image_u8: jnp.ndarray,
                       compute_dtype=jnp.float32, min_size: int = None,
                       max_size: int = None):
        """Preprocess -> backbone -> RPN -> box stage -> box postprocess.
        Returns (result dict without densepose, features, boxes_net) where
        ``boxes_net`` are the detection boxes in network (resized) coords used
        by the DensePose pooler. ``min_size``/``max_size``: static test-
        resolution override for TTA views."""
        from .roi_heads import box_stage_forward
        cfg = self.cfg
        h0, w0 = image_u8.shape[0], image_u8.shape[1]
        x, (h1, w1), (hp, wp) = self.preprocess(image_u8, (h0, w0), compute_dtype,
                                                min_size, max_size)

        _, bb_forward, _ = backbone_fns(cfg)
        features = bb_forward(params, x, cfg)
        proposals, obj_logits, pvalid = rpn_forward(params, features, (hp, wp), cfg)
        if cfg.MODEL.ROI_HEADS.NAME == "Res5ROIHeads":
            from .res5_roi_heads import res5_forward
            boxes_net, scores, classes, dvalid = res5_forward(
                params, features, proposals, pvalid, cfg)
        else:
            boxes_net, scores, classes, dvalid = box_stage_forward(
                params, features, proposals, pvalid, cfg)

        # detector_postprocess (postprocessing.py:11-61): rescale to the
        # original resolution, drop empty, clip with correct (H, W) order
        scale_x = w0 / w1
        scale_y = h0 / h1
        boxes = boxes_net * jnp.asarray([scale_x, scale_y, scale_x, scale_y], jnp.float32)
        keep = nonempty_boxes(boxes)
        valid = dvalid & keep
        boxes = clip_boxes(boxes, (h0, w0))

        result = {
            "image_size": jnp.asarray([h0, w0], jnp.int32),
            "pred_boxes": boxes,
            "scores": scores,
            "pred_classes": classes,
            "valid": valid,
            "num_instances": valid.sum().astype(jnp.int32),
        }
        result["det_packed"] = self.pack_detections(result)
        return result, features, boxes_net

    @staticmethod
    def pack_detections(result: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """One (D+1, 7) f32 array carrying every small detection output, so
        a streaming consumer fetches ONE array instead of six — on a
        remote-tunnel link each device->host fetch costs ~an RTT, which
        dominates the serving video loop. Rows 0..D-1:
        [x1, y1, x2, y2, score, class, valid]; final row:
        [num_instances, H, W, 0, 0, 0, 0]. Every value is exactly
        representable in f32 (boxes/scores already are; classes, sizes and
        counts are small ints), so ``predictor.numpy_outputs``'s unpack is
        bit-exact vs fetching the individual arrays (tested)."""
        packed = jnp.concatenate([
            result["pred_boxes"].astype(jnp.float32),
            result["scores"].astype(jnp.float32)[:, None],
            result["pred_classes"].astype(jnp.float32)[:, None],
            result["valid"].astype(jnp.float32)[:, None],
        ], axis=1)
        header = jnp.concatenate([
            result["num_instances"].astype(jnp.float32)[None],
            result["image_size"].astype(jnp.float32),
            jnp.zeros((4,), jnp.float32)])
        return jnp.concatenate([packed, header[None]], axis=0)

    def forward_densepose(self, params: Dict, features: Dict,
                          boxes_net: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """DensePose stage on given network-coordinate boxes (any count —
        the predictor buckets this for latency)."""
        from .roi_heads import densepose_stage_forward
        dp = densepose_stage_forward(params, features, boxes_net, self.cfg)
        return {f"pred_densepose_{k}": v for k, v in dp.items()}

    def resnet_prefix(self):
        """Param prefix of the ResNet bottom-up, or None for non-ResNet
        backbones (the int8 backbone mode only applies to bottlenecks)."""
        name = self.cfg.MODEL.BACKBONE.NAME
        if name in ("build_resnet_fpn_backbone",
                    "build_retinanet_resnet_fpn_backbone"):
            return "backbone.bottom_up"
        if name == "build_resnet_backbone":
            return "backbone"
        return None

    def preprocess_bucketed(self, canvas_u8: jnp.ndarray, h1, w1,
                            compute_dtype=jnp.float32) -> jnp.ndarray:
        """Normalize a bucket canvas whose top-left (h1, w1) region holds the
        HOST-resized image (ops/resize.py::resize_bilinear_np — bit-identical
        to the in-graph resize) and whose remainder is zero. ``h1``/``w1``
        are traced scalars; the dynamic mask reproduces jnp.pad's zeros
        exactly, so inside the minimal-pad extent the tensor is bitwise what
        ``preprocess`` would produce."""
        hb, wb, _ = canvas_u8.shape
        x = canvas_u8.astype(jnp.float32)
        x = (x - self.pixel_mean) / self.pixel_std
        row = jnp.arange(hb)[:, None, None] < h1
        col = jnp.arange(wb)[None, :, None] < w1
        return jnp.where(row & col, x, 0.0).astype(compute_dtype)

    def forward_bucketed(self, params: Dict, canvas_u8: jnp.ndarray,
                         sizes: jnp.ndarray, compute_dtype=jnp.float32,
                         switched_densepose: bool = False,
                         device_postprocess: bool = False) -> Dict[str, jnp.ndarray]:
        """Full inference from a geometry-bucket canvas: one compiled graph
        per PADDED bucket shape serves every input size mapping into it
        (SURVEY section 7.3 hard-part 4, VERDICT r3 #4 — without this, a
        directory of mixed-size photos costs one multi-minute compile per
        distinct (H0, W0)).

        ``canvas_u8``: (HB, WB, 3) uint8, top-left (h1, w1) = the host-
        resized image (already in network channel order), rest zero.
        ``sizes``: int32 (4,) = [h0, w0, h1, w1] — traced VALUES; shapes
        stay static, so clips/rescales on them compile once per bucket.

        Parity contract (tests/test_bucketing.py): the normalized input is
        bitwise-equal to the per-shape graph's inside the minimal-pad
        extent, and pad-region anchors are masked out of the RPN pool — the
        remaining divergence is the wider zero border's conv-boundary
        effect, the same class the reference itself accepts when its
        batching pads images to a common size (ImageList.from_tensors), and
        is envelope-bounded rather than exact."""
        from .roi_heads import box_stage_forward
        cfg = self.cfg
        h0, w0, h1, w1 = sizes[0], sizes[1], sizes[2], sizes[3]
        x = self.preprocess_bucketed(canvas_u8, h1, w1, compute_dtype)

        _, bb_forward, _ = backbone_fns(cfg)
        features = bb_forward(params, x, cfg)
        div = size_divisibility(cfg)
        hp = ((h1 + div - 1) // div) * div   # minimal-pad extent (traced)
        wp = ((w1 + div - 1) // div) * div
        hp_f, wp_f = hp.astype(jnp.float32), wp.astype(jnp.float32)
        proposals, obj_logits, pvalid = rpn_forward(
            params, features, (hp_f, wp_f), cfg,
            anchor_valid_hw=(hp_f, wp_f))
        if cfg.MODEL.ROI_HEADS.NAME == "Res5ROIHeads":
            from .res5_roi_heads import res5_forward
            boxes_net, scores, classes, dvalid = res5_forward(
                params, features, proposals, pvalid, cfg)
        else:
            boxes_net, scores, classes, dvalid = box_stage_forward(
                params, features, proposals, pvalid, cfg)

        scale_x = w0.astype(jnp.float32) / w1.astype(jnp.float32)
        scale_y = h0.astype(jnp.float32) / h1.astype(jnp.float32)
        boxes = boxes_net * jnp.stack([scale_x, scale_y, scale_x, scale_y])
        keep = nonempty_boxes(boxes)
        valid = dvalid & keep
        boxes = clip_boxes(boxes, (h0.astype(jnp.float32),
                                   w0.astype(jnp.float32)))

        result = {
            "image_size": jnp.stack([h0, w0]),
            "pred_boxes": boxes,
            "scores": scores,
            "pred_classes": classes,
            "valid": valid,
            "num_instances": valid.sum().astype(jnp.int32),
        }
        result["det_packed"] = self.pack_detections(result)
        if cfg.MODEL.DENSEPOSE_ON:
            if switched_densepose:
                dp = self.forward_densepose_switched(
                    params, features, boxes_net, result["num_instances"])
            else:
                dp = self.forward_densepose(params, features, boxes_net)
            if device_postprocess and "pred_densepose_u" in dp:
                dp = self.device_postprocess(dp)
            result.update(dp)
        return result

    def forward_int8_calibration(self, params: Dict, image_u8: jnp.ndarray,
                                 compute_dtype=jnp.float32,
                                 stat: str = "max") -> Dict[str, jnp.ndarray]:
        """Full fp pass collecting a per-quantization-site activation
        statistic: ``stat="max"`` seeds the static int8 scales
        (predictor.calibrate_int8); ``stat="sat"`` measures the fraction of
        values outside the installed clip range
        (predictor.saturation_report). Groups: ``head`` — the DensePose
        stacked-conv inputs (TPU.INT8_HEAD), ``backbone`` — the per-block
        quantization sites (TPU.INT8_BACKBONE), ``fpn`` — FPN output-conv +
        RPN-conv inputs."""
        cfg = self.cfg
        out = {}
        if ((getattr(cfg.TPU, "INT8_HEAD", False)
             or getattr(cfg.TPU, "INT8_PREDICTOR", False))
                and cfg.MODEL.DENSEPOSE_ON):
            from .roi_heads import densepose_stacked_calibration
            _, features, boxes_net = self.forward_stage1(
                params, image_u8, compute_dtype)
            out["head"] = densepose_stacked_calibration(
                params, features, boxes_net, cfg, stat=stat)
        prefix = self.resnet_prefix()
        if (getattr(cfg.TPU, "INT8_BACKBONE", False) and prefix is not None
                and cfg.MODEL.RESNETS.DEPTH >= 50):
            from .resnet import resnet_int8_calibration
            h0, w0 = image_u8.shape[0], image_u8.shape[1]
            x, _, _ = self.preprocess(image_u8, (h0, w0), compute_dtype)
            out["backbone"] = resnet_int8_calibration(params, x, cfg, prefix,
                                                      stat=stat)
        if ((getattr(cfg.TPU, "INT8_BACKBONE", False)
             or getattr(cfg.TPU, "INT8_RPN", False))
                and cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone"):
            from .fpn import fpn_int8_calibration
            h0, w0 = image_u8.shape[0], image_u8.shape[1]
            x, _, _ = self.preprocess(image_u8, (h0, w0), compute_dtype)
            out["fpn"] = fpn_int8_calibration(params, x, cfg, stat=stat)
        if (getattr(cfg.TPU, "INT8_BACKBONE", False)
                and cfg.MODEL.BACKBONE.NAME == "build_hrfpn_backbone"):
            from .hrnet import hrnet_int8_calibration
            h0, w0 = image_u8.shape[0], image_u8.shape[1]
            x, _, _ = self.preprocess(image_u8, (h0, w0), compute_dtype)
            out["hrnet"] = hrnet_int8_calibration(params, x, cfg, stat=stat)
        return out

    def forward_densepose_switched(self, params: Dict, features: Dict,
                                   boxes_net: jnp.ndarray,
                                   num_valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """DensePose stage with in-graph detection-count bucketing.

        ``lax.switch`` picks the smallest bucket covering the live detection
        count; XLA:TPU executes only the taken branch, so sparse frames skip
        most of the worst-case per-instance head FLOPs with NO host sync
        (unlike the two-stage TPU.BUCKETED_DENSEPOSE path). Outputs are
        zero-padded to the full slot count, so every branch returns the same
        shapes and results are bitwise equal to the monolithic graph on the
        valid prefix."""
        import jax
        from .roi_heads import densepose_stage_forward

        d = boxes_net.shape[0]
        buckets = [b for b in (8, 32) if b < d] + [d]

        def make_branch(b):
            def branch(_):
                dp = densepose_stage_forward(params, features, boxes_net[:b], self.cfg)
                out = {}
                for k, v in dp.items():
                    pad = d - v.shape[0]
                    if pad:
                        v = jnp.concatenate(
                            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0)
                    out[f"pred_densepose_{k}"] = v
                return out
            return branch

        idx = sum(jnp.asarray(num_valid > b, jnp.int32) for b in buckets[:-1])
        return jax.lax.switch(idx, [make_branch(b) for b in buckets], None)

    @staticmethod
    def device_postprocess(dp: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Fuse the per-instance DensePose extraction into the graph
        (BASELINE north star: 'coarse+fine segm argmax, UV resample' fused).

        Collapses the (D, H, W, 77) SIUV logit maps into
        ``pred_densepose_labels`` (D, H, W) int32 and ``pred_densepose_uv``
        (D, H, W, 2) at the heatmap grid — ~20x less device->host traffic;
        the host only rescales to the box (visualizer). Chart models only.

        NOTE (parity): the reference argmaxes AFTER resizing logits to the
        box (visualizer.py:10-17); here argmax happens at grid resolution and
        the label map is resized instead — boundaries can shift by <=1 px at
        box scale. The raw-maps mode (TPU.DEVICE_POSTPROCESS=False)
        reproduces the reference exactly.
        """
        coarse = dp["pred_densepose_coarse_segm"].astype(jnp.float32)
        fine = dp["pred_densepose_fine_segm"].astype(jnp.float32)
        u = dp["pred_densepose_u"]
        v = dp["pred_densepose_v"]
        fg = jnp.argmax(coarse, axis=-1) > 0
        labels = jnp.argmax(fine, axis=-1).astype(jnp.int32) * fg
        lab = labels[..., None]
        u_sel = jnp.take_along_axis(u, lab, axis=-1)[..., 0]
        v_sel = jnp.take_along_axis(v, lab, axis=-1)[..., 0]
        uv = jnp.stack([jnp.where(fg, u_sel, 0), jnp.where(fg, v_sel, 0)], axis=-1)
        # labels fit in uint8 (<= 24 parts) and UV in half precision — the
        # host only colormaps/rescales these, so shrink the transfer 4x
        out = {
            "pred_densepose_labels": labels.astype(jnp.uint8),
            "pred_densepose_uv": uv.astype(jnp.float16),
        }
        # extra maps (TPU.EMIT_CONFIDENCES) ride through untouched
        siuv = {"pred_densepose_coarse_segm", "pred_densepose_fine_segm",
                "pred_densepose_u", "pred_densepose_v"}
        out.update({k: v_ for k, v_ in dp.items() if k not in siuv})
        return out

    def forward(self, params: Dict, image_u8: jnp.ndarray,
                compute_dtype=jnp.float32,
                switched_densepose: bool = False,
                device_postprocess: bool = False) -> Dict[str, jnp.ndarray]:
        """Full single-image inference as one jit graph. With
        ``switched_densepose`` the DensePose stage buckets on the live
        detection count via lax.switch (device-side, no sync)."""
        result, features, boxes_net = self.forward_stage1(
            params, image_u8, compute_dtype)
        if self.cfg.MODEL.DENSEPOSE_ON:
            if switched_densepose:
                dp = self.forward_densepose_switched(
                    params, features, boxes_net, result["num_instances"])
            else:
                dp = self.forward_densepose(params, features, boxes_net)
            if device_postprocess and "pred_densepose_u" in dp:
                dp = self.device_postprocess(dp)
            result.update(dp)
        return result

    # -- jit entry ----------------------------------------------------------
    def jit_forward(self, compute_dtype=jnp.float32, switched_densepose=False,
                    device_postprocess=False):
        """Returns a jitted fn(params, image_u8). One compile per image shape
        (the shape bucket cache lives in predictor.DensePosePredictor)."""
        fwd = partial(self.forward, compute_dtype=compute_dtype,
                      switched_densepose=switched_densepose,
                      device_postprocess=device_postprocess)
        return jax.jit(fwd)


def sem_seg_postprocess(result: jnp.ndarray, img_size, output_height: int,
                        output_width: int) -> jnp.ndarray:
    """Twin of the reference's semantic-segmentation postprocess
    (detectron2/modeling/postprocessing.py:64-87): crop the padded logit
    map to the valid (pre-padding) region, then bilinear-resize
    (align_corners=False) to the original image resolution. Vestigial —
    no DensePose config builds a semantic segmentor — kept so every
    reference component has a functional twin.

    ``result`` is channel-last (H, W, C) in this framework (the reference
    takes (C, H, W)); ``img_size`` is (h, w) of the un-padded input.
    Shapes are static python ints, so the crop and resize trace cleanly
    under jit.
    """
    from ..ops import resize_bilinear
    result = result[: img_size[0], : img_size[1], :]
    return resize_bilinear(result, (int(output_height), int(output_width)))
