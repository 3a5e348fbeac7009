"""DensePosePredictor: the user-facing inference engine.

Replaces the reference's ``DefaultPredictor`` + TorchScript artifact
(engine/defaults.py:50-97): builds the model from a config, loads a
detectron2 ``.pkl`` (or our ``.npz`` export) straight into a JAX pytree, and
serves ``predictor(image_bgr_u8) -> outputs`` with an internal jit cache
keyed by the static input-shape bucket.

Differences by design (TPU-first):
* one compile per (H0, W0) input shape; video streams hit a single entry,
* compute dtype policy: float32 (parity), bfloat16 (TPU-fast) or float16
  (mirrors the reference's --fp16 export; fp32 islands at box decode and
  NMS match nms.py:19-20 / box_regression.py:84),
* outputs are fixed-size arrays + ``num_instances``; ``numpy_outputs``
  trims to the valid detections and transposes DensePose maps to the
  reference's NCHW layout for drop-in host-side consumers.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint.pkl_loader import align_state_dicts, load_checkpoint_file
from .checkpoint.transform import random_torch_state, torch_state_to_jax
from .models.rcnn import GeneralizedRCNN, build_model

logger = logging.getLogger(__name__)


def enable_compilation_cache(path: str = "~/.cache/densepose_tpu/xla") -> None:
    """Persist XLA executables across processes — the analogue of the
    reference's saved TorchScript artifact containing the compiled graph.
    Safe to call multiple times."""
    import os
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax without the knobs
        logger.warning("compilation cache unavailable: %s", e)


_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def load_params(cfg, weights_path: Optional[str] = None, seed: int = 0,
                model: Optional[GeneralizedRCNN] = None) -> Dict[str, np.ndarray]:
    """cfg + checkpoint -> JAX-layout param dict (host numpy).

    Follows the reference load stack (SURVEY.md section 3.4): pkl ->
    (optional c2 rename) -> suffix alignment against the model's key set ->
    layout transform (+FrozenBN folding per cfg.TPU.FOLD_FROZEN_BN).
    """
    model = model or build_model(cfg)
    spec = model.spec()
    if weights_path:
        ckpt, needs_c2 = load_checkpoint_file(weights_path)
        shapes = {k: v.shape for k, v in spec.items()}
        torch_state = align_state_dicts(list(spec.keys()), shapes, ckpt, needs_c2)
        matched = len(torch_state)
        logger.info("checkpoint: matched %d/%d params", matched, len(spec))
    else:
        torch_state = random_torch_state(spec, seed=seed)
    return torch_state_to_jax(torch_state, spec, fold_bn=cfg.TPU.FOLD_FROZEN_BN)


class DensePosePredictor:
    def __init__(self, cfg, weights_path: Optional[str] = None,
                 params: Optional[Dict] = None, seed: int = 0):
        import os
        if os.environ.get("DENSEPOSE_TPU_COMPILE_CACHE"):
            enable_compilation_cache()
        self.cfg = cfg
        self.model = build_model(cfg)
        self.compute_dtype = _DTYPES[cfg.TPU.COMPUTE_DTYPE]
        if params is None:
            params = load_params(cfg, weights_path, seed=seed, model=self.model)
        else:
            params = dict(params)  # augmentation must not leak into callers
        self.model.augment_params_host(params)
        if self.compute_dtype != jnp.float32:
            params = {k: self._cast_param(k, v) for k, v in params.items()}
        self.params = jax.device_put(
            {k: jnp.asarray(v) for k, v in params.items()})
        self._jit_cache: Dict[Tuple[int, int], callable] = {}
        self._stage1_cache: Dict[Tuple[int, int], callable] = {}
        self._stage2_cache: Dict[int, callable] = {}
        self.bucketed = bool(cfg.TPU.BUCKETED_DENSEPOSE) and cfg.MODEL.DENSEPOSE_ON
        self.geometry_quant = int(getattr(cfg.TPU, "GEOMETRY_BUCKET_QUANT", 0))
        if self.geometry_quant:
            from .models.rcnn import size_divisibility
            div = size_divisibility(cfg)
            assert self.geometry_quant % div == 0, (
                f"TPU.GEOMETRY_BUCKET_QUANT must be a multiple of the "
                f"backbone size divisibility ({div})")
            assert not self.bucketed, (
                "TPU.GEOMETRY_BUCKET_QUANT uses the one-graph forward; "
                "disable TPU.BUCKETED_DENSEPOSE (TPU.SWITCHED_DENSEPOSE "
                "provides in-graph detection bucketing)")
        d = cfg.TEST.DETECTIONS_PER_IMAGE
        self.buckets = sorted({b for b in (8, 16, 32, 64) if b < d} | {d})
        self._int8_needed = (((bool(getattr(cfg.TPU, "INT8_HEAD", False))
                               or bool(getattr(cfg.TPU, "INT8_PREDICTOR",
                                               False)))
                              and cfg.MODEL.DENSEPOSE_ON)
                             or (bool(getattr(cfg.TPU, "INT8_BACKBONE", False))
                                 and ((self.model.resnet_prefix() is not None
                                       and cfg.MODEL.RESNETS.DEPTH >= 50)
                                      # the FPN output convs quantize at any
                                      # depth (fpn.py::fpn_int8_active has no
                                      # depth gate; only the bottleneck path
                                      # requires depth >= 50)
                                      or cfg.MODEL.BACKBONE.NAME
                                      in ("build_resnet_fpn_backbone",
                                          "build_hrfpn_backbone")))
                             or (bool(getattr(cfg.TPU, "INT8_RPN", False))
                                 and cfg.MODEL.BACKBONE.NAME
                                 == "build_resnet_fpn_backbone"))
        self._int8_ready = False
        # provenance of the installed scales: None | "explicit" | "sidecar"
        # | "auto-single-frame" (the footgun saturation_report diagnoses)
        self.calibration_source = None
        # offline-calibrated deployments: a <weights>.calib.json sidecar
        # (export.py --calib / save_calibration) restores the int8 scales
        # without a runtime calibration pass
        if (self._int8_needed and weights_path
                and os.path.exists(weights_path + ".calib.json")):
            # a stale/partial/corrupt sidecar must not make the predictor
            # unconstructible — fall back to runtime calibration and warn
            # (explicit load_calibration() calls stay strict)
            try:
                self.load_calibration(weights_path + ".calib.json")
                self.calibration_source = "sidecar"
            except ValueError as e:
                logger.warning(
                    "ignoring calibration sidecar %s (%s); falling back to "
                    "runtime auto-calibration", weights_path + ".calib.json", e)

    def _cast_param(self, name: str, v: np.ndarray):
        # Weights participating in MXU work go to the compute dtype; the fp32
        # islands (box decode, NMS, softmax) upcast their inputs themselves.
        if v.dtype == np.float32:
            return np.asarray(v, dtype=jnp.dtype(self.compute_dtype))
        return v

    def _get_fn(self, shape_hw: Tuple[int, int]):
        fn = self._jit_cache.get(shape_hw)
        if fn is None:
            fn = self.model.jit_forward(
                compute_dtype=self.compute_dtype,
                switched_densepose=bool(self.cfg.TPU.SWITCHED_DENSEPOSE),
                device_postprocess=bool(self.cfg.TPU.DEVICE_POSTPROCESS))
            self._jit_cache[shape_hw] = fn
        return fn

    def calibrate_int8(self, frames) -> None:
        """Set the static int8 activation scales for the DensePose head from
        representative frames (TensorRT-style post-training calibration):
        one fp pass per frame records each stacked conv's input max-abs;
        scales and per-channel-quantized weights then live in ``params`` and
        the head compiles as an s8 chain with s32 bias+ReLU and a single
        requant multiply per layer (ops/conv.py::conv2d_int8_chain).

        Auto-runs on the first frame when TPU.INT8_HEAD is set and this was
        never called; call explicitly with a calibration set for better
        scale coverage."""
        assert self._int8_needed, "no TPU.INT8_* mode is enabled"
        import re
        from functools import partial

        fn = jax.jit(partial(self.model.forward_int8_calibration,
                             compute_dtype=self.compute_dtype))
        mx = {}
        for f in frames:
            m = fn(self.params, jnp.asarray(np.asarray(f)))
            for k, v in m.items():
                v = np.asarray(v, dtype=np.float32)
                mx[k] = v if k not in mx else np.maximum(mx[k], v)
        params = dict(self.params)
        quant_bases = []  # conv names whose .weight gets a qweight/wscale
        if "head" in mx:
            n = self.cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
            int8_pred = bool(getattr(self.cfg.TPU, "INT8_PREDICTOR", False))
            assert len(mx["head"]) == n + int(int8_pred), (len(mx["head"]), n)
            if getattr(self.cfg.TPU, "INT8_HEAD", False):
                for i in range(n):
                    nm = f"roi_heads.densepose_head.body_conv_fcn{i + 1}"
                    quant_bases.append(nm)
                    params[f"{nm}.in_scale"] = np.float32(
                        max(float(mx["head"][i]) / 127.0, 1e-8))
            if int8_pred:
                pp = "roi_heads.densepose_predictor"
                chart_heads = ["ann_index_lowres", "index_uv_lowres",
                               "u_lowres", "v_lowres"]
                if all(f"{pp}.{h}.weight" in params for h in chart_heads):
                    params[f"{pp}.in_scale"] = np.float32(
                        max(float(mx["head"][n]) / 127.0, 1e-8))
                    quant_bases += [f"{pp}.{h}" for h in chart_heads]
        if "backbone" in mx:
            from .models.resnet import resnet_int8_scale_sites
            prefix = self.model.resnet_prefix()
            sites = resnet_int8_scale_sites(self.cfg, prefix)
            assert len(mx["backbone"]) == len(sites), (
                len(mx["backbone"]), len(sites))
            for name, m in zip(sites, mx["backbone"]):
                params[name] = np.float32(max(float(m) / 127.0, 1e-8))
            pat = re.compile(re.escape(prefix)
                             + r"\.res[2-5]\.\d+\.(conv[123]|shortcut)\.weight$")
            quant_bases += [k[:-len(".weight")] for k in params if pat.match(k)]
        if "hrnet" in mx:
            from .models.hrnet import (hrnet_int8_quant_bases,
                                       hrnet_int8_scale_sites)
            sites = hrnet_int8_scale_sites(self.cfg)
            assert len(mx["hrnet"]) == len(sites), (
                len(mx["hrnet"]), len(sites))
            for name, m in zip(sites, mx["hrnet"]):
                params[name] = np.float32(max(float(m) / 127.0, 1e-8))
            quant_bases += hrnet_int8_quant_bases(self.cfg, params)
        if "fpn" in mx:
            from .models.fpn import fpn_int8_scale_sites
            fpn_sites, rpn_sites = fpn_int8_scale_sites(self.cfg)
            assert len(mx["fpn"]) == len(fpn_sites) + len(rpn_sites), (
                len(mx["fpn"]), len(fpn_sites), len(rpn_sites))
            fvals = mx["fpn"][:len(fpn_sites)]
            rvals = mx["fpn"][len(fpn_sites):]
            if getattr(self.cfg.TPU, "INT8_BACKBONE", False):
                for name, m in zip(fpn_sites, fvals):
                    params[name] = np.float32(max(float(m) / 127.0, 1e-8))
                quant_bases += [s[:-len(".in_scale")] for s in fpn_sites]
            if getattr(self.cfg.TPU, "INT8_RPN", False):
                for name, m in zip(rpn_sites, rvals):
                    params[name] = np.float32(max(float(m) / 127.0, 1e-8))
                quant_bases.append("proposal_generator.rpn_head.conv")
        self._quantize_install(params, quant_bases)
        self.calibration_source = "explicit"

    def _group_sites(self, group: str, count: int):
        """Ordered activation-scale param names for one calibration group
        (the name<->vector-position mapping calibrate_int8 uses inline)."""
        cfg = self.cfg
        if group == "head":
            n = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
            names = [f"roi_heads.densepose_head.body_conv_fcn{i + 1}.in_scale"
                     for i in range(n)]
            if count == n + 1:  # TPU.INT8_PREDICTOR adds the deconv input
                names.append("roi_heads.densepose_predictor.in_scale")
        elif group == "backbone":
            from .models.resnet import resnet_int8_scale_sites
            names = resnet_int8_scale_sites(cfg, self.model.resnet_prefix())
        elif group == "fpn":
            from .models.fpn import fpn_int8_scale_sites
            fpn_sites, rpn_sites = fpn_int8_scale_sites(cfg)
            names = fpn_sites + rpn_sites
        elif group == "hrnet":
            from .models.hrnet import hrnet_int8_scale_sites
            names = hrnet_int8_scale_sites(cfg)
        else:
            raise KeyError(group)
        assert len(names) == count, (group, len(names), count)
        return names

    def saturation_report(self, frames) -> Dict[str, float]:
        """Fraction of activation values outside the installed int8 clip
        range (|x| > 127 * scale) per quantization site, maxed over
        ``frames`` — the diagnostic for out-of-calibration-range inputs
        (e.g. a frame hotter than the single auto-calibration frame).
        Sites whose INT8 group is disabled report 0. Anything much above
        ~1e-3 on a representative set means recalibrate with more frames."""
        assert self._int8_ready, "no int8 calibration installed"
        from functools import partial
        fn = jax.jit(partial(self.model.forward_int8_calibration,
                             compute_dtype=self.compute_dtype, stat="sat"))
        agg: Dict[str, np.ndarray] = {}
        for f in frames:
            m = fn(self.params, jnp.asarray(np.asarray(f)))
            for g, v in m.items():
                v = np.asarray(v, np.float32)
                agg[g] = v if g not in agg else np.maximum(agg[g], v)
        report = {}
        for g, vec in agg.items():
            for name, v in zip(self._group_sites(g, len(vec)), vec):
                if name in self.params:  # only sites actually quantized
                    report[name[:-len(".in_scale")] if name.endswith(".in_scale")
                           else name] = float(v)
        return report

    def _quantize_install(self, params: Dict, quant_bases) -> None:
        """Per-channel-quantize ``quant_bases``'s conv weights and install
        the updated param dict; shared tail of calibrate_int8 and
        load_calibration."""
        from .ops.conv import quantize_weight_int8
        # quantize every weight in ONE jitted dict->dict call: eager op
        # dispatch through the axon tunnel is ~seconds per op, and the
        # backbone alone has ~53 convs (measured: per-conv eager quantization
        # stalled calibration for many minutes)
        qfn = jax.jit(lambda ws: {k: quantize_weight_int8(w)
                                  for k, w in ws.items()})
        qres = qfn({b: params[f"{b}.weight"] for b in quant_bases})
        for b, (qw, sw) in qres.items():
            params[f"{b}.qweight"] = qw
            params[f"{b}.wscale"] = sw
        self.params = jax.device_put(params)
        # the param pytree changed shape: every cached jit must re-trace
        self._jit_cache.clear()
        self._stage1_cache.clear()
        self._stage2_cache.clear()
        self._int8_ready = True

    def _int8_quant_bases(self, params: Dict):
        """Conv base names to quantize, derived from which ``.in_scale``
        activation-scale entries are present in ``params``. Mirrors the
        bookkeeping calibrate_int8 does inline (scales are only ever
        installed group-at-a-time, so presence identifies the group);
        tests pin the two code paths to each other
        (tests/test_int8.py::test_calibration_save_load_roundtrip)."""
        import re
        bases = []
        n = self.cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
        for i in range(n):
            nm = f"roi_heads.densepose_head.body_conv_fcn{i + 1}"
            if f"{nm}.in_scale" in params:
                bases.append(nm)
        pp = "roi_heads.densepose_predictor"
        if f"{pp}.in_scale" in params:
            bases += [f"{pp}.{h}" for h in ("ann_index_lowres",
                                            "index_uv_lowres",
                                            "u_lowres", "v_lowres")]
        prefix = self.model.resnet_prefix()
        if prefix is not None:
            from .models.resnet import resnet_int8_scale_sites
            sites = resnet_int8_scale_sites(self.cfg, prefix)
            if sites and all(s in params for s in sites):
                pat = re.compile(
                    re.escape(prefix)
                    + r"\.res[2-5]\.\d+\.(conv[123]|shortcut)\.weight$")
                bases += [k[:-len(".weight")] for k in params if pat.match(k)]
        if self.cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone":
            from .models.fpn import fpn_int8_scale_sites
            fpn_sites, rpn_sites = fpn_int8_scale_sites(self.cfg)
            if fpn_sites and all(s in params for s in fpn_sites):
                bases += [s[:-len(".in_scale")] for s in fpn_sites]
            if rpn_sites and all(s in params for s in rpn_sites):
                bases.append("proposal_generator.rpn_head.conv")
        if self.cfg.MODEL.BACKBONE.NAME == "build_hrfpn_backbone":
            from .models.hrnet import (hrnet_int8_quant_bases,
                                       hrnet_int8_scale_sites)
            sites = hrnet_int8_scale_sites(self.cfg)
            if sites and all(s in params for s in sites):
                bases += hrnet_int8_quant_bases(self.cfg, params)
        return bases

    def export_calibration(self) -> Dict[str, float]:
        """The int8 activation scales as a plain {param_name: float} dict
        (only meaningful after calibrate_int8/load_calibration). Emits only
        the scales belonging to the TPU.INT8_* groups this config enables —
        stray scales (e.g. from a stale sidecar that auto-loaded before
        recalibration) must not propagate into fresh sidecars."""
        assert self._int8_ready, "calibrate_int8 was never run"
        allowed = set(self._required_scale_keys(self.params))
        return {k: float(np.asarray(v)) for k, v in self.params.items()
                if (k.endswith(".in_scale") or ".in_scale_" in k)
                and k in allowed}

    def save_calibration(self, path: str) -> None:
        """Persist the int8 activation scales as JSON. Calibrate once
        offline with a representative frame set, ship the sidecar next to
        the weights bundle (``<bundle>.calib.json`` auto-loads), and
        deployment never pays nor depends on a runtime calibration pass —
        the per-channel weight quantization is deterministic and is
        recomputed from the weights at load."""
        import json
        with open(path, "w") as f:
            json.dump({"format": "densepose-tpu-int8-calib",
                       "scales": self.export_calibration()}, f, indent=1)

    def load_calibration(self, source) -> None:
        """Install activation scales saved by :meth:`save_calibration`
        (a path or a {name: float} dict) and quantize weights. With the
        same scales this reproduces calibrate_int8's params bit-for-bit,
        without running a calibration forward."""
        import json
        assert self._int8_needed, "no TPU.INT8_* mode is enabled"
        if isinstance(source, str):
            with open(source) as f:
                try:
                    data = json.load(f)
                except json.JSONDecodeError as e:
                    raise ValueError(f"corrupt calibration file {source}: {e}")
            if not isinstance(data, dict):
                raise ValueError(
                    f"calibration file {source} is not a JSON object")
            fmt = data.get("format")
            if fmt is not None and fmt != "densepose-tpu-int8-calib":
                raise ValueError(f"unrecognized calibration format: {fmt!r}")
            scales = data.get("scales", data)
            if not isinstance(scales, dict):
                raise ValueError(
                    f"calibration file {source}: 'scales' is not a dict")
        else:
            scales = dict(source)
        params = dict(self.params)
        # install only the scales belonging to groups this config enables —
        # a sidecar from a differently-configured export must not leave dead
        # in_scale/qweight params around (nor re-export them later)
        enabled = set(self._required_scale_keys(params))
        ignored = 0
        for k, v in scales.items():
            if not (k.endswith(".in_scale") or ".in_scale_" in k):
                raise ValueError(f"not an activation-scale key: {k}")
            if k not in enabled:
                ignored += 1
                continue
            params[k] = np.float32(max(float(v), 1e-8))
        if ignored:
            logger.info("load_calibration: ignored %d scales for TPU.INT8_* "
                        "modes this config does not enable", ignored)
        self._check_calibration_complete(params)
        bases = self._int8_quant_bases(params)
        if not bases:
            raise ValueError(
                "calibration contains no usable scales for this config")
        missing = [b for b in bases if f"{b}.weight" not in params]
        if missing:
            raise ValueError(
                f"calibration does not match this model: {missing[:3]}")
        self._quantize_install(params, bases)
        self.calibration_source = "explicit"

    def _required_scale_keys(self, params: Dict):
        """Activation-scale param names the enabled TPU.INT8_* modes consume
        — exactly the set calibrate_int8 installs for this config. Used both
        to validate completeness and to filter what load_calibration installs
        / export_calibration emits (scales from other modes or checkpoints
        must never leak through the sidecar)."""
        required = []
        cfg = self.cfg
        if getattr(cfg.TPU, "INT8_HEAD", False) and cfg.MODEL.DENSEPOSE_ON:
            n = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS
            required += [f"roi_heads.densepose_head.body_conv_fcn{i + 1}.in_scale"
                         for i in range(n)]
        pp = "roi_heads.densepose_predictor"
        if (getattr(cfg.TPU, "INT8_PREDICTOR", False) and cfg.MODEL.DENSEPOSE_ON
                and all(f"{pp}.{h}.weight" in params
                        for h in ("ann_index_lowres", "index_uv_lowres",
                                  "u_lowres", "v_lowres"))):
            required.append(f"{pp}.in_scale")
        prefix = self.model.resnet_prefix()
        if (getattr(cfg.TPU, "INT8_BACKBONE", False) and prefix is not None
                and cfg.MODEL.RESNETS.DEPTH >= 50):
            from .models.resnet import resnet_int8_scale_sites
            required += resnet_int8_scale_sites(cfg, prefix)
        # FPN output-conv scales are required at ANY depth: fpn_int8_active
        # (fpn.py) and forward_int8_calibration (rcnn.py) gate FPN int8 only
        # on INT8_BACKBONE + FPN backbone, with no depth gate
        if (getattr(cfg.TPU, "INT8_BACKBONE", False)
                and cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone"):
            from .models.fpn import fpn_int8_scale_sites
            required += fpn_int8_scale_sites(cfg)[0]
        if (getattr(cfg.TPU, "INT8_RPN", False)
                and cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone"):
            from .models.fpn import fpn_int8_scale_sites
            required += fpn_int8_scale_sites(cfg)[1]
        if (getattr(cfg.TPU, "INT8_BACKBONE", False)
                and cfg.MODEL.BACKBONE.NAME == "build_hrfpn_backbone"):
            from .models.hrnet import hrnet_int8_scale_sites
            required += hrnet_int8_scale_sites(cfg)
        return required

    def _check_calibration_complete(self, params: Dict) -> None:
        """Every int8 mode the config enables must be fully covered by the
        loaded scales — a partial group would silently leave some layers
        on the fp path (mirrors the per-section asserts in
        calibrate_int8)."""
        missing = [k for k in self._required_scale_keys(params)
                   if k not in params]
        if missing:
            raise ValueError(
                f"calibration is missing {len(missing)} scales required by "
                f"the enabled TPU.INT8_* modes, e.g. {missing[:3]}")

    def _auto_calibrate(self, frame) -> None:
        """Last-resort single-frame calibration when inference starts with
        TPU.INT8_* enabled but no scales installed. Loud by design: a later
        frame whose activations exceed this frame's maxima saturates at the
        clip boundary; use export.py --calib / calibrate_int8(frames) with a
        representative set, and saturation_report() to check coverage."""
        logger.warning(
            "int8 auto-calibration is running on the FIRST FRAME ONLY; "
            "frames with hotter activations will saturate at the clip "
            "boundary. Calibrate offline on a representative set "
            "(export.py --calib, or predictor.calibrate_int8(frames)) and "
            "verify with predictor.saturation_report(frames).")
        self.calibrate_int8([frame])
        self.calibration_source = "auto-single-frame"

    def stage_input(self, image_bgr_u8: np.ndarray):
        """Upload a frame to device HBM ahead of ``__call__`` — e.g. from the
        video reader thread, so the H2D transfer (the largest per-frame link
        leg on a remote tunnel) overlaps the previous frame's fetch/overlay
        instead of serializing in front of dispatch. Returns the input
        unchanged when the path needs host-side preprocessing first
        (geometry bucketing) or TTA wraps the predictor (no stage_input
        there). ``__call__`` accepts the staged array transparently."""
        if self.geometry_quant:
            return image_bgr_u8
        return jax.device_put(image_bgr_u8)

    def __call__(self, image_bgr_u8: np.ndarray) -> Dict[str, jnp.ndarray]:
        """image: (H, W, 3) uint8 BGR (the run.py contract). Returns device
        arrays (fixed-size slots + num_instances).

        With TPU.BUCKETED_DENSEPOSE the box stage runs first, the detection
        count syncs to the host, and the DensePose stage runs on the smallest
        bucket covering it — typical frames skip ~90% of the worst-case
        DensePose FLOPs at the cost of one sync."""
        assert image_bgr_u8.ndim == 3 and image_bgr_u8.shape[2] == 3, image_bgr_u8.shape
        if self._int8_needed and not self._int8_ready:
            self._auto_calibrate(image_bgr_u8)
        h, w = image_bgr_u8.shape[:2]
        if self.geometry_quant:
            return self._call_geometry_bucketed(image_bgr_u8)
        if not self.bucketed:
            fn = self._get_fn((h, w))
            return fn(self.params, jnp.asarray(image_bgr_u8))

        from functools import partial
        s1 = self._stage1_cache.get((h, w))
        if s1 is None:
            s1 = jax.jit(partial(self.model.forward_stage1,
                                 compute_dtype=self.compute_dtype))
            self._stage1_cache[(h, w)] = s1
        result, features, boxes_net = s1(self.params, jnp.asarray(image_bgr_u8))
        num = int(result["num_instances"])  # the one host sync
        bucket = next((b for b in self.buckets if b >= max(num, 1)),
                      self.buckets[-1])
        s2 = self._stage2_cache.get(bucket)
        if s2 is None:
            s2 = jax.jit(self.model.forward_densepose)
            self._stage2_cache[bucket] = s2
        # detections are score-sorted with valid slots as a prefix, so the
        # first `bucket` rows cover every valid detection
        dp = s2(self.params, features, boxes_net[:bucket])
        result = dict(result)
        result.update(dp)
        return result

    def bucketize(self, image_bgr_u8: np.ndarray):
        """Host side of the geometry-bucketed path: spec resize (numpy,
        bit-identical to the in-graph resize) + zero-pad up to the bucket.
        Returns (canvas_u8 (HB, WB, 3), sizes int32 [h0, w0, h1, w1])."""
        from .models.rcnn import compute_resize
        from .ops.resize import resize_bilinear_np
        h0, w0 = image_bgr_u8.shape[:2]
        k, h1, w1 = compute_resize(h0, w0, self.model.min_size,
                                   self.model.max_size)
        x = image_bgr_u8
        if self.model.input_format == "RGB":  # defaults.py:81-83
            x = x[:, :, ::-1]
        y = resize_bilinear_np(x, (h1, w1), scale=(k, k))
        resized = np.clip(np.rint(y), 0, 255).astype(np.uint8)
        q = self.geometry_quant
        hb = (h1 + q - 1) // q * q
        wb = (w1 + q - 1) // q * q
        canvas = np.zeros((hb, wb, 3), np.uint8)
        canvas[:h1, :w1] = resized
        return canvas, np.asarray([h0, w0, h1, w1], np.int32)

    def _call_geometry_bucketed(self, image_bgr_u8: np.ndarray):
        canvas, sizes = self.bucketize(image_bgr_u8)
        key = ("geom", canvas.shape[0], canvas.shape[1])
        fn = self._jit_cache.get(key)
        if fn is None:
            from functools import partial
            fn = jax.jit(partial(
                self.model.forward_bucketed,
                compute_dtype=self.compute_dtype,
                switched_densepose=bool(self.cfg.TPU.SWITCHED_DENSEPOSE),
                device_postprocess=bool(self.cfg.TPU.DEVICE_POSTPROCESS)))
            self._jit_cache[key] = fn
        return fn(self.params, jnp.asarray(canvas), jnp.asarray(sizes))

    def predict_numpy(self, image_bgr_u8: np.ndarray) -> Dict[str, np.ndarray]:
        return self.numpy_outputs(self(image_bgr_u8))

    def predict_batch(self, images_bgr_u8: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Batched inference over same-shaped frames (B, H, W, 3).

        On a multi-device runtime the batch is sharded over the ``data`` mesh
        axis (parallel/mesh.py); on a single chip it vmaps, amortizing
        dispatch overhead. The reference silently truncates any batch to one
        image (rcnn.py:161) — this is a new capability."""
        assert images_bgr_u8.ndim == 4 and images_bgr_u8.shape[-1] == 3
        if self._int8_needed and not self._int8_ready:
            self._auto_calibrate(images_bgr_u8[0])
        b, h, w = images_bgr_u8.shape[:3]
        key = ("batch", b, h, w)
        fn = self._jit_cache.get(key)
        if fn is None:
            n_dev = len(jax.devices())
            if n_dev > 1 and b % n_dev == 0:
                from .parallel.mesh import data_parallel_forward, make_mesh
                fn = data_parallel_forward(self.model, make_mesh(),
                                           compute_dtype=self.compute_dtype)
            else:
                from functools import partial
                fn = jax.jit(jax.vmap(
                    partial(self.model.forward, compute_dtype=self.compute_dtype),
                    in_axes=(None, 0)))
            self._jit_cache[key] = fn
        return fn(self.params, jnp.asarray(images_bgr_u8))

    # -- AOT artifact (the compiled-graph analogue of the reference's
    # TorchScript .pt, export.py:35-40) ------------------------------------
    def aot_export_bytes(self, shape_hw: Tuple[int, int],
                         platforms=None) -> bytes:
        """Serialize the compiled pipeline for a fixed input shape as a
        StableHLO artifact (jax.export). The artifact takes (params, image)
        and is loadable in a fresh process with ``aot_load`` — no model
        build or trace needed."""
        from jax import export as jax_export
        h, w = shape_hw
        fn = self.model.jit_forward(
            compute_dtype=self.compute_dtype,
            switched_densepose=bool(self.cfg.TPU.SWITCHED_DENSEPOSE),
            device_postprocess=bool(self.cfg.TPU.DEVICE_POSTPROCESS))
        params_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.params)
        img_spec = jax.ShapeDtypeStruct((h, w, 3), jnp.uint8)
        kwargs = {"platforms": platforms} if platforms else {}
        exported = jax_export.export(fn, **kwargs)(params_spec, img_spec)
        return exported.serialize()

    @staticmethod
    def aot_load(data: bytes):
        """bytes -> callable(params, image_u8) -> outputs dict."""
        from jax import export as jax_export
        exported = jax_export.deserialize(data)
        return exported.call

    @staticmethod
    def start_fetch(outputs: Dict[str, jnp.ndarray], keys=None) -> None:
        """Begin the device->host copies ``numpy_outputs`` will read, without
        blocking. Call right after dispatching the NEXT frame so the
        transfer of this one overlaps its compute — over the remote tunnel
        the copy otherwise only starts at flush time and costs ~RTT on the
        critical path. Idempotent with the async starts in
        ``numpy_outputs``."""
        if keys is not None:
            if "det_packed" in outputs:
                keep = set(keys) | {"det_packed"}
            else:
                keep = set(keys) | {"num_instances", "valid", "image_size",
                                    "pred_boxes", "scores", "pred_classes"}
            outputs = {k: v for k, v in outputs.items() if k in keep}
        for v in outputs.values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()

    @staticmethod
    def numpy_outputs(outputs: Dict[str, jnp.ndarray],
                      keys=None) -> Dict[str, np.ndarray]:
        """Trim padded slots and convert DensePose maps to the reference's
        NCHW layout (postprocessing.py:52-61 key set).

        ``keys``: optional iterable restricting which ``pred_densepose_*``
        maps are fetched from the device — the remote-tunnel D2H cost is per
        array, so a consumer that only renders labels (the fine-segm
        overlay) skips the UV/logit traffic entirely. Core detection keys
        are always fetched; when the graph emitted ``det_packed``
        (rcnn.py::pack_detections) they ride in ONE array and are unpacked
        bit-exactly here, collapsing six fetch round-trips into one."""
        if keys is not None and "det_packed" in outputs:
            keep = set(keys) | {"det_packed"}
            sub = {k: v for k, v in outputs.items() if k in keep}
            for v in sub.values():
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
            host = {k: np.asarray(v) for k, v in sub.items()}
            packed = host.pop("det_packed")
            header, body = packed[-1], packed[:-1]
            idx = np.nonzero(body[:, 6] > 0.5)[0]
            result = {
                "image_size": header[1:3].astype(np.int32),
                "num_instances": int(header[0]),
                "pred_boxes": body[idx, :4],
                "scores": body[idx, 4],
                "pred_classes": body[idx, 5].astype(np.int32),
            }
            for k, v in host.items():
                if k.startswith("pred_densepose_"):
                    sel = v[idx[idx < len(v)]]
                    result[k] = (np.transpose(sel, (0, 3, 1, 2))
                                 if sel.ndim == 4 else sel)
            return result
        if keys is not None:
            keep = set(keys) | {"num_instances", "valid", "image_size",
                                "pred_boxes", "scores", "pred_classes"}
            outputs = {k: v for k, v in outputs.items() if k in keep}
        # start every D2H together so round-trips overlap instead of
        # serializing (per-key blocking asarray measured ~RTT each over the
        # axon tunnel)
        for v in outputs.values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        out = {k: np.asarray(v) for k, v in outputs.items()}
        n = int(out.pop("num_instances"))
        valid = out.pop("valid")
        idx = np.nonzero(valid)[0]
        result = {"image_size": out["image_size"], "num_instances": n}
        for k in ("pred_boxes", "scores", "pred_classes"):
            result[k] = out[k][idx]
        for k, v in out.items():
            if k.startswith("pred_densepose_"):
                # bucketed stage-2 maps may carry fewer rows than detection
                # slots; valid detections are always a prefix
                sel = v[idx[idx < len(v)]]
                # channel-last maps go to the reference's NCHW; the
                # device-postprocess label map (N, H, W) passes through
                result[k] = (np.transpose(sel, (0, 3, 1, 2))
                             if sel.ndim == 4 else sel)
        return result
