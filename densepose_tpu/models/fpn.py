"""FPN (functional rebuild of /root/reference/detectron2/modeling/backbone/fpn.py).

Lateral 1x1 + output 3x3 convs per level, top-down exact-2x nearest upsample
with sum fusion (fpn.py:125-166), LastLevelMaxPool p6 (fpn.py:187-199).
DensePose configs use norm="" (bias convs, no norm) and fuse_type="sum".
The RetinaNet variant (LastLevelP6P7 from res5, fpn.py:202-220,246-268 —
vestigial in the reference, no shipped config uses it) is included for
inventory parity as ``build_retinanet_resnet_fpn_backbone``.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..checkpoint.spec import Spec, conv_spec
from ..ops import conv2d, max_pool2d, upsample2x_nearest
from .resnet import resnet_forward, resnet_spec


# ResNet stage name -> log2 stride
_STAGE_LOG2 = {"res2": 2, "res3": 3, "res4": 4, "res5": 5}


def fpn_spec(cfg, prefix: str = "backbone") -> Spec:
    spec = resnet_spec(cfg, prefix=f"{prefix}.bottom_up")
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    norm = cfg.MODEL.FPN.NORM
    use_bias = norm == ""
    in_features = cfg.MODEL.FPN.IN_FEATURES
    depth = cfg.MODEL.RESNETS.DEPTH
    if depth >= 50:
        ch = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
    else:
        ch = {"res2": 64, "res3": 128, "res4": 256, "res5": 512}
    # scale RES2_OUT_CHANNELS overrides
    base = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    if depth >= 50 and base != 256:
        ch = {f: base * (2 ** (_STAGE_LOG2[f] - 2)) for f in ch}
    for f in in_features:
        stage = _STAGE_LOG2[f]
        conv_spec(spec, f"{prefix}.fpn_lateral{stage}", ch[f], out_channels, 1,
                  bias=use_bias, norm=norm or "")
        conv_spec(spec, f"{prefix}.fpn_output{stage}", out_channels, out_channels, 3,
                  bias=use_bias, norm=norm or "")
    return spec


def fpn_int8_active(p, cfg, prefix: str = "backbone") -> bool:
    """Serving-mode int8 for the 3x3 FPN output convs: TPU.INT8_BACKBONE
    opted in, calibrated qweights present, and the shipped norm-free conv
    form (a normed FPN keeps the fp path)."""
    s0 = _STAGE_LOG2[cfg.MODEL.FPN.IN_FEATURES[0]]
    return (bool(getattr(cfg.TPU, "INT8_BACKBONE", False))
            and f"{prefix}.fpn_output{s0}.qweight" in p
            and f"{prefix}.fpn_output{s0}.norm.weight" not in p)


def _fpn_levels(p, x, cfg, prefix) -> "tuple[Dict, Dict]":
    """Shared lateral/top-down/output pass; returns (p-levels, bottom_up)."""
    in_features: List[str] = list(cfg.MODEL.FPN.IN_FEATURES)
    bottom_up = resnet_forward(p, x, cfg, prefix=f"{prefix}.bottom_up",
                               out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES))
    int8 = fpn_int8_active(p, cfg, prefix)

    results: Dict[str, jnp.ndarray] = {}
    # top-down pass (highest stage first), fpn.py:144-166
    prev = None
    for f in reversed(in_features):
        stage = _STAGE_LOG2[f]
        lateral = conv2d(bottom_up[f], p[f"{prefix}.fpn_lateral{stage}.weight"],
                         p.get(f"{prefix}.fpn_lateral{stage}.bias"))
        if prev is not None:
            lateral = lateral + upsample2x_nearest(prev)
        prev = lateral
        if int8:
            from ..ops.conv import conv2d_int8_chain
            from ..ops.conv import quant_act_s8
            nm = f"{prefix}.fpn_output{stage}"
            out = conv2d_int8_chain(
                quant_act_s8(prev, p[f"{nm}.in_scale"]), p[f"{nm}.in_scale"],
                p[f"{nm}.qweight"], p[f"{nm}.wscale"], p.get(f"{nm}.bias"),
                padding=1, relu=False, out_scale=None)
            results[f"p{stage}"] = out.astype(prev.dtype)
        else:
            results[f"p{stage}"] = conv2d(
                prev, p[f"{prefix}.fpn_output{stage}.weight"],
                p.get(f"{prefix}.fpn_output{stage}.bias"), padding=1)
    return results, bottom_up


def fpn_int8_scale_sites(cfg, prefix: str = "backbone",
                         rpn_prefix: str = "proposal_generator.rpn_head"):
    """(fpn_sites, rpn_sites) param names matching ``fpn_int8_calibration``'s
    output vector order: output-conv input scales in top-down (reversed
    in_features) order, then the RPN head conv's per-level input scales in
    cfg.MODEL.RPN.IN_FEATURES order."""
    in_features = list(cfg.MODEL.FPN.IN_FEATURES)
    fpn_sites = [f"{prefix}.fpn_output{_STAGE_LOG2[f]}.in_scale"
                 for f in reversed(in_features)]
    rpn_sites = [f"{rpn_prefix}.conv.in_scale_{f}"
                 for f in cfg.MODEL.RPN.IN_FEATURES]
    return fpn_sites, rpn_sites


def fpn_int8_calibration(p, x, cfg, prefix: str = "backbone",
                         stat: str = "max") -> jnp.ndarray:
    """fp pass recording the FPN output convs' input statistic and the RPN
    features' statistic (p6 computed exactly from the pooled p5), in
    ``fpn_int8_scale_sites`` order (``stat``: see ops/conv.py::act_stat).
    ``x``: preprocessed network input."""
    from ..ops.conv import act_stat
    in_features: List[str] = list(cfg.MODEL.FPN.IN_FEATURES)
    bottom_up = resnet_forward(p, x, cfg, prefix=f"{prefix}.bottom_up",
                               out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES))
    results: Dict[str, jnp.ndarray] = {}
    stats = []
    prev = None
    for f in reversed(in_features):
        stage = _STAGE_LOG2[f]
        lateral = conv2d(bottom_up[f], p[f"{prefix}.fpn_lateral{stage}.weight"],
                         p.get(f"{prefix}.fpn_lateral{stage}.bias"))
        if prev is not None:
            lateral = lateral + upsample2x_nearest(prev)
        prev = lateral
        stats.append(act_stat(prev, stat, p,
                              f"{prefix}.fpn_output{stage}.in_scale"))
        results[f"p{stage}"] = conv2d(
            prev, p[f"{prefix}.fpn_output{stage}.weight"],
            p.get(f"{prefix}.fpn_output{stage}.bias"), padding=1)
    top = _STAGE_LOG2[in_features[-1]]
    results[f"p{top + 1}"] = max_pool2d(results[f"p{top}"],
                                        kernel_size=1, stride=2)
    for f in cfg.MODEL.RPN.IN_FEATURES:
        stats.append(act_stat(results[f], stat, p,
                              f"proposal_generator.rpn_head.conv.in_scale_{f}"))
    return jnp.stack(stats)


def fpn_forward(
    p: Dict,
    x: jnp.ndarray,
    cfg,
    prefix: str = "backbone",
) -> Dict[str, jnp.ndarray]:
    """Returns {"p2": ..., "p6": ...} NHWC (or HWC) feature maps."""
    in_features: List[str] = list(cfg.MODEL.FPN.IN_FEATURES)
    results, _ = _fpn_levels(p, x, cfg, prefix)
    top_stage = _STAGE_LOG2[in_features[-1]]
    results[f"p{top_stage + 1}"] = max_pool2d(
        results[f"p{top_stage}"], kernel_size=1, stride=2)
    return results


def fpn_out_strides(cfg) -> Dict[str, int]:
    in_features = cfg.MODEL.FPN.IN_FEATURES
    strides = {f"p{_STAGE_LOG2[f]}": 2 ** _STAGE_LOG2[f] for f in in_features}
    top = _STAGE_LOG2[in_features[-1]] + 1
    strides[f"p{top}"] = 2 ** top
    return strides


def retinanet_fpn_spec(cfg, prefix: str = "backbone") -> Spec:
    """RetinaNet FPN: the lateral/output convs plus LastLevelP6P7 — two
    stride-2 3x3 convs off res5 (fpn.py:202-220). Param names follow
    detectron2's module tree (``backbone.top_block.p6/p7``)."""
    spec = fpn_spec(cfg, prefix=prefix)
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    # res5 = 8x res2 channels in both block families (2048 for bottleneck
    # base 256, 512 for basic base 64)
    res5_ch = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * 8
    conv_spec(spec, f"{prefix}.top_block.p6", res5_ch, out_channels, 3,
              bias=True, norm="")
    conv_spec(spec, f"{prefix}.top_block.p7", out_channels, out_channels, 3,
              bias=True, norm="")
    return spec


def retinanet_fpn_forward(
    p: Dict,
    x: jnp.ndarray,
    cfg,
    prefix: str = "backbone",
) -> Dict[str, jnp.ndarray]:
    """FPN with LastLevelP6P7: p6 = conv3x3/2(res5), p7 = conv3x3/2(relu(p6))
    (fpn.py:216-220)."""
    in_features: List[str] = list(cfg.MODEL.FPN.IN_FEATURES)
    results, bottom_up = _fpn_levels(p, x, cfg, prefix)
    top = _STAGE_LOG2[in_features[-1]]
    p6 = conv2d(bottom_up["res5"], p[f"{prefix}.top_block.p6.weight"],
                p.get(f"{prefix}.top_block.p6.bias"), stride=2, padding=1)
    p7 = conv2d(jax.nn.relu(p6), p[f"{prefix}.top_block.p7.weight"],
                p.get(f"{prefix}.top_block.p7.bias"), stride=2, padding=1)
    results[f"p{top + 1}"] = p6
    results[f"p{top + 2}"] = p7
    return results


def retinanet_fpn_out_strides(cfg) -> Dict[str, int]:
    in_features = cfg.MODEL.FPN.IN_FEATURES
    strides = {f"p{_STAGE_LOG2[f]}": 2 ** _STAGE_LOG2[f] for f in in_features}
    top = _STAGE_LOG2[in_features[-1]]
    strides[f"p{top + 1}"] = 2 ** (top + 1)
    strides[f"p{top + 2}"] = 2 ** (top + 2)
    return strides
