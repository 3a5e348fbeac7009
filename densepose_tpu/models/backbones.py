"""Backbone registry: cfg.MODEL.BACKBONE.NAME -> (spec, forward, strides).

Mirrors the reference's BACKBONE_REGISTRY dispatch
(detectron2/modeling/backbone/build.py:19) but as plain functions. Unlike
the reference, ``build_hrfpn_backbone`` actually exists (models/hrnet.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from ..utils.registry import Registry
from .fpn import (fpn_forward, fpn_out_strides, fpn_spec,
                  retinanet_fpn_forward, retinanet_fpn_out_strides,
                  retinanet_fpn_spec)
from .hrnet import hrfpn_forward, hrfpn_out_strides, hrfpn_spec
from .resnet import resnet_forward, resnet_spec

BACKBONE_REGISTRY = Registry("BACKBONE")


def _resnet_strides(cfg) -> Dict[str, int]:
    return {f: 2 ** int(f[3:]) for f in cfg.MODEL.RESNETS.OUT_FEATURES}


def _plain_resnet_forward(p, x, cfg, prefix="backbone"):
    # C4-style single backbone (no FPN); param prefix has no ".bottom_up"
    return resnet_forward(p, x, cfg, prefix=prefix,
                          out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES))


def _plain_resnet_spec(cfg, prefix="backbone"):
    return resnet_spec(cfg, prefix=prefix)


BACKBONE_REGISTRY.register("build_resnet_fpn_backbone",
                           (fpn_spec, fpn_forward, fpn_out_strides))
BACKBONE_REGISTRY.register("build_hrfpn_backbone",
                           (hrfpn_spec, hrfpn_forward, hrfpn_out_strides))
BACKBONE_REGISTRY.register("build_resnet_backbone",
                           (_plain_resnet_spec, _plain_resnet_forward, _resnet_strides))
BACKBONE_REGISTRY.register("build_retinanet_resnet_fpn_backbone",
                           (retinanet_fpn_spec, retinanet_fpn_forward,
                            retinanet_fpn_out_strides))


def backbone_fns(cfg) -> Tuple[Callable, Callable, Callable]:
    name = cfg.MODEL.BACKBONE.NAME
    return BACKBONE_REGISTRY.get(name)
