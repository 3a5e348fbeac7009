"""HRNet-W32/40/48 + HRFPN backbone.

The reference *declares* this backbone — ``configs/HRNet/*.yaml`` select
``build_hrfpn_backbone`` and ``densepose/config.py:237-269`` defines all
MODEL.HRNET.* keys — but ships no implementation, so those configs crash at
build (SURVEY.md section 2.4). This module supplies the real thing, following
the published HRNetV2p architecture (Sun et al., CVPR 2019) and the
detectron2-DensePose/mmdetection HRFPN neck, with parameter names matching
the upstream HRNet convention (conv1/bn1, layer1, transition{1..3},
stage{2..4}.<m>.branches/fuse_layers, reduction_conv/fpn_conv) so official
HRNet checkpoints align via the suffix matcher.

Inference-mode BatchNorm == FrozenBN, so every BN here is declared FrozenBN
and folded into its conv at load time.

Structure (stride -> channels Ci from MODEL.HRNET.STAGEk.NUM_CHANNELS):
    stem: two 3x3/2 convs (64) -> 1/4 resolution
    layer1: 4 bottleneck blocks 64->256
    stage2: 2 branches  [C0@1/4, C1@1/8],           1 module
    stage3: 3 branches  [+C2@1/16],                 4 modules
    stage4: 4 branches  [+C3@1/32],                 3 modules
    each module: 4 BasicBlocks per branch + full cross-resolution fusion
    HRFPN: bilinear-upsample all branches to 1/4, concat, 1x1 reduce to 256,
    avg-pool pyramid + 3x3 conv per level -> p1..p5 (strides 4..64)
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..checkpoint.spec import ParamSpec, Spec
from ..ops import conv2d, frozen_batch_norm, resize_bilinear

_BN_SUFFIXES = ("weight", "bias", "running_mean", "running_var")


def _conv_bn_spec(spec: Spec, conv_name: str, bn_name: str, cin: int, cout: int, k: int):
    spec[f"{conv_name}.weight"] = ParamSpec((cout, cin, k, k), "conv")
    for s in _BN_SUFFIXES:
        spec[f"{bn_name}.{s}"] = ParamSpec((cout,), "vec")


def _stage_channels(cfg) -> List[List[int]]:
    h = cfg.MODEL.HRNET
    return [list(h.STAGE2.NUM_CHANNELS), list(h.STAGE3.NUM_CHANNELS),
            list(h.STAGE4.NUM_CHANNELS)]


def hrnet_spec(cfg, prefix: str = "backbone.bottom_up") -> Spec:
    spec: Spec = {}
    # stem
    _conv_bn_spec(spec, f"{prefix}.conv1", f"{prefix}.bn1", 3, 64, 3)
    _conv_bn_spec(spec, f"{prefix}.conv2", f"{prefix}.bn2", 64, 64, 3)
    # layer1: 4 bottlenecks 64 -> 256
    for i in range(4):
        cin = 64 if i == 0 else 256
        b = f"{prefix}.layer1.{i}"
        _conv_bn_spec(spec, f"{b}.conv1", f"{b}.bn1", cin, 64, 1)
        _conv_bn_spec(spec, f"{b}.conv2", f"{b}.bn2", 64, 64, 3)
        _conv_bn_spec(spec, f"{b}.conv3", f"{b}.bn3", 64, 256, 1)
        if i == 0:
            _conv_bn_spec(spec, f"{b}.downsample.0", f"{b}.downsample.1", 64, 256, 1)

    stages = _stage_channels(cfg)
    num_modules = [cfg.MODEL.HRNET.STAGE2.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE3.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE4.NUM_MODULES]
    num_blocks = [cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS]

    prev_chans = [256]
    for si, chans in enumerate(stages):  # stage index 2..4
        sname = si + 2
        t = f"{prefix}.transition{sname - 1}"
        # transitions: conv when channels change, new branch = strided conv
        for b, c in enumerate(chans):
            if b < len(prev_chans):
                if prev_chans[b] != c:
                    _conv_bn_spec(spec, f"{t}.{b}.0", f"{t}.{b}.1", prev_chans[b], c, 3)
            else:
                _conv_bn_spec(spec, f"{t}.{b}.0.0", f"{t}.{b}.0.1", prev_chans[-1], c, 3)
        # modules
        for m in range(num_modules[si]):
            mod = f"{prefix}.stage{sname}.{m}"
            for b, c in enumerate(chans):
                for blk in range(num_blocks[si][b]):
                    bb = f"{mod}.branches.{b}.{blk}"
                    _conv_bn_spec(spec, f"{bb}.conv1", f"{bb}.bn1", c, c, 3)
                    _conv_bn_spec(spec, f"{bb}.conv2", f"{bb}.bn2", c, c, 3)
            for i in range(len(chans)):       # output branch
                for j in range(len(chans)):   # input branch
                    f = f"{mod}.fuse_layers.{i}.{j}"
                    if j > i:
                        _conv_bn_spec(spec, f"{f}.0", f"{f}.1", chans[j], chans[i], 1)
                    elif j < i:
                        for k in range(i - j):
                            cout = chans[i] if k == i - j - 1 else chans[j]
                            _conv_bn_spec(spec, f"{f}.{k}.0", f"{f}.{k}.1",
                                          chans[j], cout, 3)
        prev_chans = chans
    return spec


def _cbr(p: Dict, x, conv_name: str, bn_name: str, stride=1, padding=0, relu=True):
    """conv + (folded or explicit) BN (+relu). Folded BN leaves a bias on the
    conv and drops the bn_* keys."""
    y = conv2d(x, p[f"{conv_name}.weight"], p.get(f"{conv_name}.bias"),
               stride=stride, padding=padding)
    if f"{bn_name}.running_mean" in p:
        y = frozen_batch_norm(y, p[f"{bn_name}.weight"], p[f"{bn_name}.bias"],
                              p[f"{bn_name}.running_mean"], p[f"{bn_name}.running_var"])
    return jax.nn.relu(y) if relu else y


def _basic_block(p: Dict, name: str, x):
    out = _cbr(p, x, f"{name}.conv1", f"{name}.bn1", padding=1)
    out = _cbr(p, out, f"{name}.conv2", f"{name}.bn2", padding=1, relu=False)
    return jax.nn.relu(out + x)


def _upsample_nearest(x, factor: int):
    for _ in range(factor.bit_length() - 1):
        x = jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)
    return x


def hrnet_forward(p: Dict, x: jnp.ndarray, cfg,
                  prefix: str = "backbone.bottom_up") -> List[jnp.ndarray]:
    """x: (H, W, 3) normalized. Returns the 4 branch maps
    [1/4, 1/8, 1/16, 1/32]."""
    # first stem conv (3x3/s2 RGB) takes the packed-lane MXU routing — the
    # plain 3-channel conv lowers to a space-to-batch VPU loop (see
    # ops/conv.py::conv_stride2_packed)
    from ..ops.conv import conv2d_rgb_s2
    y = conv2d_rgb_s2(x, p[f"{prefix}.conv1.weight"],
                      p.get(f"{prefix}.conv1.bias"))
    if f"{prefix}.bn1.running_mean" in p:
        y = frozen_batch_norm(y, p[f"{prefix}.bn1.weight"], p[f"{prefix}.bn1.bias"],
                              p[f"{prefix}.bn1.running_mean"],
                              p[f"{prefix}.bn1.running_var"])
    x = jax.nn.relu(y)
    x = _cbr(p, x, f"{prefix}.conv2", f"{prefix}.bn2", stride=2, padding=1)

    for i in range(4):
        b = f"{prefix}.layer1.{i}"
        out = _cbr(p, x, f"{b}.conv1", f"{b}.bn1")
        out = _cbr(p, out, f"{b}.conv2", f"{b}.bn2", padding=1)
        out = _cbr(p, out, f"{b}.conv3", f"{b}.bn3", relu=False)
        sc = _cbr(p, x, f"{b}.downsample.0", f"{b}.downsample.1", relu=False) \
            if i == 0 else x
        x = jax.nn.relu(out + sc)

    stages = _stage_channels(cfg)
    num_modules = [cfg.MODEL.HRNET.STAGE2.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE3.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE4.NUM_MODULES]
    num_blocks = [cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS]

    feats = [x]
    prev_chans = [256]
    for si, chans in enumerate(stages):
        sname = si + 2
        t = f"{prefix}.transition{sname - 1}"
        new_feats = []
        for b, c in enumerate(chans):
            if b < len(prev_chans):
                if prev_chans[b] != c:
                    new_feats.append(_cbr(p, feats[b], f"{t}.{b}.0", f"{t}.{b}.1", padding=1))
                else:
                    new_feats.append(feats[b])
            else:
                new_feats.append(_cbr(p, feats[-1], f"{t}.{b}.0.0", f"{t}.{b}.0.1",
                                      stride=2, padding=1))
        feats = new_feats

        for m in range(num_modules[si]):
            mod = f"{prefix}.stage{sname}.{m}"
            branch_out = []
            for b in range(len(chans)):
                y = feats[b]
                for blk in range(num_blocks[si][b]):
                    y = _basic_block(p, f"{mod}.branches.{b}.{blk}", y)
                branch_out.append(y)
            fused = []
            for i in range(len(chans)):
                acc = None
                for j in range(len(chans)):
                    f = f"{mod}.fuse_layers.{i}.{j}"
                    if j == i:
                        y = branch_out[j]
                    elif j > i:
                        y = _cbr(p, branch_out[j], f"{f}.0", f"{f}.1", relu=False)
                        y = _upsample_nearest(y, 2 ** (j - i))
                    else:
                        y = branch_out[j]
                        for k in range(i - j):
                            last = k == i - j - 1
                            y = _cbr(p, y, f"{f}.{k}.0", f"{f}.{k}.1",
                                     stride=2, padding=1, relu=not last)
                    acc = y if acc is None else acc + y
                fused.append(jax.nn.relu(acc))
            feats = fused
        prev_chans = chans
    return feats


# ---------------------------------------------------------------------------
# HRFPN neck
# ---------------------------------------------------------------------------

def hrfpn_spec(cfg, prefix: str = "backbone") -> Spec:
    spec = hrnet_spec(cfg, prefix=f"{prefix}.bottom_up")
    out_channels = cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS
    total = sum(cfg.MODEL.HRNET.STAGE4.NUM_CHANNELS)
    spec[f"{prefix}.reduction_conv.weight"] = ParamSpec((out_channels, total, 1, 1), "conv")
    spec[f"{prefix}.reduction_conv.bias"] = ParamSpec((out_channels,), "vec")
    for i in range(5):
        spec[f"{prefix}.fpn_conv.{i}.weight"] = ParamSpec(
            (out_channels, out_channels, 3, 3), "conv")
        spec[f"{prefix}.fpn_conv.{i}.bias"] = ParamSpec((out_channels,), "vec")
    return spec


def _avg_pool(x, k: int):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(k, k, 1), window_strides=(k, k, 1),
        padding=((0, 0), (0, 0), (0, 0))) / float(k * k)


def hrfpn_forward(p: Dict, x: jnp.ndarray, cfg,
                  prefix: str = "backbone") -> Dict[str, jnp.ndarray]:
    """Returns {"p1".."p5"} at strides 4..64."""
    feats = hrnet_forward(p, x, cfg, prefix=f"{prefix}.bottom_up")
    h, w = feats[0].shape[-3], feats[0].shape[-2]
    ups = [feats[0]]
    for i, f in enumerate(feats[1:], 1):
        ups.append(resize_bilinear(f, (h, w), scale=(float(2 ** i), float(2 ** i))))
    cat = jnp.concatenate(ups, axis=-1)
    red = conv2d(cat, p[f"{prefix}.reduction_conv.weight"],
                 p[f"{prefix}.reduction_conv.bias"])
    outs = {}
    for i in range(5):
        level = red if i == 0 else _avg_pool(red, 2 ** i)
        outs[f"p{i + 1}"] = conv2d(level, p[f"{prefix}.fpn_conv.{i}.weight"],
                                   p[f"{prefix}.fpn_conv.{i}.bias"], padding=1)
    return outs


def hrfpn_out_strides(cfg) -> Dict[str, int]:
    return {"p1": 4, "p2": 8, "p3": 16, "p4": 32, "p5": 64}
