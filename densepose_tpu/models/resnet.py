"""ResNet backbone (functional, NHWC).

Rebuild of /root/reference/detectron2/modeling/backbone/resnet.py for the
inference path: BasicStem (:325-354), BasicBlock (:27-92, R18/34),
BottleneckBlock (:95-205, R50/101/152) with ``stride_in_1x1`` and dilation.
FrozenBN is folded into the convs at load time, so each block body is just
conv(+bias) -> relu chains that XLA fuses; residual adds stay in the compute
dtype.

Parameter names exactly mirror the reference state_dict
(``stem.conv1.weight``, ``res2.0.conv1.*``, ...) so checkpoint suffix
matching works unchanged.

The deformable-conv block variant is intentionally absent: in the reference
it crashes on use (undefined DeformConv, resnet.py:255-259 — SURVEY.md
section 7.4) and no DensePose config enables it; the builder rejects
DEFORM_ON_PER_STAGE explicitly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..checkpoint.spec import Spec, conv_spec
from ..ops import conv2d, frozen_batch_norm, max_pool2d

NUM_BLOCKS_PER_STAGE = {
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


def resnet_stage_blocks(cfg) -> List[int]:
    return NUM_BLOCKS_PER_STAGE[cfg.MODEL.RESNETS.DEPTH]


def _stage_channels(cfg) -> List[Tuple[int, int, int]]:
    """[(in, bottleneck, out)] per stage, following build_resnet_backbone
    (resnet.py:602-689)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
    width_per_group = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
    bottleneck = num_groups * width_per_group
    in_ch = cfg.MODEL.RESNETS.STEM_OUT_CHANNELS
    out_ch = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    chans = []
    for _ in range(4):
        chans.append((in_ch, bottleneck, out_ch))
        in_ch = out_ch
        out_ch *= 2
        bottleneck *= 2
    if depth in (18, 34):
        # BasicBlock: no bottleneck; channels 64,128,256,512
        chans = [(64, 0, 64), (64, 0, 128), (128, 0, 256), (256, 0, 512)]
    return chans


def resnet_spec(cfg, prefix: str = "backbone.bottom_up") -> Spec:
    depth = cfg.MODEL.RESNETS.DEPTH
    norm = cfg.MODEL.RESNETS.NORM
    assert not any(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE), (
        "deformable conv blocks are nonfunctional in the reference "
        "(resnet.py:255-259) and unsupported here")
    spec: Spec = {}
    conv_spec(spec, f"{prefix}.stem.conv1", 3, cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
              7, bias=False, norm=norm)
    blocks = NUM_BLOCKS_PER_STAGE[depth]
    for stage_idx, ((cin, cb, cout), n) in enumerate(zip(_stage_channels(cfg), blocks)):
        name = f"{prefix}.res{stage_idx + 2}"
        for i in range(n):
            b_in = cin if i == 0 else cout
            if depth >= 50:
                conv_spec(spec, f"{name}.{i}.conv1", b_in, cb, 1, bias=False, norm=norm)
                conv_spec(spec, f"{name}.{i}.conv2", cb, cb, 3, bias=False, norm=norm)
                conv_spec(spec, f"{name}.{i}.conv3", cb, cout, 1, bias=False, norm=norm)
            else:
                conv_spec(spec, f"{name}.{i}.conv1", b_in, cout, 3, bias=False, norm=norm)
                conv_spec(spec, f"{name}.{i}.conv2", cout, cout, 3, bias=False, norm=norm)
            if b_in != cout:
                conv_spec(spec, f"{name}.{i}.shortcut", b_in, cout, 1, bias=False, norm=norm)
    return spec


def _conv_norm(p: Dict, name: str, x, **kw):
    """conv + (folded or explicit) FrozenBN."""
    y = conv2d(x, p[f"{name}.weight"], p.get(f"{name}.bias"), **kw)
    if f"{name}.norm.running_mean" in p:
        y = frozen_batch_norm(y, p[f"{name}.norm.weight"], p[f"{name}.norm.bias"],
                              p[f"{name}.norm.running_mean"], p[f"{name}.norm.running_var"])
    return y


def _bottleneck(p: Dict, name: str, x, stride: int, stride_in_1x1: bool,
                dilation: int, has_shortcut: bool):
    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = jax.nn.relu(_conv_norm(p, f"{name}.conv1", x, stride=s1))
    out = jax.nn.relu(_conv_norm(p, f"{name}.conv2", out, stride=s3,
                                 padding=dilation, dilation=dilation))
    out = _conv_norm(p, f"{name}.conv3", out)
    shortcut = _conv_norm(p, f"{name}.shortcut", x, stride=stride) if has_shortcut else x
    return jax.nn.relu(out + shortcut)


def _basic_block(p: Dict, name: str, x, stride: int, has_shortcut: bool):
    out = jax.nn.relu(_conv_norm(p, f"{name}.conv1", x, stride=stride, padding=1))
    out = _conv_norm(p, f"{name}.conv2", out, padding=1)
    shortcut = _conv_norm(p, f"{name}.shortcut", x, stride=stride) if has_shortcut else x
    return jax.nn.relu(out + shortcut)


def resnet_forward(
    p: Dict,
    x: jnp.ndarray,
    cfg,
    prefix: str = "backbone.bottom_up",
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5"),
) -> Dict[str, jnp.ndarray]:
    """x: (H, W, 3) or (N, H, W, 3) normalized input. Returns feature dict."""
    depth = cfg.MODEL.RESNETS.DEPTH
    stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
    res5_dilation = cfg.MODEL.RESNETS.RES5_DILATION
    blocks = NUM_BLOCKS_PER_STAGE[depth]
    chans = _stage_channels(cfg)

    x = jax.nn.relu(_conv_norm(p, f"{prefix}.stem.conv1", x, stride=2, padding=3))
    x = max_pool2d(x, kernel_size=3, stride=2, padding=1)

    outputs: Dict[str, jnp.ndarray] = {}
    num_stages = max({"res2": 1, "res3": 2, "res4": 3, "res5": 4}.get(f, 0)
                     for f in out_features)
    for stage_idx in range(num_stages):
        stage_name = f"res{stage_idx + 2}"
        cin, _, cout = chans[stage_idx]
        dilation = res5_dilation if stage_idx == 3 else 1
        first_stride = 1 if stage_idx == 0 or (stage_idx == 3 and dilation == 2) else 2
        for i in range(blocks[stage_idx]):
            name = f"{prefix}.{stage_name}.{i}"
            stride = first_stride if i == 0 else 1
            b_in = cin if i == 0 else cout
            has_shortcut = b_in != cout
            if depth >= 50:
                x = _bottleneck(p, name, x, stride, stride_in_1x1, dilation, has_shortcut)
            else:
                x = _basic_block(p, name, x, stride, has_shortcut)
        if stage_name in out_features:
            outputs[stage_name] = x
    return outputs
