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


def stem_conv_norm(p: Dict, name: str, x):
    """The stride-2 RGB stem conv (+ FrozenBN), routed to the packed-lane
    MXU formulation (ops/conv.py::conv_stride2_packed) whenever the kernel
    fits — XLA lowers the 3-channel conv as a space-to-batch VPU loop that
    costs ~1.4 ms/frame at 800px, ~50x its MXU floor.
    ``DENSEPOSE_TPU_NO_PACKED_STEM=1`` restores the plain conv lowering.
    Shared by ResNet (7x7/s2, resnet.py:344-352) and the HRNet first stem
    conv (3x3/s2)."""
    from ..ops.conv import conv2d_rgb_s2
    y = conv2d_rgb_s2(x, p[f"{name}.weight"], p.get(f"{name}.bias"))
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


def _num_stages(out_features) -> int:
    return max({"res2": 1, "res3": 2, "res4": 3, "res5": 4}.get(f, 0)
               for f in out_features)


def _iter_blocks(cfg, prefix: str, num_stages: int):
    """Static block-structure walk shared by the int8 forward, the int8
    calibration pass and the calibration site naming — one source of truth
    so scale vectors and consumers can never get out of order.

    Yields (stage_name, block_name, stride, dilation, has_shortcut,
    next_block_name-or-None, is_stage_output)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    res5_dilation = cfg.MODEL.RESNETS.RES5_DILATION
    blocks = NUM_BLOCKS_PER_STAGE[depth]
    chans = _stage_channels(cfg)

    names = []
    for stage_idx in range(num_stages):
        stage_name = f"res{stage_idx + 2}"
        cin, _, cout = chans[stage_idx]
        dilation = res5_dilation if stage_idx == 3 else 1
        first_stride = 1 if stage_idx == 0 or (stage_idx == 3 and dilation == 2) else 2
        for i in range(blocks[stage_idx]):
            b_in = cin if i == 0 else cout
            names.append((stage_name,
                          f"{prefix}.{stage_name}.{i}",
                          first_stride if i == 0 else 1,
                          dilation,
                          b_in != cout,
                          i == blocks[stage_idx] - 1))
    for j, (stage, name, stride, dil, sc, last) in enumerate(names):
        nxt = names[j + 1][1] if j + 1 < len(names) else None
        yield stage, name, stride, dil, sc, nxt, last


def _bottleneck_int8(p: Dict, name: str, q: jnp.ndarray, s_in,
                     stride: int, stride_in_1x1: bool, dilation: int,
                     has_shortcut: bool) -> jnp.ndarray:
    """Bottleneck as a statically-calibrated s8 chain (serving mode).

    conv1/conv2 stay in the integer domain end to end (s32 bias+ReLU, one
    requant multiply — ops/conv.py::conv2d_int8_chain); conv3 and the
    shortcut dequantize to f32 for the residual add, the final ReLU runs in
    f32 and the caller requantizes to the next block's input scale. FrozenBN
    is already folded into weights/bias at load time, so the fp block is a
    pure conv+bias chain and quantizes without norm special cases."""
    from ..ops.conv import conv2d_int8_chain
    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    q1 = conv2d_int8_chain(
        q, s_in, p[f"{name}.conv1.qweight"], p[f"{name}.conv1.wscale"],
        p.get(f"{name}.conv1.bias"), stride=s1,
        out_scale=p[f"{name}.conv2.in_scale"])
    q2 = conv2d_int8_chain(
        q1, p[f"{name}.conv2.in_scale"], p[f"{name}.conv2.qweight"],
        p[f"{name}.conv2.wscale"], p.get(f"{name}.conv2.bias"), stride=s3,
        padding=dilation, dilation=dilation,
        out_scale=p[f"{name}.conv3.in_scale"])
    y = conv2d_int8_chain(
        q2, p[f"{name}.conv3.in_scale"], p[f"{name}.conv3.qweight"],
        p[f"{name}.conv3.wscale"], p.get(f"{name}.conv3.bias"),
        relu=False, out_scale=None)
    if has_shortcut:
        sc = conv2d_int8_chain(
            q, s_in, p[f"{name}.shortcut.qweight"], p[f"{name}.shortcut.wscale"],
            p.get(f"{name}.shortcut.bias"), stride=stride,
            relu=False, out_scale=None)
    else:
        sc = q.astype(jnp.float32) * s_in
    return jax.nn.relu(y + sc)


def int8_backbone_active(p: Dict, cfg, prefix: str) -> bool:
    """True when the serving-mode int8 backbone should run: opted in via
    TPU.INT8_BACKBONE, calibrated scales present (predictor.calibrate_int8),
    bottleneck architecture (R50+; BasicBlock nets keep the fp path)."""
    return (bool(getattr(cfg.TPU, "INT8_BACKBONE", False))
            and cfg.MODEL.RESNETS.DEPTH >= 50
            and f"{prefix}.res2.0.conv1.qweight" in p
            # the s8 chain assumes FrozenBN was folded into weight/bias at
            # load time (transform.py); unfolded norms keep the fp path
            and f"{prefix}.res2.0.conv1.norm.running_mean" not in p)


def _resnet_int8_stages(p: Dict, x: jnp.ndarray, cfg, prefix: str,
                        out_features) -> Dict[str, jnp.ndarray]:
    """res2..resN as the s8 chain. ``x``: fp stem+maxpool output. Stage
    outputs are emitted in the compute dtype; between blocks activations
    travel as s8 (half the HBM bytes of bf16) with one fused requant per
    block. Approximate (post-training int8) — serving mode only."""
    from ..ops.conv import quant_act_s8
    dtype = x.dtype
    stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
    outputs: Dict[str, jnp.ndarray] = {}
    s_in = p[f"{prefix}.res2.0.conv1.in_scale"]
    q = quant_act_s8(x, s_in)
    for stage, name, stride, dil, has_sc, nxt, last in _iter_blocks(
            cfg, prefix, _num_stages(out_features)):
        y = _bottleneck_int8(p, name, q, s_in, stride, stride_in_1x1, dil, has_sc)
        if last and stage in out_features:
            outputs[stage] = y.astype(dtype)
        if nxt is not None:
            s_in = p[f"{nxt}.conv1.in_scale"]
            q = quant_act_s8(y, s_in)
    return outputs


def resnet_int8_scale_sites(cfg, prefix: str = "backbone.bottom_up",
                            out_features=("res2", "res3", "res4", "res5")):
    """Ordered activation-scale param names matching
    ``resnet_int8_calibration``'s output vector, position for position."""
    sites = [f"{prefix}.res2.0.conv1.in_scale"]
    for _, name, _, _, _, nxt, _ in _iter_blocks(
            cfg, prefix, _num_stages(out_features)):
        sites.append(f"{name}.conv2.in_scale")
        sites.append(f"{name}.conv3.in_scale")
        if nxt is not None:
            sites.append(f"{nxt}.conv1.in_scale")
    return sites


def resnet_int8_calibration(p: Dict, x: jnp.ndarray, cfg,
                            prefix: str = "backbone.bottom_up",
                            out_features=("res2", "res3", "res4", "res5"),
                            stat: str = "max") -> jnp.ndarray:
    """fp pass over the backbone recording each quantization site's
    activation statistic (``stat="max"``: max-abs of the tensor feeding
    conv1/conv2/conv3 of every block, seeds the scales; ``stat="sat"``:
    fraction outside the installed clip range), in
    ``resnet_int8_scale_sites`` order. ``x``: preprocessed network input."""
    from ..ops.conv import act_stat
    stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
    x = jax.nn.relu(stem_conv_norm(p, f"{prefix}.stem.conv1", x))
    x = max_pool2d(x, kernel_size=3, stride=2, padding=1)
    stats = [act_stat(x, stat, p, f"{prefix}.res2.0.conv1.in_scale")]
    for _, name, stride, dil, has_sc, nxt, _ in _iter_blocks(
            cfg, prefix, _num_stages(out_features)):
        s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
        y1 = jax.nn.relu(_conv_norm(p, f"{name}.conv1", x, stride=s1))
        stats.append(act_stat(y1, stat, p, f"{name}.conv2.in_scale"))
        y2 = jax.nn.relu(_conv_norm(p, f"{name}.conv2", y1, stride=s3,
                                    padding=dil, dilation=dil))
        stats.append(act_stat(y2, stat, p, f"{name}.conv3.in_scale"))
        y3 = _conv_norm(p, f"{name}.conv3", y2)
        sc = (_conv_norm(p, f"{name}.shortcut", x, stride=stride)
              if has_sc else x)
        x = jax.nn.relu(y3 + sc)
        if nxt is not None:
            stats.append(act_stat(x, stat, p, f"{nxt}.conv1.in_scale"))
    return jnp.stack(stats)


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

    x = jax.nn.relu(stem_conv_norm(p, f"{prefix}.stem.conv1", x))
    x = max_pool2d(x, kernel_size=3, stride=2, padding=1)

    if int8_backbone_active(p, cfg, prefix):
        return _resnet_int8_stages(p, x, cfg, prefix, out_features)

    outputs: Dict[str, jnp.ndarray] = {}
    num_stages = _num_stages(out_features)
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
