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
import numpy as np

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


# ---------------------------------------------------------------------------
# Width-packed branch convs (lane-occupancy fix, r5)
#
# HRNet's hot loop is 64x (stage2-4 branch0) + 56x (branch1) 3x3 convs at
# C=32/64 — 25/50% of the 128 MXU lanes, measured ~13 ms/frame for branch0
# alone at 800px (r4 cycle model + trace). The (H, W, C) -> (H, W/f, f*C)
# repack is a FREE reshape in NHWC (see ops/conv.py::pack_width_conv_kernel)
# and runs every branch conv at full lane width with a host-prepacked
# kernel. Values match the unpacked conv at reassociation level (contraction
# order only); gated by TPU.HRNET_PACKED_BRANCHES and only active when
# FrozenBN is folded (the exact-parity unfolded mode stays untouched).
# ---------------------------------------------------------------------------


def _bn_base_for(conv_base: str):
    """HRNet pairs conv and BN as SIBLINGS (upstream naming): conv{N}/bn{N}
    and Sequential .0/.1 — unlike detectron2's ``X.norm`` children, which is
    the only convention checkpoint/transform.py folds. Returns the BN base
    for a conv base, or None."""
    head, _, tail = conv_base.rpartition(".")
    if tail.startswith("conv"):
        return f"{head}.bn{tail[4:]}"
    if tail == "0":
        return f"{head}.1"
    return None


def hrnet_fold_bn(params: Dict, prefix: str = "backbone.bottom_up") -> None:
    """Fold every HRNet FrozenBN into its preceding conv, in place (f64 on
    host, like checkpoint/transform.py does for .norm convs). Inference BN
    == FrozenBN here, so this is exact up to the fold's own rounding; it
    removes ~270 low-lane-occupancy scale+shift ops from the graph and is
    a precondition for the width-packed kernels below."""
    from ..ops.norms import fold_frozen_bn

    conv_keys = [k for k in params
                 if k.startswith(prefix) and k.endswith(".weight")
                 and getattr(params[k], "ndim", 0) == 4]
    for wkey in conv_keys:
        base = wkey[: -len(".weight")]
        bn = _bn_base_for(base)
        if bn is None or f"{bn}.running_mean" not in params:
            continue
        w = np.asarray(params[wkey])
        b = params.get(f"{base}.bias")
        wf, bf = fold_frozen_bn(
            w, None if b is None else np.asarray(b),
            np.asarray(params[f"{bn}.weight"]),
            np.asarray(params[f"{bn}.bias"]),
            np.asarray(params[f"{bn}.running_mean"]),
            np.asarray(params[f"{bn}.running_var"]))
        params[wkey] = wf
        params[f"{base}.bias"] = bf
        for sfx in _BN_SUFFIXES:
            params.pop(f"{bn}.{sfx}", None)


def hrnet_host_optimize(params: Dict, cfg,
                        prefix: str = "backbone.bottom_up") -> None:
    """Load-time host pass for HRNet: BN fold (TPU.FOLD_FROZEN_BN) then
    width-packed kernel precompute (TPU.HRNET_PACKED_BRANCHES)."""
    if bool(getattr(cfg.TPU, "FOLD_FROZEN_BN", True)):
        hrnet_fold_bn(params, prefix)
    hrnet_wpack_augment(params, cfg, prefix)


def _wpack_enabled(cfg) -> bool:
    """Width packing pays ONLY where lanes are the constraint (TPU MXU/VPU
    128-lane tiles). On CPU/GPU the packed conv just does f x the MACs —
    measured ~4x slower HRNet CPU tests — so the predictor packs on TPU
    backends only. DENSEPOSE_HRNET_FORCE_WPACK=1 overrides (the CPU parity
    tests exercise the packed path at tiny sizes)."""
    import os

    if not bool(getattr(cfg.TPU, "HRNET_PACKED_BRANCHES", True)):
        return False
    if os.environ.get("DENSEPOSE_HRNET_FORCE_WPACK"):
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return True


def hrnet_wpack_augment(params: Dict, cfg,
                        prefix: str = "backbone.bottom_up") -> None:
    """Add host-precomputed width-packed kernels (``<conv>.wp.weight`` /
    ``.wp.bias``) for every lane-starved 3x3 branch conv. Mutates
    ``params`` in place; no-op when packing is disabled (or the backend
    has no lane constraint — see ``_wpack_enabled``), BN is unfolded, or a
    conv's channel width doesn't benefit."""
    import numpy as np

    from ..ops.conv import pack_width_conv_kernel, pick_pack_factor

    if not _wpack_enabled(cfg):
        return

    def add(name: str, f: int):
        wkey = f"{name}.weight"
        if f <= 1 or wkey not in params:
            return
        w = np.asarray(params[wkey])
        if w.ndim != 4 or w.shape[0] != 3 or w.shape[1] != 3:
            return
        bkey = f"{name}.bias"
        if bkey not in params:
            return  # BN not folded: exact-parity mode, keep unpacked
        params[f"{name}.wp.weight"] = pack_width_conv_kernel(w, f)
        params[f"{name}.wp.bias"] = np.tile(np.asarray(params[bkey]), f)

    for i in range(4):
        add(f"{prefix}.layer1.{i}.conv2", pick_pack_factor(64))
    stages = _stage_channels(cfg)
    num_modules = [cfg.MODEL.HRNET.STAGE2.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE3.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE4.NUM_MODULES]
    num_blocks = [cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS]
    for si, chans in enumerate(stages):
        sname = si + 2
        for m in range(num_modules[si]):
            mod = f"{prefix}.stage{sname}.{m}"
            for b, c in enumerate(chans):
                f = pick_pack_factor(c)
                for blk in range(num_blocks[si][b]):
                    add(f"{mod}.branches.{b}.{blk}.conv1", f)
                    add(f"{mod}.branches.{b}.{blk}.conv2", f)


def _conv_wp(p: Dict, name: str, xp, relu: bool):
    """One packed conv on an already width-packed map (pad 1 both axes —
    the packed kernel's zero structure reproduces the original pad-1
    edge semantics)."""
    y = conv2d(xp, p[f"{name}.wp.weight"], p[f"{name}.wp.bias"],
               padding=1)
    return jax.nn.relu(y) if relu else y


def _basic_block_wp(p: Dict, name: str, xp):
    out = _conv_wp(p, f"{name}.conv1", xp, relu=True)
    out = _conv_wp(p, f"{name}.conv2", out, relu=False)
    return jax.nn.relu(out + xp)


def _basic_block_int8(p: Dict, name: str, q, s_in, wp: bool):
    """One BasicBlock as a statically-calibrated s8 chain (max serving
    mode): conv1 s8xs8->s32 + bias + ReLU + one requant, conv2 to f32,
    residual dequantized from the same s8 input, f32 add+ReLU. ``wp``:
    kernels are the width-packed variants (activations already packed)."""
    from ..ops.conv import conv2d_int8_chain

    k = ".wp" if wp else ""
    s2 = p[f"{name}.conv2.in_scale"]
    q1 = conv2d_int8_chain(
        q, s_in, p[f"{name}.conv1{k}.qweight"], p[f"{name}.conv1{k}.wscale"],
        p.get(f"{name}.conv1{k}.bias"), padding=1, out_scale=s2)
    y = conv2d_int8_chain(
        q1, s2, p[f"{name}.conv2{k}.qweight"], p[f"{name}.conv2{k}.wscale"],
        p.get(f"{name}.conv2{k}.bias"), padding=1, relu=False,
        out_scale=None)
    sc = q.astype(jnp.float32) * s_in
    return jax.nn.relu(y + sc)


def _branch_chain(p: Dict, names: List[str], y, c: int,
                  calib=None, stat: str = "max"):
    """Run a branch's BasicBlock chain, width-packed end-to-end when the
    packed kernels exist and the width divides (pack/unpack are free
    reshapes, so the whole chain runs at full lane width). With calibrated
    int8 scales installed (TPU.INT8_BACKBONE max mode) the chain runs as
    s8 MXU convs. ``calib``: append per-conv-input activation statistics
    (hrnet_int8_scale_sites order) instead of quantizing — the fp
    calibration walk."""
    wp0 = p.get(f"{names[0]}.conv1.wp.weight") if names else None
    f = wp0.shape[2] // c if wp0 is not None else 1
    h, w = y.shape[-3], y.shape[-2]
    packed_ok = (wp0 is not None and w % f == 0
                 and all(f"{n}.conv2.wp.weight" in p for n in names))

    k = ".wp" if packed_ok else ""
    int8_ok = (calib is None
               and f"{names[0]}.conv1.in_scale" in p
               and f"{names[0]}.conv1{k}.qweight" in p) if names else False
    if int8_ok:
        from ..ops.conv import quant_act_s8
        dtype = y.dtype
        if packed_ok:
            y = y.reshape(*y.shape[:-3], h, w // f, f * c)
        for n in names:
            s_in = p[f"{n}.conv1.in_scale"]
            q = quant_act_s8(y, s_in)
            y = _basic_block_int8(p, n, q, s_in, wp=packed_ok)
        if packed_ok:
            y = y.reshape(*y.shape[:-3], h, w, c)
        return y.astype(dtype)

    if packed_ok and calib is None:
        yp = y.reshape(*y.shape[:-3], h, w // f, f * c)
        for n in names:
            yp = _basic_block_wp(p, n, yp)
        return yp.reshape(*y.shape[:-3], h, w, c)
    if packed_ok:
        # calibration walk on the packed form: max-abs/sat statistics are
        # layout-invariant (the repack is a reshape of the same values)
        from ..ops.conv import act_stat
        yp = y.reshape(*y.shape[:-3], h, w // f, f * c)
        for n in names:
            calib.append(act_stat(yp, stat, p, f"{n}.conv1.in_scale"))
            o = _conv_wp(p, f"{n}.conv1", yp, relu=True)
            calib.append(act_stat(o, stat, p, f"{n}.conv2.in_scale"))
            o = _conv_wp(p, f"{n}.conv2", o, relu=False)
            yp = jax.nn.relu(o + yp)
        return yp.reshape(*y.shape[:-3], h, w, c)
    for n in names:
        if calib is not None:
            from ..ops.conv import act_stat
            calib.append(act_stat(y, stat, p, f"{n}.conv1.in_scale"))
            o = _cbr(p, y, f"{n}.conv1", f"{n}.bn1", padding=1)
            calib.append(act_stat(o, stat, p, f"{n}.conv2.in_scale"))
            o = _cbr(p, o, f"{n}.conv2", f"{n}.bn2", padding=1, relu=False)
            y = jax.nn.relu(o + y)
        else:
            y = _basic_block(p, n, y)
    return y


def _upsample_nearest(x, factor: int):
    for _ in range(factor.bit_length() - 1):
        x = jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)
    return x


def _conv2_maybe_wp(p: Dict, b: str, out, relu: bool = True):
    """layer1 conv2 (3x3, 64ch at full 1/4 res): width-packed when the
    prepacked kernel exists and the width divides."""
    wp = p.get(f"{b}.conv2.wp.weight")
    if wp is not None and out.shape[-2] % (wp.shape[2] // out.shape[-1]) == 0:
        f2 = wp.shape[2] // out.shape[-1]
        h2, w2, c2 = out.shape[-3], out.shape[-2], out.shape[-1]
        outp = out.reshape(*out.shape[:-3], h2, w2 // f2, f2 * c2)
        return _conv_wp(p, f"{b}.conv2", outp, relu=relu).reshape(
            *out.shape[:-3], h2, w2, c2)
    return _cbr(p, out, f"{b}.conv2", f"{b}.bn2", padding=1, relu=relu)


def _layer1(p: Dict, x, prefix: str, calib=None, stat: str = "max"):
    """The 4 bottleneck blocks (64->256), with optional calibration
    recording and a statically-calibrated s8 chain in max serving mode."""
    from ..ops.conv import act_stat, conv2d_int8_chain, quant_act_s8

    int8_ok = (calib is None
               and f"{prefix}.layer1.0.conv1.in_scale" in p
               and f"{prefix}.layer1.0.conv1.qweight" in p)
    dtype = x.dtype
    for i in range(4):
        b = f"{prefix}.layer1.{i}"
        if int8_ok:
            s1 = p[f"{b}.conv1.in_scale"]
            s2 = p[f"{b}.conv2.in_scale"]
            s3 = p[f"{b}.conv3.in_scale"]
            q = quant_act_s8(x, s1)
            q1 = conv2d_int8_chain(
                q, s1, p[f"{b}.conv1.qweight"], p[f"{b}.conv1.wscale"],
                p.get(f"{b}.conv1.bias"), out_scale=s2)
            wp = p.get(f"{b}.conv2.wp.qweight")
            if wp is not None and q1.shape[-2] % (wp.shape[2]
                                                  // q1.shape[-1]) == 0:
                f2 = wp.shape[2] // q1.shape[-1]
                h2, w2, c2 = q1.shape[-3], q1.shape[-2], q1.shape[-1]
                q1p = q1.reshape(*q1.shape[:-3], h2, w2 // f2, f2 * c2)
                q2 = conv2d_int8_chain(
                    q1p, s2, wp, p[f"{b}.conv2.wp.wscale"],
                    p.get(f"{b}.conv2.wp.bias"), padding=1, out_scale=s3
                ).reshape(*q1.shape[:-3], h2, w2, c2)
            else:
                q2 = conv2d_int8_chain(
                    q1, s2, p[f"{b}.conv2.qweight"], p[f"{b}.conv2.wscale"],
                    p.get(f"{b}.conv2.bias"), padding=1, out_scale=s3)
            y = conv2d_int8_chain(
                q2, s3, p[f"{b}.conv3.qweight"], p[f"{b}.conv3.wscale"],
                p.get(f"{b}.conv3.bias"), relu=False, out_scale=None)
            if i == 0:
                sc = conv2d_int8_chain(
                    q, s1, p[f"{b}.downsample.0.qweight"],
                    p[f"{b}.downsample.0.wscale"],
                    p.get(f"{b}.downsample.0.bias"), relu=False,
                    out_scale=None)
            else:
                sc = x.astype(jnp.float32)
            x = jax.nn.relu(y + sc).astype(dtype)
            continue
        if calib is not None:
            calib.append(act_stat(x, stat, p, f"{b}.conv1.in_scale"))
        out = _cbr(p, x, f"{b}.conv1", f"{b}.bn1")
        if calib is not None:
            calib.append(act_stat(out, stat, p, f"{b}.conv2.in_scale"))
        out = _conv2_maybe_wp(p, b, out)
        if calib is not None:
            calib.append(act_stat(out, stat, p, f"{b}.conv3.in_scale"))
        out = _cbr(p, out, f"{b}.conv3", f"{b}.bn3", relu=False)
        sc = _cbr(p, x, f"{b}.downsample.0", f"{b}.downsample.1", relu=False) \
            if i == 0 else x
        x = jax.nn.relu(out + sc)
    return x


def hrnet_forward(p: Dict, x: jnp.ndarray, cfg,
                  prefix: str = "backbone.bottom_up",
                  calib=None, stat: str = "max") -> List[jnp.ndarray]:
    """x: (H, W, 3) normalized. Returns the 4 branch maps
    [1/4, 1/8, 1/16, 1/32]. ``calib``: collect int8 calibration statistics
    (hrnet_int8_scale_sites order) during this fp pass."""
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

    x = _layer1(p, x, prefix, calib, stat)

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
                names = [f"{mod}.branches.{b}.{blk}"
                         for blk in range(num_blocks[si][b])]
                branch_out.append(_branch_chain(p, names, feats[b], chans[b],
                                                calib=calib, stat=stat))
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
                  prefix: str = "backbone",
                  calib=None, stat: str = "max") -> Dict[str, jnp.ndarray]:
    """Returns {"p1".."p5"} at strides 4..64. In max serving mode the two
    full-1/4-resolution convs (the 1x1 480->256 reduction and p1's 3x3
    256->256) run as calibrated s8 chains; the pooled levels p2..p5 are
    16-256x smaller and stay fp."""
    from ..ops.conv import act_stat, conv2d_int8_chain, quant_act_s8

    feats = hrnet_forward(p, x, cfg, prefix=f"{prefix}.bottom_up",
                          calib=calib, stat=stat)
    h, w = feats[0].shape[-3], feats[0].shape[-2]
    ups = [feats[0]]
    for i, f in enumerate(feats[1:], 1):
        ups.append(resize_bilinear(f, (h, w), scale=(float(2 ** i), float(2 ** i))))
    cat = jnp.concatenate(ups, axis=-1)
    if calib is not None:
        calib.append(act_stat(cat, stat, p, f"{prefix}.reduction_conv.in_scale"))
    int8_ok = (calib is None
               and f"{prefix}.reduction_conv.in_scale" in p
               and f"{prefix}.reduction_conv.qweight" in p)
    dtype = cat.dtype
    if int8_ok:
        s_cat = p[f"{prefix}.reduction_conv.in_scale"]
        red = conv2d_int8_chain(
            quant_act_s8(cat, s_cat), s_cat,
            p[f"{prefix}.reduction_conv.qweight"],
            p[f"{prefix}.reduction_conv.wscale"],
            p[f"{prefix}.reduction_conv.bias"], relu=False,
            out_scale=None, out_dtype=dtype)
    else:
        red = conv2d(cat, p[f"{prefix}.reduction_conv.weight"],
                     p[f"{prefix}.reduction_conv.bias"])
    if calib is not None:
        calib.append(act_stat(red, stat, p, f"{prefix}.fpn_conv.0.in_scale"))
    outs = {}
    for i in range(5):
        level = red if i == 0 else _avg_pool(red, 2 ** i)
        if i == 0 and int8_ok and f"{prefix}.fpn_conv.0.qweight" in p:
            s_red = p[f"{prefix}.fpn_conv.0.in_scale"]
            outs["p1"] = conv2d_int8_chain(
                quant_act_s8(level, s_red), s_red,
                p[f"{prefix}.fpn_conv.0.qweight"],
                p[f"{prefix}.fpn_conv.0.wscale"],
                p[f"{prefix}.fpn_conv.0.bias"], padding=1, relu=False,
                out_scale=None, out_dtype=dtype)
            continue
        outs[f"p{i + 1}"] = conv2d(level, p[f"{prefix}.fpn_conv.{i}.weight"],
                                   p[f"{prefix}.fpn_conv.{i}.bias"], padding=1)
    return outs


def hrnet_int8_scale_sites(cfg, prefix: str = "backbone.bottom_up",
                           hrfpn_prefix: str = "backbone") -> List[str]:
    """Ordered activation-scale names matching the calibration walk's
    recording order (layer1 per-conv inputs, then every branch BasicBlock's
    conv1/conv2 inputs in stage/module/branch/block order, then the HRFPN
    reduction and p1 conv inputs)."""
    sites = []
    for i in range(4):
        b = f"{prefix}.layer1.{i}"
        sites += [f"{b}.conv1.in_scale", f"{b}.conv2.in_scale",
                  f"{b}.conv3.in_scale"]
    stages = _stage_channels(cfg)
    num_modules = [cfg.MODEL.HRNET.STAGE2.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE3.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE4.NUM_MODULES]
    num_blocks = [cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS]
    for si, chans in enumerate(stages):
        sname = si + 2
        for m in range(num_modules[si]):
            mod = f"{prefix}.stage{sname}.{m}"
            for b in range(len(chans)):
                for blk in range(num_blocks[si][b]):
                    bb = f"{mod}.branches.{b}.{blk}"
                    sites += [f"{bb}.conv1.in_scale", f"{bb}.conv2.in_scale"]
    sites += [f"{hrfpn_prefix}.reduction_conv.in_scale",
              f"{hrfpn_prefix}.fpn_conv.0.in_scale"]
    return sites


def hrnet_int8_quant_bases(cfg, params,
                           prefix: str = "backbone.bottom_up",
                           hrfpn_prefix: str = "backbone") -> List[str]:
    """Conv bases whose weights get per-channel s8 twins in max mode.
    Branch convs quantize their width-packed variant when one exists
    (``<conv>.wp`` — quantizing the packed kernel keeps the chain fully
    packed); layer1 and HRFPN quantize the plain kernels (plus layer1
    conv2's packed twin when present)."""
    bases = []
    for i in range(4):
        b = f"{prefix}.layer1.{i}"
        bases += [f"{b}.conv1", f"{b}.conv3"]
        bases.append(f"{b}.conv2.wp" if f"{b}.conv2.wp.weight" in params
                     else f"{b}.conv2")
        if i == 0:
            bases.append(f"{b}.downsample.0")
    stages = _stage_channels(cfg)
    num_modules = [cfg.MODEL.HRNET.STAGE2.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE3.NUM_MODULES,
                   cfg.MODEL.HRNET.STAGE4.NUM_MODULES]
    num_blocks = [cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS,
                  cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS]
    for si, chans in enumerate(stages):
        sname = si + 2
        for m in range(num_modules[si]):
            mod = f"{prefix}.stage{sname}.{m}"
            for b in range(len(chans)):
                for blk in range(num_blocks[si][b]):
                    bb = f"{mod}.branches.{b}.{blk}"
                    sfx = (".wp" if f"{bb}.conv1.wp.weight" in params
                           else "")
                    bases += [f"{bb}.conv1{sfx}", f"{bb}.conv2{sfx}"]
    bases += [f"{hrfpn_prefix}.reduction_conv", f"{hrfpn_prefix}.fpn_conv.0"]
    return bases


def hrnet_int8_calibration(p: Dict, x: jnp.ndarray, cfg,
                           prefix: str = "backbone",
                           stat: str = "max") -> jnp.ndarray:
    """fp HRFPN pass recording every quantization site's activation
    statistic, in ``hrnet_int8_scale_sites`` order. ``x``: preprocessed
    network input."""
    calib: List = []
    hrfpn_forward(p, x, cfg, prefix=prefix, calib=calib, stat=stat)
    return jnp.stack(calib)


def hrfpn_out_strides(cfg) -> Dict[str, int]:
    return {"p1": 4, "p2": 8, "p3": 16, "p4": 32, "p5": 64}
