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


def hrnet_wpack_augment(params: Dict, cfg,
                        prefix: str = "backbone.bottom_up") -> None:
    """Add host-precomputed width-packed kernels (``<conv>.wp.weight`` /
    ``.wp.bias``) for every lane-starved 3x3 branch conv. Mutates
    ``params`` in place; no-op when packing is disabled, BN is unfolded,
    or a conv's channel width doesn't benefit."""
    import numpy as np

    from ..ops.conv import pack_width_conv_kernel, pick_pack_factor

    if not bool(getattr(cfg.TPU, "HRNET_PACKED_BRANCHES", True)):
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


def _branch_chain(p: Dict, names: List[str], y, c: int):
    """Run a branch's BasicBlock chain, width-packed end-to-end when the
    packed kernels exist and the width divides (pack/unpack are free
    reshapes, so the whole chain runs at full lane width)."""
    wp0 = p.get(f"{names[0]}.conv1.wp.weight") if names else None
    if wp0 is not None:
        f = wp0.shape[2] // c
        h, w = y.shape[-3], y.shape[-2]
        if w % f == 0 and all(f"{n}.conv2.wp.weight" in p for n in names):
            yp = y.reshape(*y.shape[:-3], h, w // f, f * c)
            for n in names:
                yp = _basic_block_wp(p, n, yp)
            return yp.reshape(*y.shape[:-3], h, w, c)
    for n in names:
        y = _basic_block(p, n, y)
    return y


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
        if (f"{b}.conv2.wp.weight" in p
                and out.shape[-2] % (p[f"{b}.conv2.wp.weight"].shape[2]
                                     // out.shape[-1]) == 0):
            f2 = p[f"{b}.conv2.wp.weight"].shape[2] // out.shape[-1]
            h2, w2, c2 = out.shape[-3], out.shape[-2], out.shape[-1]
            outp = out.reshape(*out.shape[:-3], h2, w2 // f2, f2 * c2)
            out = _conv_wp(p, f"{b}.conv2", outp, relu=True).reshape(
                *out.shape[:-3], h2, w2, c2)
        else:
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
                names = [f"{mod}.branches.{b}.{blk}"
                         for blk in range(num_blocks[si][b])]
                branch_out.append(_branch_chain(p, names, feats[b], chans[b]))
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
