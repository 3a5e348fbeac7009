"""Golden-value tests of the op library against torch (CPU) and pure-numpy
references. This is the layer-parity kit from SURVEY.md section 4 item 1."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from densepose_tpu import ops
from tests.reference_ops import nms_np, roi_align_np


RNG = np.random.RandomState(0)


def t2n(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("in_hw,out_hw", [
    ((17, 23), (9, 12)),
    ((9, 12), (17, 23)),
    ((56, 56), (112, 112)),
    ((120, 160), (200, 267)),
    ((4, 4), (8, 8)),
])
def test_resize_bilinear_size_mode(in_hw, out_hw):
    x = RNG.randn(*in_hw, 3).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None], size=out_hw,
        mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0)
    got = ops.resize_bilinear(jnp.asarray(x), out_hw)
    # small residual comes from torch's different lerp association order
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("in_hw,k", [
    ((120, 160), 800 / 480),
    ((180, 320), min(800 / 720, 1333 / 1280)),
    ((135, 240), min(800 / 1080, 1333 / 1920)),
])
def test_resize_bilinear_scale_mode(in_hw, k):
    """The preprocess resize uses an explicit scale factor
    (engine/defaults.py:87-89) whose reciprocal is used directly as the
    coordinate ratio."""
    x = RNG.randn(*in_hw, 3).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None], scale_factor=k,
        mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0)
    out_hw = (int(in_hw[0] * k), int(in_hw[1] * k))
    assert tuple(want.shape[:2]) == out_hw
    got = ops.resize_bilinear(jnp.asarray(x), out_hw, scale=(k, k))
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-5, rtol=1e-4)


def test_upsample2x_nearest():
    x = RNG.randn(7, 9, 4).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                         scale_factor=2.0, mode="nearest")[0].permute(1, 2, 0)
    got = ops.upsample2x_nearest(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), t2n(want))


def test_resize_bilinear_scale2_matches_interp2d():
    """Chart predictor interp2d: scale_factor=2 bilinear (chart.py:62-74)."""
    x = RNG.randn(56, 56, 25).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                         scale_factor=2.0, mode="bilinear",
                         align_corners=False)[0].permute(1, 2, 0)
    got = ops.resize_bilinear(jnp.asarray(x), (112, 112), scale=(2.0, 2.0))
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# conv / pool / linear
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cin,cout,k,stride,pad,dil", [
    (8, 16, 3, 1, 1, 1),
    (8, 16, 1, 2, 0, 1),
    (16, 8, 7, 2, 3, 1),
    (8, 8, 3, 1, 6, 6),   # ASPP dilated conv
])
def test_conv2d(cin, cout, k, stride, pad, dil):
    x = RNG.randn(13, 17, cin).astype(np.float32)
    w = (RNG.randn(cout, cin, k, k) * 0.1).astype(np.float32)
    b = RNG.randn(cout).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x).permute(2, 0, 1)[None],
                    torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=pad, dilation=dil)[0].permute(1, 2, 0)
    w_hwio = np.transpose(w, (2, 3, 1, 0))
    got = ops.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                     stride=stride, padding=pad, dilation=dil)
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-5, rtol=1e-4)


def test_conv_transpose2d_k4s2p1():
    """The chart predictor deconv config: kernel 4, stride 2, padding 1
    (chart.py:45-62)."""
    cin, cout = 12, 5
    x = RNG.randn(14, 14, cin).astype(np.float32)
    w = (RNG.randn(cin, cout, 4, 4) * 0.1).astype(np.float32)  # torch convT layout
    b = RNG.randn(cout).astype(np.float32)
    want = F.conv_transpose2d(torch.from_numpy(x).permute(2, 0, 1)[None],
                              torch.from_numpy(w), torch.from_numpy(b),
                              stride=2, padding=1)[0].permute(1, 2, 0)
    # forward-conv equivalent kernel: flip taps, (Cin,Cout,kh,kw)->(kh,kw,Cin,Cout)
    w_eq = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    got = ops.conv_transpose2d(jnp.asarray(x), jnp.asarray(w_eq), jnp.asarray(b),
                               stride=2, padding=1)
    assert got.shape == (28, 28, cout)
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hw", [(10, 14), (11, 15)])
def test_max_pool_3x3s2p1(hw):
    x = RNG.randn(*hw, 6).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x).permute(2, 0, 1)[None],
                        kernel_size=3, stride=2, padding=1)[0].permute(1, 2, 0)
    got = ops.max_pool2d(jnp.asarray(x), kernel_size=3, stride=2, padding=1)
    np.testing.assert_array_equal(np.asarray(got), t2n(want))


def test_max_pool_1x1s2():
    x = RNG.randn(25, 34, 6).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x).permute(2, 0, 1)[None],
                        kernel_size=1, stride=2, padding=0)[0].permute(1, 2, 0)
    got = ops.max_pool2d(jnp.asarray(x), kernel_size=1, stride=2)
    np.testing.assert_array_equal(np.asarray(got), t2n(want))


def test_linear():
    x = RNG.randn(5, 64).astype(np.float32)
    w = RNG.randn(32, 64).astype(np.float32)
    b = RNG.randn(32).astype(np.float32)
    want = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    got = ops.linear(jnp.asarray(x), jnp.asarray(w.T.copy()), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def test_frozen_bn_matches_torch_batchnorm():
    c = 9
    x = RNG.randn(7, 8, c).astype(np.float32)
    w = RNG.rand(c).astype(np.float32) + 0.5
    b = RNG.randn(c).astype(np.float32)
    rm = RNG.randn(c).astype(np.float32)
    rv = RNG.rand(c).astype(np.float32) + 0.1
    want = F.batch_norm(torch.from_numpy(x).permute(2, 0, 1)[None],
                        torch.from_numpy(rm), torch.from_numpy(rv),
                        torch.from_numpy(w), torch.from_numpy(b),
                        training=False, eps=1e-5)[0].permute(1, 2, 0)
    got = ops.frozen_batch_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                jnp.asarray(rm), jnp.asarray(rv))
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=1e-5, rtol=1e-5)


def test_fold_frozen_bn_equivalence():
    cin, cout = 6, 10
    x = RNG.randn(9, 9, cin).astype(np.float32)
    w = (RNG.randn(3, 3, cin, cout) * 0.2).astype(np.float32)
    bnw = RNG.rand(cout).astype(np.float32) + 0.5
    bnb = RNG.randn(cout).astype(np.float32)
    rm = RNG.randn(cout).astype(np.float32)
    rv = RNG.rand(cout).astype(np.float32) + 0.1
    y_ref = ops.frozen_batch_norm(
        ops.conv2d(jnp.asarray(x), jnp.asarray(w), padding=1),
        jnp.asarray(bnw), jnp.asarray(bnb), jnp.asarray(rm), jnp.asarray(rv))
    wf, bf = ops.fold_frozen_bn(w, None, bnw, bnb, rm, rv)
    y_fold = ops.conv2d(jnp.asarray(x), jnp.asarray(wf), jnp.asarray(bf), padding=1)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref), atol=2e-5, rtol=1e-4)


def test_group_norm():
    c = 64
    x = RNG.randn(5, 6, c).astype(np.float32)
    w = RNG.randn(c).astype(np.float32)
    b = RNG.randn(c).astype(np.float32)
    gn = torch.nn.GroupNorm(32, c)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(w))
        gn.bias.copy_(torch.from_numpy(b))
    want = gn(torch.from_numpy(x).permute(2, 0, 1)[None])[0].permute(1, 2, 0)
    got = ops.group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 32)
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# boxes
# ---------------------------------------------------------------------------

def test_apply_deltas_matches_reference_formula():
    k = 50
    boxes = np.abs(RNG.randn(k, 4)).astype(np.float32) * 50
    boxes[:, 2:] += boxes[:, :2] + 1.0
    deltas = (RNG.randn(k, 4) * 2).astype(np.float32)
    weights = (10.0, 10.0, 5.0, 5.0)

    bt = torch.from_numpy(boxes)
    dt = torch.from_numpy(deltas)
    widths = bt[:, 2] - bt[:, 0]
    heights = bt[:, 3] - bt[:, 1]
    ctr_x = bt[:, 0] + 0.5 * widths
    ctr_y = bt[:, 1] + 0.5 * heights
    dx = dt[:, 0::4] / weights[0]
    dy = dt[:, 1::4] / weights[1]
    dw = torch.clamp(dt[:, 2::4] / weights[2], max=ops.boxes.DEFAULT_SCALE_CLAMP)
    dh = torch.clamp(dt[:, 3::4] / weights[3], max=ops.boxes.DEFAULT_SCALE_CLAMP)
    pcx = dx * widths[:, None] + ctr_x[:, None]
    pcy = dy * heights[:, None] + ctr_y[:, None]
    pw = torch.exp(dw) * widths[:, None]
    ph = torch.exp(dh) * heights[:, None]
    want = torch.stack((pcx - 0.5 * pw, pcy - 0.5 * ph,
                        pcx + 0.5 * pw, pcy + 0.5 * ph), dim=-1).reshape(k, 4)

    got = ops.apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes), weights)
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=1e-3, rtol=1e-5)


def test_clip_boxes_convention():
    boxes = jnp.asarray([[-5.0, -3.0, 900.0, 700.0]])
    # (H, W) = (600, 800): x clamps to 800, y to 600
    out = ops.clip_boxes(boxes, (600, 800))
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 0.0, 800.0, 600.0]])


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def _random_boxes(k, spread=100.0):
    ctr = RNG.rand(k, 2).astype(np.float32) * spread
    wh = RNG.rand(k, 2).astype(np.float32) * 40 + 1
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1)


@pytest.mark.parametrize("k,thresh,spread", [
    (64, 0.5, 100.0),
    (128, 0.7, 60.0),   # heavy overlap -> long suppression chains
    (256, 0.3, 400.0),
    (33, 0.5, 20.0),    # extreme overlap
])
def test_nms_matches_greedy(k, thresh, spread):
    boxes = _random_boxes(k, spread)
    scores = RNG.rand(k).astype(np.float32)
    want_keep = set(nms_np(boxes, scores, thresh).tolist())
    got = ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.ones(k, dtype=bool), thresh)
    got_keep = set(np.nonzero(np.asarray(got))[0].tolist())
    assert got_keep == want_keep


def test_nms_respects_valid_mask():
    boxes = _random_boxes(32)
    scores = RNG.rand(32).astype(np.float32)
    valid = np.zeros(32, dtype=bool)
    valid[:10] = True
    got = np.asarray(ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), 0.5))
    assert not got[10:].any()
    want_keep = set(nms_np(boxes[:10], scores[:10], 0.5).tolist())
    assert set(np.nonzero(got[:10])[0].tolist()) == want_keep


def test_batched_nms_is_per_class():
    boxes = np.tile(_random_boxes(16), (2, 1))
    scores = RNG.rand(32).astype(np.float32)
    idxs = np.repeat(np.array([0, 1]), 16)
    got = np.asarray(ops.batched_nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs),
        jnp.ones(32, dtype=bool), 0.5))
    for cls in (0, 1):
        sel = idxs == cls
        want = set(nms_np(boxes[sel], scores[sel], 0.5).tolist())
        assert set(np.nonzero(got[sel])[0].tolist()) == want


# ---------------------------------------------------------------------------
# ROIAlign
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("aligned", [False, True])
@pytest.mark.parametrize("out_size,ratio", [((7, 7), 2), ((14, 14), 2), ((5, 5), 1),
                                            ((7, 7), 0), ((14, 14), 0)])
def test_roi_align_single_level(aligned, out_size, ratio):
    feat = RNG.randn(24, 32, 8).astype(np.float32)
    boxes = np.array([
        [4.0, 4.0, 60.0, 40.0],
        [0.0, 0.0, 128.0, 96.0],
        [10.5, 7.25, 30.0, 22.5],
        [100.0, 80.0, 120.0, 95.0],   # partially outside
        [2.0, 2.0, 3.0, 3.0],         # tiny
    ], dtype=np.float32)
    scale = 0.25
    want = roi_align_np(feat, boxes, scale, out_size, ratio, aligned)
    got = ops.roi_align_single(jnp.asarray(feat), jnp.asarray(boxes), scale,
                               out_size, ratio, aligned)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_roi_align_multilevel_matches_per_level():
    feats = [RNG.randn(32, 48, 4).astype(np.float32),
             RNG.randn(16, 24, 4).astype(np.float32),
             RNG.randn(8, 12, 4).astype(np.float32)]
    scales = [0.25, 0.125, 0.0625]
    boxes = np.array([
        [4.0, 4.0, 68.0, 60.0],
        [0.0, 0.0, 180.0, 120.0],
        [8.0, 8.0, 40.0, 30.0],
    ], dtype=np.float32)
    levels = np.array([1, 2, 0], dtype=np.int32)
    got = ops.roi_align_multilevel(
        [jnp.asarray(f) for f in feats], jnp.asarray(boxes),
        jnp.asarray(levels), scales, (7, 7), 2, False)
    for i, lvl in enumerate(levels):
        want = roi_align_np(feats[lvl], boxes[i:i + 1], scales[lvl], (7, 7), 2, False)
        np.testing.assert_allclose(np.asarray(got[i]), want[0], atol=1e-4, rtol=1e-4)


def test_assign_boxes_to_levels():
    # canonical 224 box -> level 4; tiny box -> clamps to min
    boxes = jnp.asarray([
        [0.0, 0.0, 224.0, 224.0],
        [0.0, 0.0, 4.0, 4.0],
        [0.0, 0.0, 2000.0, 2000.0],
        [0.0, 0.0, 112.0, 112.0],
    ])
    lvls = np.asarray(ops.roi_align.assign_boxes_to_levels(boxes, 2, 5))
    np.testing.assert_array_equal(lvls, [2, 0, 3, 1])


def test_layer_norm_cf():
    """detectron2's channelwise LayerNorm (batch_norm.py:240-259): per-pixel
    normalization over the channel axis."""
    from densepose_tpu.ops.norms import layer_norm_cf
    c = 12
    x = RNG.randn(5, 7, c).astype(np.float32)
    w = RNG.randn(c).astype(np.float32)
    b = RNG.randn(c).astype(np.float32)
    xt = torch.from_numpy(x).permute(2, 0, 1)[None]  # (1, C, H, W)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    want = ((xt - u) / torch.sqrt(s + 1e-6) * torch.from_numpy(w)[:, None, None]
            + torch.from_numpy(b)[:, None, None])[0].permute(1, 2, 0)
    got = layer_norm_cf(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), t2n(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("aligned", [False, True])
@pytest.mark.parametrize("out_size,ratio", [((7, 7), 2), ((28, 28), 2), ((5, 5), 1)])
def test_roi_align_matmul_formulation(aligned, out_size, ratio):
    """The separable-matmul ROIAlign (TPU MXU path) == the numpy golden
    reference, including border and at-edge semantics."""
    feat = RNG.randn(24, 32, 8).astype(np.float32)
    boxes = np.array([
        [4.0, 4.0, 60.0, 40.0],
        [0.0, 0.0, 128.0, 96.0],
        [10.5, 7.25, 30.0, 22.5],
        [100.0, 80.0, 120.0, 95.0],   # partially outside
        [2.0, 2.0, 3.0, 3.0],         # tiny
        [-30.0, -20.0, 10.0, 8.0],    # extends past the top-left border
    ], dtype=np.float32)
    scale = 0.25
    want = roi_align_np(feat, boxes, scale, out_size, ratio, aligned)
    got = ops.roi_align.roi_align_single_matmul(
        jnp.asarray(feat), jnp.asarray(boxes), scale, out_size, ratio, aligned)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_roi_align_multilevel_matmul_matches_gather():
    """The MXU multi-level formulation == the gather formulation, including
    level mask-selection and chunking."""
    from densepose_tpu.ops.roi_align import (assign_boxes_to_levels,
                                             roi_align_multilevel,
                                             roi_align_multilevel_matmul)
    feats = [jnp.asarray(RNG.randn(32 // (2 ** i), 40 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    scales = [0.25 / (2 ** i) for i in range(4)]
    boxes = (RNG.rand(21, 4) * np.array([80, 60, 80, 60])).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:]) + 8
    b = jnp.asarray(boxes)
    lv = assign_boxes_to_levels(b, 2, 5)
    want = roi_align_multilevel(feats, b, lv, scales, (7, 7), 2, False)
    got = roi_align_multilevel_matmul(feats, b, lv, scales, (7, 7), 2, False,
                                      chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_upsample2x_bilinear_exact():
    """Shift-add scale-2 upsample == torch F.interpolate(scale_factor=2) and
    == resize_bilinear with scale (2,2), in fp32 (commutative-equal sums)."""
    from densepose_tpu.ops.resize import resize_bilinear, upsample2x_bilinear
    x = RNG.randn(3, 9, 13, 5).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear",
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    ref = np.asarray(resize_bilinear(jnp.asarray(x), (18, 26), scale=(2.0, 2.0)))
    np.testing.assert_array_equal(got, ref)
    # 3-dim (H, W, C) input path
    got3 = np.asarray(upsample2x_bilinear(jnp.asarray(x[0])))
    np.testing.assert_array_equal(got3, got[0])


def test_conv_transpose2d_polyphase_exact():
    """Polyphase decomposition of ConvTranspose2d(k4,s2,p1) == the
    lhs-dilation form (same 4 taps per output; reassociation-level only)."""
    from densepose_tpu.ops.conv import (conv_transpose2d,
                                        conv_transpose2d_polyphase)
    x = jnp.asarray(RNG.randn(2, 13, 17, 6).astype(np.float32))
    w = jnp.asarray(RNG.randn(4, 4, 6, 9).astype(np.float32))
    b = jnp.asarray(RNG.randn(9).astype(np.float32))
    want = np.asarray(conv_transpose2d(x, w, b, stride=2, padding=1,
                                       kernel_size=4))
    got = np.asarray(conv_transpose2d_polyphase(x, w, b))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_resize_bilinear_smallc_bit_exact():
    """Transposed-W-pass resize == the standard formulation, bit for bit
    (same per-element arithmetic; only the gather layout differs)."""
    from densepose_tpu.ops.resize import resize_bilinear, resize_bilinear_smallc
    x = jnp.asarray((RNG.rand(48, 64, 3) * 255).round().astype(np.float32))
    k = min(800 / 48, 1333 / 64)
    a = np.asarray(resize_bilinear(x, (61, 80), scale=(1.27, 1.27)))
    b = np.asarray(resize_bilinear_smallc(x, (61, 80), scale=(1.27, 1.27)))
    np.testing.assert_array_equal(a, b)
    x2 = jnp.asarray(RNG.rand(2, 40, 30, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(resize_bilinear(x2, (19, 17))),
        np.asarray(resize_bilinear_smallc(x2, (19, 17))))


def test_resize_bilinear_packed_bit_exact():
    """Packed W*C-axis resize == the standard formulation, bit for bit
    (same taps and fp32 lerp; only the memory movement differs). Also
    checks the uint8-input form the preprocess uses."""
    from densepose_tpu.ops.resize import resize_bilinear, resize_bilinear_packed
    u8 = (RNG.rand(48, 64, 3) * 255).round().astype(np.uint8)
    x = jnp.asarray(u8.astype(np.float32))
    a = np.asarray(resize_bilinear(x, (61, 80), scale=(1.27, 1.27)))
    b = np.asarray(resize_bilinear_packed(jnp.asarray(u8), (61, 80),
                                          scale=(1.27, 1.27)))
    np.testing.assert_array_equal(a, b)
    # downscale, size mode, C != 3
    x2 = jnp.asarray(RNG.rand(40, 30, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(resize_bilinear(x2, (19, 17))),
        np.asarray(resize_bilinear_packed(x2, (19, 17))))


def test_packed_preprocess_bit_exact(monkeypatch):
    """The default packed preprocess produces bit-identical padded network
    inputs to the opt-out smallc path (DENSEPOSE_TPU_SMALLC_PREPROCESS)."""
    from densepose_tpu.config import load_config
    from densepose_tpu.models.rcnn import GeneralizedRCNN

    cfg = load_config(
        "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml",
        ["INPUT.MIN_SIZE_TEST", "96", "INPUT.MAX_SIZE_TEST", "160"])
    m = GeneralizedRCNN(cfg)
    img = jnp.asarray((RNG.rand(75, 117, 3) * 255).astype(np.uint8))

    monkeypatch.setenv("DENSEPOSE_TPU_SMALLC_PREPROCESS", "1")
    base, hw1, hwp = m.preprocess(img, (75, 117))
    monkeypatch.delenv("DENSEPOSE_TPU_SMALLC_PREPROCESS", raising=False)
    got, hw1b, hwpb = m.preprocess(img, (75, 117))
    assert (hw1, hwp) == (hw1b, hwpb)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_roi_align_windowed_matches_matmul():
    """x-sorted window pooler == the plain matmul pooler, including wide
    elongated boxes that overflow the window (cond fallback) and the
    scatter back to caller box order."""
    from densepose_tpu.ops.roi_align import (assign_boxes_to_levels,
                                             roi_align_multilevel_matmul,
                                             roi_align_multilevel_windowed)
    feats = [jnp.asarray(RNG.randn(32 // (2 ** i), 40 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    scales = [0.25 / (2 ** i) for i in range(4)]
    boxes = (RNG.rand(21, 4) * np.array([80, 60, 80, 60])).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:]) * 0.2 + 6
    boxes[0] = [0.0, 10.0, 158.0, 14.0]   # elongated: overflows the window
    b = jnp.asarray(boxes)
    lv = assign_boxes_to_levels(b, 2, 5)
    want = roi_align_multilevel_matmul(feats, b, lv, scales, (7, 7), 2, False)
    got = roi_align_multilevel_windowed(feats, b, lv, scales, (7, 7), 2,
                                        False, chunk=8, window=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_roi_align_levelsorted_matches_matmul():
    """Level-sorted chunked pooler (the default TPU multi-level routing) ==
    the plain matmul pooler: the same per-box einsums run, only grouped by
    level, with absent levels cond-skipped and results scattered back to
    caller box order. Chunk composition shifts einsum tiling, so equality
    is reassociation-level, not bitwise."""
    from densepose_tpu.ops.roi_align import (assign_boxes_to_levels,
                                             roi_align_multilevel_levelsorted,
                                             roi_align_multilevel_matmul)
    feats = [jnp.asarray(RNG.randn(32 // (2 ** i), 40 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    scales = [0.25 / (2 ** i) for i in range(4)]
    boxes = (RNG.rand(37, 4) * np.array([80, 60, 80, 60])).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:]) + 8
    b = jnp.asarray(boxes)
    lv = assign_boxes_to_levels(b, 2, 5)
    want = roi_align_multilevel_matmul(feats, b, lv, scales, (7, 7), 2, False,
                                       chunk=8)
    got = roi_align_multilevel_levelsorted(feats, b, lv, scales, (7, 7), 2,
                                           False, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # degenerate: all boxes on one level (3 of 4 conds skip everywhere);
    # same chunking, but the cond wrapper alone shifts einsum codegen, so
    # still reassociation-level only
    lv1 = jnp.zeros_like(lv)
    want1 = roi_align_multilevel_matmul(feats, b, lv1, scales, (7, 7), 2,
                                        False, chunk=8)
    got1 = roi_align_multilevel_levelsorted(feats, b, lv1, scales, (7, 7), 2,
                                            False, chunk=8)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               atol=1e-5, rtol=1e-5)


def test_roi_align_levelsorted_windowed_branch():
    """The column-window branch of the level-sorted pooler (levels wider
    than ``window``): narrow chunks pool from a dynamic slice (Y-first
    einsums), an elongated box overflowing the window takes the cond
    fallback, results still match the plain matmul pooler in caller box
    order."""
    from densepose_tpu.ops.roi_align import (assign_boxes_to_levels,
                                             roi_align_multilevel_levelsorted,
                                             roi_align_multilevel_matmul)
    feats = [jnp.asarray(RNG.randn(32 // (2 ** i), 40 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    scales = [0.25 / (2 ** i) for i in range(4)]
    boxes = (RNG.rand(21, 4) * np.array([80, 60, 80, 60])).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:]) * 0.2 + 6
    boxes[0] = [0.0, 10.0, 158.0, 14.0]   # elongated: overflows the window
    b = jnp.asarray(boxes)
    lv = assign_boxes_to_levels(b, 2, 5)
    want = roi_align_multilevel_matmul(feats, b, lv, scales, (7, 7), 2, False)
    got = roi_align_multilevel_levelsorted(feats, b, lv, scales, (7, 7), 2,
                                           False, chunk=8, window=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # bf16 feats through the same routing (the production dtype)
    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    want16 = roi_align_multilevel_matmul(feats16, b, lv, scales, (7, 7), 2,
                                         False)
    got16 = roi_align_multilevel_levelsorted(feats16, b, lv, scales, (7, 7),
                                             2, False, chunk=8, window=16)
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(want16, np.float32),
        atol=2e-2, rtol=2e-2)


def test_roi_align_multilevel_vmap_routing(monkeypatch):
    """Under vmap the TPU multi-level routing must take the matmul path
    (cond-under-vmap executes both branches, making the level-sorted skip
    pure overhead) and still match per-image results."""
    import jax
    from densepose_tpu.ops import roi_align as RA

    feats = [jnp.asarray(RNG.randn(2, 32 // (2 ** i), 40 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    scales = [0.25 / (2 ** i) for i in range(4)]
    boxes = (RNG.rand(2, 9, 4) * np.array([80, 60, 80, 60])).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + np.abs(boxes[..., 2:]) + 8
    b = jnp.asarray(boxes)
    lv = jax.vmap(lambda bb: RA.assign_boxes_to_levels(bb, 2, 5))(b)

    monkeypatch.setattr(RA, "_on_tpu", lambda: True)

    def pool(fs, bb, ll):
        return RA.roi_align_multilevel(list(fs), bb, ll, scales, (7, 7), 2,
                                       False)

    got = jax.vmap(pool, in_axes=(0, 0, 0))(tuple(feats), b, lv)
    for i in range(2):
        want = RA.roi_align_multilevel_matmul(
            [f[i] for f in feats], b[i], lv[i], scales, (7, 7), 2, False)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_sparse_pooler_interpret_parity():
    """roi_align_multilevel_sparse (Pallas skip-flag pooler, interpret mode
    on CPU) == the separable-matmul pooler; exercises the (level, x) sort,
    per-level Wx zeroing, flag derivation, and un-permutation."""
    import jax.numpy as jnp
    from densepose_tpu.ops.pallas.roi_align_kernel import roi_align_multilevel_sparse
    from densepose_tpu.ops.roi_align import roi_align_multilevel_matmul

    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.randn(32 // (2 ** i), 64 // (2 ** i), 128)
                         .astype(np.float32)) for i in range(4)]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    m = 70
    xy = rng.rand(m, 2).astype(np.float32) * 100
    wh = rng.rand(m, 2).astype(np.float32) * 60 + 4
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
    levels = jnp.asarray(rng.randint(0, 4, size=m).astype(np.int32))

    want = np.asarray(roi_align_multilevel_matmul(
        feats, boxes, levels, scales, (7, 7), 2, True))
    got = np.asarray(roi_align_multilevel_sparse(
        feats, boxes, levels, scales, (7, 7), 2, True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_packed_stem_conv_exact():
    """conv_stride2_packed (packed-lane MXU stem) == conv2d(stride=2,
    padding=k//2) for the 7x7 ResNet and 3x3 HRNet stem geometries, single
    and batched, including non-multiple-of-8 output widths. fp32 CPU is
    bitwise here (same products; the lane padding contributes exact zeros)."""
    import jax.numpy as jnp
    from densepose_tpu.ops.conv import conv2d, conv_stride2_packed

    rng = np.random.RandomState(3)
    for (h, w, k) in [(64, 96, 7), (64, 96, 3), (32, 52, 7), (96, 168, 3)]:
        x = rng.randn(h, w, 3).astype(np.float32)
        wk = rng.randn(k, k, 3, 64).astype(np.float32)
        b = rng.randn(64).astype(np.float32)
        want = conv2d(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b),
                      stride=2, padding=k // 2)
        got = conv_stride2_packed(jnp.asarray(x).reshape(h, w * 3),
                                  jnp.asarray(wk), jnp.asarray(b),
                                  padding=k // 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        xb = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        wantb = conv2d(xb, jnp.asarray(wk), jnp.asarray(b),
                       stride=2, padding=k // 2)
        gotb = conv_stride2_packed(xb.reshape(2, h, w * 3), jnp.asarray(wk),
                                   jnp.asarray(b), padding=k // 2)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(wantb),
                                   atol=1e-5, rtol=1e-5)


def test_conv2d_rgb_s2_routing_and_fallback(monkeypatch):
    """conv2d_rgb_s2 falls back to the plain conv for odd spatial sizes and
    honors DENSEPOSE_TPU_NO_PACKED_STEM; both routes agree."""
    import jax.numpy as jnp
    from densepose_tpu.ops.conv import conv2d, conv2d_rgb_s2

    rng = np.random.RandomState(4)
    wk = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    # odd width -> must fall back, still correct
    x_odd = jnp.asarray(rng.randn(32, 49, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv2d_rgb_s2(x_odd, wk, b)),
        np.asarray(conv2d(x_odd, wk, b, stride=2, padding=3)), atol=1e-6)
    # env escape hatch forces the plain lowering
    x = jnp.asarray(rng.randn(32, 48, 3).astype(np.float32))
    packed = np.asarray(conv2d_rgb_s2(x, wk, b))
    monkeypatch.setenv("DENSEPOSE_TPU_NO_PACKED_STEM", "1")
    plain = np.asarray(conv2d_rgb_s2(x, wk, b))
    np.testing.assert_allclose(packed, plain, atol=1e-5, rtol=1e-5)
