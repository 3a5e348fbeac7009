"""HRNet width-packed branch convs (r5, VERDICT r4 #1).

The 32/64-channel branch convs fill only 25/50% of the 128 MXU lanes; the
(H, W, C) -> (H, W/f, f*C) repack is a free NHWC reshape and the prepacked
kernel (ops/conv.py::pack_width_conv_kernel) makes the conv mathematically
identical (contraction order aside). Proven here:
1. packed conv == plain conv at kernel level (several C/f/geometry combos,
   incl. non-square and edge-dominated tiny maps),
2. the full HRNet+HRFPN forward with packed params matches the unpacked
   forward within fp32 reassociation tolerance,
3. a width that doesn't divide by the pack factor falls back to the
   unpacked path (still correct),
4. the exact-parity unfolded-BN mode never packs.
"""

import os

import numpy as np
import pytest


# the predictor packs on TPU backends only (CPU has no lane constraint
# and would just pay f x the MACs); these parity tests exercise the
# packed path explicitly at tiny sizes. Scoped to this module so a
# single-process `pytest tests/` run doesn't leak the override into
# later HRNet tests (which would then run the CPU-slow packed path).
def setup_module(_m):
    os.environ["DENSEPOSE_HRNET_FORCE_WPACK"] = "1"


def teardown_module(_m):
    os.environ.pop("DENSEPOSE_HRNET_FORCE_WPACK", None)

import jax
import jax.numpy as jnp

from densepose_tpu import model_zoo
from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                torch_state_to_jax)
from densepose_tpu.models.hrnet import (hrfpn_forward, hrnet_fold_bn,
                                         hrnet_host_optimize,
                                         hrnet_wpack_augment)
from densepose_tpu.models.rcnn import build_model
from densepose_tpu.ops.conv import (conv2d, pack_width_conv_kernel,
                                    pick_pack_factor, wpack_cost)

RNG = np.random.RandomState(3)


def _hrnet_cfg():
    cfg = model_zoo.get_config("densepose_rcnn_HRFPN_HRNet_w32_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(["INPUT.MIN_SIZE_TEST", "64",
                         "INPUT.MAX_SIZE_TEST", "128"])
    cfg.freeze()
    return cfg


def _hrnet_params(cfg, fold_bn=True):
    model = build_model(cfg)
    spec = model.spec()
    state = random_torch_state(spec, seed=9)
    return torch_state_to_jax(state, spec, fold_bn=fold_bn)


@pytest.mark.parametrize("c,cout,f,hw", [
    (32, 32, 4, (12, 16)),
    (64, 64, 2, (10, 24)),
    (32, 64, 4, (4, 8)),     # edge-dominated tiny map
    (48, 48, 2, (9, 16)),
])
def test_packed_kernel_equals_plain_conv(c, cout, f, hw):
    h, w = hw
    x = RNG.randn(h, w, c).astype(np.float32)
    ker = RNG.randn(3, 3, c, cout).astype(np.float32)
    b = RNG.randn(cout).astype(np.float32)
    ref = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(ker),
                            jnp.asarray(b), padding=1))
    wp = pack_width_conv_kernel(ker, f)
    xp = jnp.asarray(x).reshape(h, w // f, f * c)
    got = np.asarray(conv2d(xp, jnp.asarray(wp),
                            jnp.asarray(np.tile(b, f)),
                            padding=1)).reshape(h, w, cout)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pick_pack_factor_model():
    assert pick_pack_factor(32) == 4   # 2.25*HW vs 3*HW
    assert pick_pack_factor(64) == 2   # 4.5*HW vs 6*HW
    assert pick_pack_factor(128) == 1  # already full-lane
    assert pick_pack_factor(256) == 1
    assert wpack_cost(32, 4) < wpack_cost(32, 1)


def test_hrnet_forward_packed_matches_unpacked():
    cfg = _hrnet_cfg()
    params = _hrnet_params(cfg)
    aug = dict(params)
    hrnet_host_optimize(aug, cfg)
    n_packed = sum(1 for k in aug if k.endswith(".wp.weight"))
    # the host pass also folds every sibling-named HRNet BN
    assert not any(".bn" in k for k in aug if k.startswith("backbone.bottom_up"))
    # w32: 4 layer1 conv2 + 2*(4+4)*1 stage2(b0,b1) + ... every <128-ch
    # branch conv gets a packed twin
    assert n_packed > 60, n_packed

    x = RNG.randn(64, 128, 3).astype(np.float32)
    plain = jax.jit(lambda p, x: hrfpn_forward(p, x, cfg))(params, x)
    packed = jax.jit(lambda p, x: hrfpn_forward(p, x, cfg))(aug, x)
    for lvl in plain:
        a, b = np.asarray(plain[lvl]), np.asarray(packed[lvl])
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-4, lvl


def test_branch_chain_nondivisible_width_falls_back():
    """Legal HRNet inputs (64-divisible) always divide by the pack factor,
    but the guard must still route a non-divisible width through the plain
    path rather than crash or mis-reshape."""
    from densepose_tpu.models.hrnet import _branch_chain

    c, f, h, w = 32, 4, 8, 22  # 22 % 4 != 0
    ker1 = RNG.randn(3, 3, c, c).astype(np.float32)
    ker2 = RNG.randn(3, 3, c, c).astype(np.float32)
    b1 = RNG.randn(c).astype(np.float32)
    b2 = RNG.randn(c).astype(np.float32)
    p = {"m.0.conv1.weight": jnp.asarray(ker1), "m.0.conv1.bias": jnp.asarray(b1),
         "m.0.conv2.weight": jnp.asarray(ker2), "m.0.conv2.bias": jnp.asarray(b2),
         "m.0.conv1.wp.weight": jnp.asarray(pack_width_conv_kernel(ker1, f)),
         "m.0.conv1.wp.bias": jnp.asarray(np.tile(b1, f)),
         "m.0.conv2.wp.weight": jnp.asarray(pack_width_conv_kernel(ker2, f)),
         "m.0.conv2.wp.bias": jnp.asarray(np.tile(b2, f))}
    x = jnp.asarray(RNG.randn(h, w, c).astype(np.float32))
    got = np.asarray(_branch_chain(p, ["m.0"], x, c))
    plain = {k: v for k, v in p.items() if ".wp." not in k}
    want = np.asarray(_branch_chain(plain, ["m.0"], x, c))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # and a divisible width takes the packed path and agrees (to
    # reassociation noise, scaled by the unnormalized activations)
    x2 = jnp.asarray(RNG.randn(h, 24, c).astype(np.float32))
    got2 = np.asarray(_branch_chain(p, ["m.0"], x2, c))
    want2 = np.asarray(_branch_chain(plain, ["m.0"], x2, c))
    scale = max(np.abs(want2).max(), 1e-6)
    assert np.abs(got2 - want2).max() / scale < 1e-5


def test_unfolded_bn_mode_never_packs():
    cfg = model_zoo.get_config("densepose_rcnn_HRFPN_HRNet_w32_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(["TPU.FOLD_FROZEN_BN", "False"])
    cfg.freeze()
    params = _hrnet_params(cfg, fold_bn=False)
    aug = dict(params)
    hrnet_host_optimize(aug, cfg)
    # exact-parity mode: no fold, hence no packed twins either
    assert any(".bn1.running_mean" in k for k in aug)
    assert not any(k.endswith(".wp.weight") for k in aug)


def test_disabled_by_config():
    cfg = model_zoo.get_config("densepose_rcnn_HRFPN_HRNet_w32_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(["TPU.HRNET_PACKED_BRANCHES", "False"])
    cfg.freeze()
    params = _hrnet_params(cfg)
    aug = dict(params)
    hrnet_host_optimize(aug, cfg)
    # BN still folds (that part is exact), but nothing packs
    assert not any(k.endswith(".wp.weight") for k in aug)


def test_branch_chain_int8_envelope():
    """The s8 branch chain (max mode) tracks the fp chain within the usual
    post-training-int8 envelope on realistic-scale activations."""
    from densepose_tpu.models.hrnet import _branch_chain
    from densepose_tpu.ops.conv import quantize_weight_int8

    c, f, h, w = 32, 4, 16, 32
    p = {}
    names = ["m.0", "m.1"]
    for n in names:
        for cv in ("conv1", "conv2"):
            ker = (RNG.randn(3, 3, c, c) * 0.1).astype(np.float32)
            b = (RNG.randn(c) * 0.05).astype(np.float32)
            p[f"{n}.{cv}.weight"] = jnp.asarray(ker)
            p[f"{n}.{cv}.bias"] = jnp.asarray(b)
            p[f"{n}.{cv}.wp.weight"] = jnp.asarray(pack_width_conv_kernel(ker, f))
            p[f"{n}.{cv}.wp.bias"] = jnp.asarray(np.tile(b, f))
    x = jnp.asarray(RNG.randn(h, w, c).astype(np.float32))
    want = np.asarray(_branch_chain(p, names, x, c))

    # calibrate: record per-conv input maxes with the walk, install scales,
    # quantize the packed kernels
    calib = []
    _branch_chain(p, names, x, c, calib=calib)
    assert len(calib) == 4  # conv1+conv2 per block
    it = iter([float(v) for v in calib])
    for n in names:
        p[f"{n}.conv1.in_scale"] = np.float32(max(next(it) / 127.0, 1e-8))
        p[f"{n}.conv2.in_scale"] = np.float32(max(next(it) / 127.0, 1e-8))
        for cv in ("conv1", "conv2"):
            qw, sw = quantize_weight_int8(p[f"{n}.{cv}.wp.weight"])
            p[f"{n}.{cv}.wp.qweight"] = qw
            p[f"{n}.{cv}.wp.wscale"] = sw
    got = np.asarray(_branch_chain(p, names, x, c))
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert np.isfinite(got).all()
    assert rel < 0.05, rel  # the int8 step envelope, not reassociation noise


def test_hrnet_max_mode_predictor_end_to_end():
    """TPU.INT8_BACKBONE on HRNet: calibration installs every site, the
    packed branch convs quantize their packed kernels, and the pipeline
    produces finite outputs."""
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config("densepose_rcnn_HRFPN_HRNet_w32_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(["INPUT.MIN_SIZE_TEST", "64",
                         "INPUT.MAX_SIZE_TEST", "128",
                         "MODEL.RPN.POST_NMS_TOPK_TEST", "50",
                         "TEST.DETECTIONS_PER_IMAGE", "5",
                         "TPU.INT8_BACKBONE", "True"])
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    img = (RNG.rand(96, 128, 3) * 255).astype(np.uint8)
    pred.calibrate_int8([img])

    from densepose_tpu.models.hrnet import hrnet_int8_scale_sites
    for s in hrnet_int8_scale_sites(cfg):
        assert s in pred.params, s
    assert ("backbone.bottom_up.stage2.0.branches.0.0.conv1.wp.qweight"
            in pred.params)
    assert "backbone.reduction_conv.qweight" in pred.params

    out = pred.predict_numpy((RNG.rand(96, 128, 3) * 255).astype(np.uint8))
    assert np.isfinite(out["pred_boxes"]).all()
    assert np.isfinite(out["scores"]).all()


def test_hrnet_calibration_sidecar_roundtrip(tmp_path):
    """save_calibration -> fresh predictor -> load_calibration reproduces
    the max-mode params for HRNet (same machinery the resnet path pins in
    test_int8; here covering the hrnet group's sites + wp quant bases)."""
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config("densepose_rcnn_HRFPN_HRNet_w32_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(["INPUT.MIN_SIZE_TEST", "64",
                         "INPUT.MAX_SIZE_TEST", "128",
                         "MODEL.RPN.POST_NMS_TOPK_TEST", "50",
                         "TEST.DETECTIONS_PER_IMAGE", "5",
                         "TPU.INT8_BACKBONE", "True"])
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    img = (RNG.rand(96, 128, 3) * 255).astype(np.uint8)
    pred.calibrate_int8([img])
    path = str(tmp_path / "hrnet.calib.json")
    pred.save_calibration(path)

    pred2 = DensePosePredictor(cfg, seed=0)
    pred2.load_calibration(path)
    from densepose_tpu.models.hrnet import hrnet_int8_scale_sites
    for s in hrnet_int8_scale_sites(cfg):
        np.testing.assert_allclose(np.asarray(pred2.params[s]),
                                   np.asarray(pred.params[s]))
    k = "backbone.bottom_up.stage2.0.branches.0.0.conv1.wp.qweight"
    np.testing.assert_array_equal(np.asarray(pred2.params[k]),
                                  np.asarray(pred.params[k]))
