"""Input-GEOMETRY bucketing (TPU.GEOMETRY_BUCKET_QUANT, VERDICT r3 #4).

Without it, every distinct input (H0, W0) costs a full multi-minute compile
(predictor.py one-compile-per-shape). The bucketed serving path resizes on
the HOST with a bit-identical numpy mirror of the in-graph resize, pads the
resized image to a quantized geometry bucket, and serves every input size
from one compiled graph per bucket (models/rcnn.py::forward_bucketed).

Contract proven here:
1. the host resize is BIT-IDENTICAL to the in-graph resize (same taps, same
   fp32 lerp, same round-half-even quantization),
2. the bucketed graph's normalized input is BITWISE-equal to the per-shape
   graph's inside the minimal-pad extent and exactly zero outside,
3. end-to-end outputs match the per-shape graph within a printed envelope
   (count, matched boxes, scores, same-slot SIUV) — exact equality is NOT
   claimed: the wider zero border shifts conv boundary effects, the same
   divergence class the reference itself accepts when its batching pads
   images to a common size,
4. a directory's worth of mixed-size images compiles a bounded number of
   graphs (the whole point).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densepose_tpu import model_zoo
from densepose_tpu.checkpoint.transform import random_torch_state, torch_state_to_jax
from densepose_tpu.models.rcnn import build_model, compute_resize, pad_to_divisible
from densepose_tpu.ops.resize import resize_bilinear_np, resize_bilinear_packed
from densepose_tpu.predictor import DensePosePredictor

TINY = [
    "INPUT.MIN_SIZE_TEST", "128",
    "INPUT.MAX_SIZE_TEST", "224",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "200",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "100",
    "TEST.DETECTIONS_PER_IMAGE", "20",
    "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
]

RNG = np.random.RandomState(11)
# three raw sizes that resize into TWO distinct 64-quantized buckets
SIZES = [(160, 200), (180, 240), (200, 150)]


def _cfg(quant=0):
    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY + ["TPU.GEOMETRY_BUCKET_QUANT", str(quant)])
    cfg.freeze()
    return cfg


def _tamed_params(cfg):
    from tests.test_realscale_parity import detection_tamed_state
    model = build_model(cfg)
    spec = model.spec()
    state = detection_tamed_state(random_torch_state(spec, seed=5))
    return torch_state_to_jax(state, spec, fold_bn=cfg.TPU.FOLD_FROZEN_BN)


def test_host_resize_bit_identical_to_graph():
    """resize_bilinear_np + round-half-even quantization == the in-graph
    preprocess resize (resize_bilinear_packed + jnp.round), byte for byte,
    at downscale, upscale and identity scales."""
    img = (RNG.rand(97, 133, 3) * 255).astype(np.uint8)
    for h0, w0, ms, mx in ((97, 133, 64, 128), (97, 133, 200, 400),
                           (97, 133, 97, 400)):
        k, h1, w1 = compute_resize(h0, w0, ms, mx)
        want = jax.jit(lambda x: jnp.clip(jnp.round(
            resize_bilinear_packed(x, (h1, w1), scale=(k, k))), 0, 255)
        )(jnp.asarray(img))
        got = np.clip(np.rint(resize_bilinear_np(img, (h1, w1), scale=(k, k))),
                      0, 255)
        np.testing.assert_array_equal(got.astype(np.uint8),
                                      np.asarray(want).astype(np.uint8),
                                      err_msg=f"min={ms} max={mx}")


def test_bucketed_preprocess_bitwise_inside_extent():
    """The bucket canvas after normalize+mask is BITWISE what the per-shape
    preprocess produces, inside the minimal-pad extent — and exactly zero
    outside it."""
    cfg = _cfg(quant=64)
    model = build_model(cfg)
    pred = DensePosePredictor(cfg, params=_tamed_params(cfg))
    img = (RNG.rand(160, 200, 3) * 255).astype(np.uint8)

    x_min, (h1, w1), (hp, wp) = jax.jit(
        lambda im: model.preprocess(im, (160, 200)))(jnp.asarray(img))
    canvas, sizes = pred.bucketize(img)
    assert (sizes[2], sizes[3]) == (h1, w1)
    x_b = jax.jit(lambda c, s: model.preprocess_bucketed(c, s[2], s[3]))(
        jnp.asarray(canvas), jnp.asarray(sizes))

    xb = np.asarray(x_b)
    np.testing.assert_array_equal(xb[:hp, :wp], np.asarray(x_min))
    assert not xb[hp:].any() and not xb[:, wp:].any()


def test_geometry_bucketed_envelope_and_compile_count():
    """End-to-end: mixed-size images through the bucketed predictor match
    the per-shape predictor within a small envelope, and the bucketed
    predictor compiled exactly one graph per distinct bucket."""
    cfg_plain = _cfg(quant=0)
    cfg_b = _cfg(quant=64)
    params = _tamed_params(cfg_plain)
    plain = DensePosePredictor(cfg_plain, params=dict(params))
    buck = DensePosePredictor(cfg_b, params=dict(params))

    worst = dict(count=0, box=0.0, score=0.0, siuv=0.0)
    for h0, w0 in SIZES:
        img = (RNG.rand(h0, w0, 3) * 255).astype(np.uint8)
        a = plain.predict_numpy(img)
        b = buck.predict_numpy(img)
        na, nb = a["num_instances"], b["num_instances"]
        worst["count"] = max(worst["count"], abs(na - nb))
        k = min(na, nb, 8)
        if k == 0:
            continue
        d = np.array([np.abs(b["pred_boxes"] - a["pred_boxes"][i]).max(1)
                      for i in range(k)])
        nearest = d.argmin(1)
        matched = [i for i in range(k) if d[i, nearest[i]] < 8.0]
        assert len(matched) >= max(1, k // 2), (len(matched), k, (h0, w0))
        worst["box"] = max(worst["box"],
                           max(float(d[i, nearest[i]]) for i in matched))
        worst["score"] = max(worst["score"], max(
            float(abs(a["scores"][i] - b["scores"][nearest[i]]))
            for i in matched))
        # same-slot SIUV on pairs whose boxes matched tightly
        ua, ub = a["pred_densepose_u"], b["pred_densepose_u"]
        scale = max(float(np.std(ua[:k])), 1e-6)
        for i in matched:
            if nearest[i] < len(ub) and i < len(ua):
                e = float(np.max(np.abs(ua[i] - ub[nearest[i]]))) / scale
                worst["siuv"] = max(worst["siuv"], e)

    print(f"geometry-bucket envelope: count drift {worst['count']}, "
          f"matched-box {worst['box']:.3f}px, scores {worst['score']:.4f}, "
          f"same-slot u-maps {worst['siuv']:.3f} sigma")
    assert worst["count"] <= 3
    assert worst["box"] < 8.0
    assert worst["score"] < 0.08

    geom_keys = [k for k in buck._jit_cache if k[0] == "geom"]
    buckets = {(c.shape[0], c.shape[1])
               for c in (buck.bucketize((np.zeros((h, w, 3), np.uint8)))[0]
                         for h, w in SIZES)}
    assert len(geom_keys) == len(buckets) <= 2, (geom_keys, buckets)


def test_geometry_bucket_quant_validates():
    """Quantum must be a multiple of the backbone size divisibility, and the
    host-sync detection-bucket mode is mutually exclusive."""
    cfg = _cfg(quant=48)  # not a multiple of 32
    with pytest.raises(AssertionError):
        DensePosePredictor(cfg, params=_tamed_params(_cfg(0)))
    cfg2 = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg2.defrost()
    cfg2.merge_from_list(TINY + ["TPU.GEOMETRY_BUCKET_QUANT", "64",
                                 "TPU.BUCKETED_DENSEPOSE", "True"])
    cfg2.freeze()
    with pytest.raises(AssertionError):
        DensePosePredictor(cfg2, params=_tamed_params(_cfg(0)))


def test_run_cli_auto_buckets_mixed_size_dir(tmp_path):
    """The run.py directory path default-enables geometry bucketing when the
    directory's image sizes vary (VERDICT r4 #5): the probe detects mixed
    sizes, load_predictor picks quant=64, an explicit user override wins,
    and the end-to-end dispatch compiles one graph per BUCKET (bounded),
    not one per input size."""
    import types

    import run as run_cli

    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "imgs"
    d.mkdir()
    for i, (h, w) in enumerate(SIZES):
        cv2.imwrite(str(d / f"im{i}.png"),
                    (RNG.rand(h, w, 3) * 255).astype(np.uint8))

    assert len(run_cli._scan_dir_sizes(str(d))) > 1
    # same-size dir: no auto-enable signal
    d2 = tmp_path / "same"
    d2.mkdir()
    for i in range(2):
        cv2.imwrite(str(d2 / f"s{i}.png"),
                    (RNG.rand(120, 160, 3) * 255).astype(np.uint8))
    assert len(run_cli._scan_dir_sizes(str(d2))) == 1

    pred = run_cli.load_predictor("densepose_rcnn_R_50_FPN_s1x", "", False,
                                  list(TINY), auto_bucket=True)
    assert pred.geometry_quant == 64

    # explicit user choice suppresses the default
    pred_off = run_cli.load_predictor(
        "densepose_rcnn_R_50_FPN_s1x", "", False,
        list(TINY) + ["TPU.GEOMETRY_BUCKET_QUANT", "0"], auto_bucket=True)
    assert pred_off.geometry_quant == 0

    from densepose_tpu.visualizer import End2EndVisualizer
    args = types.SimpleNamespace(input=str(d), batch=0)
    run_cli._dispatch(args, pred, End2EndVisualizer(mode="bbox"), cv2)

    for i in range(len(SIZES)):
        assert (d / f"im{i}_pred.png").exists()
    geom_keys = [k for k in pred._jit_cache if k[0] == "geom"]
    assert 1 <= len(geom_keys) <= 2, geom_keys
