"""Real-TPU numerics tests — opt-in via DENSEPOSE_REAL_TPU_TESTS=1 (like
tests/test_pallas_tpu.py; conftest then keeps the real backend).

The fp16 export-mode envelope can only be measured faithfully on the chip:
the MXU accumulates f32 for f16/bf16 operands, while CPU XLA emulates f16
matmuls with f16 ACCUMULATION and overflows at real channel widths (see
tests/test_realscale_parity.py::test_fp16_head_drift_envelope_real_width
for the CPU-safe, range-controlled slice of this check, and
test_fp16_fp32_islands_real_width for the island-placement proof).

Mirrors the reference's --fp16 export artifact (reference export.py:36-37:
the whole TorchScript module is cast to half; detectron2 keeps NMS inputs
and delta decode fp32 — our fp32 islands)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("DENSEPOSE_REAL_TPU_TESTS"),
    reason="needs the real TPU chip (DENSEPOSE_REAL_TPU_TESTS=1)")


def test_fp16_full_forward_envelope_tpu():
    """Full-forward fp16 vs fp32 on the chip at real widths: detection
    count stable, matched-box / score / SIUV drift measured and bounded
    (the fp32 islands keep the range-sensitive math exact, so fp16's
    10-bit mantissa should land well inside the bf16 envelope bounds)."""
    from densepose_tpu.checkpoint.transform import torch_state_to_jax
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu import model_zoo

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.INPUT.MIN_SIZE_TEST = 400
    cfg.INPUT.MAX_SIZE_TEST = 667
    cfg.TEST.DETECTIONS_PER_IMAGE = 24
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.3
    cfg.freeze()
    model = build_model(cfg)
    # the realscale suite's tamed random weights (make_state scale=0.04):
    # load_params' random init saturates all 24 slots with NMS near-ties,
    # where fp16's tie-flips churn which boxes survive — fixture chaos, not
    # island placement
    from tests.test_realscale_parity import detection_tamed_state, make_state
    spec = model.spec()
    # detection_tamed_state: make_state alone saturates scores to 1.0 and
    # degenerates every kept box to a zero-area border slab, making the
    # matched-box/score drift comparison below vacuous
    state = detection_tamed_state(make_state(spec))
    # tame the head's multiplicative gain for f16 VALUE range: random
    # weights amplify ~1.6x per stacked conv (8 layers -> activations past
    # f16's 65504 max even though the MXU accumulates f32; real checkpoints
    # produce O(10) logits). Applied to BOTH dtypes -> identical comparison.
    state = {k: (v * 0.5 if ".densepose_head.body_conv_fcn" in k
                 and k.endswith(".weight") else v) for k, v in state.items()}
    params = jax.device_put(
        {k: jnp.asarray(v) for k, v in torch_state_to_jax(
            state, spec, fold_bn=False).items()})
    f16 = jax.device_put(
        {k: (v.astype(jnp.float16) if v.dtype == jnp.float32 else v)
         for k, v in params.items()})
    image = (np.random.RandomState(20240817).rand(480, 640, 3)
             * 255).astype(np.uint8)

    out32 = jax.jit(model.forward)(params, jnp.asarray(image))
    out16 = jax.jit(lambda p, im: model.forward(
        p, im, compute_dtype=jnp.float16))(f16, jnp.asarray(image))

    n32, n16 = int(out32["num_instances"]), int(out16["num_instances"])
    assert abs(n16 - n32) <= max(3, n32 // 4), (n16, n32)
    k = min(n16, n32, 10)
    b32 = np.asarray(out32["pred_boxes"])[:k]
    # match against fp16's FULL valid list, not its top-k: with random
    # weights many scores tie to 4+ decimals, so the top-k ORDER flips
    # between dtypes while the detections themselves are unchanged
    b16_all = np.asarray(out16["pred_boxes"])[:n16]
    s32 = np.asarray(out32["scores"])[:k]
    s16_all = np.asarray(out16["scores"])[:n16]
    # with every slot saturated (random weights, 24-cap), a borderline fp32
    # detection can be displaced by a DIFFERENT borderline one under fp16 —
    # slot churn at the cap from NMS tie-flips, not island numerics. So:
    # require most of the top-k to have a tight counterpart, and compare
    # box/score drift on the MATCHED pairs (global sorted-score compare is
    # meaningless across a churned set).
    dists = np.array([np.abs(b16_all - b32[i]).max(axis=1)
                      for i in range(k)])  # (k, n16)
    nearest = dists.argmin(axis=1)
    matched = [i for i in range(k) if dists[i, nearest[i]] < 6.0]
    box_drift = max((float(dists[i, nearest[i]]) for i in matched), default=0.0)
    score_drift = max((float(abs(s32[i] - s16_all[nearest[i]]))
                       for i in matched), default=0.0)

    # SIUV drift on IDENTICAL boxes
    from functools import partial
    _, feats32, boxes_net = jax.jit(model.forward_stage1)(
        params, jnp.asarray(image))
    _, feats16, _ = jax.jit(partial(
        model.forward_stage1, compute_dtype=jnp.float16))(
        f16, jnp.asarray(image))
    dp32 = jax.jit(model.forward_densepose)(params, feats32, boxes_net[:8])
    dp16 = jax.jit(model.forward_densepose)(f16, feats16,
                                            boxes_net[:8].astype(jnp.float32))
    u32 = np.asarray(dp32["pred_densepose_u"], np.float32)
    u16 = np.asarray(dp16["pred_densepose_u"], np.float32)
    assert np.isfinite(u16).all()
    uv_drift = float(np.max(np.abs(u16 - u32)))
    uv_sigma = uv_drift / (float(np.std(u32)) + 1e-9)
    print(f"fp16 TPU full-forward envelope: matched {len(matched)}/{k} "
          f"boxes, matched-box drift {box_drift:.3f}px, scores "
          f"{score_drift:.4f}, u-logits {uv_drift:.4f} "
          f"(= {uv_sigma:.3f} sigma), dets {n16} vs {n32}")
    assert score_drift < 0.05
    assert len(matched) >= max(1, k - 2), (len(matched), k, dists)
    # same bound as the CPU bf16 envelope: random-weight box-head FCs
    # amplify the compute-dtype's relative feature noise into multi-px
    # delta shifts (measured 5.2px worst box on-chip; the fp32 islands are
    # separately structurally asserted in test_fp16_fp32_islands_real_width)
    assert box_drift < 6.0, dists
    assert uv_sigma < 0.5


def test_tta_on_chip_matches_cpu(tmp_path):
    """TTA end-to-end ON THE CHIP (VERDICT r3 #9): multi-scale + flip
    inference runs on the real TPU, its wall-clock per-frame time is
    recorded, and its outputs match a fresh-process CPU run of the same
    TTA pipeline with MATCHED-BOX semantics within the bf16-dot envelope
    (TPU f32 dots execute at bf16 MXU precision by default; through the
    per-view NMS + cross-view merge NMS that reorders near-tied survivors,
    so slot-order equality is not expected — same semantics as the fp16
    envelope above). Tamed detection fixture shared with the CPU run via
    tests/_tta_chip_fixture.py."""
    import subprocess
    import sys
    import time

    from densepose_tpu.predictor import DensePosePredictor
    from densepose_tpu.tta import TTAPredictor
    from tests._tta_chip_fixture import tta_cfg_and_params, tta_image

    cfg, params = tta_cfg_and_params()
    img = tta_image()

    tta = TTAPredictor(DensePosePredictor(cfg, params=params))
    out = tta.predict_numpy(img)  # compiles every view
    # wall-clock per frame once compiled (distinct frames)
    rng = np.random.RandomState(8)
    frames = [(rng.rand(*img.shape) * 255).astype(np.uint8)
              for _ in range(4)]
    t0 = time.perf_counter()
    for f in frames:
        tta.predict_numpy(f)
    per_frame = (time.perf_counter() - t0) / len(frames)
    print(f"on-chip TTA (2 scales + flip): {per_frame * 1e3:.0f} ms/frame "
          f"({1.0 / per_frame:.2f} fps), {out['num_instances']} dets")

    # fresh-process CPU run of the SAME TTA pipeline on the SAME params
    script = f"""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from densepose_tpu.predictor import DensePosePredictor
from densepose_tpu.tta import TTAPredictor
from tests._tta_chip_fixture import tta_cfg_and_params, tta_image
cfg, params = tta_cfg_and_params()
out = TTAPredictor(DensePosePredictor(cfg, params=params)).predict_numpy(
    tta_image())
np.savez({str(tmp_path / "cpu.npz")!r},
         **{{k: np.asarray(v, np.float32) for k, v in out.items()
             if k != "num_instances"}},
         num_instances=out["num_instances"])
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("DENSEPOSE_REAL_TPU_TESTS", None)
    subprocess.run([sys.executable, "-c", script], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
    cpu = np.load(tmp_path / "cpu.npz")

    n_t, n_c = int(out["num_instances"]), int(cpu["num_instances"])
    assert n_c > 0, "CPU fixture produced no detections"
    assert abs(n_t - n_c) <= max(2, n_c // 4), (n_t, n_c)
    k = min(n_t, n_c, 6)
    b_c = cpu["pred_boxes"][:k]
    b_t = np.asarray(out["pred_boxes"], np.float32)[:n_t]
    s_c = cpu["scores"][:k]
    s_t = np.asarray(out["scores"], np.float32)[:n_t]
    dists = np.array([np.abs(b_t - b_c[i]).max(axis=1) for i in range(k)])
    nearest = dists.argmin(axis=1)
    matched = [i for i in range(k) if dists[i, nearest[i]] < 6.0]
    assert len(matched) >= max(1, k - 2), (len(matched), k, dists)
    box_drift = max(float(dists[i, nearest[i]]) for i in matched)
    score_drift = max(float(abs(s_c[i] - s_t[nearest[i]])) for i in matched)
    # averaged u maps on the MATCHED slots
    u_t = np.asarray(out["pred_densepose_u"], np.float32)
    u_c = cpu["pred_densepose_u"]
    sig = max(float(np.max(np.abs(u_t[nearest[i]] - u_c[i])))
              for i in matched) / (float(np.std(u_c[:k])) + 1e-9)
    print(f"TTA chip-vs-CPU: matched {len(matched)}/{k}, box "
          f"{box_drift:.3f}px, scores {score_drift:.4f}, u {sig:.3f} sigma")
    assert box_drift < 6.0
    assert score_drift < 0.05
    assert sig < 0.5, sig
