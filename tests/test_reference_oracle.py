"""THE REFERENCE ITSELF AS ORACLE: run the reference's own torch modules
(/root/reference — GeneralizedRCNN.inference, rcnn.py:110-197, via
DefaultPredictor, engine/defaults.py:50-97) end-to-end on CPU under the
tools/refshim.py shim layer, at REAL channel widths, with shared random
weights — and assert our pipeline matches the reference's own forward stage
by stage (stem, res2-5, p2-p6, RPN proposals, detections, SIUV maps, final
postprocessed output).

This replaces trust in the builder-authored twin (tests/test_realscale_parity
.py) with the reference code itself: any semantic misreading shared by our
pipeline and the twin fails here (VERDICT r2 missing #1).

The only non-reference code in the oracle path is the torchvision kernel
stand-ins (roi_align / nms), which the reference consumes as binaries; they
are pinned to the documented torchvision algorithm via the slow loop oracles
in tests/reference_ops.py (equivalence tests below).

The input geometry pins k=1 (MIN_SIZE_TEST == min image side) so both sides
resize trivially and the torch-uint8-resize-kernel divergence (a separately
tested preprocess property, test_realscale_parity.py::
test_torch_uint8_resize_divergence_is_one_lsb) cannot leak into stage
comparisons; normalize/pad parity IS asserted here, exactly.

Everything is slow (two full real-width CPU forwards) — marked @slow.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from densepose_tpu import model_zoo
from densepose_tpu.checkpoint.transform import torch_state_to_jax
from densepose_tpu.models.rcnn import build_model
from tests.reference_ops import nms_np, roi_align_np

pytestmark = pytest.mark.slow

RNG = np.random.RandomState(20250819)

# 440x592 uint8 image; MIN_SIZE_TEST=440 / MAX_SIZE_TEST=1000 -> k = 1.0
# (no resize), padded to 448x608. Real channel widths everywhere.
H0, W0 = 440, 592
_ALIAS_MARKERS = (".stages.", ".lateral_convs.", ".output_convs.",
                  ".scale_heads.", ".stacked_convs.")
_OVERRIDES = dict(
    MIN_SIZE=440, MAX_SIZE=1000, SCORE_THRESH=0.3, DETECTIONS=24)


# ---------------------------------------------------------------------------
# the fast torchvision stand-ins == the slow loop oracles
# ---------------------------------------------------------------------------

def test_fast_roi_align_matches_slow_oracle():
    from refshim import roi_align_np_fast
    feat = RNG.randn(13, 17, 6).astype(np.float32)
    boxes = np.array([
        [0.0, 0.0, 16.9, 12.9],
        [2.3, 1.1, 9.7, 11.2],
        [-3.0, -2.0, 5.0, 4.0],     # out-of-range samples -> border zeros
        [4.0, 4.0, 4.0, 4.0],       # degenerate
        [15.0, 11.0, 30.0, 25.0],   # clipped at the top edge
    ], dtype=np.float64)
    for scale in (1.0, 0.5):
        for sr in (0, 2):
            for aligned in (True, False):
                want = roi_align_np(feat, boxes, scale, (7, 5), sr, aligned)
                got = roi_align_np_fast(feat, boxes, scale, (7, 5), sr, aligned)
                # identical sample grids and border rules; only the
                # multiply-association order differs (float32 feat values),
                # so agreement is to float32 roundoff, not exact
                np.testing.assert_allclose(got, want, atol=1e-6,
                                           err_msg=f"{scale} {sr} {aligned}")


def test_fast_nms_matches_slow_oracle():
    from refshim import nms_np_fast
    for trial in range(5):
        r = np.random.RandomState(trial)
        n = 200
        xy = r.rand(n, 2) * 60
        wh = r.rand(n, 2) * 30 + 1
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = r.rand(n).astype(np.float32)
        for thresh in (0.3, 0.5, 0.7):
            want = nms_np(boxes, scores, thresh)
            got = nms_np_fast(boxes, scores, thresh)
            np.testing.assert_array_equal(got, want, err_msg=f"{trial} {thresh}")


# ---------------------------------------------------------------------------
# shared weights + both forwards, cached once per process
# ---------------------------------------------------------------------------

def _make_state(spec, scale=0.04, rng=None):
    """Random weights at real widths (same recipe as test_realscale_parity:
    small conv std so activations survive the 50-conv backbone), with the
    detection stage TAMED (test_realscale_parity.DETECTION_TAME): untamed
    random weights saturate every softmax score to exactly 1.0 and blow each
    |dw| past the delta clamp, degenerating all boxes to zero-area border
    slabs — detection/SIUV comparisons on such a fixture are vacuous."""
    from tests.test_realscale_parity import detection_tamed_state
    rng = RNG if rng is None else rng
    state = {}
    for name, ps in spec.items():
        if name.endswith("running_var"):
            state[name] = (rng.rand(*ps.shape) * 0.5 + 0.75).astype(np.float32)
        elif name.endswith("running_mean"):
            state[name] = (rng.randn(*ps.shape) * 0.05).astype(np.float32)
        elif name.endswith(".norm.weight"):
            state[name] = (rng.rand(*ps.shape) * 0.5 + 0.75).astype(np.float32)
        elif name.endswith(".norm.bias"):
            state[name] = (rng.randn(*ps.shape) * 0.05).astype(np.float32)
        else:
            state[name] = (rng.randn(*ps.shape) * scale).astype(np.float32)
    return detection_tamed_state(state)


def _nondegenerate_count(boxes, n):
    b = np.asarray(boxes, np.float32)[:n]
    return int(((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) > 1.0).sum())


def _our_cfg():
    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.INPUT.MIN_SIZE_TEST = _OVERRIDES["MIN_SIZE"]
    cfg.INPUT.MAX_SIZE_TEST = _OVERRIDES["MAX_SIZE"]
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = _OVERRIDES["SCORE_THRESH"]
    cfg.TEST.DETECTIONS_PER_IMAGE = _OVERRIDES["DETECTIONS"]
    cfg.freeze()
    return cfg


def _reference_run(image, state,
                   yaml_path="/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml",
                   tap=True):
    """Build the reference's own model, install the shared weights, run
    DefaultPredictor.forward with per-stage hooks. Returns taps + output."""
    from refshim import import_reference
    get_cfg, _, add_densepose_config = import_reference()
    from detectron2.engine.defaults import DefaultPredictor

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(yaml_path)
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.WEIGHTS = ""
    cfg.INPUT.MIN_SIZE_TEST = _OVERRIDES["MIN_SIZE"]
    cfg.INPUT.MAX_SIZE_TEST = _OVERRIDES["MAX_SIZE"]
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = _OVERRIDES["SCORE_THRESH"]
    cfg.TEST.DETECTIONS_PER_IMAGE = _OVERRIDES["DETECTIONS"]
    cfg.freeze()

    torch.manual_seed(0)
    pred = DefaultPredictor(cfg)
    model = pred.model
    model.eval()

    sd = {k: torch.from_numpy(v) for k, v in state.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected[:5]
    leftovers = [k for k in missing
                 if not any(m in k for m in _ALIAS_MARKERS)
                 and k not in ("pixel_mean", "pixel_std")
                 and "cell_anchors" not in k]
    assert not leftovers, leftovers[:5]

    taps = {}

    # forward hooks MUST return None (a non-None return replaces the
    # module's output), so each tap is a statement-bodied function
    def _tap_stem(m, i, o):
        taps["stem"] = o.detach()

    def _tap_bottom_up(m, i, o):
        taps.update({k: v.detach() for k, v in o.items()})

    def _tap_backbone(m, i, o):
        taps["padded_input"] = i[0].detach()
        taps.update({k: v.detach() for k, v in o.items()})

    def _tap_rpn(m, i, o):
        taps["proposals"] = {k: v.detach() for k, v in o[0][0].items()}

    # always capture the boxes the reference feeds its densepose pooler
    # (network coords) — the same-box SIUV comparisons key off them
    def _tap_dp_boxes(m, i, o):
        taps["dp_boxes"] = i[1][0].clone()

    hooks = [model.roi_heads.densepose_pooler.register_forward_hook(
        _tap_dp_boxes)]
    hooks += [] if not tap else [
        model.backbone.bottom_up.stem.register_forward_hook(_tap_stem),
        model.backbone.bottom_up.register_forward_hook(_tap_bottom_up),
        model.backbone.register_forward_hook(_tap_backbone),
        model.proposal_generator.register_forward_hook(_tap_rpn),
    ]
    with torch.no_grad():
        out = pred(torch.from_numpy(image), bgr=True)
    for h in hooks:
        h.remove()
    return taps, {k: (v.detach() if torch.is_tensor(v) else v)
                  for k, v in out.items()}


_CACHE = {}


def setup():
    if _CACHE:
        return _CACHE
    cfg = _our_cfg()
    model = build_model(cfg)
    spec = model.spec()
    state = _make_state(spec)
    image = (RNG.rand(H0, W0, 3) * 255).astype(np.uint8)

    # ---- the reference's own forward ----
    ref_taps, ref_out = _reference_run(image, state)

    # ---- ours, stage-tapped (fp32 CPU, exact-parity unfolded BN) ----
    from densepose_tpu.models.fpn import fpn_forward
    from densepose_tpu.models.resnet import resnet_forward
    from densepose_tpu.models.roi_heads import (box_stage_forward,
                                                densepose_stage_forward)
    from densepose_tpu.models.rpn import rpn_forward

    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(state, spec, fold_bn=False).items()}
    x, (h1, w1), (hp, wp) = model.preprocess(jnp.asarray(image), (H0, W0))
    assert (h1, w1) == (H0, W0), "k must be exactly 1 for this test"
    stages = jax.jit(lambda pp, xx: resnet_forward(
        pp, xx, cfg, out_features=("res2", "res3", "res4", "res5")))(params, x)
    feats = jax.jit(lambda pp, xx: fpn_forward(pp, xx, cfg))(params, x)
    proposals, obj, pvalid = jax.jit(
        lambda pp, ff: rpn_forward(pp, ff, (hp, wp), cfg))(params, feats)
    boxes_net, scores, classes, dvalid = jax.jit(
        lambda pp, ff, pr, pv: box_stage_forward(pp, ff, pr, pv, cfg))(
        params, feats, proposals, pvalid)
    # SIUV maps on the REFERENCE'S OWN pooler boxes (same-box comparison —
    # the unnormalized 512-ch head amplifies sub-0.01px box reassociation
    # differences ~100x; see _variant_full_pipeline_vs_reference)
    dp = jax.jit(lambda pp, ff, bb: densepose_stage_forward(pp, ff, bb, cfg))(
        params, feats, jnp.asarray(ref_taps["dp_boxes"].numpy()))

    # ---- ours, the full user-facing pipeline (jit graph + postprocess) ----
    from densepose_tpu.predictor import DensePosePredictor
    full = DensePosePredictor(
        cfg, params=torch_state_to_jax(state, spec,
                                       fold_bn=cfg.TPU.FOLD_FROZEN_BN))
    full_out = full.predict_numpy(image)

    _CACHE.update(dict(
        cfg=cfg, state=state, image=image, x=x,
        stages=stages, feats=feats, proposals=proposals, obj=obj,
        pvalid=pvalid, boxes_net=boxes_net, scores=scores, classes=classes,
        dvalid=dvalid, dp=dp, full_out=full_out,
        ref_taps=ref_taps, ref_out=ref_out))
    return _CACHE


def _nchw(a):
    a = np.asarray(a)
    return a[None].transpose(0, 3, 1, 2) if a.ndim == 3 else a.transpose(0, 3, 1, 2)


def _assert_stage(got, want_t, name, rel=2e-3):
    want = want_t.numpy() if torch.is_tensor(want_t) else np.asarray(want_t)
    got = _nchw(got)
    assert got.shape == want.shape, (name, got.shape, want.shape)
    scale = max(float(np.std(want)), 1e-6)
    err = float(np.max(np.abs(got - want))) / scale
    assert err < rel, f"{name}: normalized max err {err:.2e} (scale {scale:.3g})"


# ---------------------------------------------------------------------------
# stage-by-stage: our pipeline vs the reference's own forward
# ---------------------------------------------------------------------------

def test_preprocess_exact_vs_reference():
    """k=1: the reference's normalize+pad (rcnn.py:156-181) and ours must
    agree to float roundoff — this also proves torch's uint8 resize kernel
    is exact at identity scale."""
    c = setup()
    got = _nchw(c["x"])
    want = c["ref_taps"]["padded_input"].numpy()
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_backbone_stages_vs_reference():
    c = setup()
    for name in ("res2", "res3", "res4", "res5"):
        _assert_stage(c["stages"][name], c["ref_taps"][name], name)


def test_fpn_levels_vs_reference():
    c = setup()
    for name in ("p2", "p3", "p4", "p5", "p6"):
        _assert_stage(c["feats"][name], c["ref_taps"][name], name)


def test_rpn_proposals_vs_reference():
    c = setup()
    n = int(np.asarray(c["pvalid"]).sum())
    tprops = c["ref_taps"]["proposals"]["proposal_boxes"].numpy()
    tscores = c["ref_taps"]["proposals"]["objectness_logits"].numpy()
    assert n == len(tscores), (n, len(tscores))
    np.testing.assert_allclose(np.asarray(c["obj"])[:n], tscores,
                               atol=1e-4, rtol=1e-4)
    got_boxes = np.asarray(c["proposals"])[:n]

    def degen(b):
        return (b[:, 2] - b[:, 0] <= 0) | (b[:, 3] - b[:, 1] <= 0)

    dg, dt = degen(got_boxes), degen(tprops)
    assert dg.sum() == dt.sum(), (int(dg.sum()), int(dt.sum()))
    # tie-order tolerant multiset comparison: identical zero-padded-region
    # patches yield exactly-equal objectness logits at different anchors, so
    # the ORDER within a tie group is backend-dependent (torch sort vs XLA
    # top_k) — require every non-degenerate proposal to have an exact
    # counterpart on the other side, both directions
    g, tt = got_boxes[~dg], tprops[~dt]
    assert len(g) == len(tt)
    d = np.abs(g[:, None, :] - tt[None, :, :]).max(-1)
    assert float(d.min(1).max()) < 0.05, float(d.min(1).max())
    assert float(d.min(0).max()) < 0.05, float(d.min(0).max())


def test_detections_vs_reference():
    c = setup()
    n = int(np.asarray(c["dvalid"]).sum())
    rs = c["ref_out"]["scores"].numpy()
    rb = c["ref_out"]["pred_boxes"].numpy()
    rc = c["ref_out"]["pred_classes"].numpy()
    assert n == len(rs), (n, len(rs))
    np.testing.assert_allclose(np.asarray(c["scores"])[:n], rs,
                               atol=1e-4, rtol=1e-3)
    # k=1: detector_postprocess rescale is identity, so network coords ==
    # final coords after the (h1,w1) clip (boxes_net is tapped BEFORE our
    # postprocess clip; the reference's ref_out boxes are already clipped)
    gb = np.asarray(c["boxes_net"])[:n].copy()
    gb[:, 0::2] = gb[:, 0::2].clip(0, W0)
    gb[:, 1::2] = gb[:, 1::2].clip(0, H0)
    np.testing.assert_allclose(gb, rb, atol=0.1, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(c["classes"])[:n], rc)


def test_siuv_maps_vs_reference():
    """Same-box comparison: c["dp"] is computed on the reference's own
    pooler boxes (see setup), so this isolates stage semantics from
    box-reassociation chaos."""
    c = setup()
    n = len(c["ref_out"]["scores"])
    keymap = dict(coarse_segm="pred_densepose_coarse_segm",
                  fine_segm="pred_densepose_fine_segm",
                  u="pred_densepose_u", v="pred_densepose_v")
    for key, refkey in keymap.items():
        got = _nchw(np.asarray(c["dp"][key])[:n])
        want = c["ref_out"][refkey].numpy()[:n]
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(float(np.std(want)), 1e-6)
        err = float(np.max(np.abs(got - want))) / scale
        assert err < 5e-3, f"{key}: normalized max err {err:.2e}"


def test_full_pipeline_output_vs_reference():
    """The user-facing DensePosePredictor output (one jitted graph with
    FrozenBN folding, device postprocess path, host trim) against the
    reference DefaultPredictor's final dict — whole-pipeline, not
    stage-tapped."""
    c = setup()
    full, ref = c["full_out"], c["ref_out"]
    assert full["num_instances"] == len(ref["scores"])
    np.testing.assert_array_equal(full["image_size"],
                                  ref["image_size"].numpy())
    np.testing.assert_allclose(full["scores"], ref["scores"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(full["pred_boxes"], ref["pred_boxes"].numpy(),
                               atol=0.15, rtol=1e-3)
    np.testing.assert_array_equal(full["pred_classes"],
                                  ref["pred_classes"].numpy())
    for key in ("pred_densepose_coarse_segm", "pred_densepose_fine_segm",
                "pred_densepose_u", "pred_densepose_v"):
        want = ref[key].numpy()
        got = np.asarray(full[key])
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(float(np.std(want)), 1e-6)
        err = float(np.max(np.abs(got - want))) / scale
        # own-box maps: loose bound only — the unnormalized head amplifies
        # legitimate sub-0.01px box reassociation differences (tight
        # same-box parity lives in test_siuv_maps_vs_reference)
        assert err < 0.5, f"{key}: normalized max err {err:.2e}"


# ---------------------------------------------------------------------------
# second/third families end-to-end vs the reference's own forward: legacy
# (multi-level densepose pooler, 15-ch coarse segm, 56px maps, no decoder)
# and DeepLab (ASPP — the reference computes the FULL rate-56 dilated conv,
# so this pins our center-tap reduction to the reference's own numbers)
# ---------------------------------------------------------------------------

def _variant_full_pipeline_vs_reference(zoo_name, yaml_path):
    """Full-pipeline detection parity + same-box SIUV parity vs the
    reference's own forward for one zoo variant.

    The SIUV maps are compared on the REFERENCE'S OWN pooler boxes (tapped
    in network coords), not on each side's own detections: the chart head is
    8 unnormalized 512-ch convs, so with random weights it amplifies a
    relative input perturbation ~100x — a sub-0.01px box disagreement
    (legitimate fp32 reassociation between XLA and torch, well inside the
    detection tolerance) otherwise explodes into ~0.2 normalized map error.
    Measured same-box agreement is ~1e-5 normalized; the full-pipeline
    own-box maps are additionally bounded at a loose 0.5 to catch gross
    errors (channel permutations, wrong part order) without tripping on
    box-chaos amplification."""
    from densepose_tpu.models.fpn import fpn_forward
    from densepose_tpu.models.roi_heads import densepose_stage_forward
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config(zoo_name).clone()
    cfg.defrost()
    cfg.INPUT.MIN_SIZE_TEST = _OVERRIDES["MIN_SIZE"]
    cfg.INPUT.MAX_SIZE_TEST = _OVERRIDES["MAX_SIZE"]
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = _OVERRIDES["SCORE_THRESH"]
    cfg.TEST.DETECTIONS_PER_IMAGE = _OVERRIDES["DETECTIONS"]
    cfg.freeze()
    model = build_model(cfg)
    spec = model.spec()
    rng = np.random.RandomState(abs(hash(zoo_name)) % (2 ** 31))
    state = _make_state(spec, rng=rng)
    image = (rng.rand(H0, W0, 3) * 255).astype(np.uint8)

    # feature-normalize the fixture: deeper random-weight backbones blow up
    # activations (R101's p2 std is ~30x R50's), re-saturating the tamed
    # detection stage. Measure p2 and rescale the FPN output convs (an
    # exact linear scaling of every feature level) to the R50 calibration
    # point DETECTION_TAME was tuned for; R50-family variants fall inside
    # the no-op gate, keeping their states bitwise-unchanged.
    probe = {k: jnp.asarray(v) for k, v in torch_state_to_jax(
        state, spec, fold_bn=False).items()}
    from densepose_tpu.models.fpn import fpn_forward as _fpn
    xp, _, _ = model.preprocess(jnp.asarray(image), (H0, W0))
    p2 = jax.jit(lambda pp, xx: _fpn(pp, xx, cfg))(probe, xp)["p2"]
    gain = 220.0 / float(np.asarray(p2, np.float32).std())
    del probe, p2
    if not 0.5 < gain < 2.0:
        for k in list(state):
            if ".fpn_output" in k:
                state[k] = state[k] * np.float32(gain)

    taps, ref = _reference_run(image, state, yaml_path, tap=False)
    full = DensePosePredictor(
        cfg, params=torch_state_to_jax(state, spec,
                                       fold_bn=cfg.TPU.FOLD_FROZEN_BN)
    ).predict_numpy(image)

    n_ref = len(ref["scores"])
    assert full["num_instances"] == n_ref, (full["num_instances"], n_ref)
    assert _nondegenerate_count(ref["pred_boxes"].numpy(), n_ref) >= min(
        n_ref, 5), "fixture degenerated — detection comparison is vacuous"
    np.testing.assert_allclose(full["scores"], ref["scores"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(full["pred_boxes"], ref["pred_boxes"].numpy(),
                               atol=0.15, rtol=1e-3)

    # same-box SIUV parity: our stage chain (exact-parity unfolded BN) on
    # the reference's own pooler boxes
    params = {k: jnp.asarray(v) for k, v in torch_state_to_jax(
        state, spec, fold_bn=False).items()}
    x, (h1, w1), _ = model.preprocess(jnp.asarray(image), (H0, W0))
    assert (h1, w1) == (H0, W0)
    feats = jax.jit(lambda pp, xx: fpn_forward(pp, xx, cfg))(params, x)
    dp_boxes = jnp.asarray(taps["dp_boxes"].numpy())
    dp = jax.jit(lambda pp, ff, bb: densepose_stage_forward(
        pp, ff, bb, cfg))(params, feats, dp_boxes)
    keymap = dict(coarse_segm="pred_densepose_coarse_segm",
                  fine_segm="pred_densepose_fine_segm",
                  u="pred_densepose_u", v="pred_densepose_v")
    for key, refkey in keymap.items():
        got = _nchw(np.asarray(dp[key]))
        want = ref[refkey].numpy()
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(float(np.std(want)), 1e-6)
        err = float(np.max(np.abs(got - want))) / scale
        assert err < 5e-3, f"{zoo_name} {key}: same-box max err {err:.2e}"

    # loose own-box bound on the user-facing output (gross-error catch)
    for key in keymap.values():
        want = ref[key].numpy()
        got = np.asarray(full[key])
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(float(np.std(want)), 1e-6)
        err = float(np.max(np.abs(got - want))) / scale
        assert err < 0.5, f"{zoo_name} {key}: own-box max err {err:.2e}"
    return full


def test_legacy_full_pipeline_vs_reference():
    """Legacy family vs the reference's own forward: multi-level densepose
    ROI pooling (no decoder), 15-channel coarse segm, 56px maps."""
    full = _variant_full_pipeline_vs_reference(
        "densepose_rcnn_R_50_FPN_s1x_legacy",
        "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x_legacy.yaml")
    assert full["pred_densepose_coarse_segm"].shape[1] == 15
    assert full["pred_densepose_u"].shape[-1] == 56


def test_r101_full_pipeline_vs_reference():
    """R101 family vs the reference's own forward: the deeper backbone
    (23-block res4) end-to-end — closes the depth axis the R50-only twin
    and oracle setup cannot see."""
    full = _variant_full_pipeline_vs_reference(
        "densepose_rcnn_R_101_FPN_s1x",
        "/root/reference/configs/densepose_rcnn_R_101_FPN_s1x.yaml")
    assert full["pred_densepose_u"].shape[-1] == 112


def test_deeplab_full_pipeline_vs_reference():
    """DeepLab family vs the reference's own forward: ASPP (incl. our
    center-tap reduction of the rate-56 branch vs the reference's full
    dilated conv) + GN stacked convs."""
    full = _variant_full_pipeline_vs_reference(
        "densepose_rcnn_R_50_FPN_DL_s1x",
        "/root/reference/configs/densepose_rcnn_R_50_FPN_DL_s1x.yaml")
    assert full["pred_densepose_u"].shape[-1] == 112


def test_wc_confidence_full_pipeline_vs_reference():
    """WC (confidence) family vs the reference's own forward. Pins the
    loaded-but-dropped quirk to the reference itself: the reference's
    DensePoseChartWithConfidencePredictor CREATES the sigma_2/kappa/
    *_confidence deconv layers (so their weights must load — exercised here
    by the shared random state covering them on both sides) but its
    forward (chart_with_confidence.py:91-109) emits only SIUV — identical
    output surface to the base chart predictor. Ours mirrors that by
    default (TPU.EMIT_CONFIDENCES extends it, no reference counterpart)."""
    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_WC2M_s1x").clone()
    assert (cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME
            == "DensePoseChartWithConfidencePredictor")
    # the confidence weights really are part of the shared state
    spec = build_model(cfg).spec()
    conf_keys = [k for k in spec if "sigma_2" in k or "_confidence" in k]
    assert conf_keys, "WC spec lacks confidence layers"
    full = _variant_full_pipeline_vs_reference(
        "densepose_rcnn_R_50_FPN_WC2M_s1x",
        "/root/reference/configs/densepose_rcnn_R_50_FPN_WC2M_s1x.yaml")
    assert full["pred_densepose_u"].shape[-1] == 112
    assert not any("sigma" in k for k in full), list(full)


# ---------------------------------------------------------------------------
# the visualization surface vs the reference's own visualizer.py
# ---------------------------------------------------------------------------

def _ref_visualizer_module():
    """Import /root/reference/visualizer.py directly (it depends only on
    cv2/torch/numpy — no detectron2)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_visualizer", "/root/reference/visualizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _vis_outputs(rng, n=3, c_coarse=2, hw=28, img_hw=(120, 160)):
    """Random NCHW predictor outputs (the predict_numpy layout both
    extractors consume) + boxes fully inside the image."""
    H, W = img_hw
    boxes = []
    for _ in range(n):
        x0 = rng.uniform(0, W - 50)
        y0 = rng.uniform(0, H - 50)
        boxes.append([x0, y0, x0 + rng.uniform(20, 45),
                      y0 + rng.uniform(20, 45)])
    return {
        "num_instances": n,
        "pred_boxes": np.asarray(boxes, np.float32),
        "pred_densepose_coarse_segm":
            rng.randn(n, c_coarse, hw, hw).astype(np.float32),
        "pred_densepose_fine_segm":
            rng.randn(n, 25, hw, hw).astype(np.float32),
        "pred_densepose_u": rng.rand(n, 25, hw, hw).astype(np.float32),
        "pred_densepose_v": rng.rand(n, 25, hw, hw).astype(np.float32),
    }


def _ref_render(ref_vis, image, outputs):
    inst = {"pred_boxes": torch.from_numpy(outputs["pred_boxes"])}
    for k in ("pred_densepose_coarse_segm", "pred_densepose_fine_segm",
              "pred_densepose_u", "pred_densepose_v"):
        inst[k] = torch.from_numpy(outputs[k])
    viz = ref_vis.End2EndVisualizer(alpha=0.7, keep_bg=False)
    return viz.visualize(image.copy(), inst)


def _our_render(image, outputs):
    from densepose_tpu.visualizer import End2EndVisualizer
    viz = End2EndVisualizer(alpha=0.7, keep_bg=False, mode="fine_segm")
    return viz.visualize(image.copy(), outputs)


def test_visualizer_bit_exact_vs_reference_unambiguous():
    """Overlay rendering vs the reference's own visualizer.py, bit-exact on
    argmax-unambiguous maps: single dominant part per instance, foreground
    everywhere — interpolation cannot flip any label, so the colormap +
    mask + alpha-blend + uint8-truncation chain must agree byte for byte
    (incl. the keep_bg=False background fill)."""
    pytest.importorskip("cv2")
    ref_vis = _ref_visualizer_module()
    rng = np.random.RandomState(3)
    out = _vis_outputs(rng)
    for i in range(out["num_instances"]):
        out["pred_densepose_coarse_segm"][i, 0] = -5.0
        out["pred_densepose_coarse_segm"][i, 1] = 5.0
        out["pred_densepose_fine_segm"][i] = 0.0
        out["pred_densepose_fine_segm"][i, 7 + i] = 5.0
    image = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    want = _ref_render(ref_vis, image, out)
    got = _our_render(image, out)
    assert want.shape == got.shape
    np.testing.assert_array_equal(got, want)


def test_visualizer_extract_and_render_vs_reference_random():
    """Random logits: per-instance labels may flip only at part boundaries
    (torch F.interpolate vs our float32 resize disagree at argmax crossing
    points) — bound the flip fraction, require UV equality where labels
    agree, and bound the overlay pixel disagreement."""
    pytest.importorskip("cv2")
    ref_vis = _ref_visualizer_module()
    rng = np.random.RandomState(11)
    out = _vis_outputs(rng)

    # extractor level
    from densepose_tpu.visualizer import DensePoseResultExtractor
    ours, our_boxes = DensePoseResultExtractor()(out)
    inst = {"pred_boxes": torch.from_numpy(out["pred_boxes"])}
    for k in ("pred_densepose_coarse_segm", "pred_densepose_fine_segm",
              "pred_densepose_u", "pred_densepose_v"):
        inst[k] = torch.from_numpy(out[k])
    refs, ref_boxes = ref_vis.DensePoseResultExtractor()(inst)
    np.testing.assert_allclose(our_boxes, ref_boxes.numpy(), atol=1e-5)
    for mine, theirs in zip(ours, refs):
        lab_r = theirs["labels"].numpy()
        uv_r = theirs["uv"].numpy()
        same = mine["labels"] == lab_r
        frac = 1.0 - float(same.mean())
        assert frac < 0.01, f"label flip fraction {frac:.4f}"
        np.testing.assert_allclose(
            np.where(same[None], mine["uv"], 0.0),
            np.where(same[None], uv_r, 0.0), atol=1e-5)

    # overlay level
    image = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    want = _ref_render(ref_vis, image, out)
    got = _our_render(image, out)
    diff = (got != want).any(axis=-1)
    assert float(diff.mean()) < 0.01, float(diff.mean())


# ---------------------------------------------------------------------------
# vestigial heads vs the reference's own modules (VERDICT r3 #7): mask,
# keypoint, Res5. No shipped DensePose config enables them, but the
# reference's MaskRCNNConvUpsampleHead / KRCNNConvDeconvUpsampleHead /
# Res5ROIHeads are runnable under the refshim layer; these tests pin our
# functional equivalents to them on identical inputs and shared weights.
# ---------------------------------------------------------------------------


class _Inst:
    """Attribute-style instances shim. The reference's mask/keypoint
    inference helpers (mask_head.py:29-74: ``i.pred_classes``,
    ``instances.pred_masks = ...``; keypoint_head.py:37-71:
    ``b.pred_boxes.tensor``) require attribute access, while the
    TorchScript-converted repo's own pipeline passes dicts everywhere —
    no shipped container fits, so the heads are unreachable from the
    reference's forward (vestigial). This is the minimal object that lets
    the reference's own code run."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __len__(self):
        return len(self.pred_classes)


def _head_fixture():
    """Shared inputs for the head oracles: the cached oracle run's own FPN
    features (real activation statistics) + a level-spanning box set +
    cycling classes (NUM_CLASSES=3 exercises per-class selection, which the
    person-only DensePose configs never do)."""
    c = setup()
    feats_t = [c["ref_taps"][k] for k in ("p2", "p3", "p4", "p5")]
    feats_j = {k: jnp.asarray(c["ref_taps"][k].numpy()[0].transpose(1, 2, 0))
               for k in ("p2", "p3", "p4", "p5")}
    # box sizes spanning all four pooler levels (canonical 224 @ level 4)
    sizes = [24, 40, 64, 100, 144, 224, 320, 420]
    boxes = np.array([[8 + 12 * i, 6 + 2 * i, 8 + 12 * i + s, 6 + 2 * i + s]
                      for i, s in enumerate(sizes)], np.float32)
    boxes[:, 2] = np.minimum(boxes[:, 2], W0 - 2.0)
    boxes[:, 3] = np.minimum(boxes[:, 3], H0 - 2.0)
    classes = np.arange(len(boxes), dtype=np.int64) % 3
    strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32}
    return c, feats_t, feats_j, boxes, classes, strides


def _ref_cfg3(**model_overrides):
    """Reference-side config: s1x base with NUM_CLASSES=3 for the head
    oracles (+ caller overrides)."""
    from refshim import import_reference
    get_cfg, _, add_densepose_config = import_reference()
    rcfg = get_cfg()
    add_densepose_config(rcfg)
    rcfg.merge_from_file(
        "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml")
    rcfg.MODEL.DEVICE = "cpu"
    rcfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    for key, val in model_overrides.items():
        setattr(rcfg.MODEL, key, val)
    return rcfg


def _share_head_state(spec, module, prefix, rng, gains):
    """Random weights loaded into BOTH sides: our spec dict (torch layout)
    and the reference module (strict name match after prefix strip).

    ``gains``: ordered (substring, factor) pairs; the FIRST matching pair
    scales that ``.weight``. Keeps per-layer gain ~1: the first conv must
    absorb the O(200) FPN feature std, and deep stacks (keypoint's 8 512-ch
    convs at raw 0.04-scale gain ~2.7/layer) must not blow logits to
    O(1000) — saturated sigmoids make the mask comparison vacuous, and
    exploded keypoint logits underflow the reference's own per-keypoint
    softmax (heatmaps_to_keypoints' internal argmax assert fires on the
    resulting inf/NaN scores)."""
    state = {k: (rng.randn(*ps.shape) * 0.04).astype(np.float32)
             for k, ps in spec.items()}
    for k in state:
        if not k.endswith(".weight"):
            continue
        for sub, f in gains:
            if sub in k:
                state[k] = state[k] * np.float32(f)
                break
    sd = {k[len(prefix) + 1:]: torch.from_numpy(v) for k, v in state.items()}
    missing, unexpected = module.load_state_dict(sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    return state


def test_mask_head_vs_reference():
    """Our mask head (models/mask_head.py) against the reference's own
    MaskRCNNConvUpsampleHead + ROIPooler + mask_rcnn_inference
    (/root/reference/detectron2/modeling/roi_heads/mask_head.py:29-209,
    poolers.py, build.py:491-521) on identical FPN features, boxes, and
    shared random weights."""
    from types import SimpleNamespace

    from densepose_tpu.models.mask_head import (mask_head_forward,
                                                mask_head_spec)
    from densepose_tpu.checkpoint.transform import torch_state_to_jax

    c, feats_t, feats_j, boxes, classes, strides = _head_fixture()
    rcfg = _ref_cfg3(MASK_ON=True)
    from detectron2.modeling.poolers import ROIPooler
    from detectron2.modeling.roi_heads.mask_head import build_mask_head

    torch.manual_seed(1)
    mh = build_mask_head(rcfg, SimpleNamespace(
        channels=256, height=rcfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        width=rcfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION))
    mh.eval()
    pooler = ROIPooler(
        output_size=rcfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        scales=(1 / 4, 1 / 8, 1 / 16, 1 / 32),
        sampling_ratio=rcfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO,
        pooler_type=rcfg.MODEL.ROI_MASK_HEAD.POOLER_TYPE)

    cfg = c["cfg"].clone()
    cfg.defrost()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.freeze()
    spec = mask_head_spec(cfg)
    rng = np.random.RandomState(42)
    p2_std = float(c["ref_taps"]["p2"].numpy().std())
    state = _share_head_state(spec, mh, "roi_heads.mask_head", rng,
                              gains=[(".mask_fcn1.", 1.0 / max(p2_std, 1.0))])

    inst = _Inst(pred_classes=torch.from_numpy(classes))
    with torch.no_grad():
        x = pooler(feats_t, [torch.from_numpy(boxes)])
        mh(x, [inst])
    want = inst.pred_masks.numpy()[:, 0]  # (N, 28, 28) class-selected probs

    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(state, spec).items()}
    got = np.asarray(jax.jit(lambda pp: mask_head_forward(
        pp, feats_j, jnp.asarray(boxes), jnp.asarray(classes, jnp.int32),
        cfg, strides))(params))

    assert got.shape == want.shape, (got.shape, want.shape)
    assert want.std() > 0.01, "saturated fixture — comparison vacuous"
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_keypoint_head_vs_reference():
    """Our keypoint head + from-spec numpy heatmaps_to_keypoints
    (models/keypoint_head.py) against the reference's own
    KRCNNConvDeconvUpsampleHead + keypoint_rcnn_inference + torch
    heatmaps_to_keypoints (/root/reference/detectron2/modeling/roi_heads/
    keypoint_head.py, structures.py:34-104)."""
    from types import SimpleNamespace

    from densepose_tpu.models.keypoint_head import (
        heatmaps_to_keypoints_np, keypoint_head_forward, keypoint_head_spec)
    from densepose_tpu.checkpoint.transform import torch_state_to_jax

    c, feats_t, feats_j, boxes, classes, strides = _head_fixture()
    rcfg = _ref_cfg3(KEYPOINT_ON=True)
    from detectron2.modeling.poolers import ROIPooler
    from detectron2.modeling.roi_heads.keypoint_head import (
        build_keypoint_head, keypoint_rcnn_inference)

    torch.manual_seed(2)
    kh = build_keypoint_head(rcfg, SimpleNamespace(
        channels=256, height=rcfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
        width=rcfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION))
    kh.eval()
    pooler = ROIPooler(
        output_size=rcfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
        scales=(1 / 4, 1 / 8, 1 / 16, 1 / 32),
        sampling_ratio=rcfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO,
        pooler_type=rcfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_TYPE)

    cfg = c["cfg"].clone()
    cfg.defrost()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.freeze()
    spec = keypoint_head_spec(cfg)
    rng = np.random.RandomState(43)
    p2_std = float(c["ref_taps"]["p2"].numpy().std())
    state = _share_head_state(spec, kh, "roi_heads.keypoint_head", rng,
                              gains=[(".conv_fcn1.", 1.0 / max(p2_std, 1.0)),
                                     (".conv_fcn", 0.4)])

    boxes_t = torch.from_numpy(boxes)
    inst = _Inst(pred_classes=torch.from_numpy(classes),
                 pred_boxes=SimpleNamespace(tensor=boxes_t))
    with torch.no_grad():
        x = pooler(feats_t, [boxes_t])
        logits = kh.layers(x)
        keypoint_rcnn_inference(logits, [inst])
    want_heat = inst.pred_keypoint_heatmaps.numpy()      # (N, K, 56, 56)
    want_kps = inst.pred_keypoints.numpy()               # (N, K, 3) x,y,score

    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(state, spec).items()}
    got_heat = np.asarray(jax.jit(lambda pp: keypoint_head_forward(
        pp, feats_j, jnp.asarray(boxes), cfg, strides))(params))
    got_heat = got_heat.transpose(0, 3, 1, 2)            # NHWC -> NCHW

    assert got_heat.shape == want_heat.shape, (got_heat.shape,
                                               want_heat.shape)
    scale = max(float(np.std(want_heat)), 1e-6)
    err = float(np.max(np.abs(got_heat - want_heat))) / scale
    assert err < 1e-3, f"keypoint heatmaps: normalized max err {err:.2e}"

    got_kps = heatmaps_to_keypoints_np(got_heat, boxes)[:, :, [0, 1, 3]]
    # positions come from per-keypoint argmaxes of bicubic-resized maps:
    # equal argmax index -> bitwise-equal coords; near-exact logit ties may
    # flip a rare argmax between torch's bicubic and the from-spec numpy one
    pos_same = np.all(np.abs(got_kps[:, :, :2] - want_kps[:, :, :2]) < 1e-3,
                      axis=-1)
    assert pos_same.mean() > 0.95, f"keypoint argmax agreement {pos_same.mean():.3f}"
    np.testing.assert_allclose(got_kps[pos_same][:, 2],
                               want_kps[pos_same][:, 2], rtol=1e-3, atol=1e-5)


def test_res5_roi_heads_vs_reference():
    """Our C4 box path (models/res5_roi_heads.py) against the reference's
    own Res5ROIHeads (pooler + res5 stage + FastRCNNOutputLayers +
    fast_rcnn_inference, /root/reference/detectron2/modeling/roi_heads/
    build.py:198-363) on identical res4 features, proposals, and shared
    random weights.

    The reference's Res5ROIHeads.forward is UNREACHABLE as written: it reads
    ``x.proposal_boxes`` (attribute style) while its own
    ``box_predictor.inference`` requires dict-style proposals
    (fast_rcnn.py:257-279) — no one proposal container satisfies both, and
    ``forward_with_given_boxes`` crashes when MASK_ON=False (self.mask_head
    never assigned). This test therefore drives the reference's own
    submodules exactly as forward composes them (pool -> res5 -> mean ->
    predict -> inference) with dict proposals."""
    from types import SimpleNamespace

    from densepose_tpu.models.res5_roi_heads import res5_forward, res5_spec
    from densepose_tpu.checkpoint.transform import torch_state_to_jax
    from tests.test_realscale_parity import detection_tamed_state

    rcfg = _ref_cfg3()
    rcfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    rcfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    rcfg.MODEL.MASK_ON = False
    rcfg.MODEL.KEYPOINT_ON = False
    from detectron2.modeling.roi_heads.build import Res5ROIHeads

    torch.manual_seed(3)
    heads = Res5ROIHeads(rcfg, {"res4": SimpleNamespace(stride=16,
                                                        channels=1024)})
    heads.eval()

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.DENSEPOSE_ON = False
    cfg.freeze()

    spec = res5_spec(cfg)
    rng = np.random.RandomState(44)
    state = detection_tamed_state(_make_state(spec, rng=rng))
    sd = {k[len("roi_heads."):]: torch.from_numpy(v)
          for k, v in state.items()}
    missing, unexpected = heads.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected[:5]
    assert not missing, missing[:5]

    h, w = 30, 40  # res4 grid of a ~480x640 image
    feat = (rng.randn(1, 1024, h, w) * 0.5).astype(np.float32)
    sizes = [40, 90, 160, 260, 380]
    props = np.array([[10 + 20 * i, 4 + 6 * i, 10 + 20 * i + s, 4 + 6 * i + s]
                      for i, s in enumerate(sizes)] * 4, np.float32)
    props += rng.rand(*props.shape).astype(np.float32) * 9
    props[:, 2] = np.minimum(props[:, 2], 16.0 * w - 2)
    props[:, 3] = np.minimum(props[:, 3], 16.0 * h - 2)

    proposal_dict = {
        "proposal_boxes": torch.from_numpy(props),
        "image_size": torch.tensor([16 * h, 16 * w]),
    }
    with torch.no_grad():
        box_features = heads._shared_roi_transform(
            [torch.from_numpy(feat)], [proposal_dict["proposal_boxes"]])
        predictions = heads.box_predictor(box_features.mean(dim=[2, 3]))
        pred_instances, _ = heads.box_predictor.inference(
            predictions, [proposal_dict])
    ref = pred_instances[0]
    n_ref = len(ref["scores"])
    assert n_ref >= 3, "fixture produced too few reference detections"

    params = {k: jnp.asarray(v) for k, v in torch_state_to_jax(
        state, spec, fold_bn=False).items()}
    feat_j = jnp.asarray(feat[0].transpose(1, 2, 0))
    boxes_o, scores_o, classes_o, valid_o = jax.jit(
        lambda pp, ff, pr: res5_forward(
            pp, {"res4": ff}, pr, jnp.ones(len(props), bool), cfg))(
        params, feat_j, jnp.asarray(props))

    n = int(np.asarray(valid_o).sum())
    assert n == n_ref, (n, n_ref)
    np.testing.assert_allclose(np.asarray(scores_o)[:n],
                               ref["scores"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes_o)[:n],
                               ref["pred_boxes"].numpy(), atol=0.05,
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(classes_o)[:n],
                                  ref["pred_classes"].numpy())


# ---------------------------------------------------------------------------
# the resize path (k != 1) end-to-end vs the reference's own forward
# (VERDICT r3 #3): the oracle geometry above pins k=1 by design; this test
# bounds what the deliberate 1-LSB uint8-resize divergence
# (test_realscale_parity.test_torch_uint8_resize_divergence_is_one_lsb:
# torch's fixed-point uint8 bilinear kernel vs our float-resize+round spec,
# engine/defaults.py:87-89) does to the reference's own final detections and
# SIUV maps THROUGH the full network and NMS, in the style of the bf16 drift
# envelope (matched-box pairs + same-box SIUV).
# ---------------------------------------------------------------------------


def test_resize_k_neq_1_envelope_vs_reference():
    """592x800 input, MIN_SIZE_TEST=440 -> k = 0.743 (440x595 network
    geometry): both sides really resize. Detections: count drift bounded,
    matched-pair box/score drift bounded. SIUV: our stage chain on the
    REFERENCE'S OWN pooler boxes (isolating resize-induced feature noise
    from box-reassociation chaos), normalized max err bounded. Bounds are
    measured envelopes with headroom, not exact-parity claims — exact-parity
    at k=1 lives in the tests above; the 1-LSB input divergence is real and
    deliberate (docs/ARCHITECTURE.md)."""
    from densepose_tpu.models.fpn import fpn_forward
    from densepose_tpu.models.roi_heads import densepose_stage_forward
    from densepose_tpu.predictor import DensePosePredictor

    h0, w0 = 592, 800
    cfg = _our_cfg()
    model = build_model(cfg)
    spec = model.spec()
    rng = np.random.RandomState(20260821)
    state = _make_state(spec, rng=rng)
    image = (rng.rand(h0, w0, 3) * 255).astype(np.uint8)

    taps, ref = _reference_run(image, state, tap=True)

    # both sides must agree on the resize TARGET exactly (ResizeShortestEdge
    # rounding semantics) — padded-shape equality proves it
    x, (h1, w1), _ = model.preprocess(jnp.asarray(image), (h0, w0))
    assert (h1, w1) != (h0, w0), "k must differ from 1 in this test"
    want_shape = tuple(taps["padded_input"].shape[-2:])
    assert tuple(np.asarray(x).shape[-3:-1]) == want_shape, (
        np.asarray(x).shape, want_shape)

    # ---- full-pipeline detection envelope (matched pairs) ----
    full = DensePosePredictor(
        cfg, params=torch_state_to_jax(state, spec,
                                       fold_bn=cfg.TPU.FOLD_FROZEN_BN)
    ).predict_numpy(image)
    n_ref = len(ref["scores"])
    n_ours = int(full["num_instances"])
    assert _nondegenerate_count(ref["pred_boxes"].numpy(), n_ref) >= min(
        n_ref, 5), "fixture degenerated — comparison vacuous"
    assert abs(n_ours - n_ref) <= max(3, n_ref // 4), (n_ours, n_ref)

    k = min(n_ours, n_ref, 10)
    b_ref = ref["pred_boxes"].numpy()[:k]
    s_ref = ref["scores"].numpy()[:k]
    b_ours = np.asarray(full["pred_boxes"])[:n_ours]
    s_ours = np.asarray(full["scores"])[:n_ours]
    dists = np.array([np.abs(b_ours - b_ref[i]).max(axis=1)
                      for i in range(k)])          # (k, n_ours)
    nearest = dists.argmin(axis=1)
    matched = [i for i in range(k) if dists[i, nearest[i]] < 6.0]
    box_drift = max((float(dists[i, nearest[i]]) for i in matched),
                    default=0.0)
    score_drift = max((float(abs(s_ref[i] - s_ours[nearest[i]]))
                       for i in matched), default=0.0)

    # ---- same-box SIUV envelope on the reference's own pooler boxes ----
    params = {k2: jnp.asarray(v) for k2, v in torch_state_to_jax(
        state, spec, fold_bn=False).items()}
    feats = jax.jit(lambda pp, xx: fpn_forward(pp, xx, cfg))(params, x)
    dp = jax.jit(lambda pp, ff, bb: densepose_stage_forward(
        pp, ff, bb, cfg))(params, feats, jnp.asarray(taps["dp_boxes"].numpy()))
    keymap = dict(coarse_segm="pred_densepose_coarse_segm",
                  fine_segm="pred_densepose_fine_segm",
                  u="pred_densepose_u", v="pred_densepose_v")
    siuv_err = {}
    for key, refkey in keymap.items():
        got = _nchw(np.asarray(dp[key])[:n_ref])
        want = ref[refkey].numpy()[:n_ref]
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(float(np.std(want)), 1e-6)
        siuv_err[key] = float(np.max(np.abs(got - want))) / scale

    print(f"k!=1 envelope: matched {len(matched)}/{k} boxes, "
          f"matched-box {box_drift:.3f}px, scores {score_drift:.4f}, "
          f"dets {n_ours} vs {n_ref}, same-box SIUV normalized max err "
          + ", ".join(f"{k2}={v:.3f}" for k2, v in siuv_err.items()))
    assert len(matched) >= max(1, k // 2), (len(matched), k)
    assert box_drift < 6.0
    assert score_drift < 0.05
    for key, err in siuv_err.items():
        assert err < 0.5, f"{key}: same-box normalized max err {err:.3f}"
