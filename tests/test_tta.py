"""Test-time augmentation (densepose_tpu/tta.py) — the capability behind the
reference's TTA quick_schedule config, which it declares but cannot run."""

import numpy as np
import pytest

from densepose_tpu import model_zoo
from densepose_tpu.predictor import DensePosePredictor
from densepose_tpu.tta import TTAPredictor

TINY = [
    "INPUT.MIN_SIZE_TEST", "64",
    "INPUT.MAX_SIZE_TEST", "128",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
    "TEST.DETECTIONS_PER_IMAGE", "3",
]


def _cfg(aug_opts):
    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY + aug_opts)
    cfg.freeze()
    return cfg


IMG = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)


def test_single_view_tta_equals_base():
    """One view, no flip -> TTA's detections reduce to plain inference, and
    its densepose maps equal a given-box pass on the merged (postprocessed)
    detections — the upstream-TTA semantics. (Exact equality with the plain
    pipeline's maps is NOT expected: the plain path pools on the box stage's
    *unclipped* network boxes, the reference's discarded-clip quirk; with
    real checkpoints detections lie inside the image and the two agree.)"""
    import jax
    import jax.numpy as jnp

    cfg = _cfg(["TEST.AUG.ENABLED", "True",
                "TEST.AUG.MIN_SIZES", "(64,)",
                "TEST.AUG.MAX_SIZE", "128",
                "TEST.AUG.FLIP", "False"])
    base = DensePosePredictor(cfg, seed=0)
    tta = TTAPredictor(base)
    want = base.predict_numpy(IMG)
    got_dev = tta(IMG)
    got = tta.numpy_outputs(got_dev)
    assert got["num_instances"] == want["num_instances"]
    np.testing.assert_allclose(got["pred_boxes"], want["pred_boxes"], atol=1e-4)

    # densepose maps == given-box pass on the merged detections
    from densepose_tpu.models.rcnn import compute_resize
    _, feats, _ = jax.jit(base.model.forward_stage1)(base.params, jnp.asarray(IMG))
    _, h1, w1 = compute_resize(48, 64, 64, 128)
    boxes_net = got_dev["pred_boxes"] * jnp.asarray(
        [w1 / 64, h1 / 48, w1 / 64, h1 / 48], jnp.float32)
    ref = jax.jit(base.model.forward_densepose)(base.params, feats, boxes_net)
    np.testing.assert_allclose(
        np.asarray(got_dev["pred_densepose_u"], np.float32),
        np.asarray(ref["pred_densepose_u"], np.float32), atol=1e-4, rtol=1e-4)


def test_multi_scale_flip_tta_runs():
    cfg = _cfg(["TEST.AUG.ENABLED", "True",
                "TEST.AUG.MIN_SIZES", "(48, 64)",
                "TEST.AUG.MAX_SIZE", "128",
                "TEST.AUG.FLIP", "True"])
    base = DensePosePredictor(cfg, seed=0)
    tta = TTAPredictor(base)
    out = tta.predict_numpy(IMG)
    n = out["num_instances"]
    assert 0 <= n <= cfg.TEST.DETECTIONS_PER_IMAGE
    assert out["pred_boxes"].shape == (n, 4)
    # SIUV maps averaged over the two non-flipped views
    assert out["pred_densepose_u"].shape[1:] == (25, 112, 112) or \
        out["pred_densepose_u"].shape[-1] == 112
    # merged boxes stay inside the image
    if n:
        assert out["pred_boxes"][:, 0].min() >= 0
        assert out["pred_boxes"][:, 2].max() <= 64


def test_flip_box_merge_is_flip_invariant():
    """A mirrored image through flip-enabled TTA must detect mirrored boxes:
    feed IMG and its mirror; merged detections should correspond under
    x -> W - x (same scores)."""
    cfg = _cfg(["TEST.AUG.ENABLED", "True",
                "TEST.AUG.MIN_SIZES", "(64,)",
                "TEST.AUG.MAX_SIZE", "128",
                "TEST.AUG.FLIP", "True"])
    tta = TTAPredictor(DensePosePredictor(cfg, seed=0))
    a = tta.predict_numpy(IMG)
    b = tta.predict_numpy(IMG[:, ::-1, :].copy())
    assert a["num_instances"] == b["num_instances"]
    if a["num_instances"]:
        np.testing.assert_allclose(
            np.sort(a["scores"]), np.sort(b["scores"]), atol=1e-4)
        mirrored = np.stack([64 - b["pred_boxes"][:, 2], b["pred_boxes"][:, 1],
                             64 - b["pred_boxes"][:, 0], b["pred_boxes"][:, 3]],
                            axis=1)
        np.testing.assert_allclose(
            np.sort(a["pred_boxes"], axis=0), np.sort(mirrored, axis=0),
            atol=1e-3)


def test_unflip_chart_segm_mirror_and_permutation():
    """The flipped-view unflip: W-axis mirror + the static 24-part
    left/right channel permutation (hand-checked pairs)."""
    import jax.numpy as jnp
    from densepose_tpu.tta import FINE_SEGM_PERM, PART_SYMMETRY, unflip_chart_segm

    # the symmetry is a fixed involution: torso 1/2 self-map, later pairs swap
    assert PART_SYMMETRY[0] == 1 and PART_SYMMETRY[1] == 2
    assert PART_SYMMETRY[2] == 4 and PART_SYMMETRY[3] == 3  # hands swap
    for part, sym in enumerate(PART_SYMMETRY, start=1):
        assert PART_SYMMETRY[sym - 1] == part  # involution
    assert sorted(FINE_SEGM_PERM) == list(range(25))

    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.randn(2, 4, 6, 2).astype(np.float32))
    # fine map: channel c holds constant value c, with a spatial marker
    fine = np.tile(np.arange(25, dtype=np.float32), (2, 4, 6, 1))
    fine[:, :, 0, :] += 100.0  # marker on the left edge
    cs, fs = unflip_chart_segm(coarse, jnp.asarray(fine))
    np.testing.assert_array_equal(np.asarray(cs),
                                  np.asarray(coarse)[:, :, ::-1, :])
    fs = np.asarray(fs)
    # channel c now holds the symmetric part's value
    np.testing.assert_array_equal(fs[0, 0, 1, :],
                                  np.asarray(FINE_SEGM_PERM, np.float32))
    # the left-edge marker moved to the right edge
    assert (fs[:, :, -1, :] >= 100).all() and (fs[:, :, 0, :] < 100).all()


def test_flip_contributes_segm_evidence():
    """Single view + flip: TTA segm maps must equal
    (plain + unflipped-flipped)/2 on the merged boxes, while U/V stay
    plain-view-only — computed here from the model pieces directly."""
    import jax
    import jax.numpy as jnp
    from densepose_tpu.models.rcnn import compute_resize
    from densepose_tpu.tta import unflip_chart_segm

    cfg = _cfg(["TEST.AUG.ENABLED", "True",
                "TEST.AUG.MIN_SIZES", "(64,)",
                "TEST.AUG.MAX_SIZE", "128",
                "TEST.AUG.FLIP", "True"])
    base = DensePosePredictor(cfg, seed=0)
    tta = TTAPredictor(base)
    assert tta.flip_segm
    got = tta(IMG)

    s1 = jax.jit(base.model.forward_stage1)
    s2 = jax.jit(base.model.forward_densepose)
    _, feats, _ = s1(base.params, jnp.asarray(IMG))
    _, feats_f, _ = s1(base.params, jnp.asarray(IMG[:, ::-1, :].copy()))
    _, h1, w1 = compute_resize(48, 64, 64, 128)
    scale = jnp.asarray([w1 / 64, h1 / 48, w1 / 64, h1 / 48], jnp.float32)
    boxes = got["pred_boxes"]
    dp = s2(base.params, feats, boxes * scale)
    bf = jnp.stack([64 - boxes[:, 2], boxes[:, 1],
                    64 - boxes[:, 0], boxes[:, 3]], axis=1)
    dp_f = s2(base.params, feats_f, bf * scale)
    cs, fs = unflip_chart_segm(
        dp_f["pred_densepose_coarse_segm"].astype(jnp.float32),
        dp_f["pred_densepose_fine_segm"].astype(jnp.float32))

    np.testing.assert_allclose(
        np.asarray(got["pred_densepose_fine_segm"]),
        (np.asarray(dp["pred_densepose_fine_segm"], np.float32)
         + np.asarray(fs)) / 2, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["pred_densepose_coarse_segm"]),
        (np.asarray(dp["pred_densepose_coarse_segm"], np.float32)
         + np.asarray(cs)) / 2, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["pred_densepose_u"]),
        np.asarray(dp["pred_densepose_u"], np.float32), atol=1e-4, rtol=1e-4)


def test_tta_cli_flow(tmp_path):
    """run.py picks up TEST.AUG.ENABLED from the config (the reference's TTA
    quick_schedule) and routes through TTAPredictor."""
    import os
    import subprocess
    import sys

    cv2 = pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, (np.random.RandomState(0).rand(48, 64, 3) * 255
                           ).astype(np.uint8))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "run.py"),
         "/root/reference/configs/quick_schedules/"
         "densepose_rcnn_R_50_FPN_TTA_inference_acc_test.yaml", img_path,
         "--cpu", "--opts"] + TINY + [
             "TEST.AUG.MIN_SIZES", "(48, 64)", "TEST.AUG.MAX_SIZE", "128",
             "MODEL.WEIGHTS", ""],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "in_pred.jpg")), r.stdout


def test_unflip_legacy_15ch_coarse_segm():
    """Legacy (NUM_COARSE_SEGM_CHANNELS=15) coarse segm unflip: W mirror +
    the bg+14-part left/right involution, hand-checked channel pairs
    (VERDICT r2 #7). Chart order: 1 Torso, 2 R-hand, 3 L-hand, 4 L-foot,
    5 R-foot, 6/7 upper-leg R/L, 8/9 lower-leg R/L, 10/11 upper-arm L/R,
    12/13 lower-arm L/R, 14 Head."""
    import jax.numpy as jnp
    from densepose_tpu.tta import COARSE_SEGM_PERM_15, unflip_chart_segm

    perm = COARSE_SEGM_PERM_15
    assert sorted(perm) == list(range(15))
    for c, s in enumerate(perm):
        assert perm[s] == c, (c, s)  # involution
    # self-symmetric: background, torso, head
    assert perm[0] == 0 and perm[1] == 1 and perm[14] == 14
    # swapped pairs: hands, feet, upper/lower legs, upper/lower arms
    for a, b in ((2, 3), (4, 5), (6, 7), (8, 9), (10, 11), (12, 13)):
        assert perm[a] == b and perm[b] == a

    rng = np.random.RandomState(1)
    # coarse: channel c holds value c + a left-edge spatial marker
    coarse = np.tile(np.arange(15, dtype=np.float32), (2, 4, 6, 1))
    coarse[:, :, 0, :] += 100.0
    fine = rng.randn(2, 4, 6, 25).astype(np.float32)
    cs, fs = unflip_chart_segm(jnp.asarray(coarse), jnp.asarray(fine))
    cs = np.asarray(cs)
    # hand-checked: after unflip, the R-hand channel (2) holds the L-hand
    # value (3) and vice versa; torso/head/bg unchanged
    np.testing.assert_array_equal(
        cs[0, 0, 1, :], np.asarray(perm, np.float32))
    assert (cs[:, :, -1, :] >= 100).all() and (cs[:, :, 0, :] < 100).all()
    # fine path is unchanged by the legacy coarse width
    from densepose_tpu.tta import FINE_SEGM_PERM
    np.testing.assert_array_equal(
        np.asarray(fs), fine[:, :, ::-1, :][..., np.asarray(FINE_SEGM_PERM)])


def _synthetic_uv_tables(rng):
    """(24, 256, 256) per-part lookup tables with distinct per-part content
    (so a part/channel mix-up cannot pass)."""
    u_tab = rng.rand(24, 256, 256).astype(np.float32)
    v_tab = rng.rand(24, 256, 256).astype(np.float32)
    return u_tab, v_tab


def test_load_uv_symmetry_formats(tmp_path):
    """load_uv_symmetry accepts the tooling's .mat cell layout, .npz dense
    arrays, and in-memory dicts; rejects malformed data."""
    from scipy.io import savemat

    from densepose_tpu.tta import load_uv_symmetry

    rng = np.random.RandomState(5)
    u_tab, v_tab = _synthetic_uv_tables(rng)

    # .mat cell layout: (1, 24) object arrays of (256, 256) tables — the
    # layout scipy produces for MATLAB cell arrays, which is how
    # densepose_UV_symmetry_transforms.mat stores them
    cells_u = np.empty((1, 24), object)
    cells_v = np.empty((1, 24), object)
    for i in range(24):
        cells_u[0, i] = u_tab[i].astype(np.float64)
        cells_v[0, i] = v_tab[i].astype(np.float64)
    mat = str(tmp_path / "uv_symmetry.mat")
    savemat(mat, {"U_transforms": cells_u, "V_transforms": cells_v})
    got = load_uv_symmetry(mat)
    np.testing.assert_allclose(got["U_transforms"], u_tab, atol=1e-6)
    np.testing.assert_allclose(got["V_transforms"], v_tab, atol=1e-6)

    npz = str(tmp_path / "uv_symmetry.npz")
    np.savez(npz, U_transforms=u_tab, V_transforms=v_tab)
    got = load_uv_symmetry(npz)
    np.testing.assert_array_equal(got["U_transforms"], u_tab)

    got = load_uv_symmetry({"U_transforms": u_tab, "V_transforms": v_tab})
    np.testing.assert_array_equal(got["V_transforms"], v_tab)

    with pytest.raises(ValueError, match="U_transforms"):
        load_uv_symmetry({"V_transforms": v_tab})
    with pytest.raises(ValueError, match="expected"):
        load_uv_symmetry({"U_transforms": u_tab[:23], "V_transforms": v_tab})


def test_unflip_chart_uv_fixture():
    """unflip_chart_uv vs an explicit per-pixel loop implementing the
    ground-truth flip semantics (upstream densepose data_relative
    _flip_iuv_semantics, lifted to dense maps): a pixel whose OLD part is p
    lands in NEW channel sym(p) with value tab[p-1][int(v*255), int(u*255)],
    after the W mirror; background channel mirrors unchanged."""
    import jax.numpy as jnp

    from densepose_tpu.tta import PART_SYMMETRY, unflip_chart_uv

    rng = np.random.RandomState(7)
    u_tab, v_tab = _synthetic_uv_tables(rng)
    N, H, W = 2, 3, 5
    u = rng.rand(N, H, W, 25).astype(np.float32)
    v = rng.rand(N, H, W, 25).astype(np.float32)
    # include out-of-range values the clamp must handle
    u[0, 0, 0, 1] = -0.3
    v[0, 0, 1, 2] = 1.7

    got_u, got_v = unflip_chart_uv(jnp.asarray(u), jnp.asarray(v),
                                   jnp.asarray(u_tab), jnp.asarray(v_tab))
    got_u, got_v = np.asarray(got_u), np.asarray(got_v)

    um = u[:, :, ::-1, :]
    vm = v[:, :, ::-1, :]
    want_u = np.empty_like(um)
    want_v = np.empty_like(vm)
    want_u[..., 0] = um[..., 0]
    want_v[..., 0] = vm[..., 0]
    for n in range(N):
        for i in range(H):
            for j in range(W):
                for p in range(1, 25):  # OLD part label p
                    q = PART_SYMMETRY[p - 1]  # NEW part label
                    ub = int(min(max(um[n, i, j, p], 0.0), 1.0) * 255)
                    vb = int(min(max(vm[n, i, j, p], 0.0), 1.0) * 255)
                    want_u[n, i, j, q] = u_tab[p - 1, vb, ub]
                    want_v[n, i, j, q] = v_tab[p - 1, vb, ub]
    np.testing.assert_allclose(got_u, want_u, atol=1e-6)
    np.testing.assert_allclose(got_v, want_v, atol=1e-6)


def test_flip_contributes_uv_evidence_with_tables(tmp_path):
    """With the symmetry tables supplied (TPU.UV_SYMMETRY_PATH), flipped
    views contribute U/V evidence: TTA's u equals
    (plain + unflip_chart_uv(flipped))/2 on the merged boxes, segm merge is
    unchanged vs the no-tables run, and without tables u stays
    plain-view-only."""
    import jax
    import jax.numpy as jnp

    from densepose_tpu.models.rcnn import compute_resize
    from densepose_tpu.tta import unflip_chart_uv

    rng = np.random.RandomState(11)
    u_tab, v_tab = _synthetic_uv_tables(rng)
    npz = str(tmp_path / "uv.npz")
    np.savez(npz, U_transforms=u_tab, V_transforms=v_tab)

    cfg = _cfg(["TEST.AUG.ENABLED", "True",
                "TEST.AUG.MIN_SIZES", "(64,)",
                "TEST.AUG.MAX_SIZE", "128",
                "TEST.AUG.FLIP", "True",
                "TPU.UV_SYMMETRY_PATH", npz])
    base = DensePosePredictor(cfg, seed=0)
    tta = TTAPredictor(base)
    assert tta.uv_tables is not None
    got = tta(IMG)
    # contrast run: same weights, no tables
    cfg0 = _cfg(["TEST.AUG.ENABLED", "True",
                 "TEST.AUG.MIN_SIZES", "(64,)",
                 "TEST.AUG.MAX_SIZE", "128",
                 "TEST.AUG.FLIP", "True"])
    tta0 = TTAPredictor(DensePosePredictor(cfg0, params=dict(base.params)))
    got0 = tta0(IMG)

    # detections and segm merge identical with/without uv tables
    np.testing.assert_array_equal(np.asarray(got["pred_boxes"]),
                                  np.asarray(got0["pred_boxes"]))
    np.testing.assert_allclose(
        np.asarray(got["pred_densepose_fine_segm"]),
        np.asarray(got0["pred_densepose_fine_segm"]), atol=1e-6)

    # twin computation of the expected uv merge
    s1 = jax.jit(base.model.forward_stage1)
    s2 = jax.jit(base.model.forward_densepose)
    _, feats, _ = s1(base.params, jnp.asarray(IMG))
    _, feats_f, _ = s1(base.params, jnp.asarray(IMG[:, ::-1, :].copy()))
    _, h1, w1 = compute_resize(48, 64, 64, 128)
    scale = jnp.asarray([w1 / 64, h1 / 48, w1 / 64, h1 / 48], jnp.float32)
    boxes = got["pred_boxes"]
    dp = s2(base.params, feats, boxes * scale)
    bf = jnp.stack([64 - boxes[:, 2], boxes[:, 1],
                    64 - boxes[:, 0], boxes[:, 3]], axis=1)
    dp_f = s2(base.params, feats_f, bf * scale)
    fu, fv = unflip_chart_uv(dp_f["pred_densepose_u"].astype(jnp.float32),
                             dp_f["pred_densepose_v"].astype(jnp.float32),
                             jnp.asarray(u_tab), jnp.asarray(v_tab))
    np.testing.assert_allclose(
        np.asarray(got["pred_densepose_u"]),
        (np.asarray(dp["pred_densepose_u"], np.float32) + np.asarray(fu)) / 2,
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["pred_densepose_v"]),
        (np.asarray(dp["pred_densepose_v"], np.float32) + np.asarray(fv)) / 2,
        atol=1e-4, rtol=1e-4)
    # and the no-tables run really is plain-view-only
    np.testing.assert_allclose(
        np.asarray(got0["pred_densepose_u"]),
        np.asarray(dp["pred_densepose_u"], np.float32), atol=1e-4, rtol=1e-4)


def test_merge_detections_upstream_fixture():
    """merge_detections pinned to a hand-derived fixture following upstream
    GeneralizedRCNNWithTTA._merge_detections semantics (VERDICT r2 #9):
    all views' detections concatenated -> class-wise greedy NMS at the test
    threshold -> top-k by score. Expectations below were computed by hand
    (IoUs annotated), not by running this code."""
    import jax.numpy as jnp
    from densepose_tpu.tta import merge_detections

    # "view 1": A, B ; "view 2" (already mapped back): A', C, E, F, D + an
    # invalid slot G that must be ignored entirely
    boxes = np.array([
        [0, 0, 10, 10],    # A   cls0 0.90 IoU(A,A')=90/110=0.818 -> suppressed
        [20, 20, 30, 30],  # B   cls0 0.80 kept
        [1, 0, 11, 10],    # A'  cls0 0.95 kept (highest)
        [20, 20, 30, 31],  # C   cls0 0.70 IoU(B,C)=100/110=0.909 -> suppressed
        [1, 0, 11, 10],    # D   cls1 0.50 IoU(D,A')=1 but class-aware -> kept
        [2, 0, 12, 10],    # E   cls0 0.60 IoU(E,A')=90/110=0.818 -> suppressed
        [8, 0, 18, 10],    # F   cls0 0.65 IoU(F,A')=30/170=0.176 -> kept
        [0, 0, 10, 10],    # G   cls0 0.99 valid=False -> ignored (must NOT
    ], np.float32)         #                suppress A)
    scores = np.array([0.90, 0.80, 0.95, 0.70, 0.50, 0.60, 0.65, 0.99],
                      np.float32)
    classes = np.array([0, 0, 0, 0, 1, 0, 0, 0], np.int32)
    valid = np.array([1, 1, 1, 1, 1, 1, 1, 0], bool)

    b, s, c, v = merge_detections(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), nms_thresh=0.5, topk=6)
    b, s, c, v = (np.asarray(x) for x in (b, s, c, v))
    n = int(v.sum())
    assert n == 4
    assert v[:n].all(), v  # survivors are a score-sorted prefix
    np.testing.assert_allclose(s[:n], [0.95, 0.80, 0.65, 0.50])
    np.testing.assert_array_equal(c[:n], [0, 0, 0, 1])
    np.testing.assert_allclose(
        b[:n], [[1, 0, 11, 10], [20, 20, 30, 30], [8, 0, 18, 10],
                [1, 0, 11, 10]])

    # top-k truncation keeps the best-scored survivors
    b2, s2, c2, v2 = merge_detections(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), nms_thresh=0.5, topk=2)
    assert int(np.asarray(v2).sum()) == 2
    np.testing.assert_allclose(np.asarray(s2), [0.95, 0.80])
