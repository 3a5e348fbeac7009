"""End-to-end CLI-level tests (CPU, tiny sizes): image flow, video flow,
export/import round-trip, fp16 mode."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "INPUT.MIN_SIZE_TEST", "64",
    "INPUT.MAX_SIZE_TEST", "128",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
    "TEST.DETECTIONS_PER_IMAGE", "3",
]


def _tiny_cfg():
    from densepose_tpu import model_zoo
    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TINY)
    return cfg


def test_image_cli_flow(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_path = str(tmp_path / "in.jpg")
    img = np.full((48, 64, 3), 128, np.uint8)
    cv2.imwrite(img_path, img)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml", img_path,
         "--cpu", "--opts"] + TINY,
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "in_pred.jpg")), r.stdout


def test_video_flow(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import jax
    from densepose_tpu.predictor import DensePosePredictor
    from densepose_tpu.visualizer import End2EndVisualizer
    from densepose_tpu.parallel.pipeline import run_video

    vid_path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(5):
        w.write(np.full((48, 64, 3), 30 * i, np.uint8))
    w.release()

    cfg = _tiny_cfg()
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    vis = End2EndVisualizer(alpha=0.7, keep_bg=False)
    out_path = str(tmp_path / "clip_pred.mp4")
    run_video(pred, vis, vid_path, out_path)
    assert os.path.exists(out_path)
    cap = cv2.VideoCapture(out_path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5


class _RecordingVisualizer:
    """Captures the per-frame numpy outputs run_video hands the visualizer."""

    def __init__(self):
        self.outs = []

    def visualize(self, frame, host_outputs):
        self.outs.append(host_outputs)
        return frame.copy()


def test_video_batched_matches_serial(tmp_path):
    """SURVEY section 4 item 4: N-batched video output must equal the 1-frame
    serial output frame-for-frame. batch=2 over 5 frames also exercises the
    padded tail group (2+2+1)."""
    cv2 = pytest.importorskip("cv2")
    from densepose_tpu.predictor import DensePosePredictor
    from densepose_tpu.parallel.pipeline import run_video

    vid_path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    rng = np.random.RandomState(0)
    for i in range(5):
        w.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
    w.release()

    cfg = _tiny_cfg()
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)

    rec_serial = _RecordingVisualizer()
    run_video(pred, rec_serial, vid_path, str(tmp_path / "a.mp4"), batch=1)
    rec_batched = _RecordingVisualizer()
    run_video(pred, rec_batched, vid_path, str(tmp_path / "b.mp4"), batch=2)

    assert len(rec_serial.outs) == len(rec_batched.outs) == 5
    for f, (a, b) in enumerate(zip(rec_serial.outs, rec_batched.outs)):
        assert set(a) == set(b)
        assert a["num_instances"] == b["num_instances"], f
        for k in a:
            # the batched path compiles a different (vmapped, non-switched)
            # graph; XLA fusion differences leave small absolute residue on
            # the logit-scale maps — semantic, not bitwise, invariance.
            # rtol stays 0: near-zero logits make relative error meaningless.
            atol = 5e-2 if k.startswith("pred_densepose_") else 1e-3
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=atol, rtol=0, err_msg=f"frame {f}: {k}")


def test_export_import_roundtrip(tmp_path, monkeypatch):
    """export.py writes an .npz bundle that the predictor loads; outputs match
    the direct-from-pkl path exactly."""
    import pickle
    import jax.numpy as jnp
    from densepose_tpu.checkpoint.transform import random_torch_state
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu.predictor import DensePosePredictor

    cfg = _tiny_cfg()
    cfg.freeze()
    model = build_model(cfg)
    spec = model.spec()
    state = random_torch_state(spec, seed=7)
    pkl_path = str(tmp_path / "model.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": {k: v for k, v in state.items()},
                     "__author__": "test"}, f)

    monkeypatch.chdir(tmp_path)
    cfg_yaml = str(tmp_path / "cfg.yaml")
    with open(cfg_yaml, "w") as f:
        f.write("VERSION: 2\n")  # defaults-only; we pass overrides on top

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "export.py"),
         "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml", pkl_path],
        capture_output=True, text=True, env=env, timeout=300, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    npz = str(tmp_path / "exported" / "densepose_rcnn_R_50_FPN_s1x_fp32.npz")
    assert os.path.exists(npz)
    assert os.path.exists(npz + ".config.json")

    img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    p1 = DensePosePredictor(cfg, weights_path=pkl_path)
    p2cfg = _tiny_cfg()
    p2cfg.freeze()
    p2 = DensePosePredictor(p2cfg, weights_path=npz)
    o1 = p1.predict_numpy(img)
    o2 = p2.predict_numpy(img)
    np.testing.assert_allclose(o1["pred_boxes"], o2["pred_boxes"], atol=1e-5)
    np.testing.assert_allclose(o1["scores"], o2["scores"], atol=1e-6)


def test_fp16_mode_runs():
    """The --fp16 analogue: float16 params+compute with fp32 islands; outputs
    stay finite and close to the fp32 run (reference export.py:36-37)."""
    import jax
    from densepose_tpu.predictor import DensePosePredictor

    img = (np.random.RandomState(1).rand(48, 64, 3) * 255).astype(np.uint8)
    cfg32 = _tiny_cfg()
    cfg32.freeze()
    o32 = DensePosePredictor(cfg32, seed=0).predict_numpy(img)

    cfg16 = _tiny_cfg()
    cfg16.TPU.COMPUTE_DTYPE = "float16"
    cfg16.freeze()
    o16 = DensePosePredictor(cfg16, seed=0).predict_numpy(img)

    assert np.isfinite(o16["pred_boxes"]).all()
    assert np.isfinite(o16["scores"]).all()
    # same detections, close boxes (half precision tolerance)
    if len(o32["pred_boxes"]) and len(o16["pred_boxes"]):
        n = min(len(o32["pred_boxes"]), len(o16["pred_boxes"]))
        np.testing.assert_allclose(o16["pred_boxes"][:n], o32["pred_boxes"][:n],
                                   atol=2.0, rtol=0.1)


def test_bucketed_matches_monolithic():
    """TPU.BUCKETED_DENSEPOSE two-stage dispatch produces identical results to
    the monolithic graph for the valid detections."""
    from densepose_tpu.predictor import DensePosePredictor

    img = (np.random.RandomState(2).rand(48, 64, 3) * 255).astype(np.uint8)
    cfg_a = _tiny_cfg()
    cfg_a.freeze()
    a = DensePosePredictor(cfg_a, seed=0).predict_numpy(img)

    cfg_b = _tiny_cfg()
    cfg_b.TPU.BUCKETED_DENSEPOSE = True
    cfg_b.freeze()
    b = DensePosePredictor(cfg_b, seed=0).predict_numpy(img)

    assert a["num_instances"] == b["num_instances"]
    np.testing.assert_allclose(a["pred_boxes"], b["pred_boxes"], atol=1e-5)
    np.testing.assert_allclose(a["pred_densepose_u"], b["pred_densepose_u"],
                               atol=1e-4, rtol=1e-3)


def test_switched_densepose_matches_monolithic():
    """lax.switch in-graph bucketing picks a branch on device; outputs on the
    valid prefix equal the monolithic graph."""
    import jax.numpy as jnp
    import jax
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu.predictor import load_params

    cfg = _tiny_cfg()
    cfg.merge_from_list(["TEST.DETECTIONS_PER_IMAGE", "40",
                         "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.05"])
    cfg.freeze()
    model = build_model(cfg)
    params = {k: jnp.asarray(v) for k, v in load_params(cfg, None, seed=0).items()}
    img = (np.random.RandomState(3).rand(48, 64, 3) * 255).astype(np.uint8)

    mono = jax.jit(lambda p, x: model.forward(p, x, switched_densepose=False))(
        params, jnp.asarray(img))
    swit = jax.jit(lambda p, x: model.forward(p, x, switched_densepose=True))(
        params, jnp.asarray(img))

    n = int(mono["num_instances"])
    assert n == int(swit["num_instances"])
    np.testing.assert_allclose(np.asarray(mono["pred_boxes"]),
                               np.asarray(swit["pred_boxes"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mono["pred_densepose_u"])[:n],
                               np.asarray(swit["pred_densepose_u"])[:n],
                               atol=1e-5, rtol=1e-4)


def test_device_postprocess_matches_host_extraction():
    """TPU.DEVICE_POSTPROCESS: on-device argmax+UV gather agrees with the
    host extraction at grid resolution (labels exactly, uv where labeled)."""
    import jax
    import jax.numpy as jnp
    from densepose_tpu.models.rcnn import build_model
    from densepose_tpu.predictor import DensePosePredictor, load_params

    cfg = _tiny_cfg()
    cfg.freeze()
    model = build_model(cfg)
    params = {k: jnp.asarray(v) for k, v in load_params(cfg, None, seed=0).items()}
    img = (np.random.RandomState(4).rand(48, 64, 3) * 255).astype(np.uint8)

    raw = jax.jit(lambda p, x: model.forward(p, x))(params, jnp.asarray(img))
    dev = jax.jit(lambda p, x: model.forward(p, x, device_postprocess=True))(
        params, jnp.asarray(img))

    n = int(raw["num_instances"])
    coarse = np.asarray(raw["pred_densepose_coarse_segm"])[:n]
    fine = np.asarray(raw["pred_densepose_fine_segm"])[:n]
    u = np.asarray(raw["pred_densepose_u"])[:n]
    fg = coarse.argmax(-1) > 0
    want_labels = fine.argmax(-1) * fg

    got_labels = np.asarray(dev["pred_densepose_labels"])[:n]
    np.testing.assert_array_equal(got_labels, want_labels)
    got_uv = np.asarray(dev["pred_densepose_uv"], dtype=np.float32)[:n]
    want_u = np.take_along_axis(u, want_labels[..., None], axis=-1)[..., 0] * fg
    # uv travels in float16 (transfer-optimized)
    np.testing.assert_allclose(got_uv[..., 0], want_u, atol=2e-3, rtol=2e-3)

    # full predictor path with the knob + visualizer consumes the new form
    cfg2 = _tiny_cfg()
    cfg2.TPU.DEVICE_POSTPROCESS = True
    cfg2.freeze()
    pred = DensePosePredictor(cfg2, seed=0)
    out = pred.predict_numpy(img)
    assert "pred_densepose_labels" in out
    from densepose_tpu.visualizer import DensePoseResultExtractor
    results, boxes = DensePoseResultExtractor()(out)
    assert len(results) == out["num_instances"]
    if results:
        assert results[0]["uv"].shape[0] == 2


def test_aot_export_roundtrip():
    """jax.export AOT artifact: serialize the compiled pipeline, reload, and
    get identical outputs — the analogue of loading the reference's .pt."""
    import jax.numpy as jnp
    from densepose_tpu.predictor import DensePosePredictor

    cfg = _tiny_cfg()
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    img = (np.random.RandomState(9).rand(48, 64, 3) * 255).astype(np.uint8)
    direct = pred.predict_numpy(img)

    data = pred.aot_export_bytes((48, 64))
    assert len(data) > 1000
    call = DensePosePredictor.aot_load(data)
    out = call(pred.params, jnp.asarray(img))
    aot = pred.numpy_outputs(out)
    assert aot["num_instances"] == direct["num_instances"]
    np.testing.assert_allclose(aot["pred_boxes"], direct["pred_boxes"], atol=1e-5)


def test_image_directory_flow(tmp_path):
    """run.py on a DIRECTORY of images writes a _pred sibling per image."""
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "batch"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"f{i}.jpg"), np.full((48, 64, 3), 90 + i, np.uint8))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml", str(d),
         "--cpu", "--opts"] + TINY,
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(d / "f0_pred.jpg")) and \
        os.path.exists(str(d / "f1_pred.jpg")), r.stdout


def test_zoo_name_cli_flow(tmp_path):
    """run.py accepts a bare model-zoo name (no YAML); offline it falls back
    to random weights with a warning."""
    cv2 = pytest.importorskip("cv2")
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, np.full((48, 64, 3), 70, np.uint8))

    env = dict(os.environ, JAX_PLATFORMS="cpu", DENSEPOSE_TPU_OFFLINE="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "densepose_rcnn_R_50_FPN_s1x", img_path, "--cpu", "--opts"] + TINY,
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "in_pred.jpg")), r.stdout


@pytest.mark.parametrize("mode", ["u", "bbox"])
def test_vis_modes_cli(tmp_path, mode):
    """run.py --vis u/bbox overlay modes produce output images."""
    cv2 = pytest.importorskip("cv2")
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, (np.random.RandomState(2).rand(48, 64, 3) * 255
                           ).astype(np.uint8))
    env = dict(os.environ, JAX_PLATFORMS="cpu", DENSEPOSE_TPU_OFFLINE="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "densepose_rcnn_R_50_FPN_s1x", img_path, "--cpu", "--vis", mode,
         "--opts"] + TINY,
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "in_pred.jpg")), r.stdout
