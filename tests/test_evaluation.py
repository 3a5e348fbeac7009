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


def test_check_expected_results():
    results = {"bbox": {"AP": 59.27}}
    ok = check_expected_results(results, [("bbox", "AP", 59.27, 0.025)])
    assert ok == []
    bad = check_expected_results(results, [("bbox", "AP", 60.0, 0.025)])
    assert len(bad) == 1
    missing = check_expected_results(results, [("densepose_gps", "AP", 60.11, 0.02)])
    assert "not computed" in missing[0]
