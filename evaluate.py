#!/usr/bin/env python
"""Evaluation CLI: run a model over a COCO-format DensePose dataset and
report box AP + DensePose GPS/GPSm AP, checked against the config's
``TEST.EXPECTED_RESULTS`` when present.

The reference ships accuracy targets in its quick_schedules configs but no
way to compute them (SURVEY.md section 4) — this closes that gap:

    python evaluate.py <cfg-or-npz> <annotations.json> <image_dir> \
        [--weights model.pkl] [--geodesics Pdist_matrix.pkl] [--max-images N]

annotations.json: COCO format with DensePose fields per annotation
(``bbox`` xywh, ``dp_x``/``dp_y`` in 0..255 box-relative coords,
``dp_I``/``dp_U``/``dp_V``). Without --geodesics the GPS point distance is
the documented planar-UV stand-in (evaluation.planar_uv_distance), not the
official SMPL geodesic metric.
"""

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # Honor a CPU request through jax.config too: jax may already be
    # imported by the interpreter startup, and the config route also keeps
    # a CPU-only run from ever touching the TPU plugin's device claim
    # (mirrors run.py --cpu).
    import jax  # noqa: E402
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np  # noqa: E402


def load_geodesics(spec: str):
    """``--geodesics file.py::fn`` -> call ``fn()`` to get a geodist
    callable ``(i1,u1,v1,i2,u2,v2) -> distances``. Exact GPS needs the SMPL
    geodesic tables (external data upstream DensePose downloads); wrap your
    copy in a builder and pass it here."""
    import importlib.util
    path, _, name = spec.partition("::")
    mod_spec = importlib.util.spec_from_file_location("user_geodesics", path)
    module = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(module)
    return getattr(module, name or "build")()


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("model")
    parser.add_argument("annotations")
    parser.add_argument("image_dir")
    parser.add_argument("--weights", default="")
    parser.add_argument("--geodesics", default="")
    parser.add_argument("--max-images", type=int, default=0)
    parser.add_argument("--opts", nargs="*", default=[])
    args = parser.parse_args()

    import cv2

    from densepose_tpu.evaluation import (check_expected_results, coco_box_ap,
                                          densepose_ap, planar_uv_distance)
    from densepose_tpu.visualizer import DensePoseResultExtractor
    from run import load_predictor

    predictor = load_predictor(args.model, args.weights, False, args.opts)
    extractor = DensePoseResultExtractor()

    with open(args.annotations) as f:
        coco = json.load(f)
    anns_by_image = collections.defaultdict(list)
    for ann in coco["annotations"]:
        anns_by_image[ann["image_id"]].append(ann)
    images = coco["images"]
    if args.max_images:
        images = images[:args.max_images]

    box_preds, box_gt, dp_preds, dp_gt = [], [], [], []
    for idx, im in enumerate(images):
        path = os.path.join(args.image_dir, im["file_name"])
        img = cv2.imread(path)
        if img is None:
            print(f"warning: unreadable image {path}", file=sys.stderr)
            continue
        out = predictor.predict_numpy(img)
        results, boxes_xywh = extractor(out)
        anns = anns_by_image.get(im["id"], [])
        gt_xyxy = np.array([[a["bbox"][0], a["bbox"][1],
                             a["bbox"][0] + a["bbox"][2],
                             a["bbox"][1] + a["bbox"][3]] for a in anns],
                           dtype=np.float64).reshape(-1, 4)
        box_preds.append({"pred_boxes": out["pred_boxes"], "scores": out["scores"]})
        box_gt.append(gt_xyxy)
        dp_preds.append({
            "pred_boxes_xywh": boxes_xywh,
            "scores": out["scores"][:len(boxes_xywh)],
            "labels": [r["labels"] for r in results],
            "uv": [r["uv"] for r in results],
        })
        dp_gt.append(anns)
        print(f"image {idx + 1}/{len(images)}", end="\r", file=sys.stderr)

    if args.geodesics:
        geodist = load_geodesics(args.geodesics)
    else:
        geodist = planar_uv_distance
        print(
            "\n"
            "=" * 78 + "\n"
            "WARNING: GPS/GPSm below use the PLANAR-UV STAND-IN distance, not\n"
            "the official SMPL geodesic metric (the geodesic tables are external\n"
            "data upstream DensePose downloads; neither this repo nor the\n"
            "reference ships them). Numbers are NOT comparable to the published\n"
            "dp. AP GPS/GPSm figures. Pass --geodesics file.py::build with a\n"
            "builder wrapping your copy of the SMPL tables for the real metric.\n"
            + "=" * 78,
            file=sys.stderr)
    cfg = getattr(predictor, "cfg", None) or predictor.base.cfg
    # TTA runs report under *_TTA task names (the reference's TTA
    # quick_schedule expects ["bbox_TTA", "densepose_gps_TTA", ...])
    sfx = "_TTA" if cfg.TEST.AUG.ENABLED else ""
    results = {
        f"bbox{sfx}": coco_box_ap(box_preds, box_gt),
        f"densepose_gps{sfx}": densepose_ap(dp_preds, dp_gt, "gps", geodist),
        f"densepose_gpsm{sfx}": densepose_ap(dp_preds, dp_gt, "gpsm", geodist),
    }
    print(json.dumps(results, indent=1))
    expected = list(cfg.TEST.EXPECTED_RESULTS)
    if expected:
        failures = check_expected_results(results, expected)
        if failures:
            print("EXPECTED_RESULTS check FAILED:", *failures, sep="\n  ")
            sys.exit(1)
        print("EXPECTED_RESULTS check passed")


if __name__ == "__main__":
    main()
