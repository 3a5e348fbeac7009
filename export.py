#!/usr/bin/env python
"""Export CLI — same contract as the reference's export.py
(/root/reference/export.py:11-42): config + detectron2 ``.pkl`` checkpoint
-> a self-contained exported artifact under ``exported/``.

The TorchScript ``.pt`` is replaced by an ``.npz`` bundle holding the
JAX-layout parameters plus the fully-resolved config as JSON — the graph
itself is rebuilt and jit-compiled at load time (first compile is cached by
shape bucket; optionally AOT-persisted via JAX's compilation cache).

    python export.py <cfg.yaml> <model.pkl> [--min_score S] [--nms_thresh T] [--fp16]

Output: exported/<cfg-stem>_fp{32,16}.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from densepose_tpu.config import get_cfg  # noqa: E402
from densepose_tpu.models.rcnn import build_model  # noqa: E402
from densepose_tpu.checkpoint.pkl_loader import align_state_dicts, load_checkpoint_file  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Export DensePose model to a TPU param bundle")
    parser.add_argument("cfg", type=str, help="Config file")
    parser.add_argument("model", type=str, nargs="?", default="",
                        help="Model checkpoint (.pkl); omit to export "
                             "random-init weights (offline smoke/structure)")
    parser.add_argument("--min_score", default=0.3, type=float,
                        help="Minimum detection score")
    parser.add_argument("--nms_thresh", metavar="<threshold>", default=None, type=float,
                        help="NMS threshold")
    parser.add_argument("--fp16", action="store_true",
                        help="Store parameters as float16 (mirrors the reference's --fp16)")
    parser.add_argument("--aot", metavar="HxW[,HxW...]", default=None,
                        help="Also serialize AOT-compiled StableHLO artifacts "
                             "for these input shapes (e.g. 720x1280,1080x1920) — "
                             "the compiled-graph analogue of the reference's "
                             "TorchScript .pt")
    parser.add_argument("--calib", nargs="+", metavar="IMG", default=None,
                        help="Representative images for int8 post-training "
                             "calibration; writes <bundle>.calib.json, which "
                             "the predictor auto-loads so deployments never "
                             "run (or depend on) a runtime calibration pass. "
                             "Enables TPU.INT8_HEAD unless --opts already "
                             "select TPU.INT8_* modes")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="Extra dotted-key config overrides")
    args = parser.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    opts = ["MODEL.ROI_HEADS.SCORE_THRESH_TEST", str(args.min_score)]
    if args.nms_thresh is not None:
        opts += ["MODEL.ROI_HEADS.NMS_THRESH_TEST", str(args.nms_thresh)]
    if args.fp16:
        opts += ["TPU.COMPUTE_DTYPE", "float16"]
    cfg.merge_from_list(opts + list(args.opts))
    cfg.MODEL.WEIGHTS = args.model
    cfg.freeze()

    model = build_model(cfg)
    spec = model.spec()
    if args.model:
        ckpt, needs_c2 = load_checkpoint_file(args.model)
        shapes = {k: v.shape for k, v in spec.items()}
        torch_state = align_state_dicts(list(spec.keys()), shapes, ckpt, needs_c2)
        print(f"matched {len(torch_state)}/{len(spec)} parameters")
    else:
        # no checkpoint: random weights (offline smoke / structure export)
        from densepose_tpu.checkpoint.transform import random_torch_state
        torch_state = random_torch_state(spec, seed=0)
        print(f"no checkpoint given: exporting {len(spec)} random-init parameters")

    # store torch-layout weights (layout transform happens at load; keeps the
    # bundle usable for exact-parity fp32 runs AND folded fast runs)
    store = {}
    for k, v in torch_state.items():
        store[k] = v.astype(np.float16 if args.fp16 else np.float32)

    os.makedirs("exported", exist_ok=True)
    stem = os.path.basename(args.cfg).rsplit(".", 1)[0]
    out_path = f"exported/{stem}_fp{'16' if args.fp16 else '32'}.npz"
    np.savez(out_path, **store)
    with open(out_path + ".config.json", "w") as f:
        json.dump(cfg.dump_dict(), f, indent=1, default=str)
    print(f"Model saved to {out_path}")

    if args.calib:
        import cv2
        from densepose_tpu.predictor import DensePosePredictor
        ccfg = cfg.clone()
        ccfg.defrost()
        if not (ccfg.TPU.INT8_HEAD or ccfg.TPU.INT8_BACKBONE
                or ccfg.TPU.INT8_RPN or ccfg.TPU.INT8_PREDICTOR):
            ccfg.TPU.INT8_HEAD = True
        ccfg.freeze()
        frames = []
        for p in args.calib:
            im = cv2.imread(p)
            if im is None:
                raise SystemExit(f"--calib: cannot read image {p}")
            frames.append(im)
        # a sidecar left over from a previous export (old checkpoint or
        # different INT8 modes) would auto-load into the calibration
        # predictor and its stale scales could leak into the fresh sidecar —
        # always start clean
        if os.path.exists(out_path + ".calib.json"):
            os.remove(out_path + ".calib.json")
        pred = DensePosePredictor(ccfg, weights_path=out_path)
        pred.calibrate_int8(frames)
        pred.save_calibration(out_path + ".calib.json")
        print(f"int8 calibration ({len(frames)} frames) saved to "
              f"{out_path}.calib.json")

    if args.aot:
        from densepose_tpu.predictor import DensePosePredictor
        pred = DensePosePredictor(cfg, weights_path=out_path)
        for shape in args.aot.lower().split(","):
            h, w = (int(v) for v in shape.split("x"))
            data = pred.aot_export_bytes((h, w))
            aot_path = out_path.replace(".npz", f"_{h}x{w}.stablehlo")
            with open(aot_path, "wb") as f:
                f.write(data)
            print(f"AOT artifact saved to {aot_path} ({len(data) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
