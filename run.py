#!/usr/bin/env python
"""Run CLI — same contract as the reference's run.py
(/root/reference/run.py): ``python run.py <model> <input.[jpg|mp4]>`` writes
``<input>_pred.<ext>``.

<model> is either an exported ``.npz`` bundle (export.py) or a YAML config
path (with --weights for a raw .pkl; random weights otherwise — useful for
smoke runs). Video is processed through the streaming pipeline
(densepose_tpu/parallel/pipeline.py): decode-ahead on the host, device
prefetch, optional multi-chip data-parallel frame sharding — replacing the
reference's strictly serial loop (run.py:42-64). KeyboardInterrupt flushes
the partial video like the reference does (run.py:58-62).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

IMAGE_EXTS = [".jpg", ".png", ".jpeg", ".bmp", ".tif", ".tiff"]


def _scan_dir_sizes(dirpath: str, limit: int = 16):
    """Decoded (h, w) of up to ``limit`` images in ``dirpath`` — the
    auto-bucketing probe for mixed-size directories."""
    import cv2
    sizes = set()
    names = sorted(
        f for f in os.listdir(dirpath)
        if os.path.splitext(f)[1].lower() in IMAGE_EXTS
        and not os.path.splitext(f)[0].endswith("_pred"))
    for name in names[:limit]:
        img = cv2.imread(os.path.join(dirpath, name))
        if img is not None:
            sizes.add(img.shape[:2])
        if len(sizes) > 1:
            break
    return sizes


def load_predictor(model_path: str, weights: str, fp32: bool, opts,
                   auto_bucket: bool = False):
    from densepose_tpu.config import CfgNode, get_cfg
    from densepose_tpu.predictor import DensePosePredictor

    def _maybe_auto_bucket(cfg):
        """Mixed-size directory: default-enable input-geometry bucketing
        (TPU.GEOMETRY_BUCKET_QUANT) so the run compiles a handful of padded
        buckets instead of one multi-minute graph per distinct input size.
        Explicit --opts / --no-bucket and incompatible modes win."""
        if not auto_bucket:
            return
        if opts and "TPU.GEOMETRY_BUCKET_QUANT" in opts:
            return  # the user decided
        if (cfg.TPU.GEOMETRY_BUCKET_QUANT or cfg.TPU.BUCKETED_DENSEPOSE
                or cfg.TEST.AUG.ENABLED):
            return  # already on, or a mode that manages its own geometry
        # 64 is a multiple of every backbone's size divisibility (FPN 32,
        # HRFPN 64) and bounded the detection envelope at 1.34 px in the
        # bucketing tests
        cfg.TPU.GEOMETRY_BUCKET_QUANT = 64
        print("note: mixed-size directory — enabling input-geometry "
              "bucketing (TPU.GEOMETRY_BUCKET_QUANT 64); pass --no-bucket "
              "or --opts TPU.GEOMETRY_BUCKET_QUANT 0 for one exact graph "
              "per size", file=sys.stderr)

    cfg = get_cfg()
    if model_path.endswith(".npz"):
        with open(model_path + ".config.json") as f:
            cfg.merge_from_other_cfg(CfgNode(json.load(f)))
        if fp32:
            cfg.TPU.COMPUTE_DTYPE = "float32"
        if opts:
            cfg.merge_from_list(opts)
        _maybe_auto_bucket(cfg)
        cfg.freeze()
        pred = DensePosePredictor(cfg, weights_path=model_path)
    elif not os.path.exists(model_path) and not model_path.endswith((".yaml", ".yml")):
        # model-zoo name, e.g. densepose_rcnn_R_50_FPN_s1x (no YAML needed)
        from densepose_tpu import model_zoo
        from densepose_tpu.utils.file_io import get_local_path
        cfg = model_zoo.get_config(model_path).clone()
        cfg.defrost()
        if fp32:
            cfg.TPU.COMPUTE_DTYPE = "float32"
        if opts:
            cfg.merge_from_list(opts)
        _maybe_auto_bucket(cfg)
        cfg.freeze()
        if not weights:
            try:
                weights = get_local_path(model_zoo.get_checkpoint_url(model_path))
            except (KeyError, IOError) as e:
                print(f"warning: {e}; using random weights", file=sys.stderr)
        pred = DensePosePredictor(cfg, weights_path=weights or None)
    else:
        # YAML config path
        cfg.merge_from_file(model_path)
        if opts:
            cfg.merge_from_list(opts)
        _maybe_auto_bucket(cfg)
        cfg.freeze()
        pred = DensePosePredictor(cfg, weights_path=weights or None)
    if cfg.TEST.AUG.ENABLED:
        from densepose_tpu.tta import TTAPredictor
        pred = TTAPredictor(pred)
    return pred


def main():
    parser = argparse.ArgumentParser(description="Run DensePose inference on image/video")
    parser.add_argument("model", type=str, help="Exported .npz bundle or config YAML")
    parser.add_argument("input", type=str, help="Input image or video")
    parser.add_argument("--weights", type=str, default="",
                        help="Checkpoint .pkl (when <model> is a YAML config)")
    parser.add_argument("--cpu", action="store_true", help="Force CPU backend")
    parser.add_argument("--fp32", action="store_true", help="Force float32 compute")
    parser.add_argument("--batch", type=int, default=0,
                        help="Video frames per device batch (0 = auto)")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="Extra dotted-key config overrides")
    parser.add_argument("--profile", metavar="DIR", default="",
                        help="Capture a jax.profiler device trace of the "
                             "inference into DIR (view with tensorboard/xprof)")
    parser.add_argument("--vis", default="fine_segm",
                        choices=["fine_segm", "u", "v", "bbox"],
                        help="Overlay: fine-segm labels (the reference's), "
                             "U/V channels, or scored boxes")
    parser.add_argument("--no-bucket", action="store_true",
                        help="Disable the automatic input-geometry bucketing "
                             "that mixed-size image directories enable by "
                             "default (one exact graph per input size "
                             "instead — each compile takes minutes on TPU)")
    args = parser.parse_args()

    if args.cpu:
        # env var alone is not enough when jax was already imported by the
        # interpreter startup (sitecustomize); set both. If a backend already
        # initialized, the switch is impossible — warn instead of crashing.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as e:
            print(f"warning: --cpu ignored (backend already initialized: {e})",
                  file=sys.stderr)

    import cv2  # noqa: E402
    from densepose_tpu.visualizer import End2EndVisualizer

    visualizer = End2EndVisualizer(alpha=0.7, keep_bg=False, mode=args.vis)
    # a directory of mixed-size photos would otherwise compile one graph per
    # distinct input size (minutes each on TPU) — probe the sizes and
    # default-enable geometry bucketing when they vary (VERDICT r4 #5)
    auto_bucket = (not args.no_bucket and os.path.isdir(args.input)
                   and len(_scan_dir_sizes(args.input)) > 1)
    predictor = load_predictor(args.model, args.weights, args.fp32, args.opts,
                               auto_bucket=auto_bucket)

    profile_ctx = None
    if args.profile:
        from densepose_tpu.utils.timing import trace_device
        try:
            profile_ctx = trace_device(args.profile)
            profile_ctx.__enter__()
            print(f"profiling to {args.profile}", file=sys.stderr)
        except Exception as e:  # backend without profiler support
            print(f"warning: profiling unavailable ({e})", file=sys.stderr)
            profile_ctx = None
    try:
        _dispatch(args, predictor, visualizer, cv2)
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)


def _dispatch(args, predictor, visualizer, cv2):
    import numpy as np  # noqa: F401

    if os.path.isdir(args.input):
        # directory of images: process each, writing <name>_pred.<ext>
        # siblings (the per-image contract, applied in bulk)
        names = sorted(
            f for f in os.listdir(args.input)
            if os.path.splitext(f)[1].lower() in IMAGE_EXTS
            and not os.path.splitext(f)[0].endswith("_pred"))  # skip own outputs
        if not names:
            sys.exit(f"error: no images in {args.input!r}")
        for i, name in enumerate(names):
            path = os.path.join(args.input, name)
            img = cv2.imread(path)
            if img is None:
                print(f"warning: skipping unreadable {path}", file=sys.stderr)
                continue
            outputs = predictor.predict_numpy(img)
            out_path = "_pred".join(os.path.splitext(path))
            cv2.imwrite(out_path, visualizer.visualize(img, outputs))
            print(f"Image {i + 1}/{len(names)} saved to {out_path}")
        return

    save_path = "_pred".join(os.path.splitext(args.input))
    ext = os.path.splitext(args.input)[1].lower()
    if ext in IMAGE_EXTS:
        img = cv2.imread(args.input)
        if img is None:
            sys.exit(f"error: could not read image {args.input!r}")
        outputs = predictor.predict_numpy(img)
        image_vis = visualizer.visualize(img, outputs)
        cv2.imwrite(save_path, image_vis)
        print(f"Image saved to {save_path}")
        return

    from densepose_tpu.parallel.pipeline import run_video
    run_video(predictor, visualizer, args.input, save_path, batch=args.batch)


if __name__ == "__main__":
    main()
