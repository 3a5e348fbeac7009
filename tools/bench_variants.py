#!/usr/bin/env python
"""Per-variant throughput table (VERDICT r1 #9): one fps figure for each
major model family so regressions off the flagship stay visible.

Follows bench.py's measurement protocol (distinct pre-staged frames, forced
completion through an output-dependent checksum, best-of-N passes) at
reduced iteration counts — figures are coarser than bench.py's headline but
comparable run to run.

    python tools/bench_variants.py [--mode exact|serving|max] [variant ...]

Modes (mirror bench.py's three figures):
  exact    bf16, no quantization (the default; reference-exact numerics)
  serving  + TPU.INT8_HEAD — calibrated int8 DensePose head; detections
           bit-identical to exact, SIUV within the tested int8 envelope
  max      + INT8_BACKBONE + INT8_RPN where the variant supports them
           (resnet-FPN backbones only; changes detections; opt-in)

Prints one line per variant: name, worst-case fps, ms/frame.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_VARIANTS = [
    "densepose_rcnn_R_50_FPN_s1x",
    "densepose_rcnn_R_101_FPN_s1x",
    "densepose_rcnn_R_50_FPN_DL_s1x",
    "densepose_rcnn_R_101_FPN_DL_s1x",
    "densepose_rcnn_R_50_FPN_s1x_legacy",
    "densepose_rcnn_HRFPN_HRNet_w32_s1x",
    "densepose_rcnn_R_50_FPN_soft_s1x_cse",
]


def bench_variant(name: str, iters: int = 16, passes: int = 3,
                  mode: str = "exact") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor

    cfg = model_zoo.get_config(name).clone()
    cfg.defrost()
    cfg.merge_from_list([
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
        "TPU.COMPUTE_DTYPE", "bfloat16",
    ])
    if mode in ("serving", "max") and cfg.MODEL.DENSEPOSE_ON:
        cfg.TPU.INT8_HEAD = True
    if (mode == "max"
            and cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone"):
        cfg.TPU.INT8_BACKBONE = True
        cfg.TPU.INT8_RPN = True
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    if pred._int8_needed and not pred._int8_ready:
        # calibrate once up front (its compile would otherwise pollute the
        # first timed warmup)
        rng0 = np.random.RandomState(7)
        pred.calibrate_int8(
            [(rng0.rand(720, 1280, 3) * 255).astype(np.uint8)])
    fn = pred._get_fn((720, 1280))

    def checksum(out):
        # data-depends on every output element; nan_to_num because random
        # init at bf16 can overflow deep variants (HRNet) — timing is the
        # point here, not the values
        total = jnp.float32(0)
        for k in sorted(out):
            v = jnp.nan_to_num(out[k].astype(jnp.float32),
                               nan=1.0, posinf=1.0, neginf=-1.0)
            total += jnp.sum(v)
        return total

    step = jax.jit(lambda p, img: checksum(fn(p, img)))

    rng = np.random.RandomState(0)
    warm = (rng.rand(720, 1280, 3) * 255).astype(np.uint8)
    frames = [jax.device_put((rng.rand(720, 1280, 3) * 255).astype(np.uint8))
              for _ in range(iters)]
    jax.block_until_ready(frames)
    _ = np.asarray(step(pred.params, jnp.asarray(warm)))  # compile + sync

    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        sums = [step(pred.params, f) for f in frames]
        total = np.asarray(jnp.sum(jnp.stack(sums)))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total)
    best = min(times)
    return {"fps": iters / best, "ms": best / iters * 1e3,
            "passes_s": [round(t, 3) for t in times]}


def main():
    args = sys.argv[1:]
    mode = "exact"
    if args and args[0] == "--mode":
        mode = args[1]
        assert mode in ("exact", "serving", "max"), mode
        args = args[2:]
    variants = args or DEFAULT_VARIANTS
    print(f"mode={mode}")
    print(f"{'variant':45s} {'fps':>7s} {'ms/frame':>9s}")
    for name in variants:
        try:
            r = bench_variant(name, mode=mode)
            print(f"{name:45s} {r['fps']:7.2f} {r['ms']:9.1f}   "
                  f"passes={r['passes_s']}")
        except Exception as e:  # keep the table going past one bad variant
            print(f"{name:45s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
