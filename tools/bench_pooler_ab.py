#!/usr/bin/env python
"""End-to-end A/B of multi-level box-pooler routings on the flagship model.

Follows bench.py's protocol (distinct pre-staged HBM frames, forced
completion via an output-dependent checksum, best-of-N passes) so deltas
here are trustworthy; per-op isolated timings through the tunnel are not.

    python tools/bench_pooler_ab.py [iters]

Routings measured (env knobs read at trace time, flipped between builds):
  matmul       every chunk x every level (pre-r2 default)
  levelsorted  level-sorted chunks, absent levels cond-skipped
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG = "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml"


def measure(env: dict, frames, warm, iters: int, passes: int = 3,
            opts=()) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from densepose_tpu.config import load_config
    from densepose_tpu.predictor import DensePosePredictor

    for k, v in env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v

    cfg = load_config(CFG, [
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
        "TPU.COMPUTE_DTYPE", "bfloat16",
    ] + list(opts))
    pred = DensePosePredictor(cfg, seed=0)
    if pred._int8_needed:
        # this harness bypasses __call__ (which would auto-calibrate)
        pred.calibrate_int8([np.asarray(warm)])
    fn = pred._get_fn((720, 1280))

    @jax.jit
    def step(p, img):
        out = fn(p, img)
        total = jnp.float32(0)
        for k in sorted(out):
            total += jnp.sum(out[k].astype(jnp.float32))
        return total

    t0 = time.perf_counter()
    _ = np.asarray(step(pred.params, jnp.asarray(warm)))
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        sums = [step(pred.params, f) for f in frames]
        total = np.asarray(jnp.sum(jnp.stack(sums)))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total)
    best = min(times)
    return {"fps": iters / best, "ms": best / iters * 1e3,
            "passes_s": [round(t, 3) for t in times],
            "compile_s": round(compile_s, 1)}


def main():
    import jax
    import numpy as np

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.RandomState(0)
    warm = (rng.rand(720, 1280, 3) * 255).astype(np.uint8)
    frames = [jax.device_put((rng.rand(720, 1280, 3) * 255).astype(np.uint8))
              for _ in range(iters)]
    jax.block_until_ready(frames)

    variants = [
        ("matmul", {"DENSEPOSE_TPU_MATMUL_POOLER": "1"}, ()),
        ("levelsorted", {"DENSEPOSE_TPU_MATMUL_POOLER": None}, ()),
    ]
    if len(sys.argv) > 2 and sys.argv[2] == "decoder":
        variants = [
            ("perchain-up", {"DENSEPOSE_TPU_DECODER_PERCHAIN_UP": "1"}, ()),
            ("shared-up", {"DENSEPOSE_TPU_DECODER_PERCHAIN_UP": None}, ()),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "lswin":
        variants = [
            ("ls-nowindow", {"DENSEPOSE_TPU_LS_NOWINDOW": "1"}, ()),
            ("ls-windowed", {"DENSEPOSE_TPU_LS_NOWINDOW": None}, ()),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "preproc":
        variants = [
            ("smallc", {"DENSEPOSE_TPU_SMALLC_PREPROCESS": "1"}, ()),
            ("packed-wc", {"DENSEPOSE_TPU_SMALLC_PREPROCESS": None}, ()),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "stem":
        variants = [
            ("conv-stem", {"DENSEPOSE_TPU_NO_PACKED_STEM": "1"}, ()),
            ("packed-stem", {"DENSEPOSE_TPU_NO_PACKED_STEM": None}, ()),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "int8bb":
        variants = [
            ("int8-head", {}, ("TPU.INT8_HEAD", "True")),
            ("int8-head+bb", {}, ("TPU.INT8_HEAD", "True",
                                  "TPU.INT8_BACKBONE", "True")),
            ("int8-all", {}, ("TPU.INT8_HEAD", "True",
                              "TPU.INT8_BACKBONE", "True",
                              "TPU.INT8_RPN", "True")),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "int8pred":
        variants = [
            ("int8-head", {}, ("TPU.INT8_HEAD", "True")),
            ("int8-head+pred", {}, ("TPU.INT8_HEAD", "True",
                                    "TPU.INT8_PREDICTOR", "True")),
            ("int8-hd+pd+bb+rpn", {}, ("TPU.INT8_HEAD", "True",
                                       "TPU.INT8_PREDICTOR", "True",
                                       "TPU.INT8_BACKBONE", "True",
                                       "TPU.INT8_RPN", "True")),
        ]
    for name, env, opts in variants:
        r = measure(env, frames, warm, iters, opts=opts)
        print(f"{name:12s} {r['fps']:7.2f} fps  {r['ms']:6.1f} ms/frame  "
              f"passes={r['passes_s']}  compile={r['compile_s']}s",
              flush=True)


if __name__ == "__main__":
    main()
