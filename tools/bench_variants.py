#!/usr/bin/env python
"""Per-variant throughput table (VERDICT r1 #9): one fps figure for each
major model family so regressions off the flagship stay visible.

Follows bench.py's measurement protocol EXACTLY (distinct pre-staged
frames, completion forced through a carry-chained checksum fetched ONCE per
pass, best-of-N passes, same iteration count) — since r5 the rows are
absolute figures directly comparable to bench.py's headline, not just to
each other. (The r4 sweep carried a fixed ~110 ms/pass eager-reduction tail
— ~3 tunnel RTTs — that inflated every row ~7 ms/frame at its old
iters=16; the carry protocol removes the tail and iters now matches
bench.py's 48.)

    python tools/bench_variants.py [--mode exact|serving|max] [--sparse]
                                   [variant ...]

Modes (mirror bench.py's three figures):
  exact    bf16, no quantization (the default; reference-exact numerics)
  serving  + TPU.INT8_HEAD — calibrated int8 DensePose head; detections
           bit-identical to exact, SIUV within the tested int8 envelope
  max      + INT8_BACKBONE + INT8_RPN where the variant supports them
           (resnet-FPN backbones only; changes detections; opt-in)

--sparse adds a column measuring the <=8-detection lax.switch branch (the
figure real, non-crowded video runs at) per variant — one extra graph
compile per row.

Prints one line per variant: name, worst-case fps, ms/frame (+ sparse fps).
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


def _checksum_terms(out, carry, sanitize=False):
    """carry + sum over every output element. ``sanitize`` routes through
    nan_to_num (random init at bf16 can overflow deep variants) — but it is
    only used when the plain checksum actually comes back non-finite in
    warmup, because the 3-way selects BLOCK XLA from fusing the f32
    convert+reduce into the producing ops, materializing ~0.5 GB of f32
    intermediates per frame and inflating every row several ms (r5: the
    flagship exact row read 34.7 ms vs bench.py's 28.9 with sanitize
    unconditionally on)."""
    import jax.numpy as jnp

    total = carry
    for k in sorted(out):
        v = out[k].astype(jnp.float32)
        if sanitize:
            v = jnp.nan_to_num(v, nan=1.0, posinf=1.0, neginf=-1.0)
        total += jnp.sum(v)
    return total


def _timed_passes(step, params, frames, zero, passes):
    """bench.py's pass protocol: dispatch every staged frame with the
    checksum carried through the jitted step, ONE final scalar fetch."""
    import numpy as np

    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        total = zero
        for f in frames:
            total = step(params, f, total)
        total = np.asarray(total)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total)
    return times


def bench_variant(name: str, iters: int = 48, passes: int = 3,
                  mode: str = "exact", sparse: bool = False,
                  extra_opts=None) -> dict:
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
    if extra_opts:
        cfg.merge_from_list(list(extra_opts))
    if mode in ("serving", "max") and cfg.MODEL.DENSEPOSE_ON:
        cfg.TPU.INT8_HEAD = True
    if (mode == "max"
            and cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone"):
        cfg.TPU.INT8_BACKBONE = True
        cfg.TPU.INT8_RPN = True
    if (mode == "max"
            and cfg.MODEL.BACKBONE.NAME == "build_hrfpn_backbone"):
        # r5: HRNet branch/layer1/HRFPN s8 chains (no RPN int8 — those
        # sites are resnet-FPN-specific)
        cfg.TPU.INT8_BACKBONE = True
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    if pred._int8_needed and not pred._int8_ready:
        # calibrate once up front (its compile would otherwise pollute the
        # first timed warmup)
        rng0 = np.random.RandomState(7)
        pred.calibrate_int8(
            [(rng0.rand(720, 1280, 3) * 255).astype(np.uint8)])
    fn = pred._get_fn((720, 1280))

    step = jax.jit(lambda p, img, carry: _checksum_terms(fn(p, img), carry))

    rng = np.random.RandomState(0)
    warm = (rng.rand(720, 1280, 3) * 255).astype(np.uint8)
    frames = [jax.device_put((rng.rand(720, 1280, 3) * 255).astype(np.uint8))
              for _ in range(iters)]
    zero = jax.device_put(np.float32(0))
    jax.block_until_ready(frames)
    jax.block_until_ready(zero)
    w0 = np.asarray(step(pred.params, jnp.asarray(warm), zero))  # compile+sync
    if not np.isfinite(w0):
        # non-finite random-init outputs (deep variants) would poison the
        # carry; fall back to the sanitized checksum for THIS variant only
        step = jax.jit(lambda p, img, carry: _checksum_terms(
            fn(p, img), carry, sanitize=True))
        _ = np.asarray(step(pred.params, jnp.asarray(warm), zero))

    times = _timed_passes(step, pred.params, frames, zero, passes)
    best = min(times)
    # which lax.switch branch did the timed graph take? (the r4 HRNet rows
    # silently measured the sparse path because NaN scores zeroed all
    # detections — report the count so a "worst case" row proves itself)
    n_det = int(pred.predict_numpy(warm)["num_instances"])
    r = {"fps": iters / best, "ms": best / iters * 1e3, "det": n_det,
         "passes_s": [round(t, 3) for t in times]}

    if sparse:
        m = pred.model

        def make_fsp(sanitize):
            def fsp(p, img, carry):
                result, features, boxes_net = m.forward_stage1(
                    p, img, compute_dtype=pred.compute_dtype)
                dp = m.forward_densepose(p, features, boxes_net[:8])
                out = dict(result)
                out.update(dp)
                return _checksum_terms(out, carry, sanitize=sanitize)
            return jax.jit(fsp)

        try:
            use = make_fsp(False)
            s0 = np.asarray(use(pred.params, jnp.asarray(warm), zero))
            if not np.isfinite(s0):
                use = make_fsp(True)
                _ = np.asarray(use(pred.params, jnp.asarray(warm), zero))
            sp = _timed_passes(use, pred.params, frames, zero, passes)
            r["sparse_fps"] = iters / min(sp)
        except Exception as e:  # a family without the sparse branch
            r["sparse_err"] = f"{type(e).__name__}: {e}"
    return r


def main():
    args = sys.argv[1:]
    mode = "exact"
    sparse = False
    if "--sparse" in args:
        sparse = True
        args.remove("--sparse")
    if args and args[0] == "--mode":
        mode = args[1]
        assert mode in ("exact", "serving", "max"), mode
        args = args[2:]
    extra_opts = []
    if "--opts" in args:  # everything after --opts is config overrides
        i = args.index("--opts")
        extra_opts = args[i + 1:]
        args = args[:i]
    variants = args or DEFAULT_VARIANTS
    print(f"mode={mode} iters=48 (bench.py protocol, absolute figures)")
    hdr = f"{'variant':45s} {'fps':>7s} {'ms/frame':>9s}"
    if sparse:
        hdr += f" {'sparse_fps':>10s}"
    print(hdr)
    for name in variants:
        try:
            r = bench_variant(name, mode=mode, sparse=sparse,
                              extra_opts=extra_opts)
            line = (f"{name:45s} {r['fps']:7.2f} {r['ms']:9.1f}"
                    f"   det={r['det']}")
            if sparse:
                if "sparse_fps" in r:
                    line += f" {r['sparse_fps']:10.2f}"
                else:
                    line += f"   sparse: {r.get('sparse_err', '-')}"
            line += f"   passes={r['passes_s']}"
            print(line)
        except Exception as e:  # keep the table going past one bad variant
            print(f"{name:45s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
