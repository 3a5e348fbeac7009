#!/usr/bin/env python
"""Measure batched worst-case throughput (predict_batch's vmapped graph)
against the single-image graph on one chip.

Same protocol as bench.py: distinct frames pre-staged in HBM, forced
completion via an output-dependent checksum, best-of-N passes.

    python tools/bench_batch.py [batch ...]     # default: 1 2 4
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG = "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from densepose_tpu.config import load_config
    from densepose_tpu.predictor import DensePosePredictor

    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    iters = 32

    cfg = load_config(CFG, [
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
        "TPU.COMPUTE_DTYPE", "bfloat16",
    ])
    pred = DensePosePredictor(cfg, seed=0)

    rng = np.random.RandomState(0)
    warm = (rng.rand(720, 1280, 3) * 255).astype(np.uint8)

    for b in batches:
        if b == 1:
            fn = pred._get_fn((720, 1280))

            @jax.jit
            def step(p, img, fn=fn):
                out = fn(p, img)
                return sum(jnp.sum(out[k].astype(jnp.float32))
                           for k in sorted(out))

            frames = [jax.device_put(
                (rng.rand(720, 1280, 3) * 255).astype(np.uint8))
                for _ in range(iters)]
            warm_in = jnp.asarray(warm)
        else:
            vfwd = jax.jit(jax.vmap(
                partial(pred.model.forward, compute_dtype=pred.compute_dtype),
                in_axes=(None, 0)))

            @jax.jit
            def step(p, imgs, vfwd=vfwd):
                out = vfwd(p, imgs)
                return sum(jnp.sum(out[k].astype(jnp.float32))
                           for k in sorted(out))

            frames = [jax.device_put(
                (rng.rand(b, 720, 1280, 3) * 255).astype(np.uint8))
                for _ in range(iters)]
            warm_in = jnp.asarray(np.stack([warm] * b))
        jax.block_until_ready(frames)

        t0 = time.perf_counter()
        _ = np.asarray(step(pred.params, warm_in))
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sums = [step(pred.params, f) for f in frames]
            total = np.asarray(jnp.sum(jnp.stack(sums)))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(total)
        best = min(times)
        n_frames = iters * b
        print(f"batch={b}  {n_frames / best:7.2f} fps/chip  "
              f"{best / n_frames * 1e3:6.1f} ms/frame  "
              f"passes={[round(t, 3) for t in times]}  "
              f"compile={compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()
