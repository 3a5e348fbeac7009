#!/usr/bin/env python
"""Benchmark: densepose_rcnn_R_50_FPN_s1x at 800px, single chip.

Prints ONE JSON line:
    {"metric": "frames_per_sec_per_chip", "value": N, "unit": "fps",
     "vs_baseline": N / 15.15, "mode": ..., "exact_mode_fps": N, ...}

Baseline: the reference reports 0.066 s/im (~15.15 fps) for R_50_FPN_s1x on
the detectron2 zoo GPU (BASELINE.md / README.md:129). The BASELINE.json
north-star target is >= 30 fps/chip on v5e.

The headline ``value`` is the SERVING configuration: bfloat16 compute (fp32
islands at box decode / NMS / softmax as in the reference's fp16 export),
FrozenBN folded, and the calibrated int8 DensePose head (TPU.INT8_HEAD +
static-scale calibration). Quantization touches only the post-detection
head, so detections are BIT-IDENTICAL to the exact mode; the SIUV logit
envelope is bounded and tested (tests/test_int8.py). The reference-exact
bf16 numerics mode is measured in the SAME run and reported as
``exact_mode_fps``. BENCH_EXACT=1 makes the exact mode the headline;
BENCH_INT8 is accepted for compatibility (it is the default).

Static worst-case shapes throughout: full 1000-proposal box stage and all
TEST.DETECTIONS_PER_IMAGE DensePose slots live every frame — unlike the
reference, throughput does not degrade on crowded frames. Input is a
720x1280 frame -> resized to 749x1333 -> padded 768x1344.

Measurement honesty (this environment tunnels the chip over HTTP, so naive
timing lies in BOTH directions):
* every iteration uses a DISTINCT frame — identical inputs have been
  observed memoized upstream, overstating fps by multiples;
* ``block_until_ready`` alone does NOT guarantee remote completion here —
  we force completion by fetching an aggregate checksum that data-depends
  on EVERY output of EVERY frame (boxes, scores, and the DensePose UV/segm
  maps), so no frame's work can be skipped or left in flight;
* frames are pre-staged in HBM before the clock starts, and the checksum is
  one scalar fetch — host<->device tunnel RTT (~30 ms/call here, vs ~0.1 ms
  for a local PCIe host) stays out of the *chip* throughput figure. The
  serial end-to-end latency including transfers is reported separately on
  stderr.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_FPS = 1.0 / 0.066  # R_50_FPN_s1x, BASELINE.md

# Written after every successful run; replayed (marked "stale": true) when
# the chip is unreachable, because a dead tunnel otherwise HANGS the first
# device touch forever (the axon plugin retries in a silent nanosleep loop
# with no timeout — observed r2, outage >3h) and the round would record
# nothing at all. Deliberately git-tracked: the round driver commits
# end-of-round state, so the freshest record survives into the next round
# as the outage fallback (the measured_at stamp discloses its age).
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_last.json")


def chip_reachable(timeout_s: float = None) -> bool:
    """Probe the device in a THROWAWAY subprocess. In-process probing is
    impossible: a hung device touch cannot be cancelled from Python. The
    probe also rejects a CPU backend — a JAX_PLATFORMS=cpu leak or a
    fast-failing plugin must not let the bench silently measure CPU."""
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
    code = ("import jax, jax.numpy as jnp;"
            "p = jax.devices()[0].platform.lower();"
            "assert p != 'cpu', p;"
            "y=(jnp.ones((128,128))@jnp.ones((128,128))).sum();"
            "assert float(y)==128.0**3, float(y)")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )
        if proc.returncode != 0:
            tail = proc.stderr.decode(errors="replace").strip().splitlines()
            print(f"# chip probe failed: {tail[-1] if tail else 'no stderr'}",
                  file=sys.stderr)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        print(f"# chip probe timed out after {timeout_s:.0f}s",
              file=sys.stderr)
        return False

CFG_PATH = "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml"


def build_pred(int8: bool, int8_max: bool = False):
    from densepose_tpu.config import load_config
    from densepose_tpu.predictor import DensePosePredictor

    opts = [
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
        "TPU.COMPUTE_DTYPE", os.environ.get("BENCH_DTYPE", "bfloat16"),
        "TPU.INT8_HEAD", "True" if int8 else "False",
    ]
    if int8_max:
        # everything the A/B showed pays for itself (the int8 predictor
        # deconv measured neutral-negative and stays off — ARCHITECTURE.md)
        opts += ["TPU.INT8_BACKBONE", "True", "TPU.INT8_RPN", "True"]
    cfg = load_config(CFG_PATH, opts)
    return cfg, DensePosePredictor(cfg, seed=0)


def measure_fps(pred, frames, aux_frames, iters, calibrate=False,
                n_passes=3):
    """Best-of-N forced-completion throughput for one predictor; returns
    (fps, passes, p50_e2e_latency)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    fn = pred._get_fn((720, 1280))

    # checksum touching every output -> nothing can be dead-code'd or
    # left unfinished; one dispatch per frame (forward+checksum fused).
    # The running total is threaded through the jitted step as a carry, so
    # a pass ends with ONE scalar fetch (np.asarray of the last carry) and
    # NO eager reduction ops — the previous jnp.stack+jnp.sum tail cost ~3
    # tunnel RTTs (~100 ms) per pass, a pure harness tax that inflated
    # every frame figure (~2.3 ms at iters=48, ~7 ms at the sweep's old
    # iters=16; docs/ARCHITECTURE.md r4 notes).
    @jax.jit
    def step(params, img, carry):
        out = fn(params, img)
        total = carry
        for k in sorted(out):
            total += jnp.sum(out[k].astype(jnp.float32))
        return total

    if calibrate:
        # static-scale calibration (one fp pass over held-out frames) before
        # any int8 graph compiles — the serving flow
        pred.calibrate_int8(aux_frames[:2])

    zero = jax.device_put(np.float32(0))
    jax.block_until_ready(zero)

    # warmup: compile forward + checksum, then one true sync
    _ = np.asarray(step(pred.params, jnp.asarray(aux_frames[0]), zero))

    # throughput: dispatch every staged frame (the carry chains them), then
    # force completion of all of them through the single final-carry fetch.
    # Best of N passes: the remote runtime shows occasional multi-ms jitter
    # on single passes.
    passes = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        total = zero
        for f in frames:
            total = step(pred.params, f, total)
        total = np.asarray(total)
        passes.append(time.perf_counter() - t0)
        assert np.isfinite(total), "non-finite checksum: outputs corrupt"

    # serial end-to-end latency (includes host->device upload of the uint8
    # frame and the result fetch through whatever link is attached). Probed
    # AFTER the throughput passes: the first timed loops after a compile in
    # this remote environment are inflated 5-10x by link/runtime warmup,
    # and the throughput passes soak that up.
    lat = []
    for f in aux_frames[1:]:
        t0 = time.perf_counter()
        _ = np.asarray(step(pred.params, jnp.asarray(f), zero))
        lat.append(time.perf_counter() - t0)
    p50_e2e = sorted(lat)[len(lat) // 2]
    return iters / min(passes), passes, p50_e2e


def measure_sparse_fps(pred, frames, aux_frames, iters):
    """Throughput of the <=8-detection lax.switch branch (what real,
    non-crowded video executes in-graph)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    m = pred.model

    @jax.jit
    def fsp(p, img, carry):
        result, features, boxes_net = m.forward_stage1(
            p, img, compute_dtype=pred.compute_dtype)
        dp = m.forward_densepose(p, features, boxes_net[:8])
        out = dict(result)
        out.update(dp)
        total = carry
        for k in sorted(out):
            total += jnp.sum(out[k].astype(jnp.float32))
        return total

    zero = jax.device_put(np.float32(0))
    jax.block_until_ready(zero)
    _ = np.asarray(fsp(pred.params, jnp.asarray(aux_frames[0]), zero))
    sp_passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        total = zero
        for f in frames:
            total = fsp(pred.params, f, total)
        _ = np.asarray(total)
        sp_passes.append(time.perf_counter() - t0)
    return iters / min(sp_passes)


def main():
    if not os.environ.get("BENCH_SKIP_PROBE") and not chip_reachable():
        # Chip unreachable: replay the last recorded measurement rather than
        # hanging. The stale flag + timestamp make the provenance explicit.
        try:
            with open(LAST_GOOD) as f:
                rec = json.load(f)
            if not isinstance(rec, dict):
                rec = None
        except (OSError, ValueError):
            rec = None
        if rec is None:
            rec = {"metric": "frames_per_sec_per_chip", "value": 0.0,
                   "unit": "fps", "vs_baseline": 0.0,
                   "stale_reason": ("TPU unreachable and no recorded "
                                    "measurement available; 0.0 is a "
                                    "placeholder, not a measurement")}
        else:
            rec["stale_reason"] = ("TPU unreachable (probe failed — see "
                                   "stderr); value is the most recent "
                                   "successful on-chip measurement, not a "
                                   "fresh run")
        rec["stale"] = True
        print(json.dumps(rec))
        print("# CHIP UNREACHABLE — replayed last recorded measurement from "
              f"{LAST_GOOD}", file=sys.stderr)
        return

    import jax
    import numpy as np

    headline_exact = bool(os.environ.get("BENCH_EXACT"))

    iters = int(os.environ.get("BENCH_ITERS", "48"))
    rng = np.random.RandomState(0)
    # warmup + latency-probe frames are DISJOINT from the timed set, so no
    # timed iteration ever repeats an input the stack may have cached
    aux_frames = [(rng.rand(720, 1280, 3) * 255).astype(np.uint8)
                  for _ in range(7)]
    host_frames = [(rng.rand(720, 1280, 3) * 255).astype(np.uint8)
                   for _ in range(iters)]
    # stage DISTINCT frames in HBM before the clock starts
    frames = [jax.device_put(f) for f in host_frames]
    jax.block_until_ready(frames)

    # exact bf16 mode first (its fp graphs also warm the compile cache)
    cfg, pred_exact = build_pred(int8=False)
    fps_exact, passes_exact, p50_exact = measure_fps(
        pred_exact, frames, aux_frames, iters)
    fps_sparse = measure_sparse_fps(pred_exact, frames, aux_frames, iters)
    del pred_exact

    # serving mode: calibrated int8 head
    _, pred_srv = build_pred(int8=True)
    fps_srv, passes_srv, p50_srv = measure_fps(
        pred_srv, frames, aux_frames, iters, calibrate=True)

    # max-throughput serving: int8 head + backbone + RPN (changes
    # detections — informational, never the headline). BENCH_SKIP_MAX=1
    # skips the extra compile.
    fps_max = None
    if not os.environ.get("BENCH_SKIP_MAX"):
        del pred_srv  # free HBM before the third full build
        _, pred_max = build_pred(int8=True, int8_max=True)
        fps_max, _, _ = measure_fps(
            pred_max, frames, aux_frames, iters, calibrate=True)
        del pred_max

    if headline_exact:
        fps, passes, mode = fps_exact, passes_exact, "bf16_exact"
    else:
        fps, passes, mode = fps_srv, passes_srv, "int8_serving_head"
    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
        "mode": mode,
        "exact_mode_fps": round(fps_exact, 2),
        "serving_mode_fps": round(fps_srv, 2),
        "sparse_fps": round(fps_sparse, 2),
        **({"max_serving_fps": round(fps_max, 2)} if fps_max else {}),
        # per-pass wall times so consumers can see the spread behind the
        # best-of-N headline (remote passes jitter by multiple ms)
        "passes_s": [round(t, 3) for t in passes],
        "fps_median_pass": round(iters / sorted(passes)[len(passes) // 2], 2),
    }
    result["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        tmp = LAST_GOOD + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f)
            f.write("\n")
        os.replace(tmp, LAST_GOOD)
    except OSError:
        pass
    print(json.dumps(result))
    print(f"# exact bf16 mode: {1e3 / fps_exact:.1f} ms/frame "
          f"({fps_exact:.2f} fps) | int8-head serving mode: "
          f"{1e3 / fps_srv:.1f} ms ({fps_srv:.2f} fps; detections "
          f"bit-identical, SIUV maps within the tested int8 envelope); "
          + (f"max serving (int8 head+backbone+RPN, detections change): "
             f"{1e3 / fps_max:.1f} ms ({fps_max:.2f} fps); " if fps_max else "")
          + f"worst case: all {cfg.TEST.DETECTIONS_PER_IMAGE} DensePose slots "
          f"live; sparse frames (<=8 detections, the in-graph switch branch "
          f"real video takes): {fps_sparse:.1f} fps; serial end-to-end "
          f"latency p50 (incl transfers): exact {p50_exact * 1e3:.0f} ms / "
          f"serving {p50_srv * 1e3:.0f} ms; input 720x1280 -> 768x1344; "
          f"dtype={cfg.TPU.COMPUTE_DTYPE}; "
          f"switched_densepose={cfg.TPU.SWITCHED_DENSEPOSE}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
