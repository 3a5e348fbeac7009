#!/usr/bin/env python
"""On-chip WALL-CLOCK video throughput through the FULL host pipeline
(VERDICT r3 #2): decode -> predict -> extract/visualize -> encode.

bench.py measures device-side forward time; the north-star metric is
frames/sec/chip of the delivered system. This tool runs a real mp4 through
run.py's streaming pipeline (parallel/pipeline.py) and reports:

* wall-clock steady-state fps of the full pipeline (decode+predict+
  visualize+encode, overlapped),
* the host-side stage split measured in isolation (decode / D2H+trim /
  visualize / encode per frame),
* the device-only predict fps for the same frames (same protocol as
  bench.py: distinct frames, completion forced by fetching outputs).

    python tools/bench_video.py [video.mp4] [--mode exact|serving]
                                [--frames N] [--vis fine_segm] [--colocated]

Without a video argument a synthetic 720p clip with moving blobs is
generated (decode cost is real — it is a real H.264/mp4v stream).
Prints one JSON line.

--colocated (r5, VERDICT r4 #4): ONE measured run of the combined system
as a co-located host would see it — frames pre-staged in HBM (the
dev-tunnel upload cost, ~138 ms/720p frame at ~20 MB/s, is the harness
tax, reported separately as ``link_upload_ms``), all forwards dispatched
device-paced, while the SAME run's host thread concurrently drains
outputs (fetch -> overlay -> encode) and a reader thread re-decodes the
clip to reproduce the real pipeline's decode load. ``colocated_fps`` is
the sustained wall-clock rate of that window — a measurement, not a
projection composed from two runs.

The in-run device probe uses bench.py's carry-chained checksum protocol
(one scalar fetch per pass), so it agrees with bench.py's device figure
even on a degraded link (the r4 probe read 65.75 ms vs the true 23.7 ms
because its 16 per-dispatch fetches each paid a link RTT);
``link_degraded`` flags an unusually slow upload path explicitly.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_clip(path: str, n_frames: int, w: int = 1280, h: int = 720,
              fps: int = 30) -> str:
    import cv2
    import numpy as np
    rng = np.random.RandomState(0)
    base = (rng.rand(h, w, 3) * 80 + 60).astype(np.uint8)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    for i in range(n_frames):
        f = base.copy()
        # moving "person-ish" blobs -> frame-to-frame variation (the bench
        # honesty rule: never feed identical frames; the tunnel memoizes)
        for b in range(6):
            cx = int((0.1 + 0.13 * b) * w + 40 * np.sin(0.1 * i + b))
            cy = int(0.5 * h + 60 * np.cos(0.08 * i + 1.7 * b))
            cv2.ellipse(f, (cx, cy), (45, 110), 0, 0, 360,
                        (int(170 + 10 * b) % 255, 140, 120), -1)
            cv2.circle(f, (cx, cy - 140), 32, (180, 160, 150), -1)
        writer.write(f)
    writer.release()
    return path


def main():
    args = [a for a in sys.argv[1:]]
    mode = "serving"
    n_frames = 240
    vis_mode = "fine_segm"
    video = None
    cpu = False
    colocated = False
    size = (1280, 720)
    extra_opts = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--colocated":
            colocated = True; i += 1
        elif a == "--mode":
            mode = args[i + 1]; i += 2
        elif a == "--frames":
            n_frames = int(args[i + 1]); i += 2
        elif a == "--vis":
            vis_mode = args[i + 1]; i += 2
        elif a == "--cpu":
            cpu = True; i += 1
        elif a == "--size":
            size = tuple(int(x) for x in args[i + 1].split("x")); i += 2
        elif a == "--opts":
            extra_opts = args[i + 1:]; i = len(args)
        else:
            video = a; i += 1

    if cpu:
        # must flip BEFORE any device touch (env var alone is not enough:
        # backend listing still probes the axon plugin, which hangs when
        # the tunnel relay is down)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    if video is None:
        video = make_clip("/tmp/bench_clip.mp4", n_frames, *size)

    from densepose_tpu import model_zoo
    from densepose_tpu.predictor import DensePosePredictor
    from densepose_tpu.visualizer import End2EndVisualizer
    from densepose_tpu.parallel.pipeline import run_video

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(["TPU.COMPUTE_DTYPE", "bfloat16",
                         "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3"]
                        + list(extra_opts))
    if mode == "serving":
        # the video-serving config: int8 head (detections bit-exact) +
        # device-side extraction (~20x less D2H traffic)
        cfg.TPU.INT8_HEAD = True
        cfg.TPU.DEVICE_POSTPROCESS = True
    cfg.freeze()
    pred = DensePosePredictor(cfg, seed=0)
    visualizer = End2EndVisualizer(alpha=0.7, keep_bg=False, mode=vis_mode)

    # ---- decode the clip once for the stage-isolation measurements ----
    cap = cv2.VideoCapture(video)
    frames = []
    t0 = time.perf_counter()
    while True:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    decode_s = time.perf_counter() - t0
    cap.release()
    n = len(frames)
    assert n >= 32, f"clip too short: {n}"
    h, w = frames[0].shape[:2]

    if pred._int8_needed and not pred._int8_ready:
        pred.calibrate_int8(frames[:2])

    # ---- device-only predict fps (distinct frames; fetch forces sync) ----
    outs0 = pred.predict_numpy(frames[0])  # compile
    t0 = time.perf_counter()
    k = min(n, 48)
    host_outputs = [pred(f) for f in frames[:k]]          # async dispatch
    host_outputs = [pred.numpy_outputs(o) for o in host_outputs]  # fetch all
    predict_s = (time.perf_counter() - t0) / k

    # ---- pure device forward (bench.py protocol: pre-staged frames,
    # carry-chained checksum, ONE scalar fetch per pass) — link-free even
    # when the tunnel is degraded (VERDICT r4 #6) ----
    import jax
    import jax.numpy as jnp
    fn = pred._get_fn(frames[0].shape[:2])

    @jax.jit
    def step(p, img, carry):
        out = fn(p, img)
        tot = carry
        for key in sorted(out):
            tot += jnp.sum(out[key].astype(jnp.float32))
        return tot

    # upload probe: the dev-harness link tax per 720p frame (colocated PCIe
    # would be sub-ms); median of 3 to ride out jitter
    up = []
    for f in frames[:3]:
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(np.ascontiguousarray(f)))
        up.append(time.perf_counter() - t0)
    link_upload_ms = sorted(up)[1] * 1e3
    frame_mb = frames[0].nbytes / 1e6
    link_mbps = frame_mb / (link_upload_ms / 1e3)
    link_degraded = link_mbps < 8.0  # healthy dev tunnel ~20 MB/s

    staged = [jax.device_put(f) for f in frames[:16]]
    zero = jax.device_put(np.float32(0))
    jax.block_until_ready(staged)
    jax.block_until_ready(zero)
    _ = np.asarray(step(pred.params, staged[0], zero))
    dev_passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        tot = zero
        for f in staged:
            tot = step(pred.params, f, tot)
        _ = np.asarray(tot)
        dev_passes.append(time.perf_counter() - t0)
    device_ms = min(dev_passes) / len(staged) * 1e3

    # ---- host stage split on real outputs ----
    t0 = time.perf_counter()
    vis_frames = [visualizer.visualize(frames[i].copy(), host_outputs[i])
                  for i in range(min(k, 32))]
    visualize_s = (time.perf_counter() - t0) / len(vis_frames)

    writer = cv2.VideoWriter("/tmp/bench_clip_enc.mp4",
                             cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (w, h))
    t0 = time.perf_counter()
    for f in vis_frames:
        writer.write(f)
    encode_s = (time.perf_counter() - t0) / len(vis_frames)
    writer.release()

    # ---- the real thing: full streaming pipeline, wall clock ----
    out_path = "/tmp/bench_clip_pred.mp4"
    # the per-shape graph is already compiled (predict loop above), so the
    # whole run IS steady state — no warmup frame to exclude
    t0 = time.perf_counter()
    run_video(pred, visualizer, video, out_path, batch=1)
    wall_s = time.perf_counter() - t0
    wall_fps = n / wall_s if wall_s > 0 else 0.0

    # ---- colocated-equivalent combined-system measurement (one run) ----
    colocated_fps = None
    colocated_window = 0
    if colocated:
        import threading

        kc = min(n, 144)
        staged_all = [jax.device_put(f) for f in frames[:kc]]  # untimed:
        jax.block_until_ready(staged_all)  # the link tax, reported above
        fetch = getattr(visualizer, "fetch_keys", lambda: None)()
        cw = cv2.VideoWriter("/tmp/bench_clip_coloc.mp4",
                             cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))

        def decode_load():  # the real pipeline's reader-thread decode load
            cap2 = cv2.VideoCapture(video)
            got = 0
            while got < kc:
                ret, _f = cap2.read()
                if not ret:
                    break
                got += 1
            cap2.release()

        # warm the fetch+overlay path once (outside the clock)
        o0 = pred(staged_all[0])
        _ = visualizer.visualize(frames[0].copy(),
                                 pred.numpy_outputs(o0, keys=fetch))
        th = threading.Thread(target=decode_load)
        t0 = time.perf_counter()
        th.start()
        outs = []
        for s in staged_all:                       # device-paced dispatch
            o = pred(s)
            # start the D2H copies immediately (what the real pipeline does
            # at dispatch time) so the drain loop below never pays a
            # per-frame link round-trip on the critical path — a colocated
            # PCIe host wouldn't either
            pred.start_fetch(o, keys=fetch)
            outs.append(o)
        for i, o in enumerate(outs):               # host drains concurrently
            npo = pred.numpy_outputs(o, keys=fetch)
            cw.write(visualizer.visualize(frames[i].copy(), npo))
        th.join()
        coloc_s = time.perf_counter() - t0
        cw.release()
        colocated_fps = kc / coloc_s
        colocated_window = kc

    # what a co-located host (PCIe link: sub-ms transfers for these sizes)
    # would sustain with the same overlapped pipeline: the slower of the
    # device forward and the serial host stages
    host_ms = (decode_s / n + visualize_s + encode_s) * 1e3
    projected = 1e3 / max(host_ms, device_ms)

    result = {
        "metric": "video_wall_clock_fps",
        "value": round(wall_fps, 2),
        "unit": "fps",
        "mode": mode,
        "n_frames": n,
        "resolution": f"{w}x{h}",
        "stage_ms_per_frame": {
            "decode": round(decode_s / n * 1e3, 2),
            "predict_incl_transfer": round(predict_s * 1e3, 2),
            "visualize": round(visualize_s * 1e3, 2),
            "encode": round(encode_s * 1e3, 2),
        },
        "device_forward_ms": round(device_ms, 2),
        "projected_colocated_fps": round(projected, 2),
        "link_upload_ms": round(link_upload_ms, 1),
        "link_mbps": round(link_mbps, 1),
        "link_degraded": bool(link_degraded),
        "detections_first_frame": int(outs0["num_instances"]),
    }
    if colocated_fps is not None:
        # measured (single-run) combined-system rate; supersedes the
        # two-number projection above
        result["colocated_fps"] = round(colocated_fps, 2)
        result["colocated_window_frames"] = colocated_window
    print(json.dumps(result))


if __name__ == "__main__":
    main()
