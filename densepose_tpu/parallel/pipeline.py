"""Streaming video inference: decode-ahead -> device -> overlay -> write.

Replaces the reference's strictly serial frame loop (run.py:42-64, the
throughput ceiling called out in SURVEY.md section 3.3) with a pipelined
design:

* a reader thread decodes frames ahead into a bounded queue (host CPU work
  overlaps device compute),
* with ``batch`` > 1 (default: the local device count) frames are grouped
  and dispatched through ``predictor.predict_batch`` — on a multi-device
  runtime the batch shards over the ``data`` mesh axis
  (parallel/mesh.py::data_parallel_forward), on one chip it vmaps; the
  tail group is padded with repeated frames and trimmed on the host.
  Keep batch <= the device count: >1 frame per chip measured SLOWER than
  the single-frame graph (the vmapped kernel loses the cond-skip pooler
  and sparse-count switch specializations — see docs/ARCHITECTURE.md
  "Batching frames does NOT pay"),
* device->host transfer of the *previous* dispatch overlaps the current
  one's compute (double buffering via JAX's async dispatch),
* KeyboardInterrupt flushes the partial output video, matching run.py:58-62.

Batched and per-frame paths are invariant frame-for-frame (tested in
tests/test_e2e.py::test_video_batched_matches_serial).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


def _default_batch(predictor) -> int:
    if not hasattr(predictor, "predict_batch"):
        return 1  # e.g. the TTA wrapper: per-frame only
    try:
        import jax
        return max(1, len(jax.devices()))
    except Exception:
        return 1


def run_video(predictor, visualizer, input_path: str, save_path: str,
              batch: int = 0) -> None:
    import time

    import cv2

    if batch <= 0:
        batch = _default_batch(predictor)
    if batch > 1 and not hasattr(predictor, "predict_batch"):
        batch = 1

    cap = cv2.VideoCapture(input_path)
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30

    frame_q: "queue.Queue" = queue.Queue(maxsize=4 * batch)

    # serial mode: the reader thread also uploads each decoded frame to the
    # device (predictor.stage_input) so the H2D transfer overlaps the main
    # thread's fetch/overlay/encode of earlier frames — on a remote-tunnel
    # link the upload is the largest per-frame leg. Batched mode stacks raw
    # frames on the host instead.
    stage = getattr(predictor, "stage_input", None) if batch == 1 else None

    def reader():
        while True:
            ret, frame = cap.read()
            if not ret:
                frame_q.put(None)
                return
            frame_q.put((frame, stage(frame)) if stage is not None
                        else (frame, frame))

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    writer = None
    processed = 0

    def write_vis(image_vis):
        nonlocal writer, processed
        if writer is None:
            writer = cv2.VideoWriter(
                save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (image_vis.shape[1], image_vis.shape[0]))
        writer.write(image_vis)
        processed += 1
        print(f"Frame {processed}/{n_frames} processed", end="\r")

    # fetch only the maps the overlay consumes (End2EndVisualizer.fetch_keys)
    # — unused maps then never cross the device->host link
    fetch = getattr(visualizer, "fetch_keys", lambda: None)()
    # start D2H at dispatch time so the copy overlaps the next frame's
    # compute instead of landing on the flush critical path (~RTT over the
    # remote tunnel); numpy_outputs' own async starts are then no-ops
    start_fetch = getattr(predictor, "start_fetch", lambda o, keys=None: None)

    def flush(frame, outputs):
        write_vis(visualizer.visualize(
            frame, predictor.numpy_outputs(outputs, keys=fetch)))

    def flush_group(frames, outputs, count):
        # ONE device->host fetch per key for the whole batch (per-frame
        # device-array slicing would dispatch eager ops — seconds each over
        # a remote tunnel), then split into per-frame dicts on the host;
        # padded tail rows are dropped.
        if fetch is None:
            keep = None
        elif "det_packed" in outputs:
            keep = set(fetch) | {"det_packed"}
        else:
            keep = set(fetch) | {"num_instances", "valid", "image_size",
                                 "pred_boxes", "scores", "pred_classes"}
        wanted = {k: v for k, v in outputs.items()
                  if keep is None or k in keep}
        for v in wanted.values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        host = {k: np.asarray(v) for k, v in wanted.items()}
        for i in range(count):
            flush(frames[i], {k: v[i] for k, v in host.items()})

    t_start = None
    t_frames = 0  # frames counted toward the steady-state fps figure
    try:
        if batch == 1:
            pending = []  # (frame, outputs) — drain one behind to overlap D2H
            while True:
                item = frame_q.get()
                if item is None:
                    break
                frame, staged = item
                if t_start is None:
                    # exclude the first frame's compile from the fps figure
                    flush(frame, predictor(staged))
                    t_start = time.perf_counter()
                    continue
                outs = predictor(staged)  # async dispatch
                start_fetch(outs, keys=fetch)
                pending.append((frame, outs))
                if len(pending) > 1:
                    flush(*pending.pop(0))
                    t_frames += 1
            while pending:
                flush(*pending.pop(0))
                t_frames += 1
        else:
            pending = []  # (frames, outputs, count)
            group: list = []
            eof = False
            while not eof or group:
                if not eof:
                    item = frame_q.get()
                    if item is None:
                        eof = True
                    else:
                        group.append(item[0])
                        if len(group) < batch:
                            continue
                if not group:
                    break
                count = len(group)
                # pad the tail group so the batched compile is reused
                padded = group + [group[-1]] * (batch - count)
                outs = predictor.predict_batch(np.stack(padded))
                group = []
                if t_start is None:
                    # first dispatch carries the compile; flush synchronously
                    flush_group(padded, outs, count)
                    t_start = time.perf_counter()
                    continue
                start_fetch(outs, keys=fetch)
                pending.append((padded, outs, count))
                if len(pending) > 1:
                    frames_, outs_, count_ = pending.pop(0)
                    flush_group(frames_, outs_, count_)
                    t_frames += count_
            while pending:
                frames_, outs_, count_ = pending.pop(0)
                flush_group(frames_, outs_, count_)
                t_frames += count_
    except KeyboardInterrupt:
        pass

    if writer is not None:
        writer.release()
        msg = f"\nVideo saved to {save_path}"
        if t_start is not None and t_frames > 0:
            fps_eff = t_frames / (time.perf_counter() - t_start)
            msg += f" ({fps_eff:.1f} fps steady-state, batch={batch})"
        print(msg)
    else:
        print("No frames processed")
