#!/usr/bin/env python
"""Op-level device-time profile of the flagship forward graph.

Runs bench.py's steady-state step a few times under jax.profiler.trace and
aggregates the device plane's XLA op durations from the raw .xplane.pb
(the tensorboard converter is incompatible with the installed TF build, so
the proto is walked directly). Within-trace relative shares are the
trustworthy signal; absolute per-op times carry the usual remote jitter.

    python tools/profile_ops.py [steps] [--exact|--int8] [--top N]
"""

import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG = "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml"


def run_trace(logdir: str, steps: int, int8: bool,
              cfg_spec: str = None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from densepose_tpu.config import load_config
    from densepose_tpu.predictor import DensePosePredictor

    overrides = [
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
        "TPU.COMPUTE_DTYPE", "bfloat16",
    ]
    if int8:
        overrides += ["TPU.INT8_HEAD", "True"]
    if cfg_spec and not os.path.exists(cfg_spec):  # bare zoo name
        from densepose_tpu import model_zoo
        cfg = model_zoo.get_config(cfg_spec).clone()
        cfg.defrost()
        cfg.merge_from_list(overrides)
        cfg.freeze()
    else:
        cfg = load_config(cfg_spec or CFG, overrides)
    pred = DensePosePredictor(cfg, seed=0)
    fn = pred._get_fn((720, 1280))

    @jax.jit
    def step(p, img):
        out = fn(p, img)
        total = jnp.float32(0)
        for k in sorted(out):
            total += jnp.sum(out[k].astype(jnp.float32))
        return total

    rng = np.random.RandomState(0)
    frames = [jax.device_put((rng.rand(720, 1280, 3) * 255).astype(np.uint8))
              for _ in range(steps + 4)]
    jax.block_until_ready(frames)
    if int8:
        pred.calibrate_int8([np.asarray(f) for f in frames[:2]])

    # compile + soak up remote warmup before tracing
    for f in frames[:4]:
        _ = np.asarray(step(pred.params, f))

    with jax.profiler.trace(logdir):
        total = jnp.float32(0)
        for f in frames[4:]:
            total = total + step(pred.params, f)
        _ = np.asarray(total)


def aggregate(logdir: str, steps: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb written", file=sys.stderr)
        sys.exit(1)
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    planes = [(p, sum(len(l.events) for l in p.lines)) for p in space.planes
              if "TPU" in p.name or "device" in p.name.lower()]
    if not planes:
        planes = [(p, sum(len(l.events) for l in p.lines))
                  for p in space.planes]
    plane = max(planes, key=lambda t: t[1])[0]
    print(f"# plane: {plane.name}", file=sys.stderr)

    md = plane.event_metadata
    by_op = defaultdict(float)
    total_ps = 0.0
    # async spans (copy-start/slice-start waits overlap real compute) and
    # container ops (jit_*, conditional, while, tuple — their duration
    # re-counts nested children) pollute attribution; keep leaf compute only
    skip = re.compile(r"%?(copy-start|slice-start|all-reduce-start|"
                      r"collective-permute-start|jit_|cond|conditional|"
                      r"while|tuple|get-tuple-element|copy-done|slice-done)")
    for line in plane.lines:
        for ev in line.events:
            name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
            if skip.match(name):
                continue
            by_op[name] += ev.duration_ps
            total_ps += ev.duration_ps

    def bucket(name: str) -> str:
        # strip fusion numbering so repeated instances group
        return re.sub(r"[.\d]+$", "", name)

    by_bucket = defaultdict(float)
    for name, ps in by_op.items():
        by_bucket[bucket(name)] += ps

    print(f"device total: {total_ps / 1e9 / steps:.3f} ms/step over "
          f"{steps} steps\n")
    print(f"{'ms/step':>9s}  {'%':>5s}  op bucket (instances summed)")
    for name, ps in sorted(by_bucket.items(), key=lambda t: -t[1])[:top]:
        print(f"{ps / 1e9 / steps:9.3f}  {100 * ps / total_ps:5.1f}  {name}")


def main():
    args = [a for a in sys.argv[1:]]
    int8 = "--int8" in args
    top = 40
    cfg_spec = None
    if "--top" in args:
        top = int(args[args.index("--top") + 1])
    if "--cfg" in args:  # yaml path or bare zoo name
        cfg_spec = args[args.index("--cfg") + 1]
    nums = [a for a in args if a.isdigit() and
            (("--top" not in args) or args[args.index("--top") + 1] is not a)]
    steps = int(nums[0]) if nums else 8

    logdir = tempfile.mkdtemp(prefix="dp_profile_")
    t0 = time.time()
    run_trace(logdir, steps, int8, cfg_spec)
    print(f"# traced {steps} steps in {time.time() - t0:.1f}s -> {logdir}",
          file=sys.stderr)
    aggregate(logdir, steps, top)


if __name__ == "__main__":
    main()
