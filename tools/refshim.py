"""Shim layer that lets the reference implementation (/root/reference) run
OFFLINE in this environment: minimal fvcore/iopath/omegaconf stand-ins plus
WORKING numpy-backed torchvision ops (roi_align / nms / batched_nms).

With these installed, the reference's own torch modules — GeneralizedRCNN,
RPN, DensePoseROIHeads, DefaultPredictor (engine/defaults.py:50-97) — execute
end-to-end on CPU, making the reference itself the parity oracle
(tests/test_reference_oracle.py) instead of a builder-authored twin.

The torchvision stand-ins implement the documented torchvision algorithms
(the same spec as tests/reference_ops.py's slow oracles — vectorized here so
real proposal counts are tractable; equivalence to the slow oracles is
asserted in the test suite). batched_nms uses torchvision's class-offset
coordinate trick verbatim (torchvision.ops.boxes._batched_nms_coordinate_trick
semantics; the reference wraps it at detectron2/layers/nms.py:9-20).

Shared by tools/gen_checkpoint_manifest.py (model-build only) and the oracle
tests (full inference).
"""

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# numpy implementations of the two torchvision kernels the reference calls
# at inference (vectorized; spec identical to tests/reference_ops.py)
# ---------------------------------------------------------------------------

def _axis_samples(start, bin_sz, n_out, g, size):
    """Per-axis ROIAlign sample positions with torchvision's border rules.

    Returns (idx_low, idx_high, w_low, w_high, valid), each (n_out * g,).
    Mirrors tests/reference_ops.py::bilinear_interpolate axis-by-axis: a
    coordinate c < -1 or c > size contributes zero; c is clamped at 0; at the
    top edge (floor(c) >= size-1) both taps collapse onto size-1 with weight
    1 on the low tap.
    """
    i = np.repeat(np.arange(n_out, dtype=np.float64), g)
    s = np.tile(np.arange(g, dtype=np.float64), n_out)
    c = start + i * bin_sz + (s + 0.5) * bin_sz / g
    valid = (c >= -1.0) & (c <= size)
    c = np.maximum(c, 0.0)
    low = c.astype(np.int64)  # trunc == floor for c >= 0
    at_edge = low >= size - 1
    low = np.where(at_edge, size - 1, low)
    high = np.where(at_edge, size - 1, low + 1)
    cc = np.where(at_edge, low.astype(np.float64), c)
    w_high = cc - low
    w_low = 1.0 - w_high
    return low, high, w_low, w_high, valid


def roi_align_np_fast(feat, boxes, spatial_scale, output_size,
                      sampling_ratio, aligned):
    """Vectorized twin of tests/reference_ops.py::roi_align_np.

    feat: (H, W, C) float; boxes: (M, 4) xyxy. Returns (M, oh, ow, C)
    float64. Per-box loop (adaptive grids are per-box), fully vectorized
    inside; equivalence to the loop oracle is pinned in
    tests/test_reference_oracle.py::test_fast_roi_align_matches_slow_oracle.
    """
    import math
    oh, ow = output_size
    h, w = feat.shape[:2]
    m = boxes.shape[0]
    out = np.zeros((m, oh, ow, feat.shape[-1]), dtype=np.float64)
    offset = 0.5 if aligned else 0.0
    feat = feat.astype(np.float64)
    for i in range(m):
        x1, y1, x2, y2 = (float(v) for v in boxes[i])
        start_w = x1 * spatial_scale - offset
        start_h = y1 * spatial_scale - offset
        roi_w = x2 * spatial_scale - offset - start_w
        roi_h = y2 * spatial_scale - offset - start_h
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_h, bin_w = roi_h / oh, roi_w / ow
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / oh))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / ow))
        count = max(gh * gw, 1)
        if gh <= 0 or gw <= 0:  # degenerate roi: all-zero bins
            continue
        yl, yh, wyl, wyh, vy = _axis_samples(start_h, bin_h, oh, gh, h)
        xl, xh, wxl, wxh, vx = _axis_samples(start_w, bin_w, ow, gw, w)
        # joint validity factorizes: a sample point is zero when either
        # coordinate is out of range
        ay_l = (wyl * vy)[:, None, None]
        ay_h = (wyh * vy)[:, None, None]
        ax_l = (wxl * vx)[None, :, None]
        ax_h = (wxh * vx)[None, :, None]
        vals = (ay_l * (ax_l * feat[yl][:, xl] + ax_h * feat[yl][:, xh])
                + ay_h * (ax_l * feat[yh][:, xl] + ax_h * feat[yh][:, xh]))
        out[i] = vals.reshape(oh, gh, ow, gw, -1).sum(axis=(1, 3)) / count
    return out


def nms_np_fast(boxes, scores, iou_threshold):
    """Vectorized greedy NMS, torchvision semantics (same spec as
    tests/reference_ops.py::nms_np). Returns kept indices score-sorted."""
    order = np.argsort(-scores, kind="stable")
    b = boxes[order].astype(np.float32)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    alive = np.ones(len(order), dtype=bool)
    keep = []
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        rest = slice(i + 1, None)
        xx1 = np.maximum(b[i, 0], b[rest, 0])
        yy1 = np.maximum(b[i, 1], b[rest, 1])
        xx2 = np.minimum(b[i, 2], b[rest, 2])
        yy2 = np.minimum(b[i, 3], b[rest, 3])
        inter = np.maximum(xx2 - xx1, 0.0) * np.maximum(yy2 - yy1, 0.0)
        union = areas[i] + areas[rest] - inter
        iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
        alive[rest] &= ~(iou > iou_threshold)
    return np.array(keep, dtype=np.int64)


# ---------------------------------------------------------------------------
# module shims
# ---------------------------------------------------------------------------

def install_shims():
    """Install fvcore / iopath / omegaconf / torchvision stand-ins into
    sys.modules so /root/reference imports resolve. Idempotent."""
    if "fvcore" in sys.modules and hasattr(sys.modules["fvcore"], "_densepose_tpu_shim"):
        return
    import torch
    import torch.nn.init as tinit

    sys.path.insert(0, REPO)
    from densepose_tpu.config import CfgNode as OurCfgNode
    from densepose_tpu.config import load_yaml_with_base

    # -- fvcore.nn.weight_init (only called at module build; values unused)
    weight_init = types.ModuleType("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        tinit.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            tinit.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        tinit.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            tinit.constant_(module.bias, 0)

    weight_init.c2_msra_fill = c2_msra_fill
    weight_init.c2_xavier_fill = c2_xavier_fill

    # -- fvcore.common.registry.Registry
    registry_mod = types.ModuleType("fvcore.common.registry")

    class Registry:
        def __init__(self, name):
            self._name = name
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(fn_or_class):
                    self._map[fn_or_class.__name__] = fn_or_class
                    return fn_or_class
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

        def __contains__(self, name):
            return name in self._map

    registry_mod.Registry = Registry

    # -- fvcore.common.config.CfgNode: our CfgNode + the classmethods the
    # reference's subclass calls (merge_from_file -> load_yaml_with_base)
    config_mod = types.ModuleType("fvcore.common.config")

    class CfgNode(OurCfgNode):
        @classmethod
        def load_yaml_with_base(cls, filename, allow_unsafe=True):
            return load_yaml_with_base(filename)

    config_mod.CfgNode = CfgNode

    # -- fvcore.common.checkpoint.Checkpointer: enough behavior for
    # DetectionCheckpointer.load("") (detection_checkpoint.py:30-47) — an
    # empty path is a no-op returning {}; real loading in the oracle tests
    # goes through load_state_dict directly.
    ckpt_mod = types.ModuleType("fvcore.common.checkpoint")

    class Checkpointer:
        def __init__(self, model, save_dir="", *, save_to_disk=None, **extras):
            import logging
            self.model = model
            self.logger = logging.getLogger(__name__)

        def load(self, path, *args, **kwargs):
            if not path:
                return {}
            raise NotImplementedError(
                "refshim Checkpointer only supports empty-path loads; "
                "install weights via model.load_state_dict")

    ckpt_mod.Checkpointer = Checkpointer

    # -- iopath.common.file_io stubs
    iopath_mod = types.ModuleType("iopath.common.file_io")

    class PathHandler:
        pass

    class HTTPURLHandler(PathHandler):
        pass

    class OneDrivePathHandler(PathHandler):
        pass

    class PathManager:
        def register_handler(self, handler, allow_override=False):
            pass

        def open(self, path, mode="r", **kw):
            return open(path, mode)

        def isfile(self, path):
            return os.path.isfile(path)

        def get_local_path(self, path, **kw):
            return path

    iopath_mod.PathManager = PathManager
    iopath_mod.PathHandler = PathHandler
    iopath_mod.HTTPURLHandler = HTTPURLHandler
    iopath_mod.OneDrivePathHandler = OneDrivePathHandler

    # -- omegaconf stub (config.py:872 isinstance check only)
    omegaconf = types.ModuleType("omegaconf")

    class DictConfig:  # never instantiated here
        pass

    omegaconf.DictConfig = DictConfig

    # -- torchvision: WORKING numpy-backed ops so the reference's forward
    # actually runs (roi_align.py:58-66, nms.py:20 call sites)
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.16.2"  # parsed by layers/roi_align.py:43-45
    tv_ops = types.ModuleType("torchvision.ops")

    def roi_align(input, boxes, output_size, spatial_scale=1.0,
                  sampling_ratio=-1, aligned=False):
        assert isinstance(boxes, torch.Tensor) and boxes.shape[-1] == 5, \
            "refshim roi_align expects (K, 5) rois"
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        feat = input.detach().cpu().numpy()  # (N, C, H, W)
        rois = boxes.detach().cpu().numpy().astype(np.float64)
        n, c, h, w = feat.shape
        m = rois.shape[0]
        out = np.zeros((m, c, output_size[0], output_size[1]), np.float64)
        for b in range(n):
            sel = np.nonzero(rois[:, 0].astype(np.int64) == b)[0]
            if sel.size == 0:
                continue
            pooled = roi_align_np_fast(
                feat[b].transpose(1, 2, 0), rois[sel, 1:5], spatial_scale,
                output_size, sampling_ratio, aligned)
            out[sel] = pooled.transpose(0, 3, 1, 2)
        return torch.from_numpy(out).to(input.dtype)

    def nms(boxes, scores, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        keep = nms_np_fast(boxes.detach().cpu().numpy().astype(np.float32),
                           scores.detach().cpu().numpy().astype(np.float32),
                           float(iou_threshold))
        return torch.from_numpy(keep)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        # torchvision.ops.boxes._batched_nms_coordinate_trick
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
        return nms(boxes_for_nms, scores, iou_threshold)

    tv_ops.roi_align = roi_align
    tv_ops.nms = nms

    class RoIPool:  # imported by poolers.py, never constructed for FPN models
        def __init__(self, *a, **k):
            raise NotImplementedError("refshim RoIPool is not implemented")

    tv_ops.RoIPool = RoIPool
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.batched_nms = batched_nms
    tv_boxes.nms = nms
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops

    fvcore = types.ModuleType("fvcore")
    fvcore._densepose_tpu_shim = True
    fvcore.nn = types.ModuleType("fvcore.nn")
    fvcore.nn.weight_init = weight_init
    fvcore.common = types.ModuleType("fvcore.common")
    fvcore.common.registry = registry_mod
    fvcore.common.config = config_mod
    fvcore.common.checkpoint = ckpt_mod
    iopath = types.ModuleType("iopath")
    iopath.common = types.ModuleType("iopath.common")
    iopath.common.file_io = iopath_mod

    sys.modules.update({
        "fvcore": fvcore,
        "fvcore.nn": fvcore.nn,
        "fvcore.nn.weight_init": weight_init,
        "fvcore.common": fvcore.common,
        "fvcore.common.registry": registry_mod,
        "fvcore.common.config": config_mod,
        "fvcore.common.checkpoint": ckpt_mod,
        "iopath": iopath,
        "iopath.common": iopath.common,
        "iopath.common.file_io": iopath_mod,
        "torchvision": tv,
        "torchvision.ops": tv_ops,
        "torchvision.ops.boxes": tv_boxes,
        "omegaconf": omegaconf,
    })


def import_reference():
    """install_shims + put /root/reference on sys.path; returns the
    (get_cfg, build_model, add_densepose_config) trio."""
    install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model
    from densepose import add_densepose_config
    return get_cfg, build_model, add_densepose_config
