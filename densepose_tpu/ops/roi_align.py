"""ROIAlign as a flattened multi-level gather — the TPU replacement for
torchvision's CUDA kernel.

Semantics follow torchvision ``roi_align`` exactly (the op the reference
wraps at detectron2/layers/roi_align.py:7-74):

* ``aligned=False`` ("ROIAlign" pooler type — what every shipped DensePose
  config uses): no half-pixel shift, ROI width/height clamped to >= 1.
* ``aligned=True`` ("ROIAlignV2"): coordinates shifted by -0.5.
* bilinear sampling with the torchvision border rule: samples with
  ``y < -1 or y > H`` contribute 0; otherwise coordinates clamp to
  ``[0, H-1]`` and the 4-tap lerp runs with weights from the unclamped
  fraction.
* ``sampling_ratio > 0``: a static ratio x ratio sample grid per output bin,
  averaged. (All shipped DensePose poolers use 2 — conveniently static.)
* ``sampling_ratio == 0`` (adaptive; used by the evolution configs' box
  pooler and the mask/keypoint-head defaults, detectron2/config.py:372,417):
  per-box ``ceil(roi_size / output_size)`` samples per bin, exactly as
  torchvision. Sample *positions* may be traced per-box values under XLA;
  only the sample *count* must be static, so we evaluate a fixed
  ``_ADAPTIVE_CAP`` grid and mask samples beyond the per-box count. With FPN
  level assignment (canonical 224/level 4) a clamped box spans at most
  ~max_size/stride feature pixels, so counts never exceed the cap for the
  7x7/14x14 poolers; gigantic single-level ROIs beyond the cap fall back to
  the first ``cap`` uniformly spaced samples (documented approximation).

Design: instead of the reference ROIPooler's boolean-indexed per-level
dispatch (modeling/poolers.py:210-226, impossible under static shapes), all
FPN levels are flattened into one (sum HW, C) array and each box gathers from
its assigned level via a per-box base offset. One pass over all boxes, fixed
shapes, 4*ratio^2 gathers total — XLA fuses the lerp arithmetic into the
gather results. (A precomputed (sum HW, 4, C) tap-table variant — 4x fewer,
4x wider gathers — was measured ~6% SLOWER end-to-end on v5e: XLA's gather
here is bytes-bound, not row-bound, and the table build pays extra HBM
writes. Keeping the simple formulation.)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def assign_boxes_to_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN paper eqn (1); poolers.py:43-51. Returns level - min_level."""
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    sizes = jnp.sqrt(jnp.maximum(area.astype(jnp.float32), 0.0))
    lvl = jnp.floor(
        canonical_level + jnp.log2(sizes / canonical_box_size + 1e-8)
    )
    lvl = jnp.clip(lvl, min_level, max_level)
    return lvl.astype(jnp.int32) - min_level


_ADAPTIVE_CAP = 8  # static sample-grid bound for the adaptive (ratio 0) mode


def _axis_samples(start, bin_size, n_bins: int, grid: int, limit, k=None):
    """Sample coordinates along one axis for every (bin, sub-sample).

    start, bin_size, limit: (M,) per-box values. ``k`` (adaptive mode): (M,)
    per-box samples-per-bin; samples with index >= k are masked out. Returns
    (low_idx, high_idx, lerp, ok_mask), each (M, n_bins*grid) laid out so
    ``[:, i::grid]`` selects sub-sample i across bins."""
    p = np.arange(n_bins, dtype=np.float32)  # bin index
    if k is None:
        g = (np.arange(grid, dtype=np.float32) + 0.5) / grid  # sub-sample offset
        # (n_bins, grid) static fractional bin positions
        frac = (p[:, None] + g[None, :]).reshape(-1)  # n_bins*grid
        coord = start[:, None] + bin_size[:, None] * jnp.asarray(frac)[None, :]
        svalid = None
    else:
        i = np.arange(grid, dtype=np.float32)
        kf = jnp.maximum(k.astype(jnp.float32), 1.0)
        sub = (jnp.asarray(i)[None, :] + 0.5) / kf[:, None]       # (M, grid)
        frac = jnp.asarray(p)[None, :, None] + sub[:, None, :]    # (M, bins, grid)
        coord = (start[:, None, None]
                 + bin_size[:, None, None] * frac).reshape(start.shape[0], -1)
        svalid = jnp.broadcast_to(
            (jnp.asarray(i)[None, None, :] < k.astype(jnp.float32)[:, None, None]),
            (start.shape[0], n_bins, grid)).reshape(start.shape[0], -1)

    lim = limit[:, None].astype(jnp.float32)
    ok = (coord >= -1.0) & (coord <= lim)
    if svalid is not None:
        ok = ok & svalid
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    # torchvision: if low >= H-1 -> low = high = H-1, lerp = 0
    at_edge = low >= lim - 1.0
    low = jnp.where(at_edge, lim - 1.0, low)
    lerp = jnp.where(at_edge, 0.0, c - low)
    high = jnp.where(at_edge, low, low + 1.0)
    return low.astype(jnp.int32), high.astype(jnp.int32), lerp, ok


def roi_align_multilevel(
    feats: List[jnp.ndarray],
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    """Pool each box from its assigned pyramid level.

    feats: per-level (Hl, Wl, C) maps (single image); boxes: (M, 4) XYXY in
    input-image coordinates; levels: (M,) int32 in [0, L). Returns
    (M, out_h, out_w, C) in the feats dtype.
    """
    if _default_use_matmul(sampling_ratio):
        import os
        if os.environ.get("DENSEPOSE_TPU_SPARSE_POOLER"):
            # Pallas skip-flag pooler (experimental routing knob; see
            # ops/pallas/roi_align_kernel.py::roi_align_multilevel_sparse)
            from .pallas.roi_align_kernel import roi_align_multilevel_sparse
            return roi_align_multilevel_sparse(
                feats, boxes, levels, scales, output_size, sampling_ratio,
                aligned)
        if os.environ.get("DENSEPOSE_TPU_MATMUL_POOLER"):
            # A/B knob: the pre-r2 every-chunk-times-every-level form
            return roi_align_multilevel_matmul(
                feats, boxes, levels, scales, output_size, sampling_ratio,
                aligned)
        if len(feats) > 1 and not _is_vmapped(boxes):
            # default TPU multi-level path: level-sorted chunks skip the
            # absent levels per chunk (reassociation-level numerics;
            # measured end-to-end — docs/ARCHITECTURE.md). Under vmap the
            # per-chunk lax.cond lowers to a select that executes BOTH
            # branches, so the skip buys nothing and the sort/scatter is
            # pure overhead — batched forwards take the matmul path.
            return roi_align_multilevel_levelsorted(
                feats, boxes, levels, scales, output_size, sampling_ratio,
                aligned)
        return roi_align_multilevel_matmul(
            feats, boxes, levels, scales, output_size, sampling_ratio, aligned)
    out_h, out_w = output_size
    adaptive = sampling_ratio <= 0
    g = _ADAPTIVE_CAP if adaptive else sampling_ratio
    c = feats[0].shape[-1]
    dtype = feats[0].dtype

    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    hs = np.array([f.shape[0] for f in feats], dtype=np.int32)
    ws = np.array([f.shape[1] for f in feats], dtype=np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws)[:-1]]).astype(np.int32)
    scales_arr = np.asarray(scales, dtype=np.float32)

    h_b = jnp.asarray(hs)[levels]          # (M,)
    w_b = jnp.asarray(ws)[levels]
    off_b = jnp.asarray(offs)[levels]
    scale_b = jnp.asarray(scales_arr)[levels]

    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    start_w = boxes[:, 0] * scale_b - offset
    start_h = boxes[:, 1] * scale_b - offset
    end_w = boxes[:, 2] * scale_b - offset
    end_h = boxes[:, 3] * scale_b - offset
    roi_w = end_w - start_w
    roi_h = end_h - start_h
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / out_h
    bin_w = roi_w / out_w

    if adaptive:
        # torchvision: grid = ceil(roi_size / pooled_size); count >= 1
        k_h = jnp.minimum(jnp.ceil(bin_h), float(g))
        k_w = jnp.minimum(jnp.ceil(bin_w), float(g))
    else:
        k_h = k_w = None

    y_low, y_high, ly, y_ok = _axis_samples(start_h, bin_h, out_h, g, h_b, k_h)
    x_low, x_high, lx, x_ok = _axis_samples(start_w, bin_w, out_w, g, w_b, k_w)

    m = boxes.shape[0]
    acc = jnp.zeros((m, out_h, out_w, c), dtype=jnp.float32)
    w_row = w_b[:, None]  # (M, 1) row stride per box

    # static loop over the g x g sub-sample grid; each iteration is 4 gathers
    for iy in range(g):
        yl = y_low[:, iy::g]       # (M, out_h)
        yh = y_high[:, iy::g]
        fy = ly[:, iy::g]
        oky = y_ok[:, iy::g]
        for ix in range(g):
            xl = x_low[:, ix::g]   # (M, out_w)
            xh = x_high[:, ix::g]
            fx = lx[:, ix::g]
            okx = x_ok[:, ix::g]

            ok = (oky[:, :, None] & okx[:, None, :]).astype(jnp.float32)

            def take(yi, xi):
                idx = off_b[:, None, None] + yi[:, :, None] * w_row[:, :, None] + xi[:, None, :]
                gathered = jnp.take(flat, idx.reshape(-1), axis=0)
                return gathered.reshape(m, out_h, out_w, c).astype(jnp.float32)

            w11 = ((1 - fy)[:, :, None] * (1 - fx)[:, None, :] * ok)[..., None]
            w12 = ((1 - fy)[:, :, None] * fx[:, None, :] * ok)[..., None]
            w21 = (fy[:, :, None] * (1 - fx)[:, None, :] * ok)[..., None]
            w22 = (fy[:, :, None] * fx[:, None, :] * ok)[..., None]

            acc = acc + take(yl, xl) * w11 + take(yl, xh) * w12 \
                      + take(yh, xl) * w21 + take(yh, xh) * w22

    if adaptive:
        count = jnp.maximum(k_h * k_w, 1.0)
        acc = acc / count[:, None, None, None]
    else:
        acc = acc / float(g * g)
    return acc.astype(dtype)


def _axis_weights(start, bin_size, n_bins: int, g: int, limit: int):
    """Per-box separable ROIAlign weights along one axis: (M, n_bins, limit)
    rows summing the g sub-sample bilinear taps / g (so the g x g average is
    the product of the two axes). Exactly the gather formulation's taps —
    border rule, at-edge clamp and all — expressed as a dense row."""
    m = start.shape[0]
    low, high, lerp, ok = _axis_samples(start, bin_size, n_bins, g,
                                        jnp.full((m,), float(limit)))
    okf = ok.astype(jnp.float32)
    w_low = (1.0 - lerp) * okf   # (M, n_bins*g)
    w_high = lerp * okf
    idx = jnp.arange(limit, dtype=jnp.int32)
    one_low = (low[:, :, None] == idx).astype(jnp.float32)
    one_high = (high[:, :, None] == idx).astype(jnp.float32)
    w = w_low[:, :, None] * one_low + w_high[:, :, None] * one_high
    return w.reshape(m, n_bins, g, limit).sum(axis=2) / g  # (M, n_bins, limit)


def roi_align_single_matmul(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    scale: float,
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    """Exact ROIAlign as two small matmuls per box (MXU path).

    ROIAlign's sample grid is uniformly spaced, so the bilinear taps + g x g
    average factorize per axis into dense weight rows with <= 2g nonzeros:
    pooled[b] = Wy[b] @ feat @ Wx[b]^T. On TPU this replaces XLA's scattered
    gathers (~13% of HBM bandwidth in practice) with MXU contractions.
    Bit-differences vs the gather path are pure float reassociation
    (weights cast to the feature dtype)."""
    assert sampling_ratio > 0, "matmul pooler: static ratio only"
    out_h, out_w = output_size
    g = sampling_ratio
    h, w = feat.shape[0], feat.shape[1]

    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    start_w = boxes[:, 0] * scale - offset
    start_h = boxes[:, 1] * scale - offset
    roi_w = boxes[:, 2] * scale - offset - start_w
    roi_h = boxes[:, 3] * scale - offset - start_h
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    wy = _axis_weights(start_h, roi_h / out_h, out_h, g, h)  # (M, out_h, H)
    wx = _axis_weights(start_w, roi_w / out_w, out_w, g, w)  # (M, out_w, W)

    f = feat.astype(jnp.float32) if feat.dtype == jnp.float32 else feat
    wy = wy.astype(f.dtype)
    wx = wx.astype(f.dtype)
    # Two chained contractions; XLA must materialize the intermediate in
    # HBM, so (a) contract the axis that leaves the SMALLER intermediate
    # first (this stage is bandwidth-bound, not FLOP-bound): X-first leaves
    # (M, H, out_w, C), Y-first leaves (M, out_h, W, C); and (b) emit the
    # intermediate directly in the feature dtype — the MXU still accumulates
    # fp32 internally and rounds on output, which is bit-identical to
    # computing fp32 then casting, but skips a full fp32 HBM round trip.
    if h * out_w <= out_h * w:
        cols = jnp.einsum("mxw,hwc->mhxc", wx, f, preferred_element_type=f.dtype)
        out = jnp.einsum("myh,mhxc->myxc", wy, cols,
                         preferred_element_type=jnp.float32)
    else:
        rows = jnp.einsum("myh,hwc->mywc", wy, f, preferred_element_type=f.dtype)
        out = jnp.einsum("mxw,mywc->myxc", wx, rows,
                         preferred_element_type=jnp.float32)
    return out.astype(feat.dtype)


def roi_align_multilevel_matmul(
    feats: List[jnp.ndarray],
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
    chunk: int = 128,
) -> jnp.ndarray:
    """Multi-level ROIAlign on the MXU: every chunk of boxes is pooled
    against EVERY pyramid level via the separable matmuls, then the assigned
    level's result is mask-selected. ~300 GFLOP for 1000 boxes over an
    800px P2-P5 pyramid — 2-3 ms of MXU work vs ~6 ms of XLA gathers.
    Chunking bounds the (chunk, out_h, Wl, C) intermediates."""
    m = boxes.shape[0]
    outs = []
    for s in range(0, m, chunk):
        b = boxes[s:s + chunk]
        lv = levels[s:s + chunk]
        acc = None
        for li, (f, sc) in enumerate(zip(feats, scales)):
            pooled = roi_align_single_matmul(f, b, sc, output_size,
                                             sampling_ratio, aligned)
            sel = (lv == li).astype(pooled.dtype)[:, None, None, None]
            acc = pooled * sel if acc is None else acc + pooled * sel
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def roi_align_multilevel_levelsorted(
    feats: List[jnp.ndarray],
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
    chunk: int = 128,
    window: int = 128,
) -> jnp.ndarray:
    """Separable-matmul multi-level ROIAlign with level-sorted chunks and
    x-windowed wide levels.

    Two stacked schedule optimizations over the plain matmul pooler:

    * **Level sort + cond-skip** — the plain pooler contracts EVERY chunk
      of boxes against EVERY pyramid level and mask-selects: 4x the
      necessary einsum FLOPs and HBM traffic for a 4-level pyramid.
      Sorting boxes by (assigned level, x1) makes each chunk's level set
      nearly always a single level, so a per-(chunk, level) ``lax.cond``
      skips the absent levels entirely — TPU executes only the taken
      branch of a conditional.
    * **Column windows on wide levels** — an FPN-assigned box spans at
      most ~28*sqrt(aspect) feature columns, so within an x-sorted chunk
      the nonzero Wx columns cluster. For levels wider than ``window``
      the chunk pools from a ``window``-column ``dynamic_slice`` — exact,
      since the dropped columns carry exactly zero weight — with a
      per-chunk cond fallback to the full width when a chunk's nonzero
      columns do not fit (wide/elongated boxes). Windowing also flips the
      bandwidth-optimal contraction order: at full width the X-first
      intermediate (chunk, H, out_w, C) is smaller, but with W cut to
      ``window`` the Y-first intermediate (chunk, out_h, window, C) wins
      (58 vs 92 MB per 128-chunk on an 800px P2) and stage 1 drops to
      ~window/W of its FLOPs.

    Per-box results are the SAME tap weights over the same operand rows
    as roi_align_multilevel_matmul, scattered back to the caller's box
    order; chunk composition, the cond wrappers and the per-branch
    contraction order shift einsum codegen/tiling, so equality is
    reassociation-level (within the pooler's existing float noise), not
    bitwise.
    """
    assert sampling_ratio > 0
    import os
    if os.environ.get("DENSEPOSE_TPU_LS_NOWINDOW"):
        window = 1 << 30   # A/B knob: pure level-sort, no column windows
    m = boxes.shape[0]
    out_h, out_w = output_size
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0

    # sort by (level, x-start) so chunks are single-level AND x-clustered
    key = levels.astype(jnp.float32) * 1e7 + jnp.clip(boxes[:, 0], 0.0, 1e6)
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    b_s = boxes[order]
    lv_s = levels[order]

    outs = []
    for s in range(0, m, chunk):
        b = b_s[s:s + chunk]
        lv = lv_s[s:s + chunk]
        n = b.shape[0]
        acc = jnp.zeros((n, out_h, out_w, c), dtype=dtype)
        for li, (f, sc) in enumerate(zip(feats, scales)):
            present = jnp.any(lv == li)

            def pool(acc, b=b, lv=lv, f=f, sc=sc, li=li):
                h, w = f.shape[0], f.shape[1]
                start_w = b[:, 0] * sc - offset
                start_h = b[:, 1] * sc - offset
                roi_w = b[:, 2] * sc - offset - start_w
                roi_h = b[:, 3] * sc - offset - start_h
                if not aligned:
                    roi_w = jnp.maximum(roi_w, 1.0)
                    roi_h = jnp.maximum(roi_h, 1.0)
                wy = _axis_weights(start_h, roi_h / out_h, out_h,
                                   sampling_ratio, h).astype(dtype)
                wx = _axis_weights(start_w, roi_w / out_w, out_w,
                                   sampling_ratio, w).astype(dtype)
                # zero other-level rows: their pooled output becomes exactly
                # 0 and their columns don't widen the window span
                sel = (lv == li).astype(dtype)
                wx = wx * sel[:, None, None]

                def full(_, wy=wy, wx=wx, f=f):
                    # X-first: smaller intermediate at full width
                    cols = jnp.einsum("mxw,hwc->mhxc", wx, f,
                                      preferred_element_type=f.dtype)
                    return jnp.einsum("myh,mhxc->myxc", wy, cols,
                                      preferred_element_type=jnp.float32)

                if w <= window:
                    pooled = full(None)
                else:
                    colnz = (wx != 0).any(axis=(0, 1))          # (W,)
                    idx = jnp.arange(w)
                    first = jnp.min(jnp.where(colnz, idx, w))
                    last = jnp.max(jnp.where(colnz, idx, -1))
                    w_lo = jnp.clip(first, 0, w - window)
                    fits = (last - w_lo) < window

                    def narrow(_, wy=wy, wx=wx, f=f, w_lo=w_lo):
                        fw = jax.lax.dynamic_slice(
                            f, (0, w_lo, 0), (f.shape[0], window, c))
                        wxw = jax.lax.dynamic_slice(
                            wx, (0, 0, w_lo), (wx.shape[0], out_w, window))
                        # Y-first: with W cut to `window` its intermediate
                        # is the smaller one
                        return _pair_einsums_yfirst(wy, wxw, fw)

                    pooled = jax.lax.cond(fits, narrow, full, None)
                return acc + pooled.astype(dtype)

            acc = jax.lax.cond(present, pool, lambda a: a, acc)
        outs.append(acc)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[inv]


def _pair_einsums_yfirst(wy_c, wx_c, f):
    """pooled = Wy @ f @ Wx^T, Y-contraction first (see
    roi_align_single_matmul for the dtype discipline)."""
    rows = jnp.einsum("myh,hwc->mywc", wy_c, f, preferred_element_type=f.dtype)
    return jnp.einsum("mxw,mywc->myxc", wx_c, rows,
                      preferred_element_type=jnp.float32)


def roi_align_multilevel_windowed(
    feats: List[jnp.ndarray],
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
    chunk: int = 128,
    window: int = 128,
) -> jnp.ndarray:
    """Separable-matmul multi-level ROIAlign with x-sorted column windows.

    The plain matmul pooler contracts every chunk against the FULL width of
    every level, so its (chunk, ·, W, C) intermediate round-trips ~2.6 GB of
    HBM per frame at 800px. But an FPN-assigned box spans at most ~28
    feature columns on its level, so after sorting boxes by x1 each chunk's
    nonzero Wx columns cluster: pooling from a ``window``-column
    ``dynamic_slice`` of the level is then bit-exact (the dropped columns
    have exactly zero weight). A per-chunk ``lax.cond`` falls back to the
    full-width path when a chunk's nonzero columns do not fit the window
    (wide/elongated boxes), preserving exactness for every input. Levels
    narrower than ``window`` take the plain path.

    Results are scattered back to the caller's box order; value-identical to
    roi_align_multilevel_matmul up to einsum reassociation. One extra dtype
    difference for bf16 features: this path keeps the pooled chunks in fp32
    through the level-select and casts once at the end, while the matmul
    path rounds each level's pooled output to the feature dtype first — so
    bf16 results can differ by one rounding step (fp32 inputs match
    exactly; tested).
    """
    assert sampling_ratio > 0
    out_h, out_w = output_size
    m = boxes.shape[0]
    dtype = feats[0].dtype
    boxes = boxes.astype(jnp.float32)

    order = jnp.argsort(boxes[:, 0])
    inv = jnp.argsort(order)
    b_s = boxes[order]
    lv_s = levels[order]

    offset = 0.5 if aligned else 0.0
    acc = None
    for li, (feat, scale) in enumerate(zip(feats, scales)):
        h, w = feat.shape[0], feat.shape[1]
        c = feat.shape[2]
        f = feat
        start_w = b_s[:, 0] * scale - offset
        start_h = b_s[:, 1] * scale - offset
        roi_w = b_s[:, 2] * scale - offset - start_w
        roi_h = b_s[:, 3] * scale - offset - start_h
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        wy = _axis_weights(start_h, roi_h / out_h, out_h,
                           sampling_ratio, h).astype(dtype)
        wx = _axis_weights(start_w, roi_w / out_w, out_w,
                           sampling_ratio, w).astype(dtype)

        chunks = []
        for s in range(0, m, chunk):
            wy_c = wy[s:s + chunk]
            wx_c = wx[s:s + chunk]
            if w <= window:
                chunks.append(_pair_einsums_yfirst(wy_c, wx_c, f))
                continue

            colnz = (wx_c != 0).any(axis=(0, 1))            # (W,)
            idx = jnp.arange(w)
            first = jnp.min(jnp.where(colnz, idx, w))
            last = jnp.max(jnp.where(colnz, idx, -1))
            w_lo = jnp.clip(first, 0, w - window)
            fits = (last - w_lo) < window

            def narrow(_, wy_c=wy_c, wx_c=wx_c, f=f, w_lo=w_lo):
                fw = jax.lax.dynamic_slice(f, (0, w_lo, 0),
                                           (f.shape[0], window, c))
                wxw = jax.lax.dynamic_slice(
                    wx_c, (0, 0, w_lo), (wx_c.shape[0], out_w, window))
                return _pair_einsums_yfirst(wy_c, wxw, fw)

            def wide(_, wy_c=wy_c, wx_c=wx_c, f=f):
                return _pair_einsums_yfirst(wy_c, wx_c, f)

            chunks.append(jax.lax.cond(fits, narrow, wide, None))

        pooled = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
        sel = (lv_s == li).astype(jnp.float32)[:, None, None, None]
        acc = pooled * sel if acc is None else acc + pooled * sel
    return acc[inv].astype(dtype)


def _is_vmapped(x) -> bool:
    """True when ``x`` is being traced under a jax.vmap batch dimension."""
    try:
        from jax.interpreters import batching
        return isinstance(x, batching.BatchTracer)
    except Exception:
        return False


def _on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
        return "tpu" in plat or plat == "axon"
    except Exception:
        return False


def _default_use_matmul(sampling_ratio: int) -> bool:
    return _on_tpu() and sampling_ratio > 0


def roi_align_single(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    scale: float,
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
    use_matmul: bool = None,
) -> jnp.ndarray:
    """Single-level ROIAlign (the Decoder-path DensePose pooler,
    densepose roi_head.py:104-118 uses only the stride-4 map). On TPU the
    separable-matmul formulation is used (see roi_align_single_matmul);
    elsewhere the flattened gather."""
    if use_matmul is None:
        use_matmul = _default_use_matmul(sampling_ratio)
    if use_matmul:
        return roi_align_single_matmul(feat, boxes, scale, output_size,
                                       sampling_ratio, aligned)
    levels = jnp.zeros((boxes.shape[0],), dtype=jnp.int32)
    return roi_align_multilevel(
        [feat], boxes, levels, [scale], output_size, sampling_ratio, aligned
    )
