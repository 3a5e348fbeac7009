"""Fused separable ROIAlign as a Pallas TPU kernel — EXPERIMENTAL, SLOWER.

Status: correct (matches the XLA path to 1 bf16 ulp) but measured ~6x
SLOWER than roi_align_multilevel_matmul end-to-end (42 vs 7 ms for the
1000-proposal box pooler at 800px): the per-box Wx weighting of stage 2
broadcasts lane-misaligned per-box scalars across the (chunk, out_h, TW, C)
rows block, which Mosaic lowers as cross-lane shuffles; and a dense VPU
stage 2 is inherently ~10 ms of vector work at these shapes. Kept as a
documented experiment — a competitive version needs x-sorted boxes with
per-(chunk, tile) skip flags to make stage 2 sparse (see
docs/ARCHITECTURE.md "Measurement discipline"). NOT routed by default.

The idea: the XLA separable-matmul pooler
(ops/roi_align.py::roi_align_multilevel_matmul) is bandwidth-bound — the
(chunk, H, out_w, C) intermediate of the first contraction round-trips HBM,
~2.6 GB/frame for the 1000-proposal box pooler at 800px. This kernel keeps
that intermediate in VMEM: for each chunk of boxes and each width-tile of
one pyramid level it computes

    rows = Wy_chunk (chunk*out_h, H) @ feat_tile (H, TW*C)      [MXU]
    out[:, :, x, :] += sum_w Wx[x, :, w] * rows[:, :, w, :]     [VPU]

accumulating the (chunk, out_h, out_w, C) output block in fp32 VMEM across
width-tiles. Numerics bit-match the XLA path: rows round to the feature
dtype after the fp32 MXU accumulation (what the XLA path's
``preferred_element_type=f.dtype`` einsum produces) and the second
contraction accumulates fp32.

Grid = (m_chunks, w_tiles) with w innermost, so the output block lives in
VMEM for a whole chunk and the feature map is re-read only m_chunks times
(~260 MB/frame for p2 instead of ~2.6 GB of intermediate traffic).

Semantics (weight construction, border rules, sampling_ratio, aligned) are
inherited from ops/roi_align.py::_axis_weights — this kernel only changes
the execution schedule of the same math, standing in for torchvision's CUDA
roi_align (reference: detectron2/layers/roi_align.py:7-74).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128     # boxes per output block
TW = 8          # feature-width tile


def _kernel(wy_ref, wxt_ref, feat_ref, out_ref, *, out_h: int, out_w: int,
            chunk: int):
    t = pl.program_id(1)

    h, tw, c = feat_ref.shape

    wy = wy_ref[:]                                    # (chunk*out_h, H)
    ft = feat_ref[:].reshape(h, tw * c)
    rows = jnp.dot(wy, ft, preferred_element_type=jnp.float32)
    # round to the feature dtype between the contractions (bit-matches the
    # XLA path's intermediate dtype), then back up to fp32 for accumulation
    rows4 = (rows.astype(feat_ref.dtype)
             .astype(jnp.float32)
             .reshape(chunk, out_h, tw, c))

    parts = []
    for x in range(out_w):
        wxx = wxt_ref[x].astype(jnp.float32)          # (tw, chunk)
        wxx = wxx.T                                   # (chunk, tw)
        parts.append(jnp.sum(rows4 * wxx[:, None, :, None], axis=2))
    update = jnp.stack(parts, axis=2)                 # (chunk, out_h, out_w, c)

    @pl.when(t == 0)
    def _():
        out_ref[:] = update

    @pl.when(t > 0)
    def _():
        out_ref[:] = out_ref[:] + update


def _pad_to(x: jnp.ndarray, mult: int, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pool_one_level(feat, wy2, wxt, out_h: int, out_w: int):
    """feat (H, W, C) with W % TW == 0; wy2 (Mp*out_h, H); wxt
    (out_w, W, Mp) — Mp % CHUNK == 0. Returns (Mp, out_h, out_w, C) fp32."""
    mp = wxt.shape[2]
    h, w, c = feat.shape
    m_chunks = mp // CHUNK
    w_tiles = w // TW

    flops = 2 * mp * out_h * h * w * c + 2 * mp * out_h * out_w * w * c
    bytes_accessed = (m_chunks * h * w * c * feat.dtype.itemsize
                      + mp * out_h * h * wy2.dtype.itemsize
                      + mp * out_w * w * wxt.dtype.itemsize
                      + mp * out_h * out_w * c * 4)

    return pl.pallas_call(
        functools.partial(_kernel, out_h=out_h, out_w=out_w, chunk=CHUNK),
        grid=(m_chunks, w_tiles),
        in_specs=[
            pl.BlockSpec((CHUNK * out_h, h), lambda mc, t: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_w, TW, CHUNK), lambda mc, t: (0, t, mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, TW, c), lambda mc, t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, out_h, out_w, c),
                               lambda mc, t: (mc, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, out_h, out_w, c), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects the
        # fp32 accumulator + rows working set at CHUNK=128
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wy2, wxt, feat)


# ---------------------------------------------------------------------------
# Sparse (skip-flag) variant — the design the r1 notes identified as the
# remaining live option: x-sorted level-grouped boxes + per-(chunk, tile)
# skip flags, so the dense VPU stage 2 and the stage-1 matmuls only run on
# the (chunk, width-tile) pairs a chunk's boxes actually touch.
#
# MEASURED (r2): exact (on-chip parity test passes) but SLOWER end-to-end
# than the XLA matmul pooler — 49.8 vs 39.1 ms/frame worst case at 800px
# (DENSEPOSE_TPU_SPARSE_POOLER=1 bench). The ~75% tile skip rate is not
# enough: the per-ACTIVE-tile cost is still dominated by the lane-misaligned
# per-box Wx broadcasts of stage 2 (the same limiter as the dense fused
# kernel), so sparsity scales a number that starts ~6x behind. This closes
# the design question: both the dense and the sparse fused schedules lose
# to XLA's chunked separable matmuls on this hardware. Kept as a tested,
# documented experiment behind the env knob; NOT routed by default.
# ---------------------------------------------------------------------------

# Mosaic requires the last block dim to be 128-divisible (wxt blocks carry
# the chunk on the minor axis), so the chunk stays at 128 boxes. TW_S=8
# matches the proven dense kernel's tile; larger tiles (32) blow up the
# Mosaic compile of the stage-2 broadcast (compiler OOM, measured).
CHUNK_S = 128   # boxes per output block
TW_S = 8        # feature-width tile


def _kernel_sparse(flags_ref, wy_ref, wxt_ref, feat_ref, out_ref, *,
                   out_h: int, out_w: int, chunk: int):
    mc = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(flags_ref[mc, t] != 0)
    def _():
        h, tw, c = feat_ref.shape
        wy = wy_ref[:]                                    # (chunk*out_h, H)
        ft = feat_ref[:].reshape(h, tw * c)
        rows = jnp.dot(wy, ft, preferred_element_type=jnp.float32)
        rows4 = (rows.astype(feat_ref.dtype)
                 .astype(jnp.float32)
                 .reshape(chunk, out_h, tw, c))
        parts = []
        for x in range(out_w):
            wxx = wxt_ref[x].astype(jnp.float32)          # (tw, chunk)
            wxx = wxx.T                                   # (chunk, tw)
            parts.append(jnp.sum(rows4 * wxx[:, None, :, None], axis=2))
        out_ref[:] = out_ref[:] + jnp.stack(parts, axis=2)


def _pool_one_level_sparse(feat, wy2, wxt, flags, out_h: int, out_w: int):
    """feat (H, W, C), W % TW_S == 0; wy2 (Mp*out_h, H); wxt
    (out_w, W, Mp), Mp % CHUNK_S == 0; flags (Mp//CHUNK_S, W//TW_S) int32.
    Returns (Mp, out_h, out_w, C) fp32; inactive (chunk, tile) pairs are
    skipped entirely."""
    mp = wxt.shape[2]
    h, w, c = feat.shape
    m_chunks = mp // CHUNK_S
    w_tiles = w // TW_S

    # cost of the ACTIVE fraction is data-dependent; report the dense upper
    # bound scaled by a typical ~25% activity so the scheduler doesn't
    # over-serialize around the kernel
    flops = (2 * mp * out_h * h * w * c + 2 * mp * out_h * out_w * w * c) // 4
    bytes_accessed = (m_chunks * h * w * c * feat.dtype.itemsize
                      + mp * out_h * h * wy2.dtype.itemsize
                      + mp * out_w * w * wxt.dtype.itemsize
                      + mp * out_h * out_w * c * 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_chunks, w_tiles),
        in_specs=[
            pl.BlockSpec((CHUNK_S * out_h, h), lambda mc, t, *_: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_w, TW_S, CHUNK_S), lambda mc, t, *_: (0, t, mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, TW_S, c), lambda mc, t, *_: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_S, out_h, out_w, c),
                               lambda mc, t, *_: (mc, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    from ..roi_align import _on_tpu
    return pl.pallas_call(
        functools.partial(_kernel_sparse, out_h=out_h, out_w=out_w,
                          chunk=CHUNK_S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, out_h, out_w, c), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        # interpret mode off-TPU so the CPU suite keeps parity coverage
        interpret=not _on_tpu(),
    )(flags, wy2, wxt, feat)


def roi_align_multilevel_sparse(
    feats: List[jnp.ndarray],
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    """Drop-in for roi_align_multilevel_matmul with sparse scheduling.

    Boxes are sorted by (assigned level, x-start) so each CHUNK_S-box chunk
    clusters on one level and a narrow column range; per-level Wx rows of
    boxes assigned elsewhere are zeroed, per-(chunk, tile) activity flags
    are derived from the actual nonzero Wx columns (conservative => exact),
    and the Pallas kernel skips inactive pairs. Results return in caller
    order. Numerics: Y-first contraction with the intermediate rounded to
    the feature dtype — matches roi_align_multilevel_matmul to float
    reassociation (1 bf16 ulp; the default XLA path picks its contraction
    order per level).
    """
    from ..roi_align import _axis_weights

    assert sampling_ratio > 0
    out_h, out_w = output_size
    m = boxes.shape[0]
    dtype = feats[0].dtype

    boxes = boxes.astype(jnp.float32)
    # sort by (level, x-start); stable so padded slots keep relative order
    key = levels.astype(jnp.float32) * 1e7 + jnp.clip(boxes[:, 0], 0.0, 1e6)
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    b_s = boxes[order]
    lv_s = levels[order]

    offset = 0.5 if aligned else 0.0
    acc = None
    for li, (feat, scale) in enumerate(zip(feats, scales)):
        h, w = feat.shape[0], feat.shape[1]
        c = feat.shape[2]
        start_w = b_s[:, 0] * scale - offset
        start_h = b_s[:, 1] * scale - offset
        roi_w = b_s[:, 2] * scale - offset - start_w
        roi_h = b_s[:, 3] * scale - offset - start_h
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        wy = _axis_weights(start_h, roi_h / out_h, out_h, sampling_ratio, h)
        wx = _axis_weights(start_w, roi_w / out_w, out_w, sampling_ratio, w)
        sel = (lv_s == li).astype(jnp.float32)
        wx = wx * sel[:, None, None]   # other-level boxes contribute zero

        wy2 = _pad_to(wy.astype(dtype), CHUNK_S, 0)
        mp = wy2.shape[0]
        wy2 = wy2.reshape(mp * out_h, h)
        wxt = _pad_to(_pad_to(wx.astype(dtype), CHUNK_S, 0), TW_S, 2)
        wp = wxt.shape[2]
        # activity flags from the actual nonzero Wx columns
        nz = (wxt != 0).reshape(mp // CHUNK_S, CHUNK_S, out_w,
                                wp // TW_S, TW_S)
        flags = nz.any(axis=(1, 2, 4)).astype(jnp.int32)
        wxt = wxt.transpose(1, 2, 0)                    # (out_w, W, Mp)
        fp = _pad_to(feat, TW_S, 1)
        pooled = _pool_one_level_sparse(fp, wy2, wxt, flags, out_h, out_w)[:m]
        acc = pooled if acc is None else acc + pooled
    return acc[inv].astype(dtype)


def roi_align_multilevel_fused(
    feats: List[jnp.ndarray],
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    scales: Sequence[float],
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    """Drop-in for roi_align_multilevel_matmul with the fused schedule."""
    from ..roi_align import _axis_weights

    assert sampling_ratio > 0
    out_h, out_w = output_size
    m = boxes.shape[0]
    dtype = feats[0].dtype

    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    acc = None
    for li, (feat, scale) in enumerate(zip(feats, scales)):
        h, w = feat.shape[0], feat.shape[1]
        start_w = boxes[:, 0] * scale - offset
        start_h = boxes[:, 1] * scale - offset
        roi_w = boxes[:, 2] * scale - offset - start_w
        roi_h = boxes[:, 3] * scale - offset - start_h
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        wy = _axis_weights(start_h, roi_h / out_h, out_h, sampling_ratio, h)
        wx = _axis_weights(start_w, roi_w / out_w, out_w, sampling_ratio, w)
        wy2 = _pad_to(wy.astype(dtype), CHUNK, 0)
        wy2 = wy2.reshape(wy2.shape[0] * out_h, h)
        wxt = _pad_to(_pad_to(wx.astype(dtype), CHUNK, 0), TW, 2)
        wxt = wxt.transpose(1, 2, 0)                    # (out_w, W, Mp)
        fp = _pad_to(feat, TW, 1)
        pooled = _pool_one_level(fp, wy2, wxt, out_h, out_w)[:m]
        sel = (levels == li).astype(jnp.float32)[:, None, None, None]
        acc = pooled * sel if acc is None else acc + pooled * sel
    return acc.astype(dtype)
