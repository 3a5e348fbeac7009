"""Image/feature resizing with exact PyTorch ``F.interpolate`` semantics.

The reference relies on torch's ``align_corners=False`` (half-pixel) bilinear
resize in five places (SURVEY.md section 7.3): the preprocess resize
(engine/defaults.py:87-89), FPN top-down upsample (nearest, fpn.py:152), the
Decoder upsample (densepose roi_head.py:63), the chart predictor ``interp2d``
(chart.py:62-74) and the ASPP pooling branch (deeplab.py:109).

``jax.image.resize`` antialiases on downscale (torch does not), so we
implement the torch sampling rule directly as two separable axis gathers with
statically precomputed indices/weights — gathers are cheap on TPU and XLA
fuses the lerp arithmetic.

Source coordinate rule (align_corners=False):
    src = (dst + 0.5) * ratio - 0.5,   clamped below at 0
where ratio = 1/scale_factor when an explicit scale factor was given
(torch uses the provided scale directly when ``recompute_scale_factor`` is
unset), else H_in / H_out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(in_size: int, out_size: int, scale: Optional[float]):
    """Static (i0, i1, w0, w1) index/weight vectors for one axis."""
    # torch computes source coordinates in float32 for float32 inputs;
    # matching the dtype keeps weights bit-identical.
    if scale is not None:
        ratio = np.float32(1.0) / np.float32(scale)
    else:
        ratio = np.float32(in_size) / np.float32(out_size)
    dst = np.arange(out_size, dtype=np.float32)
    src = (dst + np.float32(0.5)) * ratio - np.float32(0.5)
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    frac = src - i0
    i1 = np.minimum(i0 + 1, in_size - 1)
    # torch: when i0 == in_size-1, i1 == i0 and the lerp degenerates to x[i0].
    w1 = np.where(i1 > i0, frac, 0.0)
    w0 = 1.0 - w1
    return i0, i1, w0.astype(np.float32), w1.astype(np.float32)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    scale: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Bilinear resize of ``x`` with shape (..., H, W, C) to ``out_hw``.

    ``scale`` — optional (scale_h, scale_w) when mirroring torch's
    scale_factor mode (the coordinate ratio is then 1/scale, not H_in/H_out).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out) and scale is None:
        return x
    dtype = x.dtype
    sh, sw = (scale if scale is not None else (None, None))

    # NOTE(perf): an exact scale-2 shift-add fast path (even = 0.25*x[m-1]
    # + 0.75*x[m], odd mirrored, stack-interleave) measured ~20% faster in
    # isolation on TPU but 1.6 ms/frame SLOWER inside the full fused graph —
    # the constant-index takes below fuse better with surrounding work.
    # Tried and reverted; don't re-add without an end-to-end bench win.

    i0, i1, w0, w1 = _axis_weights(h_in, h_out, sh)
    xa = jnp.take(x, jnp.asarray(i0), axis=-3)
    xb = jnp.take(x, jnp.asarray(i1), axis=-3)
    w0 = jnp.asarray(w0, dtype=dtype)[:, None, None]
    w1 = jnp.asarray(w1, dtype=dtype)[:, None, None]
    x = xa * w0 + xb * w1

    j0, j1, v0, v1 = _axis_weights(w_in, w_out, sw)
    xa = jnp.take(x, jnp.asarray(j0), axis=-2)
    xb = jnp.take(x, jnp.asarray(j1), axis=-2)
    v0 = jnp.asarray(v0, dtype=dtype)[:, None]
    v1 = jnp.asarray(v1, dtype=dtype)[:, None]
    return xa * v0 + xb * v1


def resize_bilinear_smallc(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    scale: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Bit-exact ``resize_bilinear`` variant for few-channel images (HWC).

    The standard formulation's W-axis gather indexes the second-to-last dim
    while the minor dim holds only C=3 channels — 125 of 128 lanes idle, and
    it cost ~2.8 ms/frame on the (720,1280,3)->800px preprocess resize. Here
    both axis passes gather ROWS of a 2D-contiguous view: the H pass as-is,
    the W pass after a (H, W, C) -> (W, H, C) swap (two cheap relayouts of a
    few MB bracket a lane-aligned gather). The per-element arithmetic is
    identical to ``resize_bilinear`` — same takes, same fp32 lerp — so the
    result is bit-exact, unlike a matmul formulation which on TPU would run
    at bf16 MXU precision."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out) and scale is None:
        return x
    dtype = x.dtype
    sh, sw = (scale if scale is not None else (None, None))

    def axis_pass(y, out_size, s):
        # y: (..., N, K, C) resized along -3 via row takes
        i0, i1, w0, w1 = _axis_weights(y.shape[-3], out_size, s)
        xa = jnp.take(y, jnp.asarray(i0), axis=-3)
        xb = jnp.take(y, jnp.asarray(i1), axis=-3)
        w0 = jnp.asarray(w0, dtype=dtype)[:, None, None]
        w1 = jnp.asarray(w1, dtype=dtype)[:, None, None]
        return xa * w0 + xb * w1

    y = axis_pass(x, h_out, sh)
    y = jnp.swapaxes(y, -3, -2)
    y = axis_pass(y, w_out, sw)
    return jnp.swapaxes(y, -3, -2)


def resize_bilinear_packed(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    scale: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Bit-exact HWC resize with the W and C axes PACKED into one.

    ``resize_bilinear_smallc`` fixed the W-axis gather, but every
    intermediate still carries a minor dim of C=3 — on TPU each (8, 128)
    tile then holds 3 useful lanes, so even "cheap" elementwise/relayout
    steps move ~42x more tiles than data. Here the image is viewed as
    (H, W*C) (a free reshape of contiguous HWC), so every gather, lerp and
    transpose runs on full 128-lane tiles:

      H pass : row takes on (H, W*C)
      W pass : transpose to (W*C, H) [an efficient 2D relayout], then row
               takes with channel-interleaved indices i[j]*C + c and
               3x-repeated weights, transpose back.

    Taps and fp32 lerp arithmetic are identical to ``resize_bilinear`` —
    the result is bit-exact; only the memory movement differs. Input may be
    uint8 (taken as u8, cast exactly to f32 at the lerp) or float.
    Returns float32 (H_out, W_out, C).
    """
    h_in, w_in, c = x.shape
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out) and scale is None:
        return x.astype(jnp.float32)
    sh, sw = (scale if scale is not None else (None, None))

    y = x.reshape(h_in, w_in * c)

    # H pass: rows of (H, W*C)
    i0, i1, w0, w1 = _axis_weights(h_in, h_out, sh)
    ya = jnp.take(y, jnp.asarray(i0), axis=0).astype(jnp.float32)
    yb = jnp.take(y, jnp.asarray(i1), axis=0).astype(jnp.float32)
    y = ya * jnp.asarray(w0)[:, None] + yb * jnp.asarray(w1)[:, None]

    # W pass: rows of the transposed (W*C, H) view, channel-interleaved
    j0, j1, v0, v1 = _axis_weights(w_in, w_out, sw)
    cc = np.arange(c, dtype=np.int64)
    j0m = (j0[:, None] * c + cc[None, :]).reshape(-1)
    j1m = (j1[:, None] * c + cc[None, :]).reshape(-1)
    v0m = np.repeat(v0, c)
    v1m = np.repeat(v1, c)
    y = y.T  # (W*C, H) — full-lane 2D relayout
    ya = jnp.take(y, jnp.asarray(j0m), axis=0)
    yb = jnp.take(y, jnp.asarray(j1m), axis=0)
    y = ya * jnp.asarray(v0m)[:, None] + yb * jnp.asarray(v1m)[:, None]
    return y.T.reshape(h_out, w_out, c)


def resize_bilinear_np(x: np.ndarray, out_hw: Tuple[int, int],
                       scale: Optional[Tuple[float, float]] = None) -> np.ndarray:
    """HOST (numpy) mirror of the in-graph preprocess resize, bit-identical:
    the same ``_axis_weights`` taps and the same per-element fp32 lerp
    (``a*w0 + b*w1`` — two correctly-rounded mults and one add, identical in
    numpy and XLA) as ``resize_bilinear_packed``. Used by the geometry-
    bucketing serving path (predictor) to resize on the host so one compiled
    graph per PADDED geometry bucket serves every input size; equality is
    pinned by tests/test_bucketing.py. Input uint8 or float; returns fp32."""
    h_in, w_in = x.shape[:2]
    h_out, w_out = out_hw
    sh, sw = (scale if scale is not None else (None, None))
    i0, i1, w0, w1 = _axis_weights(h_in, h_out, sh)
    ya = x[i0].astype(np.float32)
    yb = x[i1].astype(np.float32)
    y = ya * w0[:, None, None] + yb * w1[:, None, None]
    j0, j1, v0, v1 = _axis_weights(w_in, w_out, sw)
    return y[:, j0] * v0[None, :, None] + y[:, j1] * v1[None, :, None]


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact scale-2 half-pixel bilinear upsample as shift-adds.

    For scale_factor=2 the torch rule degenerates to a 2-phase FIR per axis:
    even out[2m] = 0.25*x[m-1] + 0.75*x[m] (edge-clamped), odd mirrored.
    Shift-add + stack-interleave measured ~1.7x faster than the gather
    formulation on the (100,56,56,77) chart-predictor upsample (the gathers
    relayout badly at 77 channels). fp32 accumulation — commutative-equal to
    ``resize_bilinear(..., scale=(2,2))`` in fp32, and strictly more accurate
    for bf16 inputs. Used by the chart predictor only; the general
    ``resize_bilinear`` remains the default elsewhere (an earlier attempt to
    use a fast path globally was slower inside the big fused graphs)."""
    dt = x.dtype

    def up_axis(y, axis):
        n = y.shape[axis]

        def shift(a, d):
            if d == -1:
                first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
                rest = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
                return jnp.concatenate([first, rest], axis=axis)
            last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
            rest = jax.lax.slice_in_dim(a, 1, n, axis=axis)
            return jnp.concatenate([rest, last], axis=axis)

        yf = y.astype(jnp.float32)
        a = (0.25 * shift(y, -1).astype(jnp.float32) + 0.75 * yf).astype(dt)
        b = (0.75 * yf + 0.25 * shift(y, +1).astype(jnp.float32)).astype(dt)
        st = jnp.stack([a, b], axis=axis + 1)
        shp = list(y.shape)
        shp[axis] = 2 * shp[axis]
        return st.reshape(shp)

    ax = x.ndim - 3
    return up_axis(up_axis(x, ax), ax + 1)


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch mode="nearest": src = floor(dst * in/out), per axis."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    iy = np.minimum((np.arange(h_out) * (h_in / h_out)).astype(np.int64), h_in - 1)
    ix = np.minimum((np.arange(w_out) * (w_in / w_out)).astype(np.int64), w_in - 1)
    x = jnp.take(x, jnp.asarray(iy), axis=-3)
    x = jnp.take(x, jnp.asarray(ix), axis=-2)
    return x


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample (FPN top-down path, fpn.py:152): each pixel
    repeats 2x2. Implemented as repeat, which XLA lowers to a cheap
    broadcast-reshape."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x
