"""Convolution / pooling / linear primitives in TPU-preferred layouts.

All feature maps are NHWC (or HWC for the single-image pipeline) and all conv
kernels are HWIO so XLA tiles them straight onto the MXU. Weight layout
conversion from the checkpoints' torch OIHW happens once at load time
(checkpoint/transform.py), never in the hot path.

The reference wraps torch ``nn.Conv2d`` with optional fused norm+activation
(detectron2/layers/wrappers.py:82-112); here conv is a pure function and the
norm is either folded into the kernel (FrozenBN, the TPU-idiomatic move) or
applied as a separate fused elementwise op.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """2D conv, x: (N,H,W,C) or (H,W,C); w: (kh,kw,Cin/groups,Cout)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y[0] if squeeze else y


def conv_stride2_packed(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    padding: int,
) -> jnp.ndarray:
    """Stride-2 RGB conv computed as full-lane MXU matmuls on the PACKED
    (..., H, W*3) image view (see ``resize_bilinear_packed``) — the backbone
    stem (ResNet 7x7/s2, resnet.py:344-352; HRNet 3x3/s2) is otherwise
    lowered by XLA as a space-to-batch VPU loop over the 3-channel input
    (~1.4 ms/frame at 800px, ~50x its MXU floor).

    Key fact: in the packed row, the taps of output column n occupy the
    CONTIGUOUS lanes [6n, 6n + 3*kw) (stride 2 pixels = 6 lanes). Splitting
    output columns by phase j = n mod 4 makes every window start lane a
    multiple of 24 inside the lane-shifted view P_j = xpad[:, 6j:], so each
    phase reduces to a dense GEMM:

        P_j reshaped (..., Hp, T, 24);  per tap-row dy a stride-2 row slice;
        concat over dy -> (..., ho, T, 24*kh) @ W_pack (24*kh, Cout)

    with W_pack the HWIO kernel laid out as [dy, dx*3+c] and zero-padded
    from 3*kw to 24 lanes per dy. Every slice/reshape moves full 128-lane
    tiles; the four phase GEMMs run at K = 24*kh. Same products as
    ``conv2d`` (the lane padding multiplies exact zeros), so parity is at
    MXU-reassociation level.

    xp: (..., H, W*3), already zero-padded to the network input (H, W even);
    w: (kh, kw, 3, Cout) HWIO with 3*kw <= 24; padding: the conv's spatial
    pad (3 for the 7x7 stem, 1 for 3x3). Returns (..., H//2, W//2, Cout).
    """
    kh, kw, cin, cout = w.shape
    assert cin == 3 and 3 * kw <= 24, (w.shape,)
    *lead, hp, wc = xp.shape
    assert wc % 3 == 0 and hp % 2 == 0, (xp.shape,)
    wp = wc // 3
    assert wp % 2 == 0, (xp.shape,)
    ho, wo = hp // 2, wp // 2
    t_blocks = -(-wo // 4)

    # rows: `padding` above; below just enough for the last tap row
    pad_top = padding
    h_pad = 2 * ho - 2 + kh
    pad_bot = h_pad - pad_top - hp
    # lanes: 3*padding left; right up to the widest phase view
    w_pad = 18 + 24 * t_blocks
    lane_l = 3 * padding
    lane_r = w_pad - lane_l - wc
    assert pad_bot >= 0 and lane_r >= 0, (pad_bot, lane_r)
    zeros2 = [(0, 0)] * len(lead)
    xpad = jnp.pad(xp, zeros2 + [(pad_top, pad_bot), (lane_l, lane_r)])

    # W_pack: K index = dy*24 + dx*3 + c, lanes [3*kw, 24) exact zeros
    wp_k = jnp.concatenate(
        [w, jnp.zeros((kh, 8 - kw, 3, cout), w.dtype)], axis=1
    ).reshape(kh * 24, cout).astype(xp.dtype)

    phases = []
    for j in range(4):
        pj = jax.lax.slice_in_dim(xpad, 6 * j, 6 * j + 24 * t_blocks, axis=-1)
        pj = pj.reshape(*lead, h_pad, t_blocks, 24)
        taps = [pj[..., dy:dy + 2 * ho:2, :, :] for dy in range(kh)]
        kmat = jnp.concatenate(taps, axis=-1)      # (..., ho, T, 24*kh)
        phases.append(jnp.dot(kmat, wp_k))         # (..., ho, T, Cout)
    y = jnp.stack(phases, axis=-2)                 # (..., ho, T, 4, Cout)
    y = y.reshape(*lead, ho, 4 * t_blocks, cout)[..., :, :wo, :]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d_rgb_s2(x: jnp.ndarray, w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stride-2 stem conv on an RGB image (..., H, W, 3), routed to
    ``conv_stride2_packed`` whenever the kernel fits (odd k, 3*kw <= 24,
    even H/W), else the plain conv. ``DENSEPOSE_TPU_NO_PACKED_STEM=1``
    forces the plain lowering (A/B escape hatch)."""
    import os
    kh, kw_, cin, _ = w.shape
    if (not os.environ.get("DENSEPOSE_TPU_NO_PACKED_STEM")
            and cin == 3 and x.shape[-1] == 3 and 3 * kw_ <= 24
            and kh % 2 == 1 and kh == kw_
            and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0):
        xp = x.reshape(*x.shape[:-2], x.shape[-2] * 3)
        return conv_stride2_packed(xp, w, b, padding=kh // 2)
    return conv2d(x, w, b, stride=2, padding=kh // 2)


def conv2d_int8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    padding: Union[int, Tuple[int, int]] = 0,
) -> jnp.ndarray:
    """Quantized conv for the int8 serving mode (TPU.INT8_HEAD): dynamic
    per-tensor activation scale, per-output-channel weight scales,
    s8 x s8 -> s32 on the MXU (2x the bf16 peak rate on v5e; ~1.5x measured
    on the DensePose head stack). Output dequantizes back to x.dtype.

    Post-training quantization — an approximation (~1% relative error per
    layer on typical activations), which is why it is opt-in and never the
    default: the reference's numerics are bf16/fp32 exact."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    ph, pw = _pair(padding)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    qx = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-8) / 127.0  # (Cout,)
    qw = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        qx, qw,
        window_strides=(1, 1),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if b is not None:
        y = y + b.astype(jnp.float32)
    y = y.astype(x.dtype)
    return y[0] if squeeze else y


def quant_act_s8(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric per-tensor activation quantization with a precomputed
    (calibrated) scale: round(x/scale) clipped to the s8 range."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                    ).astype(jnp.int8)


def act_stat(x: jnp.ndarray, stat: str, p=None, site: Optional[str] = None):
    """Per-quantization-site activation statistic for the int8 calibration
    walks (resnet/fpn/densepose ``*_int8_calibration``):

    * ``"max"``  — max |x| (seeds the static scales; calibrate_int8)
    * ``"sat"``  — fraction of values outside the installed clip range,
      ``mean(|x| > 127 * p[site])`` (predictor.saturation_report). A site
      whose scale is not installed (that INT8 group is disabled) reports 0.
    """
    x32 = jnp.abs(x.astype(jnp.float32))
    if stat == "max":
        return jnp.max(x32)
    assert stat == "sat", stat
    s = None if p is None else p.get(site)
    if s is None:
        return jnp.float32(0.0)
    return jnp.mean((x32 > 127.0 * s).astype(jnp.float32))


def quantize_weight_int8(w: jnp.ndarray):
    """Offline per-output-channel symmetric weight quantization:
    (kh, kw, Cin, Cout) f32/bf16 -> (qw s8, scale f32 (Cout,))."""
    wf = jnp.asarray(w, jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-8) / 127.0
    qw = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return qw, sw


def conv2d_int8_chain(
    qx: jnp.ndarray,
    sx: float,
    qw: jnp.ndarray,
    wscale: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    out_scale: Optional[float] = None,
    relu: bool = True,
    out_dtype=None,
):
    """One link of a statically-calibrated int8 conv+ReLU chain.

    qx: s8 activations with known per-tensor scale ``sx`` (a static python
    float from calibration — a graph constant, so there is NO dynamic
    max-reduction over activations). qw/wscale from quantize_weight_int8.

    The conv runs s8 x s8 -> s32 on the MXU (2x the bf16 rate on v5e); the
    epilogue never leaves the integer domain until the single requant
    multiply: bias is pre-quantized into s32 counts, ReLU happens on s32
    (valid: sx*wscale > 0 preserves sign), and the output requantizes
    directly to the NEXT layer's s8 input with one per-channel f32 multiply
    — XLA fuses the whole epilogue into the conv. This replaces the r1
    dynamic path's per-layer fp32 round-trip (quant -> conv -> dequant ->
    bias -> relu -> re-quant), which cost ~half the int8 MXU gain.

    With ``out_scale`` set, returns s8 activations at that scale (chain
    link). With ``out_scale=None``, returns f32 (sx*wscale-scaled) values —
    the chain's final layer, ready for the fp predictor.

    ``stride``/``dilation`` mirror conv2d (used by the int8 backbone's
    stride-2 blocks and res5_dilation configs).
    """
    squeeze = qx.ndim == 3
    if squeeze:
        qx = qx[None]
    sh, sw_ = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    y = jax.lax.conv_general_dilated(
        qx, qw,
        window_strides=(sh, sw_),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32,
    )
    scale = sx * wscale  # (Cout,) f32, graph constant
    if b is not None:
        qb = jnp.round(b.astype(jnp.float32) / scale).astype(jnp.int32)
        y = y + qb
    if relu:
        y = jnp.maximum(y, 0)  # s32-domain ReLU
    if out_scale is None:
        out = y.astype(jnp.float32) * scale
        if out_dtype is not None:
            # bf16 materialization for GN links: the dequantized tensor is
            # re-read by the normalize pass, so halving it halves that
            # link's HBM traffic; 0.4% bf16 rounding sits well inside the
            # ~0.8% int8 step the serving chain already carries
            out = out.astype(out_dtype)
    else:
        m = scale / out_scale  # per-channel requant multiplier, constant
        out = jnp.clip(jnp.round(y.astype(jnp.float32) * m), -127, 127
                       ).astype(jnp.int8)
    return out[0] if squeeze else out


def conv_transpose2d_int8_chain(
    qx: jnp.ndarray,
    sx: float,
    qw: jnp.ndarray,
    wscale: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 2,
    padding: int = 1,
    kernel_size: Optional[int] = None,
) -> jnp.ndarray:
    """Statically-calibrated int8 ConvTranspose2d (TPU.INT8_PREDICTOR).

    Same input-dilated-conv formulation as conv_transpose2d (``qw`` in
    forward-conv equivalent form, see checkpoint/transform.py), but run as
    s8 x s8 -> s32 on the MXU with the conv2d_int8_chain epilogue: bias in
    s32 counts, one per-channel f32 dequant. No ReLU and no requant-out —
    the predictor's deconv is the chain's terminal layer."""
    squeeze = qx.ndim == 3
    if squeeze:
        qx = qx[None]
    k = kernel_size if kernel_size is not None else qw.shape[0]
    p = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        qx, qw,
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32,
    )
    scale = sx * wscale  # (Cout,) f32, graph constant
    if b is not None:
        y = y + jnp.round(b.astype(jnp.float32) / scale).astype(jnp.int32)
    return (y[0] if squeeze else y).astype(jnp.float32) * scale


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 2,
    padding: int = 1,
    kernel_size: Optional[int] = None,
) -> jnp.ndarray:
    """torch ``nn.ConvTranspose2d`` (used by the chart predictor's four
    deconv heads, densepose predictors/chart.py:45-62).

    ``w`` must already be in *forward-conv equivalent* form
    (kh, kw, Cin, Cout) with spatially flipped taps — see
    ``checkpoint/transform.py::convert_conv_transpose_weight``. The transpose
    conv is then an input-dilated regular conv:
        pad = kernel - 1 - padding,  lhs_dilation = stride
    giving out = (in-1)*stride - 2*padding + kernel (torch formula).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    k = kernel_size if kernel_size is not None else w.shape[0]
    p = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y[0] if squeeze else y


def conv_transpose2d_polyphase(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ConvTranspose2d(k=4, s=2, p=1) as ONE stride-1 k=2 conv with 4x the
    output channels + a polyphase interleave.

    XLA:TPU lowers ``lhs_dilation`` transpose convs by convolving the dense
    4x4 window over the zero-dilated input — 4x the effective FLOPs at poor
    MXU occupancy. But a stride-2 transpose conv splits exactly by output
    parity: output (2m+dy, 2n+dx) sums the 4 taps w[2r+dy, 2c+dx] over input
    (m-1+r+dy', n-1+c+dx') — i.e. each of the 4 phases is a plain 2x2
    stride-1 conv. Stacking the phases on the channel axis gives one MXU
    pass with dense output channels (e.g. 77 -> 308), then a cheap
    reshape-interleave. Same 4 products per output as torch's kernel (the
    12 dilation zeros contribute exactly 0.0), so parity holds to
    reassociation level.

    ``w``: forward-conv form (4, 4, Cin, Cout) with spatially flipped taps,
    as stored by checkpoint/transform.py (the same weight conv_transpose2d
    consumes).
    """
    assert w.shape[0] == 4 and w.shape[1] == 4, w.shape
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    # phase kernels: ph(dy,dx)[r,c] = w[2r+dy, 2c+dx]
    wcat = jnp.concatenate(
        [w[dy::2, dx::2] for dy in (0, 1) for dx in (0, 1)], axis=-1
    )  # (2, 2, Cin, 4*Cout); phase order (0,0),(0,1),(1,0),(1,1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wcat.astype(x.dtype),
        window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=_DIMNUMS,
    )  # (N, H+1, W+1, 4*Cout)
    # phase (dy,dx) output rows m in [0,H): even phases read y[m], odd read
    # y[m+1] (their 2-tap window starts one pixel later)
    ph = [y[:, dy:dy + h, dx:dx + wd, i * cout:(i + 1) * cout]
          for i, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
    # interleave: out[2m+dy, 2n+dx] = ph[(dy,dx)][m, n]
    z = jnp.stack(ph, axis=3).reshape(n, h, wd, 2, 2, cout)
    out = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out[0] if squeeze else out


def max_pool2d(
    x: jnp.ndarray,
    *,
    kernel_size: int,
    stride: int,
    padding: int = 0,
) -> jnp.ndarray:
    """torch ``F.max_pool2d`` (ResNet stem k3 s2 p1, resnet.py:352; FPN
    LastLevelMaxPool k1 s2 p0, fpn.py:199). Padding uses -inf so padded
    positions never win."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if kernel_size == 1 and padding == 0:
        y = x[:, ::stride, ::stride, :]
    else:
        neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)
        y = jax.lax.reduce_window(
            x,
            neg,
            jax.lax.max,
            window_dimensions=(1, kernel_size, kernel_size, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
        )
    return y[0] if squeeze else y


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer; w is stored pre-transposed as (in, out)."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def pack_width_conv_kernel(w, f: int):
    """Width-packed equivalent of a 3-wide, pad-1 HWIO conv kernel.

    NHWC memory is row-major with W before C, so the lane repack
    (H, W, C) -> (H, W/f, f*C) is a FREE reshape (identical flat layout:
    packed channel t*C+c <-> original column f*J+t). A 3x3 stride-1 pad-1
    conv on the original map then equals a 3x3 stride-1 pad-(ph,1) conv on
    the packed map with this (kh, 3, f*C, f*Cout) kernel: output subcolumn
    u at packed tap DX and input slot t carries the original tap dx where
    u + dx - 1 = DX*f + t. Zero entries land exactly where the original
    conv's pad-1 border would read columns the packed pad doesn't supply,
    so edge semantics match bit-for-bit in structure (values differ only
    by contraction order — reassociation level).

    Why: HRNet's 32/64-channel branch convs occupy 25-50% of the 128 MXU
    lanes; packing fills the lanes. Cycle model (kw*C folded into the MXU
    contraction): C=32,f=4: 2.25*HW vs 3*HW block-positions; C=64,f=2:
    4.5*HW vs 6*HW — >=25% fewer, more if the real limiter is lane
    occupancy of the surrounding elementwise ops. Host-side (numpy), run
    once at load.
    """
    import numpy as np

    kh, kw, cin, cout = w.shape
    assert kw == 3, "width packing is derived for 3-wide pad-1 kernels"
    wp = np.zeros((kh, 3, f * cin, f * cout), w.dtype)
    for u in range(f):
        for dx in range(kw):
            e = u + dx - 1
            dxp = e // f  # floor: -1, 0, or 1 for any f >= 2
            t = e - dxp * f
            wp[:, dxp + 1, t * cin:(t + 1) * cin,
               u * cout:(u + 1) * cout] = w[:, dx]
    return wp


def wpack_cost(c: int, f: int) -> float:
    """MXU block-position cost per original output position of a 3x3 conv
    at channel width c, width-packed by f (1 = unpacked), under the
    kw*C-folded contraction model."""
    import math

    return 3.0 * math.ceil(3 * f * c / 128) * math.ceil(f * c / 128) / f


def pick_pack_factor(c: int) -> int:
    """Smallest-cost width-pack factor for a 3x3 conv at channel width c;
    ties break toward fuller lanes (f*c <= 128). 1 means don't pack."""
    best_f, best_cost = 1, wpack_cost(c, 1)
    for f in (2, 4):
        cost = wpack_cost(c, f)
        if cost < best_cost - 1e-9 or (cost < best_cost + 1e-9
                                       and c < 128 and f * c <= 128):
            best_f, best_cost = f, cost
    return best_f
