"""Normalization ops (inference only).

FrozenBatchNorm2d (detectron2/layers/batch_norm.py:10-92) is an affine
transform with fixed statistics. On TPU the idiomatic move is to fold it into
the preceding conv's kernel+bias at load time (``fold_frozen_bn``); the
unfolded ``frozen_batch_norm`` is kept for exact-parity validation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def frozen_batch_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x * scale + shift over the channel (last) axis; scale/shift computed in
    fp32 then cast to x.dtype, mirroring batch_norm.py:44-51."""
    scale = weight.astype(jnp.float32) / jnp.sqrt(running_var.astype(jnp.float32) + eps)
    shift = bias.astype(jnp.float32) - running_mean.astype(jnp.float32) * scale
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def fold_frozen_bn(
    conv_w: np.ndarray,
    conv_b,
    bn_weight: np.ndarray,
    bn_bias: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = 1e-5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold FrozenBN into a conv. conv_w is HWIO (out = last axis).

    Returns (w', b') with  conv(x, w') + b' == BN(conv(x, w) + b).
    Computed in float64 on host for maximal weight fidelity.
    """
    scale = bn_weight.astype(np.float64) / np.sqrt(bn_var.astype(np.float64) + eps)
    shift = bn_bias.astype(np.float64) - bn_mean.astype(np.float64) * scale
    w = conv_w.astype(np.float64) * scale[None, None, None, :]
    b = shift if conv_b is None else conv_b.astype(np.float64) * scale + shift
    return w.astype(np.float32), b.astype(np.float32)


def layer_norm_cf(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """ConvNeXt-style channels LayerNorm over channel-last x (..., C) —
    functional equivalent of detectron2's LayerNorm (batch_norm.py:240-259,
    [vestigial]: unused by every DensePose config)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm_onepass(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm with ONE-PASS statistics (var = E[x^2] - mean^2) for the
    int8 DeepLab serving chain only.

    The exact two-pass form (group_norm below) computes var = E[(x-mean)^2],
    whose reduction data-depends on mean — XLA cannot fuse it into the
    producing conv's epilogue, costing a separate full pass over the
    dequantized tensor per stacked layer (~0.22 ms/layer at 100 slots,
    measured). Both one-pass sums depend only on x, so they fuse into the
    conv fusion. E[x^2] - mean^2 loses accuracy when |mean| >> std; the
    pre-ReLU conv outputs this normalizes are near zero-mean, and the chain
    is already inside the int8 serving envelope (~0.8%/step), so the wobble
    is absorbed — exact mode keeps the two-pass form.
    """
    *lead, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(*lead, h, w, g, c // g)
    axes = tuple(range(len(lead), len(lead) + 2)) + (len(lead) + 3,)
    mean = xf.mean(axis=axes, keepdims=True)
    mean_sq = (xf * xf).mean(axis=axes, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(*lead, h, w, c)
    y = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch ``nn.GroupNorm`` over channel-last x (..., H, W, C).

    Used by the DeepLab head's ASPP and stacked convs (deeplab.py:88-145).
    Statistics are computed per (group) across H, W and the group's channels,
    in fp32.
    """
    *lead, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(*lead, h, w, g, c // g)
    axes = tuple(range(len(lead), len(lead) + 2)) + (len(lead) + 3,)
    mean = xf.mean(axis=axes, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=axes, keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(*lead, h, w, c)
    y = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def cycle_batch_norm(
    x: jnp.ndarray,
    running_means: jnp.ndarray,
    running_vars: jnp.ndarray,
    weight,
    bias,
    pos,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Functional twin of detectron2's ``CycleBatchNormList``
    (detectron2/layers/batch_norm.py:193-238) at inference.

    The reference keeps N affine-free BatchNorms (one per input domain),
    cycles an internal ``_pos`` counter every forward, and applies ONE
    shared affine after whichever BN fired. No shipped config reaches it
    (vestigial), but the twin exists so every reference component has one.
    Functional JAX has no module state, so the domain index is an explicit
    ``pos`` argument — a caller reproducing the reference's cycling threads
    ``pos = call_count % N``; at inference a single call is exactly the
    reference's first-call behaviour (pos=0, i.e. "inference == its first
    BN" when never cycled).

    running_means / running_vars: (N, C) per-domain eval statistics;
    weight / bias: shared (C,) affine, or ``None`` for affine=False.
    ``pos`` may be a python int or a traced scalar.
    """
    mean = jnp.take(running_means, pos, axis=0).astype(jnp.float32)
    var = jnp.take(running_vars, pos, axis=0).astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
