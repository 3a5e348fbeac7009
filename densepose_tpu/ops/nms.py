"""Fixed-shape non-maximum suppression for XLA.

The reference calls torchvision's CUDA/C++ greedy NMS through
``batched_nms`` (detectron2/layers/nms.py:9-21) with data-dependent output
shapes. On TPU we need static shapes and no serial host loop, so greedy NMS
is re-expressed as a *fixed-point iteration over a suppression matrix*:

    keep[i] = valid[i] and not exists j<i (in score order):
                  keep[j] and IoU(i, j) > thresh

Iterating ``keep <- f(keep)`` from all-valid converges to exactly the greedy
solution (each sweep finalizes at least one more prefix element; depth equals
the longest suppression chain, typically < 10). Each sweep is one (K, K)
masked any-reduce — pure VPU work, no serial dependency of length K.

Matches torchvision ``nms`` semantics: score-descending order, IoU with
``(x2-x1)*(y2-y1)`` areas, strict ``>`` threshold comparison, fp32 compute
(the reference upcasts fp16 before NMS, nms.py:19-20).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

_NEG = -1e30  # effective -inf that survives fp16/bf16 casts of scores


def _use_pallas() -> bool:
    """Opt-in (DENSEPOSE_TPU_PALLAS_NMS=1) and TPU-only. The sequential
    Pallas kernel was measured SLOWER end-to-end than the XLA fixed-point
    formulation (46.5 vs 40.3 ms/frame at 800px): the fixed-point's sweeps
    are fully parallel VPU work and vmap across pyramid levels, while the
    kernel walks the score order serially. Kept for reference/experiments.
    Cached once per process."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        import os
        if not os.environ.get("DENSEPOSE_TPU_PALLAS_NMS"):
            _PALLAS_OK = False
        else:
            try:
                import jax as _jax
                plat = _jax.devices()[0].platform.lower()
                _PALLAS_OK = ("tpu" in plat or plat == "axon")
            except Exception:
                _PALLAS_OK = False
    return _PALLAS_OK


_PALLAS_OK = None


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy NMS. boxes (K,4), scores (K,), valid (K,) bool.

    Returns a bool keep-mask in the *original* index space. Ordering of the
    survivors is recovered downstream by sorting on score (torchvision
    returns indices score-sorted; all our consumers re-sort by score anyway).
    """
    k = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    s = jnp.where(valid, scores.astype(jnp.float32), _NEG)

    order = jnp.argsort(-s, stable=True)
    b = boxes[order]
    v = valid[order]

    if _use_pallas():
        from .pallas.nms_kernel import nms_keep_pallas
        keep = nms_keep_pallas(b, v, float(iou_threshold))
        return jnp.zeros((k,), dtype=bool).at[order].set(keep)

    iou = pairwise_iou(b, b)
    row = jnp.arange(k)[:, None]
    col = jnp.arange(k)[None, :]
    # j (earlier, higher score) can suppress i
    suppress = (iou > iou_threshold) & (col < row) & v[None, :] & v[:, None]

    def body(state):
        keep, _ = state
        new_keep = v & ~jnp.any(suppress & keep[None, :], axis=1)
        return new_keep, keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    keep0 = v
    keep, _ = jax.lax.while_loop(cond, body, (body((keep0, ~keep0))[0], keep0))

    # scatter back to original order
    out = jnp.zeros((k,), dtype=bool).at[order].set(keep)
    return out


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-offset batched NMS (torchvision coordinates trick, used by the
    reference via detectron2/layers/nms.py:9-21): boxes of different ``idxs``
    never suppress each other. Implemented directly in the IoU mask instead
    of coordinate offsets — exact, and free of the max-coordinate hazard."""
    k = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    s = jnp.where(valid, scores.astype(jnp.float32), _NEG)

    order = jnp.argsort(-s, stable=True)
    b = boxes[order]
    v = valid[order]
    c = idxs[order]

    if _use_pallas():
        from .pallas.nms_kernel import nms_keep_pallas
        keep = nms_keep_pallas(b, v, float(iou_threshold), classes_sorted=c)
        return jnp.zeros((k,), dtype=bool).at[order].set(keep)

    iou = pairwise_iou(b, b)
    row = jnp.arange(k)[:, None]
    col = jnp.arange(k)[None, :]
    same_class = c[:, None] == c[None, :]
    suppress = (iou > iou_threshold) & (col < row) & same_class & v[None, :] & v[:, None]

    def body(state):
        keep, _ = state
        new_keep = v & ~jnp.any(suppress & keep[None, :], axis=1)
        return new_keep, keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    keep0 = v
    keep, _ = jax.lax.while_loop(cond, body, (body((keep0, ~keep0))[0], keep0))
    return jnp.zeros((k,), dtype=bool).at[order].set(keep)
