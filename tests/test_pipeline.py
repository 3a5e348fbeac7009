"""Static-shape pipeline stages vs a dynamic-shape numpy re-derivation of the
reference's selection logic (find_top_rpn_proposals / fast_rcnn_inference).
Verifies that the fixed-size + validity-mask re-expression selects exactly
the same boxes in the same order."""

import numpy as np

import jax.numpy as jnp

from densepose_tpu import ops
from densepose_tpu.ops.nms import nms_mask
from tests.reference_ops import nms_np

RNG = np.random.RandomState(7)
NEG = -1e30


def dynamic_proposal_selection(boxes_lvls, scores_lvls, wh, nms_thresh, pre_topk, post_topk):
    """The reference algorithm (proposal_utils.py:19-134) with dynamic shapes,
    in numpy: per-level topk -> concat -> clip (swapped W/H as the reference
    passes (W,H) into an (H,W)-indexed clip) -> per-level NMS -> global topk."""
    all_boxes, all_scores, all_lvl = [], [], []
    for lvl, (b, s) in enumerate(zip(boxes_lvls, scores_lvls)):
        k = min(len(s), pre_topk)
        idx = np.argsort(-s, kind="stable")[:k]
        all_boxes.append(b[idx])
        all_scores.append(s[idx])
        all_lvl.append(np.full(k, lvl))
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    lvls = np.concatenate(all_lvl)

    w, h = wh
    # clip_boxes((W,H)) clamps x to H and y to W (reference quirk)
    boxes = boxes.copy()
    boxes[:, 0] = boxes[:, 0].clip(0, h)
    boxes[:, 1] = boxes[:, 1].clip(0, w)
    boxes[:, 2] = boxes[:, 2].clip(0, h)
    boxes[:, 3] = boxes[:, 3].clip(0, w)

    keep_all = []
    for lvl in np.unique(lvls):
        sel = np.nonzero(lvls == lvl)[0]
        kept = sel[nms_np(boxes[sel], scores[sel], nms_thresh)]
        keep_all.append(kept)
    keep = np.concatenate(keep_all)
    order = keep[np.argsort(-scores[keep], kind="stable")][:post_topk]
    return boxes[order], scores[order]


def test_rpn_static_selection_matches_dynamic():
    """Exercise the exact selection math used in models/rpn.py (topk + swapped
    clip + vmapped per-level NMS + global topk) against the dynamic version."""
    pre_topk, post_topk, thresh = 20, 15, 0.7
    wh = (80.0, 60.0)  # (W, H)
    lvl_sizes = [50, 30, 8]
    boxes_lvls, scores_lvls = [], []
    for n in lvl_sizes:
        ctr = RNG.rand(n, 2) * 70
        half = RNG.rand(n, 2) * 15 + 1
        boxes_lvls.append(np.concatenate([ctr - half, ctr + half], 1).astype(np.float32))
        scores_lvls.append(RNG.randn(n).astype(np.float32))

    want_boxes, want_scores = dynamic_proposal_selection(
        boxes_lvls, scores_lvls, wh, thresh, pre_topk, post_topk)

    # static-shape version (mirrors models/rpn.py internals)
    import jax
    max_k = min(max(lvl_sizes), pre_topk)
    sb, ss, sv = [], [], []
    for b, s in zip(boxes_lvls, scores_lvls):
        k = min(len(s), pre_topk)
        top_s, top_i = jax.lax.top_k(jnp.asarray(s), k)
        bb = jnp.asarray(b)[top_i]
        pad = max_k - k
        if pad:
            bb = jnp.concatenate([bb, jnp.zeros((pad, 4), jnp.float32)])
            top_s = jnp.concatenate([top_s, jnp.full((pad,), NEG, jnp.float32)])
        sb.append(bb)
        ss.append(top_s)
        sv.append(jnp.arange(max_k) < k)
    boxes = jnp.stack(sb)
    scores = jnp.stack(ss)
    valid = jnp.stack(sv)
    boxes = ops.clip_boxes_wh_swapped(boxes, wh)
    valid = valid & ops.nonempty_boxes(boxes, 0.0)
    keep = jax.vmap(nms_mask, in_axes=(0, 0, 0, None))(boxes, scores, valid, thresh)
    flat_scores = jnp.where(keep & valid, scores, NEG).reshape(-1)
    out_s, out_i = jax.lax.top_k(flat_scores, post_topk)
    out_b = boxes.reshape(-1, 4)[out_i]
    got_valid = np.asarray(out_s) > NEG / 2

    n = got_valid.sum()
    assert n == len(want_scores), (n, len(want_scores))
    np.testing.assert_allclose(np.asarray(out_s)[:n], want_scores, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b)[:n], want_boxes, rtol=1e-5, atol=1e-4)


def test_detection_stage_matches_dynamic():
    """fast_rcnn_inference selection (fast_rcnn.py:86-141), single class:
    score threshold -> NMS -> top-k, against a dynamic numpy version."""
    r, thresh_score, thresh_nms, topk = 60, 0.3, 0.5, 10
    ctr = RNG.rand(r, 2) * 100
    half = RNG.rand(r, 2) * 20 + 2
    boxes = np.concatenate([ctr - half, ctr + half], 1).astype(np.float32)
    scores = RNG.rand(r).astype(np.float32)

    # dynamic
    sel = np.nonzero(scores > thresh_score)[0]
    kept = sel[nms_np(boxes[sel], scores[sel], thresh_nms)][:topk]
    want_scores = scores[kept]

    # static (mirrors roi_heads.box_stage_forward)
    import jax
    valid = jnp.asarray(scores > thresh_score)
    keep = nms_mask(jnp.asarray(boxes), jnp.asarray(scores), valid, thresh_nms)
    masked = jnp.where(keep & valid, jnp.asarray(scores), NEG)
    out_s, out_i = jax.lax.top_k(masked, topk)
    got_valid = np.asarray(out_s) > NEG / 2
    n = got_valid.sum()
    assert n == len(want_scores)
    np.testing.assert_allclose(np.asarray(out_s)[:n], np.sort(want_scores)[::-1], rtol=1e-6)


def test_postprocess_box_rescale():
    """detector_postprocess semantics (postprocessing.py:11-61): scale by
    output/resized, clip to (H, W) correctly ordered."""
    boxes = jnp.asarray([[10.0, 20.0, 110.0, 220.0], [-5.0, -5.0, 1000.0, 1000.0]])
    h1, w1 = 400, 600      # resized (unpadded)
    h0, w0 = 800, 1200     # original
    scaled = boxes * jnp.asarray([w0 / w1, h0 / h1, w0 / w1, h0 / h1])
    clipped = ops.clip_boxes(scaled, (h0, w0))
    np.testing.assert_allclose(np.asarray(clipped[0]), [20, 40, 220, 440])
    np.testing.assert_allclose(np.asarray(clipped[1]), [0, 0, 1200, 800])
