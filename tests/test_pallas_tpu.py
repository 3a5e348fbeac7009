"""Pallas kernel tests — require a real TPU (Mosaic); skipped on the CPU test
mesh. Run manually on TPU hardware:
    JAX_PLATFORMS='' python -m pytest tests/test_pallas_tpu.py --no-header -q
(They also run in the driver's bench environment.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_plat = jax.devices()[0].platform.lower()
pytestmark = pytest.mark.skipif(
    "tpu" not in _plat and _plat != "axon",
    reason="Pallas TPU kernels need TPU hardware")


def test_pallas_nms_matches_greedy():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_ops import nms_np
    from densepose_tpu.ops.pallas.nms_kernel import nms_keep_pallas

    rng = np.random.RandomState(0)
    for k, thresh in [(64, 0.5), (256, 0.7)]:
        ctr = rng.rand(k, 2).astype(np.float32) * 80
        wh = rng.rand(k, 2).astype(np.float32) * 40 + 1
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
        scores = rng.rand(k).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        keep = np.asarray(nms_keep_pallas(jnp.asarray(boxes[order]),
                                          jnp.ones(k, bool), thresh))
        got = set(order[np.nonzero(keep)[0]].tolist())
        want = set(nms_np(boxes, scores, thresh).tolist())
        assert got == want


def test_pallas_nms_valid_mask():
    from densepose_tpu.ops.pallas.nms_kernel import nms_keep_pallas
    boxes = jnp.asarray(np.tile([[0, 0, 10, 10]], (16, 1)).astype(np.float32))
    valid = jnp.asarray([True] * 8 + [False] * 8)
    keep = np.asarray(nms_keep_pallas(boxes, valid, 0.5))
    assert keep[0] and not keep[1:8].any() and not keep[8:].any()


def test_pallas_classed_nms_matches_xla_fixpoint():
    """Class-aware Pallas NMS == the XLA fixed-point batched_nms_mask (which
    is golden-tested against numpy greedy NMS per class in test_ops.py)."""
    from densepose_tpu.ops import nms as nms_mod
    from densepose_tpu.ops.pallas.nms_kernel import nms_keep_pallas

    rng = np.random.RandomState(1)
    k = 256
    ctr = rng.rand(k, 2).astype(np.float32) * 60
    wh = rng.rand(k, 2).astype(np.float32) * 30 + 1
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
    scores = rng.rand(k).astype(np.float32)
    classes = rng.randint(0, 3, size=k).astype(np.int32)
    valid = rng.rand(k) > 0.1

    order = np.argsort(-scores, kind="stable")
    keep_sorted = np.asarray(nms_keep_pallas(
        jnp.asarray(boxes[order]), jnp.asarray(valid[order]), 0.5,
        classes_sorted=jnp.asarray(classes[order])))
    got = np.zeros(k, bool)
    got[order] = keep_sorted

    # force the XLA path for the oracle
    old = nms_mod._PALLAS_OK
    nms_mod._PALLAS_OK = False
    try:
        want = np.asarray(nms_mod.batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            jnp.asarray(valid), 0.5))
    finally:
        nms_mod._PALLAS_OK = old
    np.testing.assert_array_equal(got, want)


def test_merged_deconv_predictor_matches_separate_heads_on_tpu():
    """The TPU-only merged chart-predictor path (one concatenated
    conv_transpose + shift-add upsample, models/roi_heads.py) must match
    running the four deconv heads separately with the gather resize."""
    from densepose_tpu.config import load_config
    from densepose_tpu.models import roi_heads as RH
    from densepose_tpu.ops import conv_transpose2d, resize_bilinear
    from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                    torch_state_to_jax)

    cfg = load_config(
        "/root/reference/configs/densepose_rcnn_R_50_FPN_s1x.yaml")
    spec = RH.densepose_predictor_spec(cfg)
    p = torch_state_to_jax(random_torch_state(spec, seed=0), spec)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    x = jnp.asarray(np.random.RandomState(1).randn(3, 28, 28, 512)
                    .astype(np.float32))

    out = jax.jit(lambda: RH.densepose_predictor_forward(p, x, cfg))()

    prefix = "roi_heads.densepose_predictor"
    names = {"coarse_segm": "ann_index_lowres", "fine_segm": "index_uv_lowres",
             "u": "u_lowres", "v": "v_lowres"}

    def separate(name):
        y = conv_transpose2d(x, p[f"{prefix}.{name}.weight"],
                             p[f"{prefix}.{name}.bias"], stride=2, padding=1,
                             kernel_size=4)
        return resize_bilinear(y, (112, 112), scale=(2.0, 2.0))

    for key, name in names.items():
        want = np.asarray(jax.jit(lambda name=name: separate(name))())
        np.testing.assert_allclose(np.asarray(out[key]), want,
                                   atol=2e-4, rtol=2e-3)


def test_pallas_fused_pooler_matches_matmul_pooler():
    """roi_align_multilevel_fused (kept-for-reference Pallas schedule) vs the
    default separable-matmul pooler — regression coverage so the kernel's
    parity claim stays verified (ADVICE r1)."""
    from densepose_tpu.ops.pallas.roi_align_kernel import roi_align_multilevel_fused
    from densepose_tpu.ops.roi_align import roi_align_multilevel_matmul

    rng = np.random.RandomState(3)
    # bf16 features (the serving dtype): on TPU, f32 MXU dots run at bf16
    # operand precision anyway, so an f32 comparison between two different
    # schedules would only measure that truncation, not kernel correctness
    feats = [jnp.asarray(rng.randn(64 // (2 ** i), 96 // (2 ** i), 256)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for i in range(4)]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    m = 64
    xy = rng.rand(m, 2).astype(np.float32) * 200
    wh = rng.rand(m, 2).astype(np.float32) * 120 + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
    levels = jnp.asarray(rng.randint(0, 4, size=m).astype(np.int32))

    want = np.asarray(jax.jit(lambda: roi_align_multilevel_matmul(
        feats, boxes, levels, scales, (7, 7), 2, True))(), np.float32)
    got = np.asarray(jax.jit(lambda: roi_align_multilevel_fused(
        feats, boxes, levels, scales, (7, 7), 2, True))(), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_pallas_sparse_pooler_matches_matmul_pooler():
    """roi_align_multilevel_sparse (skip-flag schedule) vs the default
    separable-matmul pooler: exact up to float reassociation, independent of
    its internal (level, x) sort."""
    from densepose_tpu.ops.pallas.roi_align_kernel import roi_align_multilevel_sparse
    from densepose_tpu.ops.roi_align import roi_align_multilevel_matmul

    rng = np.random.RandomState(7)
    # bf16 features — see the fused-pooler test note on f32 MXU precision
    feats = [jnp.asarray(rng.randn(96 // (2 ** i), 168 // (2 ** i), 256)
                         .astype(np.float32)).astype(jnp.bfloat16)
             for i in range(4)]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    m = 200
    xy = rng.rand(m, 2).astype(np.float32) * 300
    wh = rng.rand(m, 2).astype(np.float32) * 150 + 4
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
    levels = jnp.asarray(rng.randint(0, 4, size=m).astype(np.int32))

    want = np.asarray(jax.jit(lambda: roi_align_multilevel_matmul(
        feats, boxes, levels, scales, (7, 7), 2, True))(), np.float32)
    got = np.asarray(jax.jit(lambda: roi_align_multilevel_sparse(
        feats, boxes, levels, scales, (7, 7), 2, True))(), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_smallc_resize_matches_on_tpu():
    """resize_bilinear_smallc (preprocess routing) vs the gather
    formulation, on the actual chip in f32."""
    from densepose_tpu.ops.resize import resize_bilinear, resize_bilinear_smallc
    x = jnp.asarray((np.random.RandomState(0).rand(96, 160, 3) * 255)
                    .round().astype(np.float32))
    k = min(800 / 96, 1333 / 160)
    a = np.asarray(jax.jit(
        lambda: resize_bilinear(x, (100, 166), scale=(k, k)))())
    b = np.asarray(jax.jit(
        lambda: resize_bilinear_smallc(x, (100, 166), scale=(k, k)))())
    np.testing.assert_array_equal(a, b)
