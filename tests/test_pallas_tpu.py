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
