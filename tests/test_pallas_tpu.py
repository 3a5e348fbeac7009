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
