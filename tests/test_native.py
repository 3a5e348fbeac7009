"""Native fastvis extension: builds with the system compiler and matches the
numpy reference implementation exactly."""

import numpy as np
import pytest

from densepose_tpu.native import get_lib, resample_instance_native
from densepose_tpu.visualizer import _resize_bilinear_np

RNG = np.random.RandomState(11)


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
@pytest.mark.parametrize("in_hw,out_hw,kc", [
    ((112, 112), (200, 150), 2),
    ((56, 56), (37, 81), 15),
    ((112, 112), (112, 112), 2),
    ((112, 112), (13, 7), 2),
])
def test_native_matches_numpy(in_hw, out_hw, kc):
    h, w = in_hw
    oh, ow = out_hw
    coarse = RNG.randn(h, w, kc).astype(np.float32)
    fine = RNG.randn(h, w, 25).astype(np.float32)
    u = RNG.rand(h, w, 25).astype(np.float32)
    v = RNG.rand(h, w, 25).astype(np.float32)

    labels_n, uv_n = resample_instance_native(coarse, fine, u, v, oh, ow)

    # numpy reference (same math as visualizer fallback)
    coarse_r = _resize_bilinear_np(coarse, (oh, ow))
    fine_r = _resize_bilinear_np(fine, (oh, ow))
    fg = coarse_r.argmax(-1) > 0
    labels = fine_r.argmax(-1) * fg
    u_r = _resize_bilinear_np(u, (oh, ow))
    v_r = _resize_bilinear_np(v, (oh, ow))
    lab = labels[..., None]
    u_sel = np.take_along_axis(u_r, lab, axis=-1)[..., 0]
    v_sel = np.take_along_axis(v_r, lab, axis=-1)[..., 0]
    uv = np.stack([np.where(labels > 0, u_sel, 0.0),
                   np.where(labels > 0, v_sel, 0.0)]).astype(np.float32)

    # tie-breaking on float-equal argmax can differ at ~1e-7 crossings; allow
    # a tiny fraction of pixels to disagree on the label
    mismatch = (labels_n != labels).mean()
    assert mismatch < 2e-3, mismatch
    same = labels_n == labels
    np.testing.assert_allclose(uv_n[:, same], uv[:, same], atol=2e-5)


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
def test_native_is_used_by_visualizer():
    from densepose_tpu.visualizer import resample_fine_and_uv
    coarse = RNG.randn(56, 56, 2).astype(np.float32)
    fine = RNG.randn(56, 56, 25).astype(np.float32)
    u = RNG.rand(56, 56, 25).astype(np.float32)
    v = RNG.rand(56, 56, 25).astype(np.float32)
    labels, uv = resample_fine_and_uv(coarse, fine, u, v, (3, 4, 40, 30))
    assert labels.shape == (30, 40)
    assert uv.shape == (2, 30, 40)
