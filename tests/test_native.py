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


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
@pytest.mark.parametrize("need_uv", [True, False])
def test_native_chw_matches_hwc(need_uv):
    """The CHW kernel (consumes predictor NCHW slices with no transpose)
    computes the identical result to the HWC kernel."""
    from densepose_tpu.native import resample_instance_native_chw
    coarse = RNG.randn(112, 112, 2).astype(np.float32)
    fine = RNG.randn(112, 112, 25).astype(np.float32)
    u = RNG.rand(112, 112, 25).astype(np.float32)
    v = RNG.rand(112, 112, 25).astype(np.float32)
    labels_h, uv_h = resample_instance_native(coarse, fine, u, v, 173, 149)
    chw = lambda a: np.ascontiguousarray(a.transpose(2, 0, 1))
    got = resample_instance_native_chw(
        chw(coarse), chw(fine),
        chw(u) if need_uv else None, chw(v) if need_uv else None,
        173, 149, need_uv=need_uv)
    assert got is not None
    labels_c, uv_c = got
    np.testing.assert_array_equal(labels_c, labels_h)
    if need_uv:
        np.testing.assert_array_equal(uv_c, uv_h)
    else:
        assert uv_c is None


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
def test_native_blend_matches_numpy_chain():
    """blend_overlay (colormap+mask+alpha in one C pass) is byte-identical
    to the numpy fallback chain in MatrixVisualizer.visualize — including
    the reference's 1-LSB background darkening artifact."""
    import cv2
    from densepose_tpu.visualizer import MatrixVisualizer

    h, w = 87, 61
    img_a = (RNG.rand(120, 160, 3) * 255).astype(np.uint8)
    img_b = img_a.copy()
    matrix = RNG.randint(0, 25, (h, w)).astype(np.uint8)
    mask = (RNG.rand(h, w) > 0.4).astype(np.uint8)
    bbox = (13, 9, w, h)

    mv = MatrixVisualizer(val_scale=255 / 24.0, alpha=0.7)
    ok = __import__("densepose_tpu.native", fromlist=["blend_overlay_native"]
                    ).blend_overlay_native(
        img_a[9:9 + h, 13:13 + w, :], matrix, mask,
        mv._cmap_table, mv._blend_lut)
    assert ok, "native blend unavailable despite compiler present"

    # numpy chain (the in-function fallback, replicated)
    scaled = (matrix.astype(np.float32) * mv.val_scale).clip(0, 255).astype(np.uint8)
    vis = cv2.applyColorMap(scaled, mv.cmap)
    roi = img_b[9:9 + h, 13:13 + w, :]
    bg = mask == 0
    vis[bg] = roi[bg]
    img_b[9:9 + h, 13:13 + w, :] = mv._blend_lut[roi, vis]

    np.testing.assert_array_equal(img_a, img_b)


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
@pytest.mark.parametrize("keep_bg", [True, False])
def test_blend_labels_grid_fused_byte_parity(keep_bg):
    """The fused device-postprocess fine-segm path (blend_labels_grid) is
    byte-identical to the unfused extractor + MatrixVisualizer chain, across
    fractional boxes, a degenerate (w<1) box, a 1px box, and an
    edge-touching box."""
    pytest.importorskip("cv2")
    from densepose_tpu.visualizer import End2EndVisualizer

    rng = np.random.RandomState(3)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    boxes = np.array([
        [10.7, 20.3, 110.2, 180.9],   # fractional
        [50.0, 5.0, 51.0, 200.0],     # 1px wide
        [200.5, 100.5, 200.9, 140.0], # degenerate: int(w)=0 -> skipped
        [250.0, 150.0, 320.0, 240.0], # touches right/bottom edge
        [0.0, 0.0, 40.0, 40.0],       # touches origin
    ], dtype=np.float32)
    n = len(boxes)
    grids = rng.randint(0, 25, size=(n, 112, 112)).astype(np.uint8)
    outputs = {"num_instances": n, "pred_boxes": boxes,
               "pred_densepose_labels": grids}

    vis = End2EndVisualizer(alpha=0.7, keep_bg=keep_bg, mode="fine_segm")
    a, b = img.copy(), img.copy()
    fused = vis._visualize_labels_fused(a, outputs)
    assert fused is not None, "fused path unexpectedly declined"
    data = vis.extractor(outputs, need_uv=False)
    ref = vis.visualizer.visualize(b, data)
    np.testing.assert_array_equal(fused, ref)

    # out-of-frame box -> fused path declines BEFORE touching any pixel
    bad = dict(outputs)
    bad["pred_boxes"] = np.array([[-5.0, 10.0, 50.0, 60.0]], np.float32)
    bad["num_instances"] = 1
    c = img.copy()
    assert vis._visualize_labels_fused(c, bad) is None
    np.testing.assert_array_equal(c, img)


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
@pytest.mark.parametrize("keep_bg", [True, False])
def test_resample_blend_fused_byte_parity(keep_bg):
    """The fused raw-maps fine-segm path (resample_blend_chw) is
    byte-identical to the unfused resample_instance_chw + blend_overlay
    chain driven through extractor + MatrixVisualizer."""
    pytest.importorskip("cv2")
    from densepose_tpu.visualizer import End2EndVisualizer

    rng = np.random.RandomState(7)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    boxes = np.array([
        [10.7, 20.3, 110.2, 180.9],
        [50.0, 5.0, 51.0, 200.0],
        [200.5, 100.5, 200.9, 140.0],  # degenerate -> skipped
        [250.0, 150.0, 320.0, 240.0],
    ], dtype=np.float32)
    n = len(boxes)  # <= 4 so the fused path engages on any host
    outputs = {
        "num_instances": n,
        "pred_boxes": boxes,
        "pred_densepose_coarse_segm": rng.randn(n, 2, 112, 112).astype(np.float32),
        "pred_densepose_fine_segm": rng.randn(n, 25, 112, 112).astype(np.float32),
    }

    vis = End2EndVisualizer(alpha=0.7, keep_bg=keep_bg, mode="fine_segm")
    a, b = img.copy(), img.copy()
    fused = vis._visualize_labels_fused(a, outputs)
    assert fused is not None, "fused raw path unexpectedly declined"
    data = vis.extractor(outputs, need_uv=False)
    ref = vis.visualizer.visualize(b, data)
    np.testing.assert_array_equal(fused, ref)


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
@pytest.mark.parametrize("mode", ["u", "v"])
def test_resample_blend_uv_fused_byte_parity(mode):
    """The fused raw-maps U/V overlay path is byte-identical to the unfused
    extractor(need_uv) + DensePoseResultsU/VVisualizer chain."""
    pytest.importorskip("cv2")
    from densepose_tpu.visualizer import End2EndVisualizer

    rng = np.random.RandomState(13)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    boxes = np.array([
        [10.7, 20.3, 110.2, 180.9],
        [150.0, 30.0, 310.0, 230.0],
        [0.0, 0.0, 40.0, 40.0],
    ], dtype=np.float32)
    n = len(boxes)
    outputs = {
        "num_instances": n,
        "pred_boxes": boxes,
        "pred_densepose_coarse_segm": rng.randn(n, 2, 112, 112).astype(np.float32),
        "pred_densepose_fine_segm": rng.randn(n, 25, 112, 112).astype(np.float32),
        # a little out-of-range to exercise the clip
        "pred_densepose_u": (rng.rand(n, 25, 112, 112).astype(np.float32)
                             * 1.2 - 0.1),
        "pred_densepose_v": (rng.rand(n, 25, 112, 112).astype(np.float32)
                             * 1.2 - 0.1),
    }

    vis = End2EndVisualizer(alpha=0.7, keep_bg=True, mode=mode)
    a, b = img.copy(), img.copy()
    fused = vis._visualize_labels_fused(a, outputs)
    assert fused is not None, "fused uv path unexpectedly declined"
    data = vis.extractor(outputs, need_uv=True)
    ref = vis.visualizer.visualize(b, data)
    np.testing.assert_array_equal(fused, ref)
