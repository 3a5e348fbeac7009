"""Tests for the completeness kit: matcher, subsampling, mask/keypoint heads,
rotated boxes + rotated NMS, registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densepose_tpu.models.matcher import match_quality, subsample_labels
from densepose_tpu.ops.rotated import (
    apply_deltas_linear, apply_deltas_rotated, nms_rotated_mask,
    rotated_pairwise_iou, _box_corners,
)
from densepose_tpu.utils.registry import Registry, locate

RNG = np.random.RandomState(5)


# ---------------------------------------------------------------------------
# matcher / sampling
# ---------------------------------------------------------------------------

def test_match_quality_thresholds():
    iou = jnp.asarray([[0.9, 0.4, 0.1, 0.75],
                       [0.2, 0.6, 0.05, 0.8]])
    matches, labels = match_quality(iou, [0.3, 0.7], [0, -1, 1])
    np.testing.assert_array_equal(np.asarray(matches), [0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0, 1])


def test_match_low_quality_promotion():
    # gt 1's best match (0.25) is below fg threshold but gets promoted
    iou = jnp.asarray([[0.9, 0.1], [0.2, 0.25]])
    _, labels = match_quality(iou, [0.3, 0.7], [0, -1, 1],
                              allow_low_quality_matches=True)
    assert int(labels[1]) == 1


def test_subsample_labels_counts():
    labels = jnp.asarray([1] * 20 + [0] * 100 + [-1] * 10)
    pos, neg = subsample_labels(labels, 64, 0.25, bg_label=0,
                                rng_key=jax.random.PRNGKey(0))
    assert int(pos.sum()) == 16  # min(64*0.25, 20)
    assert int(neg.sum()) == 48
    assert not bool((pos & neg).any())
    assert not bool(pos[120:].any()) and not bool(neg[120:].any())


# ---------------------------------------------------------------------------
# rotated boxes
# ---------------------------------------------------------------------------

def _iou_monte_carlo(b1, b2, n=400):
    """Grid-rasterized IoU reference for rotated boxes (cx, cy, w, h, deg)."""
    def inside(b, pts):
        cx, cy, w, h, a = b
        t = -np.deg2rad(a)
        x = (pts[:, 0] - cx) * np.cos(t) - (pts[:, 1] - cy) * np.sin(t)
        y = (pts[:, 0] - cx) * np.sin(t) + (pts[:, 1] - cy) * np.cos(t)
        return (np.abs(x) <= w / 2) & (np.abs(y) <= h / 2)

    lo = min(b1[0] - b1[2] - b1[3], b2[0] - b2[2] - b2[3]) - 1
    hi = max(b1[0] + b1[2] + b1[3], b2[0] + b2[2] + b2[3]) + 1
    xs = np.linspace(lo, hi, n)
    g = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    m1, m2 = inside(b1, g), inside(b2, g)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    return inter / union if union else 0.0


@pytest.mark.parametrize("b1,b2", [
    ([0, 0, 4, 2, 0], [1, 0.5, 4, 2, 0]),          # axis-aligned overlap
    ([0, 0, 2, 2, 0], [0, 0, 2, 2, 45]),           # square vs its 45 deg twin
    ([0, 0, 6, 2, 30], [1, 1, 4, 3, -20]),         # generic
    ([0, 0, 2, 2, 0], [5, 5, 2, 2, 10]),           # disjoint
    ([0, 0, 4, 2, 90], [0, 0, 2, 4, 0]),           # 90 deg == swapped w/h
])
def test_rotated_iou(b1, b2):
    got = float(rotated_pairwise_iou(jnp.asarray([b1], jnp.float32),
                                     jnp.asarray([b2], jnp.float32))[0, 0])
    want = _iou_monte_carlo(np.array(b1, float), np.array(b2, float))
    assert abs(got - want) < 0.02, (got, want)


def test_rotated_nms_suppresses_duplicates():
    boxes = jnp.asarray([
        [0, 0, 4, 2, 10],
        [0.1, 0.0, 4, 2, 12],   # near-duplicate of 0
        [10, 10, 4, 2, 45],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated_mask(boxes, scores, jnp.ones(3, bool), 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_apply_deltas_rotated_identity():
    boxes = jnp.asarray([[10.0, 20.0, 4.0, 8.0, 30.0]])
    out = apply_deltas_rotated(jnp.zeros((1, 5)), boxes, (1, 1, 1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(boxes), atol=1e-5)


def test_apply_deltas_linear():
    boxes = jnp.asarray([[0.0, 0.0, 4.0, 4.0]])   # ctr (2,2), stride 4
    deltas = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])  # 2 px each direction
    out = apply_deltas_linear(deltas, boxes)
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 4, 4]], atol=1e-5)


# ---------------------------------------------------------------------------
# mask / keypoint heads
# ---------------------------------------------------------------------------

def test_mask_and_keypoint_heads_run():
    from densepose_tpu.config import get_cfg
    from densepose_tpu.checkpoint.transform import random_torch_state, torch_state_to_jax
    from densepose_tpu.models.mask_head import mask_head_forward, mask_head_spec
    from densepose_tpu.models.keypoint_head import (
        heatmaps_to_keypoints_np, keypoint_head_forward, keypoint_head_spec)

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 2
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (32, 32)
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 7

    spec = {}
    spec.update(mask_head_spec(cfg))
    spec.update(keypoint_head_spec(cfg))
    params = {k: jnp.asarray(v) for k, v in
              torch_state_to_jax(random_torch_state(spec, 0), spec).items()}

    feats = {"p2": jnp.asarray(RNG.randn(32, 32, 16).astype(np.float32)),
             "p3": jnp.asarray(RNG.randn(16, 16, 16).astype(np.float32))}
    boxes = jnp.asarray([[4.0, 4.0, 60.0, 60.0], [10.0, 10.0, 40.0, 30.0]])
    classes = jnp.asarray([1, 2], jnp.int32)
    strides = {"p2": 4, "p3": 8}

    masks = mask_head_forward(params, feats, boxes, classes, cfg, strides)
    assert masks.shape == (2, 14, 14)
    assert bool(((np.asarray(masks) >= 0) & (np.asarray(masks) <= 1)).all())

    heat = keypoint_head_forward(params, feats, boxes, cfg, strides)
    assert heat.shape == (2, 28, 28, 17)
    kps = heatmaps_to_keypoints_np(
        np.transpose(np.asarray(heat), (0, 3, 1, 2)), np.asarray(boxes))
    assert kps.shape == (2, 17, 4)
    # keypoint coordinates land inside their boxes
    assert (kps[0, :, 0] >= 4).all() and (kps[0, :, 0] <= 60).all()


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def test_registry():
    reg = Registry("test")

    @reg.register
    def thing():
        return 1

    reg.register("other", lambda: 2)
    assert reg.get("thing")() == 1
    assert reg.get("other")() == 2
    assert "thing" in reg
    with pytest.raises(KeyError):
        reg.get("missing")


def test_locate():
    fn = locate("densepose_tpu.ops.nms.nms_mask")
    from densepose_tpu.ops.nms import nms_mask
    assert fn is nms_mask


def test_bicubic_resize_matches_torch():
    """_resize_bicubic_np == torch F.interpolate(mode='bicubic',
    align_corners=False), the kernel heatmaps_to_keypoints uses
    (structures.py:34-104)."""
    import torch
    import torch.nn.functional as F

    from densepose_tpu.models.keypoint_head import _resize_bicubic_np

    rng = np.random.RandomState(0)
    for (hi, wi), (ho, wo) in [((14, 14), (37, 22)), ((8, 12), (3, 5)),
                               ((14, 14), (56, 56))]:
        x = rng.randn(hi, wi, 3).astype(np.float32)
        got = _resize_bicubic_np(x, (ho, wo))
        want = F.interpolate(
            torch.from_numpy(x.transpose(2, 0, 1))[None], size=(ho, wo),
            mode="bicubic", align_corners=False)[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_uv_visualizer_renders_gradient():
    """U-channel overlay must render a gradient, not a saturated binary mask
    (regression: double 255 scaling collapsed it to 2 colors)."""
    import pytest
    pytest.importorskip("cv2")
    from densepose_tpu.visualizer import DensePoseResultsUVisualizer

    h = w = 32
    u = np.tile(np.linspace(0, 1, w, dtype=np.float32), (h, 1))
    res = {"labels": np.ones((h, w), np.int64),
           "uv": np.stack([u, np.zeros_like(u)])}
    img = np.zeros((h, w, 3), np.uint8)
    vis = DensePoseResultsUVisualizer(alpha=1.0)
    out = vis.visualize(img, ([res], np.array([[0, 0, w, h]], np.float32)))
    colors = np.unique(out.reshape(-1, 3), axis=0)
    assert len(colors) > 16, f"only {len(colors)} colors — gradient collapsed"


# ---------------------------------------------------------------------------
# vestigial-parity extras: OneDrive links, RetinaNet FPN backbone
# ---------------------------------------------------------------------------

def test_onedrive_share_link_rewrite():
    """1drv.ms share links rewrite to the api.onedrive.com direct-download
    form (iopath OneDrivePathHandler semantics: base64url, u! prefix, no
    padding)."""
    from densepose_tpu.utils.file_io import onedrive_download_url
    link = "https://1drv.ms/u/s!AmkRs-xASEQ8a1Zb"
    url = onedrive_download_url(link)
    assert url.startswith("https://api.onedrive.com/v1.0/shares/u!")
    assert url.endswith("/root/content")
    import base64
    b64 = url[len("https://api.onedrive.com/v1.0/shares/u!"):-len("/root/content")]
    pad = "=" * (-len(b64) % 4)
    assert base64.urlsafe_b64decode(b64 + pad).decode() == link


def test_retinanet_fpn_backbone():
    """build_retinanet_resnet_fpn_backbone (vestigial in the reference,
    fpn.py:246-268): p3-p5 from the shared FPN pass, p6 = conv3x3/2(res5),
    p7 = conv3x3/2(relu(p6)) — p6/p7 checked against torch convs fed the
    same res5 map."""
    import torch
    import torch.nn.functional as F
    from densepose_tpu.config import get_cfg
    from densepose_tpu.checkpoint.transform import torch_state_to_jax
    from densepose_tpu.models.backbones import backbone_fns
    from densepose_tpu.models.resnet import resnet_forward

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.NUM_GROUPS = 1
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 16

    spec_fn, fwd_fn, strides_fn = backbone_fns(cfg)
    spec = spec_fn(cfg)
    state = {}
    for name, ps in spec.items():
        if name.endswith("running_var"):
            state[name] = (RNG.rand(*ps.shape) * 0.5 + 0.5).astype(np.float32)
        else:
            state[name] = (RNG.randn(*ps.shape) * 0.1).astype(np.float32)
    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(state, spec, fold_bn=True).items()}

    x = jnp.asarray(RNG.rand(64, 96, 3).astype(np.float32))
    feats = fwd_fn(params, x, cfg)
    assert sorted(feats) == ["p3", "p4", "p5", "p6", "p7"]
    strides = strides_fn(cfg)
    assert strides == {"p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
    for k in ("p3", "p4", "p5"):
        s = strides[k]
        assert feats[k].shape == (64 // s, 96 // s, 16), (k, feats[k].shape)
    # p6/p7 shapes are conv ceil-halvings of res5, checked via the twin below

    res5 = resnet_forward(params, x, cfg, prefix="backbone.bottom_up",
                          out_features=("res5",))["res5"]
    r5 = torch.from_numpy(np.asarray(res5)).permute(2, 0, 1)[None]
    w6 = torch.from_numpy(state["backbone.top_block.p6.weight"])
    b6 = torch.from_numpy(state["backbone.top_block.p6.bias"])
    w7 = torch.from_numpy(state["backbone.top_block.p7.weight"])
    b7 = torch.from_numpy(state["backbone.top_block.p7.bias"])
    p6_t = F.conv2d(r5, w6, b6, stride=2, padding=1)
    p7_t = F.conv2d(F.relu(p6_t), w7, b7, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(feats["p6"]), p6_t[0].permute(1, 2, 0).numpy(),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(feats["p7"]), p7_t[0].permute(1, 2, 0).numpy(),
        atol=1e-5, rtol=1e-5)
