"""Whole-pipeline golden parity: a tiny R50-FPN DensePose model evaluated by
(a) this framework's jitted static-shape pipeline and (b) a dynamic-shape
torch+numpy twin assembled here from first principles (torch convs, numpy
selection logic, the from-spec ROIAlign/NMS references). Same weights, same
image — detections and SIUV maps must agree.

This is the integration-level analogue of SURVEY.md section 4 item 2
(per-stage activations parity), catching seams the per-op tests can't:
flatten order into the box head, level-assignment boundaries, clip/selection
ordering, preprocess quantization.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from densepose_tpu.config import get_cfg
from densepose_tpu.checkpoint.transform import torch_state_to_jax
from densepose_tpu.models.rcnn import build_model
from tests.reference_ops import nms_np, roi_align_np

RNG = np.random.RandomState(123)


def tiny_cfg():
    cfg = get_cfg()
    m = cfg.MODEL
    m.BACKBONE.NAME = "build_resnet_fpn_backbone"
    m.RESNETS.DEPTH = 50
    m.RESNETS.STEM_OUT_CHANNELS = 8
    m.RESNETS.RES2_OUT_CHANNELS = 16
    m.RESNETS.NUM_GROUPS = 1
    m.RESNETS.WIDTH_PER_GROUP = 4
    m.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    m.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    m.FPN.OUT_CHANNELS = 16
    m.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    m.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    m.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    m.RPN.PRE_NMS_TOPK_TEST = 50
    m.RPN.POST_NMS_TOPK_TEST = 24
    m.ROI_HEADS.NAME = "DensePoseROIHeads"
    m.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    m.ROI_HEADS.NUM_CLASSES = 1
    m.ROI_HEADS.SCORE_THRESH_TEST = 0.3
    m.ROI_BOX_HEAD.NUM_FC = 2
    m.ROI_BOX_HEAD.FC_DIM = 32
    m.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    m.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    m.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlign"
    m.DENSEPOSE_ON = True
    m.ROI_DENSEPOSE_HEAD.NAME = "DensePoseV1ConvXHead"
    m.ROI_DENSEPOSE_HEAD.POOLER_TYPE = "ROIAlign"
    m.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 8
    m.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO = 2
    m.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    m.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 16
    m.ROI_DENSEPOSE_HEAD.NUM_COARSE_SEGM_CHANNELS = 2
    m.ROI_DENSEPOSE_HEAD.DECODER_ON = True
    m.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 16
    m.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 16
    m.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME = "DensePoseChartPredictor"
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TEST.DETECTIONS_PER_IMAGE = 6
    cfg.freeze()
    return cfg


def make_state(spec):
    state = {}
    for name, ps in spec.items():
        if name.endswith("running_var"):
            state[name] = (RNG.rand(*ps.shape) * 0.5 + 0.5).astype(np.float32)
        elif name.endswith(".norm.weight"):
            state[name] = (RNG.rand(*ps.shape) + 0.5).astype(np.float32)
        else:
            state[name] = (RNG.randn(*ps.shape) * 0.1).astype(np.float32)
    return state


# ---------------------------------------------------------------------------
# torch+numpy twin
# ---------------------------------------------------------------------------

def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def conv_bn(state, name, x, stride=1, pad=0, relu=False):
    w = t(state[f"{name}.weight"])
    y = F.conv2d(x, w, None, stride=stride, padding=pad)
    y = F.batch_norm(y, t(state[f"{name}.norm.running_mean"]),
                     t(state[f"{name}.norm.running_var"]),
                     t(state[f"{name}.norm.weight"]), t(state[f"{name}.norm.bias"]),
                     training=False, eps=1e-5)
    return F.relu(y) if relu else y


def conv_b(state, name, x, stride=1, pad=0, relu=False):
    y = F.conv2d(x, t(state[f"{name}.weight"]), t(state[f"{name}.bias"]),
                 stride=stride, padding=pad)
    return F.relu(y) if relu else y


def twin_backbone(state, x, cfg):
    p = "backbone.bottom_up"
    x = F.relu(conv_bn(state, f"{p}.stem.conv1", x, 2, 3))
    x = F.max_pool2d(x, 3, 2, 1)
    chans = [(8, 4, 16), (16, 8, 32), (32, 16, 64), (64, 32, 128)]
    blocks = [3, 4, 6, 3]
    outs = {}
    for si, ((cin, cb, cout), n) in enumerate(zip(chans, blocks)):
        stage = f"{p}.res{si + 2}"
        first_stride = 1 if si == 0 else 2
        for i in range(n):
            stride = first_stride if i == 0 else 1
            b_in = cin if i == 0 else cout
            name = f"{stage}.{i}"
            out = F.relu(conv_bn(state, f"{name}.conv1", x, stride))
            out = F.relu(conv_bn(state, f"{name}.conv2", out, 1, 1))
            out = conv_bn(state, f"{name}.conv3", out)
            sc = conv_bn(state, f"{name}.shortcut", x, stride) if b_in != cout else x
            x = F.relu(out + sc)
        outs[f"res{si + 2}"] = x

    # FPN
    feats = {}
    prev = None
    for f in ["res5", "res4", "res3", "res2"]:
        stage = int(f[3:])
        lat = conv_b(state, f"backbone.fpn_lateral{stage}", outs[f])
        if prev is not None:
            lat = lat + F.interpolate(prev, scale_factor=2.0, mode="nearest")
        prev = lat
        feats[f"p{stage}"] = conv_b(state, f"backbone.fpn_output{stage}", lat, 1, 1)
    feats["p6"] = F.max_pool2d(feats["p5"], 1, 2, 0)
    return feats


def grid_anchors_np(h, w, stride, size, ars, offset=0.0):
    anchors = []
    for ar in ars:
        ww = np.sqrt(size * size / ar)
        hh = ar * ww
        anchors.append([-ww / 2, -hh / 2, ww / 2, hh / 2])
    cell = np.asarray(anchors, np.float32)
    sx = np.arange(offset * stride, w * stride, stride, dtype=np.float32)
    sy = np.arange(offset * stride, h * stride, stride, dtype=np.float32)
    gy, gx = np.meshgrid(sy, sx, indexing="ij")
    shifts = np.stack([gx.ravel(), gy.ravel(), gx.ravel(), gy.ravel()], 1)
    return (shifts[:, None, :] + cell[None]).reshape(-1, 4)


def decode_np(deltas, boxes, weights=(1, 1, 1, 1)):
    import math
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / weights[0], deltas[:, 1] / weights[1]
    dw = np.minimum(deltas[:, 2] / weights[2], math.log(1000 / 16))
    dh = np.minimum(deltas[:, 3] / weights[3], math.log(1000 / 16))
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = np.exp(dw) * widths
    ph = np.exp(dh) * heights
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], 1)


def twin_forward(state, image_u8, cfg):
    # preprocess (defaults.py:76-89 + rcnn.py:156-181)
    h0, w0 = image_u8.shape[:2]
    k = min(cfg.INPUT.MIN_SIZE_TEST / min(h0, w0), cfg.INPUT.MAX_SIZE_TEST / max(h0, w0))
    img = t(image_u8).permute(2, 0, 1)[None]
    img = F.interpolate(img, scale_factor=k, mode="bilinear", align_corners=False)
    h1, w1 = img.shape[-2:]
    x = (img.float() - torch.tensor(cfg.MODEL.PIXEL_MEAN)[None, :, None, None])
    hp = int(np.ceil(h1 / 32) * 32)
    wp = int(np.ceil(w1 / 32) * 32)
    x = F.pad(x, (0, wp - w1, 0, hp - h1))

    feats = twin_backbone(state, x, cfg)

    # RPN head + selection
    levels = ["p2", "p3", "p4", "p5", "p6"]
    strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    sizes = {f: s[0] for f, s in zip(levels, cfg.MODEL.ANCHOR_GENERATOR.SIZES)}
    boxes_l, scores_l = [], []
    for f in levels:
        feat = feats[f]
        tshared = conv_b(state, "proposal_generator.rpn_head.conv", feat, 1, 1, relu=True)
        logits = conv_b(state, "proposal_generator.rpn_head.objectness_logits", tshared)
        deltas = conv_b(state, "proposal_generator.rpn_head.anchor_deltas", tshared)
        a = 3
        hh, ww = logits.shape[-2:]
        lg = logits[0].permute(1, 2, 0).reshape(-1).detach().numpy()
        dl = deltas[0].reshape(a, 4, hh, ww).permute(2, 3, 0, 1).reshape(-1, 4).detach().numpy()
        anc = grid_anchors_np(hh, ww, strides[f], sizes[f], [0.5, 1.0, 2.0])
        kk = min(len(lg), cfg.MODEL.RPN.PRE_NMS_TOPK_TEST)
        idx = np.argsort(-lg, kind="stable")[:kk]
        boxes_l.append(decode_np(dl[idx], anc[idx]))
        scores_l.append(lg[idx])

    # clip with the reference's swapped (W, H) (rpn.py:320)
    props, pscores, plvl = [], [], []
    for lvl, (b, s) in enumerate(zip(boxes_l, scores_l)):
        b = b.copy()
        b[:, 0] = b[:, 0].clip(0, hp)  # x clipped to H (quirk)
        b[:, 1] = b[:, 1].clip(0, wp)
        b[:, 2] = b[:, 2].clip(0, hp)
        b[:, 3] = b[:, 3].clip(0, wp)
        keep = nms_np(b, s, cfg.MODEL.RPN.NMS_THRESH)
        props.append(b[keep])
        pscores.append(s[keep])
    props = np.concatenate(props)
    pscores = np.concatenate(pscores)
    order = np.argsort(-pscores, kind="stable")[:cfg.MODEL.RPN.POST_NMS_TOPK_TEST]
    proposals = props[order]

    # box stage
    feats_np = {f: feats[f][0].permute(1, 2, 0).detach().numpy() for f in feats}
    lv = np.clip(np.floor(4 + np.log2(
        np.sqrt(np.maximum((proposals[:, 2] - proposals[:, 0])
                           * (proposals[:, 3] - proposals[:, 1]), 0)) / 224 + 1e-8)), 2, 5
    ).astype(int)
    pooled = np.zeros((len(proposals), 7, 7, 16), np.float64)
    for lev in (2, 3, 4, 5):
        sel = np.nonzero(lv == lev)[0]
        if len(sel):
            pooled[sel] = roi_align_np(feats_np[f"p{lev}"], proposals[sel],
                                       1.0 / (2 ** lev), (7, 7), 2, False)
    xb = t(pooled.astype(np.float32)).permute(0, 3, 1, 2).reshape(len(proposals), -1)
    for kfc in (1, 2):
        xb = F.relu(F.linear(xb, t(state[f"roi_heads.box_head.fc{kfc}.weight"]),
                             t(state[f"roi_heads.box_head.fc{kfc}.bias"])))
    cls = F.linear(xb, t(state["roi_heads.box_predictor.cls_score.weight"]),
                   t(state["roi_heads.box_predictor.cls_score.bias"]))
    dlt = F.linear(xb, t(state["roi_heads.box_predictor.bbox_pred.weight"]),
                   t(state["roi_heads.box_predictor.bbox_pred.bias"]))
    probs = F.softmax(cls, -1).detach().numpy()[:, 0]
    det_boxes = decode_np(dlt.detach().numpy(), proposals, (10, 10, 5, 5))
    sel = np.nonzero(probs > cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST)[0]
    keep = sel[nms_np(det_boxes[sel], probs[sel], cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST)]
    keep = keep[:cfg.TEST.DETECTIONS_PER_IMAGE]
    det_boxes, det_scores = det_boxes[keep], probs[keep]

    # densepose: decoder -> pooler -> head -> predictor
    dstate = "roi_heads.decoder"
    dec = None
    for f, length, has_up in [("p2", 1, False), ("p3", 1, True), ("p4", 2, True), ("p5", 3, True)]:
        y = feats[f]
        for kk in range(length):
            idx2 = kk * 2 if has_up else kk
            y = conv_b(state, f"{dstate}.{f}.{idx2}", y, 1, 1, relu=True)
            if has_up:
                y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=False)
        dec = y if dec is None else dec + y
    dec = conv_b(state, f"{dstate}.predictor", dec)
    dec_np = dec[0].permute(1, 2, 0).detach().numpy()

    dp_pool = roi_align_np(dec_np, det_boxes, 0.25, (8, 8), 2, False).astype(np.float32)
    xdp = t(dp_pool).permute(0, 3, 1, 2)
    for i in (1, 2):
        xdp = F.relu(conv_b(state, f"roi_heads.densepose_head.body_conv_fcn{i}", xdp, 1, 1))

    def dp_head(name):
        w = t(state[f"roi_heads.densepose_predictor.{name}.weight"])
        b = t(state[f"roi_heads.densepose_predictor.{name}.bias"])
        y = F.conv_transpose2d(xdp, w, b, stride=2, padding=1)
        return F.interpolate(y, scale_factor=2, mode="bilinear",
                             align_corners=False).detach().numpy()

    dp_u = dp_head("u_lowres")
    dp_coarse = dp_head("ann_index_lowres")

    # postprocess (correct (H, W) clip)
    sx, sy = w0 / w1, h0 / h1
    out_boxes = det_boxes * np.array([sx, sy, sx, sy])
    out_boxes[:, [0, 2]] = out_boxes[:, [0, 2]].clip(0, w0)
    out_boxes[:, [1, 3]] = out_boxes[:, [1, 3]].clip(0, h0)
    return out_boxes, det_scores, dp_u, dp_coarse


@pytest.mark.slow
def test_full_pipeline_parity():
    cfg = tiny_cfg()
    model = build_model(cfg)
    spec = model.spec()
    state = make_state(spec)
    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(state, spec, fold_bn=True).items()}

    image = (RNG.rand(60, 80, 3) * 255).astype(np.uint8)
    got = jax.jit(model.forward)(params, jnp.asarray(image))
    n = int(got["num_instances"])

    want_boxes, want_scores, want_u, want_coarse = twin_forward(state, image, cfg)

    assert n == len(want_scores), (n, len(want_scores))
    np.testing.assert_allclose(np.asarray(got["scores"])[:n], want_scores,
                               atol=2e-3, rtol=2e-3)

    # random weights saturate the classifier, producing duplicate scores;
    # ordering among ties is arbitrary, so match detections by box coords
    got_boxes = np.asarray(got["pred_boxes"])[:n]
    got_u = np.transpose(np.asarray(got["pred_densepose_u"])[:n], (0, 3, 1, 2))
    got_c = np.transpose(np.asarray(got["pred_densepose_coarse_segm"])[:n], (0, 3, 1, 2))

    def order(boxes):
        return np.lexsort((boxes[:, 3], boxes[:, 2], boxes[:, 1], boxes[:, 0]))

    gi = order(got_boxes)
    wi = order(want_boxes)
    np.testing.assert_allclose(got_boxes[gi], want_boxes[wi], atol=0.2, rtol=2e-3)
    # UV maps are only sanity-checked here: with random weights, sub-pixel box
    # coordinate drift gets amplified by high-frequency random features
    # (test_densepose_stage_same_box_parity below does the tight check on
    # identical boxes — 1e-4 level).
    assert got_u.shape == want_u.shape
    assert np.isfinite(got_u).all() and np.isfinite(got_c).all()
    np.testing.assert_allclose(got_u[gi], want_u[wi], atol=0.5, rtol=1.0)


def test_densepose_stage_same_box_parity():
    """Decoder -> ROIAlign -> head -> predictor vs the torch twin on
    IDENTICAL boxes: tight tolerance (the stage itself is exact; the e2e test
    above only drifts through box-coordinate chaos)."""
    cfg = tiny_cfg()
    model = build_model(cfg)
    spec = model.spec()
    state = make_state(spec)
    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(state, spec, fold_bn=False).items()}

    from densepose_tpu.models.fpn import fpn_forward
    from densepose_tpu.models.roi_heads import densepose_stage_forward

    image = (np.random.RandomState(7).rand(60, 80, 3) * 255).astype(np.uint8)
    x, _, _ = model.preprocess(jnp.asarray(image), (60, 80))
    feats = fpn_forward(params, x, cfg)

    boxes = np.array([[5.0, 4.0, 40.0, 30.0], [10.0, 8.0, 60.0, 50.0]], np.float32)
    dp = densepose_stage_forward(params, feats, jnp.asarray(boxes), cfg)
    u_mine = np.transpose(np.asarray(dp["u"]), (0, 3, 1, 2))

    # torch twin on the same feature maps + boxes
    feats_t = {k: t(np.asarray(v)).permute(2, 0, 1)[None] for k, v in feats.items()}
    dstate = "roi_heads.decoder"
    dec = None
    for f, length, has_up in [("p2", 1, False), ("p3", 1, True),
                              ("p4", 2, True), ("p5", 3, True)]:
        y = feats_t[f]
        for kk in range(length):
            idx2 = kk * 2 if has_up else kk
            y = conv_b(state, f"{dstate}.{f}.{idx2}", y, 1, 1, relu=True)
            if has_up:
                y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=False)
        dec = y if dec is None else dec + y
    dec = conv_b(state, f"{dstate}.predictor", dec)
    dec_np = dec[0].permute(1, 2, 0).detach().numpy()
    dp_pool = roi_align_np(dec_np, boxes, 0.25, (8, 8), 2, False).astype(np.float32)
    xdp = t(dp_pool).permute(0, 3, 1, 2)
    for i in (1, 2):
        xdp = F.relu(conv_b(state, f"roi_heads.densepose_head.body_conv_fcn{i}", xdp, 1, 1))
    w = t(state["roi_heads.densepose_predictor.u_lowres.weight"])
    b = t(state["roi_heads.densepose_predictor.u_lowres.bias"])
    y = F.conv_transpose2d(xdp, w, b, stride=2, padding=1)
    u_twin = F.interpolate(y, scale_factor=2, mode="bilinear",
                           align_corners=False).detach().numpy()
    np.testing.assert_allclose(u_mine, u_twin, atol=1e-4, rtol=1e-3)


def test_deeplab_head_parity():
    """DeepLab (ASPP rates 6/12/56 + GN stacked convs) vs a torch twin built
    from the reference's exact module structure (deeplab.py:20-145)."""
    import torch.nn as nn

    from densepose_tpu.checkpoint.transform import (random_torch_state,
                                                    torch_state_to_jax)
    from densepose_tpu.models.roi_heads import (densepose_head_forward,
                                                densepose_head_spec)

    cfg = get_cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseDeepLabHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_ON = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NORM = "GN"
    cfg.freeze()

    spec = densepose_head_spec(cfg, "head")
    tstate = random_torch_state(spec, seed=7)
    params = {k: jnp.asarray(v)
              for k, v in torch_state_to_jax(tstate, spec, fold_bn=False).items()}

    C = 32
    x = RNG.randn(3, 12, 12, C).astype(np.float32)

    got = np.asarray(densepose_head_forward(params, jnp.asarray(x), cfg, "head"))

    # --- torch twin, module structure verbatim from the reference ---------
    class ASPPConvT(nn.Sequential):
        def __init__(self, cin, cout, dil):
            super().__init__(nn.Conv2d(cin, cout, 3, padding=dil, dilation=dil,
                                       bias=False),
                             nn.GroupNorm(32, cout), nn.ReLU())

    class ASPPPoolingT(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.seq = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                     nn.Conv2d(cin, cout, 1, bias=False),
                                     nn.GroupNorm(32, cout), nn.ReLU())

        def forward(self, z):
            size = z.shape[-2:]
            z = self.seq(z)
            return F.interpolate(z, size=size, mode="bilinear",
                                 align_corners=False)

    convs = nn.ModuleList([
        nn.Sequential(nn.Conv2d(C, C, 1, bias=False), nn.GroupNorm(32, C),
                      nn.ReLU()),
        ASPPConvT(C, C, 6), ASPPConvT(C, C, 12), ASPPConvT(C, C, 56),
        ASPPPoolingT(C, C),
    ])
    project = nn.Sequential(nn.Conv2d(5 * C, C, 1, bias=False), nn.ReLU())
    stacked = nn.ModuleList([
        nn.Conv2d(C if i == 0 else 32, 32, 3, padding=1, bias=False)
        for i in range(2)])
    gns = nn.ModuleList([nn.GroupNorm(32, 32) for _ in range(2)])

    with torch.no_grad():
        def setw(mod, key):
            mod.weight.copy_(t(tstate[key + ".weight"]))
            if getattr(mod, "bias", None) is not None and key + ".bias" in tstate:
                mod.bias.copy_(t(tstate[key + ".bias"]))

        setw(convs[0][0], "head.ASPP.convs.0.0"); setw(convs[0][1], "head.ASPP.convs.0.1")
        for i in (1, 2, 3):
            setw(convs[i][0], f"head.ASPP.convs.{i}.0")
            setw(convs[i][1], f"head.ASPP.convs.{i}.1")
        setw(convs[4].seq[1], "head.ASPP.convs.4.1")
        setw(convs[4].seq[2], "head.ASPP.convs.4.2")
        setw(project[0], "head.ASPP.project.0")
        for i in range(2):
            setw(stacked[i], f"head.body_conv_fcn{i + 1}")
            setw(gns[i], f"head.body_conv_fcn{i + 1}.norm")

        z = t(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        res = [c(z) for c in convs]
        y = project(torch.cat(res, dim=1))
        for i in range(2):
            y = F.relu(gns[i](stacked[i](y)))
        want = y.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_aspp_center_tap_reduction():
    """_aspp_branch reduces a 3x3 conv whose dilation >= both ROI dims to
    the exact center-tap 1x1 (the rate-56 ASPP branch on 28x28 pooled ROIs,
    reference deeplab.py:34: the +-dilation taps always land in zero
    padding) and must NOT reduce when any tap can land in-bounds."""
    from densepose_tpu.models.roi_heads import _aspp_branch
    from densepose_tpu.ops import conv2d, group_norm

    C = 32
    x = jnp.asarray(RNG.randn(2, 14, 14, C).astype(np.float32))
    p = {"a.0.weight": jnp.asarray(RNG.randn(3, 3, C, C).astype(np.float32) * 0.1),
         "a.1.weight": jnp.asarray(RNG.rand(C).astype(np.float32) + 0.5),
         "a.1.bias": jnp.asarray(RNG.randn(C).astype(np.float32) * 0.1)}

    def full(dil):
        y = conv2d(x, p["a.0.weight"], padding=dil, dilation=dil)
        y = group_norm(y, p["a.1.weight"], p["a.1.bias"], 32)
        return jax.nn.relu(y)

    # dilation 14 == ROI size -> center-tap path; equal to the full conv
    got = _aspp_branch(p, x, "a", 0, 1, padding=14, dilation=14)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full(14)),
                               atol=1e-5, rtol=1e-5)
    # and it really is the center tap: zeroing off-center taps changes nothing
    w_center_only = p["a.0.weight"] * jnp.zeros((3, 3, 1, 1)).at[1, 1].set(1.0)
    got_center = _aspp_branch({**p, "a.0.weight": w_center_only},
                              x, "a", 0, 1, padding=14, dilation=14)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got_center),
                               atol=1e-6, rtol=1e-6)

    # dilation 6 < ROI size -> full dilated conv (in-bounds taps matter)
    got6 = _aspp_branch(p, x, "a", 0, 1, padding=6, dilation=6)
    np.testing.assert_allclose(np.asarray(got6), np.asarray(full(6)),
                               atol=1e-6, rtol=1e-6)
    assert float(np.max(np.abs(np.asarray(got6) - np.asarray(got)))) > 1e-3
