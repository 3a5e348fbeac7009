"""C4 (Res5ROIHeads) pipeline: plain ResNet backbone, single-level ROI pool,
res5 per-region stage."""

import numpy as np

import jax
import jax.numpy as jnp

from densepose_tpu.config import get_cfg
from densepose_tpu.models.rcnn import build_model
from densepose_tpu.predictor import load_params


def test_res5_c4_pipeline_runs():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlign"
    cfg.MODEL.DENSEPOSE_ON = False
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 40
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    # C4 RPN: 15 anchors/position at one level
    cfg.freeze()

    model = build_model(cfg)
    spec = model.spec()
    assert "roi_heads.res5.0.conv1.weight" in spec
    assert "roi_heads.box_predictor.cls_score.weight" in spec
    assert not any("fpn" in k for k in spec)

    params = {k: jnp.asarray(v) for k, v in load_params(cfg, None, seed=0).items()}
    img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    out = jax.jit(model.forward)(params, jnp.asarray(img))
    assert out["pred_boxes"].shape == (5, 4)
    assert out["pred_classes"].shape == (5,)
