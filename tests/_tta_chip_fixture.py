"""Shared fixture for the on-chip TTA test (tests/test_tpu_numerics.py):
the chip process and the fresh CPU subprocess must build IDENTICAL
config + params, so both import this. Tamed detection weights — plain
random init degenerates every kept box to a zero-area border slab with
near-tied scores, on which a chip-vs-CPU comparison through two NMS
passes is pure tie-flip chaos (see test_realscale_parity.py::
detection_tamed_state)."""

import numpy as np


TTA_OPTS = [
    "INPUT.MIN_SIZE_TEST", "128",
    "INPUT.MAX_SIZE_TEST", "256",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "200",
    "TEST.DETECTIONS_PER_IMAGE", "8",
    "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.3",
    "TEST.AUG.ENABLED", "True",
    "TEST.AUG.MIN_SIZES", "(128, 160)",
    "TEST.AUG.MAX_SIZE", "256",
    "TEST.AUG.FLIP", "True",
]


def tta_cfg_and_params():
    """Deterministic: make_state draws from test_realscale_parity's
    module-level RNG, so call this exactly once per process."""
    from densepose_tpu import model_zoo
    from densepose_tpu.checkpoint.transform import torch_state_to_jax
    from densepose_tpu.models.rcnn import build_model
    from tests.test_realscale_parity import detection_tamed_state, make_state

    cfg = model_zoo.get_config("densepose_rcnn_R_50_FPN_s1x").clone()
    cfg.defrost()
    cfg.merge_from_list(TTA_OPTS)
    cfg.freeze()
    spec = build_model(cfg).spec()
    state = detection_tamed_state(make_state(spec))
    params = torch_state_to_jax(state, spec, fold_bn=cfg.TPU.FOLD_FROZEN_BN)
    return cfg, params


def tta_image():
    return (np.random.RandomState(7).rand(256, 320, 3) * 255).astype(np.uint8)
