"""Checkpoint loader tests: Caffe2 rename tables, background-class surgery,
suffix alignment, and end-to-end pkl -> params for a real model spec."""

import os
import pickle
import tempfile

import numpy as np

from densepose_tpu.checkpoint.pkl_loader import (
    align_state_dicts, convert_c2_names, load_checkpoint_file,
)
from densepose_tpu.config import get_cfg
from densepose_tpu.models.rcnn import build_model
from densepose_tpu.predictor import load_params

RNG = np.random.RandomState(3)


def test_c2_backbone_renames():
    w = {
        "conv1_w": RNG.randn(64, 3, 7, 7).astype(np.float32),
        "conv1_bn_s": RNG.randn(64).astype(np.float32),
        "conv1_bn_b": RNG.randn(64).astype(np.float32),
        "res2_0_branch2a_w": RNG.randn(64, 64, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": RNG.randn(64).astype(np.float32),
        "res2_0_branch1_w": RNG.randn(256, 64, 1, 1).astype(np.float32),
    }
    out, mapping = convert_c2_names(w)
    assert "stem.conv1.weight" in out
    assert "stem.conv1.norm.weight" in out
    assert "stem.conv1.norm.bias" in out
    assert "res2.0.conv1.weight" in out
    assert "res2.0.conv1.norm.weight" in out
    assert "res2.0.shortcut.weight" in out


def test_c2_densepose_head_renames():
    w = {
        "body_conv_fcn1_w": RNG.randn(512, 256, 3, 3).astype(np.float32),
        "body_conv_fcn1_b": RNG.randn(512).astype(np.float32),
        "AnnIndex_lowres_w": RNG.randn(512, 15, 4, 4).astype(np.float32),
        "Index_UV_lowres_w": RNG.randn(512, 25, 4, 4).astype(np.float32),
        "U_lowres_w": RNG.randn(512, 25, 4, 4).astype(np.float32),
        "V_lowres_b": RNG.randn(25).astype(np.float32),
    }
    out, _ = convert_c2_names(w)
    assert "body_conv_fcn1.weight" in out
    assert "ann_index_lowres.weight" in out
    assert "index_uv_lowres.weight" in out
    assert "u_lowres.weight" in out
    assert "v_lowres.bias" in out


def test_c2_bg_class_surgery():
    """cls_score: bg moves from index 0 to last; bbox_pred: first 4 rows
    (bg regression) dropped (c2_model_loading.py:184-200)."""
    w = {
        "cls_score_w": np.arange(3 * 8, dtype=np.float32).reshape(3, 8),
        "bbox_pred_w": np.arange(12 * 8, dtype=np.float32).reshape(12, 8),
    }
    out, _ = convert_c2_names(w)
    np.testing.assert_array_equal(out["cls_score.weight"][-1], w["cls_score_w"][0])
    np.testing.assert_array_equal(out["cls_score.weight"][:-1], w["cls_score_w"][1:])
    assert out["bbox_pred.weight"].shape == (8, 8)
    np.testing.assert_array_equal(out["bbox_pred.weight"], w["bbox_pred_w"][4:])


def test_suffix_alignment_longest_wins():
    model_keys = ["backbone.bottom_up.stem.conv1.weight",
                  "backbone.bottom_up.res2.0.conv1.weight"]
    shapes = {k: (4, 4, 3, 3) for k in model_keys}
    ckpt = {
        "conv1.weight": np.zeros((4, 4, 3, 3), np.float32),
        "res2.0.conv1.weight": np.ones((4, 4, 3, 3), np.float32),
    }
    out = align_state_dicts(model_keys, shapes, ckpt, c2_conversion=False)
    # the res2 key must match the longer ckpt suffix, not bare conv1.weight
    np.testing.assert_array_equal(out["backbone.bottom_up.res2.0.conv1.weight"],
                                  ckpt["res2.0.conv1.weight"])
    np.testing.assert_array_equal(out["backbone.bottom_up.stem.conv1.weight"],
                                  ckpt["conv1.weight"])


def test_shape_mismatch_skipped():
    model_keys = ["head.weight"]
    shapes = {"head.weight": (4, 4)}
    ckpt = {"head.weight": np.zeros((8, 8), np.float32)}
    out = align_state_dicts(model_keys, shapes, ckpt, c2_conversion=False)
    assert "head.weight" not in out


def test_full_pkl_roundtrip_detectron2_format():
    """A zoo-format pkl with a complete (random) R50-FPN-s1x state dict loads
    into every spec slot."""
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.NAME = "DensePoseROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseV1ConvXHead"
    cfg.freeze()

    model = build_model(cfg)
    spec = model.spec()
    state = {k: (np.abs(RNG.randn(*ps.shape)) + 0.1 if k.endswith("running_var")
                 else RNG.randn(*ps.shape)).astype(np.float32)
             for k, ps in spec.items()}

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.pkl")
        with open(path, "wb") as f:
            pickle.dump({"model": state, "__author__": "test"}, f)
        loaded, needs_c2 = load_checkpoint_file(path)
        assert not needs_c2
        params = load_params(cfg, path, model=model)

    # every conv got transposed OIHW->HWIO; FrozenBN got folded away
    w = params["backbone.bottom_up.stem.conv1.weight"]
    assert w.shape == (7, 7, 3, 64)
    assert "backbone.bottom_up.stem.conv1.norm.weight" not in params
    assert "backbone.bottom_up.stem.conv1.bias" in params
    # deconv kernels converted to forward-conv layout
    assert params["roi_heads.densepose_predictor.u_lowres.weight"].shape == (4, 4, 512, 25)


# ---------------------------------------------------------------------------
# Real-checkpoint key manifests (VERDICT r1 #3 / SURVEY section 7.2 step 1)
# ---------------------------------------------------------------------------

def _manifest_case(zoo_name):
    """Load a fixture manifest (generated from the reference's own torch
    model by tools/gen_checkpoint_manifest.py — the detectron2-zoo pkl key
    set, e.g. model_final_162be9.pkl for s1x) and our matching model spec."""
    import json

    from densepose_tpu import model_zoo

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        f"manifest_{zoo_name}.json")
    with open(path) as f:
        manifest = json.load(f)
    cfg = model_zoo.get_config(zoo_name)
    spec = build_model(cfg).spec()
    return manifest, spec


def _assert_full_alignment(manifest, spec):
    from densepose_tpu.checkpoint.pkl_loader import align_state_dicts

    ckpt = {k: np.zeros(shape, np.float32)
            for k, shape in manifest["keys"].items()}
    shapes = {k: v.shape for k, v in spec.items()}
    aligned = align_state_dicts(list(spec.keys()), shapes, ckpt, False)
    missing = sorted(set(spec) - set(aligned))
    assert not missing, f"model keys without checkpoint match: {missing[:10]}"
    # and the checkpoint is fully consumed — no unexpected keys
    assert len(aligned) == len(spec) == len(manifest["keys"])
    for k, v in aligned.items():
        assert tuple(spec[k].shape) == tuple(v.shape), k


def test_manifest_alignment_s1x():
    """100% of model_final_162be9.pkl's keys load into the s1x model spec
    through the suffix matcher, and every model key is covered."""
    manifest, spec = _manifest_case("densepose_rcnn_R_50_FPN_s1x")
    assert manifest["checkpoint"] == "model_final_162be9.pkl"
    _assert_full_alignment(manifest, spec)


def test_manifest_alignment_wc2m():
    """WC2M: the confidence deconv weights (sigma_2/kappa_u/kappa_v +
    segm confidences) are declared in the spec so the checkpoint loads them
    (outputs dropped, the reference quirk)."""
    manifest, spec = _manifest_case("densepose_rcnn_R_50_FPN_WC2M_s1x")
    assert any("sigma_2_lowres" in k for k in manifest["keys"])
    assert any("kappa_u_lowres" in k for k in manifest["keys"])
    _assert_full_alignment(manifest, spec)


def test_manifest_alignment_cse():
    """CSE: embedding predictor + smpl_27554 vertex-feature embedder keys."""
    manifest, spec = _manifest_case("densepose_rcnn_R_50_FPN_soft_s1x_cse")
    assert any("embed_lowres" in k for k in manifest["keys"])
    assert any("embedder_smpl_27554" in k for k in manifest["keys"])
    _assert_full_alignment(manifest, spec)
