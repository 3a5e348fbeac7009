#!/usr/bin/env python
"""Generate checkpoint key/shape manifests from the reference implementation.

Dev tooling (SURVEY.md section 7.2 step 1): builds the reference's torch
model on CPU for selected zoo configs and dumps its ``state_dict`` key ->
shape map as JSON fixtures under tests/fixtures/. The detectron2-zoo
DensePose ``.pkl`` checkpoints contain exactly the model's state_dict (plain
``load_state_dict`` path, detection_checkpoint.py:95-123), so these
manifests are an offline-faithful stand-in for the real checkpoint key sets
(e.g. model_final_162be9.pkl for R_50_FPN_s1x) — the strongest proof
available without network egress that a real checkpoint will load.

Keys the real checkpoints do NOT carry are recorded, not dropped:
``pixel_mean``/``pixel_std`` (initialized from config; the checkpointer
ignores them as missing, detection_checkpoint.py:107-116) and
``anchor_generator.cell_anchors`` (non-persistent in modern detectron2;
absent from state_dict here as well).

The reference depends on fvcore/iopath which this environment lacks, so a
minimal shim of the handful of symbols it imports is installed first (shapes
are all we read; init functions are irrelevant).

Usage: python tools/gen_checkpoint_manifest.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from refshim import install_shims  # noqa: E402  (shared shim layer)


# zoo name -> (config yaml, checkpoint file the zoo serves, or None when the
# reference README publishes no weights for the variant)
TARGETS = {
    "densepose_rcnn_R_50_FPN_s1x": (
        "configs/densepose_rcnn_R_50_FPN_s1x.yaml", "model_final_162be9.pkl"),
    "densepose_rcnn_R_50_FPN_WC2M_s1x": (
        "configs/densepose_rcnn_R_50_FPN_WC2M_s1x.yaml", None),
    "densepose_rcnn_R_50_FPN_soft_s1x_cse": (
        "configs/cse/densepose_rcnn_R_50_FPN_soft_s1x.yaml", None),
}


def register_cse_stub_predictor():
    """The reference's CSE configs name ``DensePoseEmbeddingPredictor`` but
    never register one (SURVEY section 7.4 — they crash at build). Register a
    parameter-structure stub following the upstream detectron2 CSE predictor
    (two ConvTranspose2d heads: coarse_segm_lowres + embed_lowres) so the
    rest of the reference model builds and yields the checkpoint key set."""
    import torch.nn as nn

    from densepose.modeling.predictors import DENSEPOSE_PREDICTOR_REGISTRY

    @DENSEPOSE_PREDICTOR_REGISTRY.register()
    class DensePoseEmbeddingPredictor(nn.Module):
        def __init__(self, cfg, input_channels):
            super().__init__()
            dim_in = input_channels
            n_segm = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_COARSE_SEGM_CHANNELS
            embed = cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE
            k = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL
            pad = int(k / 2 - 1)
            self.coarse_segm_lowres = nn.ConvTranspose2d(
                dim_in, n_segm, k, stride=2, padding=pad)
            self.embed_lowres = nn.ConvTranspose2d(
                dim_in, embed, k, stride=2, padding=pad)

    return DensePoseEmbeddingPredictor


def main():
    install_shims()
    sys.path.insert(0, "/root/reference")

    import torch

    from detectron2.config import get_cfg
    from detectron2.modeling import build_model
    from densepose import add_densepose_config

    register_cse_stub_predictor()

    out_dir = os.path.join(REPO, "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)

    for name, (cfg_rel, pkl) in TARGETS.items():
        cfg_path = os.path.join("/root/reference", cfg_rel)
        cfg = get_cfg()
        add_densepose_config(cfg)
        cfg.merge_from_file(cfg_path)
        cfg.MODEL.DEVICE = "cpu"
        cfg.MODEL.WEIGHTS = ""  # embedder pre-load path; no egress
        for emb in cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS.values():
            emb.INIT_FILE = ""  # no egress; shapes are all we need
        with torch.no_grad():
            model = build_model(cfg)
        sd = model.state_dict()

        # The TorchScript fork registers several module groups twice — once
        # under upstream's canonical attribute name and once in a ModuleList
        # (ResNet stages, resnet.py:384-403; FPN lateral/output convs;
        # decoder scale_heads; densepose-head stacked_convs) — so its
        # state_dict carries alias keys upstream's saved checkpoints don't
        # have. Group keys by underlying tensor identity, keep the canonical
        # (non-ModuleList) name, and record how many aliases were dropped.
        _alias_markers = (".stages.", ".lateral_convs.", ".output_convs.",
                          ".scale_heads.", ".stacked_convs.")

        def _is_alias(k):
            return any(m in k for m in _alias_markers)

        by_ptr = {}
        for k, v in sd.items():
            by_ptr.setdefault((v.data_ptr(), tuple(v.shape)), []).append(k)
        keys, alias_keys = {}, []
        for group in by_ptr.values():
            group = sorted(group, key=lambda k: (_is_alias(k), k))
            keys[group[0]] = list(sd[group[0]].shape)
            alias_keys += group[1:]
        assert all(_is_alias(k) for k in alias_keys), alias_keys
        assert not any(_is_alias(k) for k in keys), [k for k in keys if _is_alias(k)]

        non_ckpt = [k for k in ("pixel_mean", "pixel_std") if k in keys]
        manifest = {
            "config": cfg_rel,
            "checkpoint": pkl,  # None: reference README publishes no weights
            "non_checkpoint_keys": non_ckpt,
            "fork_alias_keys_dropped": len(alias_keys),
            "keys": keys,
        }
        path = os.path.join(out_dir, f"manifest_{name}.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"{path}: {len(manifest['keys'])} keys "
              f"({len(alias_keys)} fork aliases dropped)")


if __name__ == "__main__":
    main()
