"""Module-level parity: compose equivalent torch modules (written here, from
the published architecture — NOT imported from the reference) with identical
weights and compare against our functional JAX modules."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from densepose_tpu.checkpoint.transform import torch_state_to_jax
from densepose_tpu.checkpoint.spec import Spec, conv_spec, conv_transpose_spec
from densepose_tpu.config import get_cfg
from densepose_tpu.models.resnet import resnet_forward, resnet_spec
from densepose_tpu.models.roi_heads import densepose_predictor_forward, densepose_predictor_spec

RNG = np.random.RandomState(42)


def small_resnet_cfg():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3"]
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.NUM_GROUPS = 1
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    return cfg


class TorchFrozenBN(nn.Module):
    """Inference-mode frozen BN: F.batch_norm(training=False)."""

    def __init__(self, c):
        super().__init__()
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        return F.batch_norm(x, self.running_mean, self.running_var,
                            self.weight, self.bias, training=False, eps=1e-5)


def torch_resnet50_prefix(state, cfg):
    """Torch twin of stem + res2 + res3 for the tiny config, weights loaded
    from a torch-layout state dict keyed like the reference."""
    stem_c = cfg.MODEL.RESNETS.STEM_OUT_CHANNELS

    def conv(name, cin, cout, k, stride=1, pad=0):
        m = nn.Conv2d(cin, cout, k, stride=stride, padding=pad, bias=False)
        m.weight.data = torch.from_numpy(state[f"{name}.weight"])
        bn = TorchFrozenBN(cout)
        for s in ("weight", "bias", "running_mean", "running_var"):
            getattr(bn, s).data = torch.from_numpy(state[f"{name}.norm.{s}"])
        return m, bn

    p = "backbone.bottom_up"

    def forward(x):
        m, bn = conv(f"{p}.stem.conv1", 3, stem_c, 7, 2, 3)
        x = F.relu(bn(m(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        chans = [(stem_c, 4, 16), (16, 8, 32)]
        blocks = [3, 4]
        for si, ((cin, cb, cout), n) in enumerate(zip(chans, blocks)):
            stage = f"{p}.res{si + 2}"
            first_stride = 1 if si == 0 else 2
            for i in range(n):
                stride = first_stride if i == 0 else 1
                b_in = cin if i == 0 else cout
                s1, s3 = (stride, 1)  # stride_in_1x1=True default
                m1, bn1 = conv(f"{stage}.{i}.conv1", b_in, cb, 1, s1)
                m2, bn2 = conv(f"{stage}.{i}.conv2", cb, cb, 3, s3, 1)
                m3, bn3 = conv(f"{stage}.{i}.conv3", cb, cout, 1)
                out = F.relu(bn1(m1(x)))
                out = F.relu(bn2(m2(out)))
                out = bn3(m3(out))
                if b_in != cout:
                    ms, bns = conv(f"{stage}.{i}.shortcut", b_in, cout, 1, stride)
                    sc = bns(ms(x))
                else:
                    sc = x
                x = F.relu(out + sc)
        return x

    return forward


@pytest.mark.parametrize("fold_bn", [False, True])
def test_resnet_prefix_parity(fold_bn):
    cfg = small_resnet_cfg()
    spec = resnet_spec(cfg)
    state = {}
    for name, ps in spec.items():
        if name.endswith("running_var"):
            state[name] = (RNG.rand(*ps.shape) * 0.5 + 0.5).astype(np.float32)
        elif name.endswith(".norm.weight"):
            state[name] = (RNG.rand(*ps.shape) + 0.5).astype(np.float32)
        else:
            state[name] = (RNG.randn(*ps.shape) * 0.1).astype(np.float32)

    x = RNG.randn(64, 96, 3).astype(np.float32)
    want = torch_resnet50_prefix(state, cfg)(
        torch.from_numpy(x).permute(2, 0, 1)[None])[0].permute(1, 2, 0).detach().numpy()

    params = torch_state_to_jax(state, spec, fold_bn=fold_bn)
    got = resnet_forward({k: jnp.asarray(v) for k, v in params.items()},
                         jnp.asarray(x), cfg, out_features=("res2", "res3"))["res3"]
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_chart_predictor_parity():
    cfg = get_cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME = "DensePoseChartPredictor"
    spec = densepose_predictor_spec(cfg)
    state = {k: (RNG.randn(*ps.shape) * 0.1).astype(np.float32) for k, ps in spec.items()}

    dim_in = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM
    x = RNG.randn(2, 28, 28, dim_in).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    def torch_head(name, cout):
        m = nn.ConvTranspose2d(dim_in, cout, 4, stride=2, padding=1)
        m.weight.data = torch.from_numpy(state[f"roi_heads.densepose_predictor.{name}.weight"])
        m.bias.data = torch.from_numpy(state[f"roi_heads.densepose_predictor.{name}.bias"])
        y = m(xt)
        return F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=False)

    want = {
        "coarse_segm": torch_head("ann_index_lowres", 2),
        "fine_segm": torch_head("index_uv_lowres", 25),
        "u": torch_head("u_lowres", 25),
        "v": torch_head("v_lowres", 25),
    }

    params = {k: jnp.asarray(v) for k, v in torch_state_to_jax(state, spec).items()}
    got = densepose_predictor_forward(params, jnp.asarray(x), cfg)
    for key in want:
        w = want[key].permute(0, 2, 3, 1).detach().numpy()
        g = np.asarray(got[key])
        assert g.shape == w.shape, (key, g.shape, w.shape)
        np.testing.assert_allclose(g, w, atol=5e-5, rtol=1e-4, err_msg=key)


def test_chart_predictor_merged_path_parity_on_cpu(monkeypatch):
    """The default-on-TPU merged predictor path (one concatenated deconv +
    shift-add upsample), forced on CPU via monkeypatched _on_tpu so the
    always-run suite covers it (ADVICE r1: previously it had only the
    opt-in on-chip test). Plain jit, no mesh — the known XLA:CPU crash is
    specific to the GSPMD mesh compile."""
    from densepose_tpu.ops import roi_align as RA

    cfg = get_cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME = "DensePoseChartPredictor"
    spec = densepose_predictor_spec(cfg)
    state = {k: (RNG.randn(*ps.shape) * 0.1).astype(np.float32)
             for k, ps in spec.items()}
    params = {k: jnp.asarray(v) for k, v in torch_state_to_jax(state, spec).items()}
    dim_in = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM
    x = jnp.asarray(RNG.randn(2, 28, 28, dim_in).astype(np.float32))

    want = jax.jit(lambda: densepose_predictor_forward(params, x, cfg))()
    monkeypatch.setattr(RA, "_on_tpu", lambda: True)
    got = jax.jit(lambda: densepose_predictor_forward(params, x, cfg))()
    for key in want:
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(want[key]),
                                   atol=2e-4, rtol=2e-3, err_msg=key)


def test_decoder_tpu_routing_shared_upsample_parity(monkeypatch):
    """The TPU decoder routing (shift-add upsample + one shared final
    upsample of the half-resolution sum) vs the reference per-chain
    formulation: upsampling is linear, so differences are reassociation
    only."""
    from densepose_tpu.models import roi_heads as RH

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 8
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 8
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 5

    spec = RH.decoder_spec(cfg)
    params = {k: jnp.asarray((RNG.randn(*ps.shape) * 0.1).astype(np.float32))
              for k, ps in spec.items()}
    from densepose_tpu.checkpoint.transform import torch_state_to_jax
    params = {k: jnp.asarray(v) for k, v in torch_state_to_jax(
        {k: np.asarray(v) for k, v in params.items()}, spec).items()}

    feats = {f"p{i}": jnp.asarray(
        RNG.randn(32 // 2 ** (i - 2), 40 // 2 ** (i - 2), 8)
        .astype(np.float32)) for i in range(2, 6)}

    from densepose_tpu.ops import roi_align as RA
    want = RH.decoder_forward(params, feats, cfg)          # CPU reference form
    monkeypatch.setattr(RA, "_on_tpu", lambda: True)
    got = RH.decoder_forward(params, feats, cfg)           # TPU routing
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)
