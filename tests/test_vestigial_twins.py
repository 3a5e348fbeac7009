"""Parity tests for the last two vestigial reference components.

Neither ``sem_seg_postprocess`` (detectron2/modeling/postprocessing.py:64-87)
nor ``CycleBatchNormList`` (detectron2/layers/batch_norm.py:193-238) is
reachable from any shipped DensePose config — these twins exist so the
"every reference component has one" claim carries no asterisks. Oracles are
torch (CPU) re-executions of the reference's exact op chain.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from densepose_tpu.models.rcnn import sem_seg_postprocess  # noqa: E402
from densepose_tpu.ops import cycle_batch_norm  # noqa: E402


@pytest.mark.parametrize(
    "in_hw,img_size,out_hw",
    [((32, 40), (28, 36), (56, 75)),   # upsample after crop
     ((32, 40), (32, 40), (16, 20)),   # no-crop downsample
     ((24, 24), (17, 19), (17, 19))],  # crop to exact output size
)
def test_sem_seg_postprocess_vs_torch(in_hw, img_size, out_hw):
    rng = np.random.RandomState(0)
    c = 5
    x = rng.randn(in_hw[0], in_hw[1], c).astype(np.float32)

    # reference chain: crop (C, H, W) -> F.interpolate bilinear,
    # align_corners=False (postprocessing.py:83-86)
    t = torch.from_numpy(x.transpose(2, 0, 1))
    t = t[:, : img_size[0], : img_size[1]].unsqueeze(0)
    want = torch.nn.functional.interpolate(
        t, size=out_hw, mode="bilinear", align_corners=False
    )[0].numpy().transpose(1, 2, 0)

    got = np.asarray(sem_seg_postprocess(jnp.asarray(x), img_size, *out_hw))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("affine", [True, False])
def test_cycle_batch_norm_vs_torch(affine):
    rng = np.random.RandomState(1)
    n_domains, c = 3, 6
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    means = rng.randn(n_domains, c).astype(np.float32)
    variances = (rng.rand(n_domains, c).astype(np.float32) + 0.3)
    weight = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)

    # reference: N eval-mode affine-free BatchNorm2d cycled by _pos, then
    # ONE shared affine (batch_norm.py:224-233)
    bns = []
    for k in range(n_domains):
        bn = torch.nn.BatchNorm2d(c, affine=False).eval()
        bn.running_mean.copy_(torch.from_numpy(means[k]))
        bn.running_var.copy_(torch.from_numpy(variances[k]))
        bns.append(bn)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for pos in range(n_domains + 1):  # cycles past N: pos wraps
        with torch.no_grad():
            want = bns[pos % n_domains](t)
            if affine:
                want = (want * torch.from_numpy(weight).reshape(1, -1, 1, 1)
                        + torch.from_numpy(bias).reshape(1, -1, 1, 1))
        want = want.numpy().transpose(0, 2, 3, 1)

        got = np.asarray(cycle_batch_norm(
            jnp.asarray(x), jnp.asarray(means), jnp.asarray(variances),
            jnp.asarray(weight) if affine else None,
            jnp.asarray(bias) if affine else None,
            pos % n_domains))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cycle_batch_norm_traced_pos():
    """pos may be a traced scalar (jnp.take path) — jit over pos compiles
    once and indexes dynamically."""
    import jax

    rng = np.random.RandomState(2)
    c = 4
    x = jnp.asarray(rng.randn(1, 2, 2, c).astype(np.float32))
    means = jnp.asarray(rng.randn(2, c).astype(np.float32))
    variances = jnp.asarray(rng.rand(2, c).astype(np.float32) + 0.5)

    f = jax.jit(lambda pos: cycle_batch_norm(x, means, variances, None, None, pos))
    a = np.asarray(f(jnp.int32(0)))
    b = np.asarray(f(jnp.int32(1)))
    ref0 = np.asarray(cycle_batch_norm(x, means, variances, None, None, 0))
    ref1 = np.asarray(cycle_batch_norm(x, means, variances, None, None, 1))
    np.testing.assert_allclose(a, ref0, rtol=1e-6)
    np.testing.assert_allclose(b, ref1, rtol=1e-6)
    assert not np.allclose(a, b)
