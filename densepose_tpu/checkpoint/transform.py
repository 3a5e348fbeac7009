"""Layout transforms: torch-layout state dicts -> TPU-ready JAX pytrees.

Performed once at load time (host-side numpy):

* conv kernels OIHW -> HWIO,
* ConvTranspose2d kernels (Cin,Cout,kh,kw) -> spatially flipped HWIO so the
  deconv runs as an input-dilated forward conv (ops/conv.py),
* linear weights transposed to (in, out),
* optional FrozenBN folding into the preceding conv (TPU.FOLD_FROZEN_BN):
  the BN affine collapses into the conv kernel and a bias — one less
  elementwise pass over every backbone activation, and XLA then fuses the
  bias+ReLU into the conv epilogue.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .spec import ParamSpec, Spec
from ..ops.norms import fold_frozen_bn

StateDict = Dict[str, np.ndarray]


def random_torch_state(spec: Spec, seed: int = 0, scale: float = 0.03) -> StateDict:
    """Random torch-layout params for tests/benches (no checkpoint needed).

    Norm statistics must be PLAUSIBLE, not merely random: a running_var
    drawn from randn is negative half the time and the FrozenBN fold's
    sqrt then poisons the whole net with NaNs. Norm keys are detected by
    suffix (``running_var``/``running_mean``) and by sibling — detectron2
    names them ``.norm.weight`` but HRNet's torchvision-style blocks use
    ``bn1.weight``/``bn2.weight`` etc., so a norm WEIGHT is any ``.weight``
    whose prefix also owns a ``running_var`` — OR any ``.norm.weight``
    (GroupNorm has no running stats but its scale must still sit near 1;
    this also keeps the RNG stream bitwise-identical to the pre-HRNet-fix
    generator for every detectron2-named family)."""
    rng = np.random.RandomState(seed)
    out: StateDict = {}
    for name, ps in spec.items():
        if name.endswith("running_var"):
            out[name] = (rng.rand(*ps.shape).astype(np.float32) * 0.5 + 0.5)
        elif name.endswith(".norm.weight") or (
                name.endswith(".weight")
                and name[:-len("weight")] + "running_var" in spec):
            out[name] = (rng.rand(*ps.shape).astype(np.float32) * 0.5 + 0.75)
        else:
            out[name] = (rng.randn(*ps.shape) * scale).astype(np.float32)
    return out


def convert_conv_transpose_weight(w: np.ndarray) -> np.ndarray:
    """(Cin, Cout, kh, kw) -> flipped (kh, kw, Cin, Cout)."""
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def torch_state_to_jax(
    state: StateDict,
    spec: Spec,
    fold_bn: bool = True,
    missing_ok: bool = True,
) -> StateDict:
    """Convert a torch-layout state dict to JAX layouts, optionally folding
    FrozenBN. Missing spec entries are zero-filled (mirrors the reference's
    strict=False load, fvcore Checkpointer) unless missing_ok=False.

    FrozenBN folding: a spec entry ``X.norm.running_mean`` marks conv X as
    FrozenBN-normalized; its four norm vectors are folded into ``X.weight`` /
    ``X.bias`` and dropped from the output tree.
    """
    out: StateDict = {}

    def get(name: str, ps: ParamSpec) -> np.ndarray:
        if name in state:
            a = np.asarray(state[name], dtype=np.float32)
            if tuple(a.shape) != tuple(ps.shape):
                raise ValueError(f"{name}: checkpoint shape {a.shape} != spec {ps.shape}")
            return a
        if not missing_ok:
            raise KeyError(name)
        if name.endswith(".norm.running_var") or name.endswith(".norm.weight"):
            return np.ones(ps.shape, dtype=np.float32)
        return np.zeros(ps.shape, dtype=np.float32)

    frozen_bn_convs = {
        name[: -len(".norm.running_mean")]
        for name in spec
        if name.endswith(".norm.running_mean")
    }

    handled = set()
    for name, ps in spec.items():
        if name in handled:
            continue
        base = name[: -len(".weight")] if name.endswith(".weight") else None
        if base in frozen_bn_convs and ps.kind == "conv" and fold_bn:
            w = np.transpose(get(name, ps), (2, 3, 1, 0))  # OIHW -> HWIO
            bias_name = f"{base}.bias"
            b: Optional[np.ndarray] = None
            if bias_name in spec:
                b = get(bias_name, spec[bias_name])
                handled.add(bias_name)
            norm = {}
            for sfx in ("weight", "bias", "running_mean", "running_var"):
                n = f"{base}.norm.{sfx}"
                norm[sfx] = get(n, spec[n])
                handled.add(n)
            wf, bf = fold_frozen_bn(w, b, norm["weight"], norm["bias"],
                                    norm["running_mean"], norm["running_var"])
            out[name] = wf
            out[bias_name] = bf
            continue

        a = get(name, ps)
        if ps.kind == "conv":
            out[name] = np.ascontiguousarray(np.transpose(a, (2, 3, 1, 0)))
        elif ps.kind == "convT":
            out[name] = convert_conv_transpose_weight(a)
        elif ps.kind == "linear":
            out[name] = np.ascontiguousarray(a.T)
        else:
            out[name] = a
    return out
