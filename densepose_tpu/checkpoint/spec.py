"""Parameter specifications.

Every model component declares its parameters as a ``Spec``: an ordered map
from the *reference state_dict name* (e.g.
``backbone.bottom_up.stem.conv1.weight``) to a ``ParamSpec`` carrying the
torch-layout shape and the tensor kind. The spec is the single source of
truth used for

* random initialization (tests / benches without a downloaded checkpoint),
* checkpoint alignment (the suffix matcher needs the model's key set —
  c2_model_loading.py:209-240),
* layout conversion to TPU-friendly JAX arrays (OIHW->HWIO etc.).

Kinds:
    conv    torch (Cout, Cin, kh, kw)        -> jax (kh, kw, Cin, Cout)
    convT   torch (Cin, Cout, kh, kw)        -> jax (kh, kw, Cin, Cout), taps
            spatially flipped so conv_transpose2d can run as an input-dilated
            forward conv
    linear  torch (out, in)                  -> jax (in, out)
    vec     1-D (biases, norm params)        -> unchanged
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple


@dataclass(frozen=True)
class ParamSpec:
    shape: Tuple[int, ...]
    kind: str  # conv | convT | linear | vec


Spec = Dict[str, ParamSpec]


def conv_spec(spec: Spec, name: str, cin: int, cout: int, k: int,
              bias: bool = True, norm: str = "") -> None:
    """Conv2d with the reference's optional fused norm
    (layers/wrappers.py:82-112). norm in {"", "FrozenBN", "GN"}."""
    spec[f"{name}.weight"] = ParamSpec((cout, cin, k, k), "conv")
    if bias:
        spec[f"{name}.bias"] = ParamSpec((cout,), "vec")
    if norm == "FrozenBN":
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{name}.norm.{suffix}"] = ParamSpec((cout,), "vec")
    elif norm == "GN":
        spec[f"{name}.norm.weight"] = ParamSpec((cout,), "vec")
        spec[f"{name}.norm.bias"] = ParamSpec((cout,), "vec")
    elif norm:
        raise ValueError(f"unsupported norm {norm!r}")


def conv_transpose_spec(spec: Spec, name: str, cin: int, cout: int, k: int) -> None:
    spec[f"{name}.weight"] = ParamSpec((cin, cout, k, k), "convT")
    spec[f"{name}.bias"] = ParamSpec((cout,), "vec")


def linear_spec(spec: Spec, name: str, din: int, dout: int) -> None:
    spec[f"{name}.weight"] = ParamSpec((dout, din), "linear")
    spec[f"{name}.bias"] = ParamSpec((dout,), "vec")


def gn_spec(spec: Spec, name: str, c: int) -> None:
    """Standalone GroupNorm module (ASPP sequentials)."""
    spec[f"{name}.weight"] = ParamSpec((c,), "vec")
    spec[f"{name}.bias"] = ParamSpec((c,), "vec")
