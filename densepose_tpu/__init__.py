"""densepose_tpu — a TPU-native (JAX/XLA/Pallas) DensePose inference framework.

A from-scratch rebuild of the capabilities of dajes/DensePose-TorchScript
(reference mounted at /root/reference) designed for TPU hardware:

* functional core: params are a flat pytree, the whole pipeline is one
  ``jax.jit``-compiled pure function with static shapes,
* all data-dependent control flow of the reference (top-k -> NMS -> top-100)
  is re-expressed as fixed-size tensors + validity masks,
* convolutions run in NHWC/HWIO layouts on the MXU, FrozenBN is folded into
  conv weights at load time,
* scaling is done with ``jax.sharding`` data-parallel meshes over frames
  (the reference is strictly single-image / single-device).

Reference parity notes are cited throughout as ``file:line`` into
``/root/reference``.
"""

__version__ = "0.1.0"

from .config import get_cfg, load_config  # noqa: F401
