"""Multi-chip scaling: data-parallel frame sharding over a device mesh.

The reference has NO parallelism of any kind (SURVEY.md section 2.7 — single
process, single device, one image per forward). The TPU-native scale axis
for this workload is *frames*: a ``Mesh`` with a ``data`` axis, the frame
batch sharded across chips, parameters replicated. No collectives are needed
in the forward path, so the whole program is embarrassingly parallel over
ICI — XLA only inserts the initial shard/replicate transfers.

The model is ~70M params max (R101+DeepLab) so tensor/pipeline parallelism
would only add collective latency; DP is the right decomposition
(SURVEY.md section 2.7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def data_parallel_forward(model, mesh: Mesh, compute_dtype=None):
    """Returns a jitted fn(params, images[B,H,W,3]) with B sharded over the
    mesh's ``data`` axis and params replicated. B must be a multiple of the
    mesh size (pad the tail batch with repeated frames; the host trims)."""
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32

    def batched(params, images):
        return jax.vmap(partial(model.forward, compute_dtype=dtype),
                        in_axes=(None, 0))(params, images)

    img_sharding = NamedSharding(mesh, P("data"))
    param_sharding = NamedSharding(mesh, P())
    out_sharding = None  # let XLA propagate: batch-dim sharded outputs
    return jax.jit(
        batched,
        in_shardings=(param_sharding, img_sharding),
        out_shardings=out_sharding,
    )


def make_mesh_2d(n_data: int, n_space: int) -> Mesh:
    """(data, space) mesh for combined frame + within-frame sharding."""
    devs = np.array(jax.devices()[:n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devs, axis_names=("data", "space"))


def spatial_parallel_forward(model, mesh: Mesh, axis: str = "space",
                             compute_dtype=None):
    """Within-image spatial sharding (SURVEY.md section 2.7's 'optional
    within-image spatial sharding of the backbone for large inputs').

    The input image's ROW axis is sharded over the mesh's ``axis``; params
    are replicated. XLA GSPMD partitions the resize + every convolution
    spatially, inserting the halo exchanges (collective-permutes over ICI)
    that a hand-written distributed conv would need, and gathers the small
    tensors (proposals, detections) where the data-dependent stages demand
    a global view. Outputs are replicated.

    Use when a single frame is too large or too slow for one chip; for
    throughput over many frames prefer data_parallel_forward (no collectives
    at all). The input height must be divisible by the axis size.

    PERF CAVEAT: correctness is tested (8-device virtual mesh invariance,
    tests/test_multichip.py) but halo-exchange cost and the crossover point
    vs single-chip are UNCHARACTERIZED — this harness has one physical
    chip, so no ICI measurement is possible. Treat the partitioning as
    functional, not as performance-validated; profile on a real multi-chip
    slice before relying on it for latency.
    """
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32
    img_sharding = NamedSharding(mesh, P(axis))
    param_sharding = NamedSharding(mesh, P())
    out_sharding = NamedSharding(mesh, P())
    return jax.jit(
        partial(model.forward, compute_dtype=dtype),
        in_shardings=(param_sharding, img_sharding),
        out_shardings=out_sharding,
    )
