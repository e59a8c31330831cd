"""Device mesh bootstrap for single-chip through multi-host pod slices.

The reference is single-process single-GPU (reference predict.py:396-399,481).
Here parallelism is first-class: a 2-D logical mesh with

- ``data``  : frames and ensemble members (batch-like, sharded over ICI/DCN)
- ``model`` : tensor-parallel axis for large UNets (attention heads / conv
  channels), usually size 1 for the Marigold-scale backbone.

Weights are replicated over ``data`` and optionally sharded over ``model``;
XLA inserts collectives (psum / all_gather) from the sharding annotations —
no hand-written transport layer.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXIS_DATA = "data"
AXIS_MODEL = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data * model`` must divide the device count."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    With ``spec.data == -1`` every device not consumed by ``model`` goes to the
    data axis. Device order follows ``jax.devices()`` so that the data axis
    spans hosts (DCN) outermost and chips (ICI) innermost, which keeps
    model-axis collectives on ICI.
    """
    if devices is None:
        devices = jax.devices()
    spec = spec or MeshSpec()
    n = len(devices)
    model = spec.model
    if model <= 0:
        raise ValueError(f"model axis size must be positive, got {model}")
    data = spec.data if spec.data != -1 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not match device count {n}"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = AXIS_DATA
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
