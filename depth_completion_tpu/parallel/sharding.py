"""Sharding rules: data-parallel frames/members, tensor-parallel UNet.

The scaling design (SURVEY.md §2.4): the reference is single-GPU; here

- ``data`` axis: frames and ensemble members (batch dim of every activation)
- ``model`` axis: optional tensor parallelism for large UNets — attention
  QKV/out and MLP projections sharded head-/channel-wise, and resnet convs
  sharded Megatron-style: ``conv1`` + ``time_emb_proj`` output-channel-
  sharded, ``conv2`` input-channel-sharded, so each resnet block needs one
  psum (at the conv2 output, where the partial sums meet the residual).
  The in-between GroupNorm stays shard-local because channel shards align
  to contiguous group boundaries whenever ``groups % model_size == 0``
  (SD2: 32 groups; channels 320..1280 — any power-of-two axis ≤ 32 works).
  Boundary convs (conv_in/out, shortcuts, down/upsamplers) replicate: their
  outputs feed skip connections and residuals that need full channels.

Everything is expressed as NamedSharding annotations; XLA GSPMD inserts the
collectives (all-gather/psum over ICI). No hand-written communication.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL

# Parameter-name → (spec for "kernel") rules for tensor parallelism.
# Linear kernels are [in, out]: shard `out` for fan-out projections
# (to_q/k/v, ff in) and `in` for fan-in projections (to_out, ff out) so the
# pair needs only one psum per block. Resnet convs pair the same way:
# conv1/time_emb_proj fan out (sharded output channels), conv2 fans in.
_TP_OUT_SHARDED = {"to_q", "to_k", "to_v", "proj_in"}
_TP_IN_SHARDED = {"to_out", "proj_out"}
_TP_CONV_OUT_SHARDED = {"conv1"}  # [kh,kw,I,O]: shard O
_TP_CONV_IN_SHARDED = {"conv2"}  # [kh,kw,I,O]: shard I
_TP_LINEAR_OUT_EXTRA = {"time_emb_proj"}  # rides conv1's output sharding


def unet_tp_spec(path: tuple, leaf: Any) -> PartitionSpec:
    """PartitionSpec for a UNet parameter at ``path`` (tree_map_with_path)."""
    names = [
        p.key if isinstance(p, jax.tree_util.DictKey) else None for p in path
    ]
    # the parent module name is the second-to-last dict key
    parent = None
    for name in reversed(names[:-1] if names and names[-1] else names):
        if name is not None:
            parent = name
            break
    leaf_name = names[-1] if names else None
    if leaf.ndim == 2 and leaf_name == "kernel":
        # ff lives under {"ff": {"proj_in","proj_out"}} — also matched here
        if parent in _TP_OUT_SHARDED | _TP_LINEAR_OUT_EXTRA:
            return PartitionSpec(None, AXIS_MODEL)
        if parent in _TP_IN_SHARDED:
            return PartitionSpec(AXIS_MODEL, None)
    if leaf.ndim == 4 and leaf_name == "kernel":
        if parent in _TP_CONV_OUT_SHARDED:
            return PartitionSpec(None, None, None, AXIS_MODEL)
        if parent in _TP_CONV_IN_SHARDED:
            return PartitionSpec(None, None, AXIS_MODEL, None)
    if leaf.ndim == 1 and parent in (
        _TP_OUT_SHARDED | _TP_LINEAR_OUT_EXTRA | _TP_CONV_OUT_SHARDED
    ):
        return PartitionSpec(AXIS_MODEL)
    return PartitionSpec()  # replicated


def unet_param_sharding(
    mesh: Mesh, path: tuple, leaf: Any, tensor_parallel: bool = True
) -> NamedSharding:
    """NamedSharding for one UNet param leaf: the TP spec with the
    divisibility fallback applied — a sharded dim that doesn't divide the
    model-axis size replicates instead (GSPMD would pad unevenly; tiny
    boundary layers don't pay). ``leaf`` needs only .shape/.ndim, so
    abstract ShapeDtypeStructs work (production-geometry lowering checks).
    """
    model_size = mesh.shape.get(AXIS_MODEL, 1)
    spec = unet_tp_spec(path, leaf) if tensor_parallel else PartitionSpec()
    for dim, axis in enumerate(spec):
        if axis == AXIS_MODEL and leaf.shape[dim] % model_size:
            spec = PartitionSpec()
            break
    return NamedSharding(mesh, spec)


def shard_bundle(mesh: Mesh, bundle, tensor_parallel: bool = False):
    """device_put the bundle: replicated, or TP-sharded UNet (attention/MLP
    linears + resnet conv channels; see module docstring)."""

    def place(path, leaf):
        return jax.device_put(
            leaf, unet_param_sharding(mesh, path, leaf, tensor_parallel)
        )

    unet_params = jax.tree_util.tree_map_with_path(place, bundle.unet_params)
    rep = lambda path, leaf: jax.device_put(  # noqa: E731
        leaf, NamedSharding(mesh, PartitionSpec())
    )
    vae_params = jax.tree_util.tree_map_with_path(rep, bundle.vae.params)
    ctx = jax.device_put(bundle.text_context, NamedSharding(mesh, PartitionSpec()))
    import dataclasses

    return dataclasses.replace(
        bundle,
        unet_params=unet_params,
        vae=dataclasses.replace(bundle.vae, params=vae_params),
        text_context=ctx,
    )


def shard_batch(mesh: Mesh, *arrays):
    """Shard the leading (batch) dim of each array over the data axis."""
    out = tuple(
        jax.device_put(
            a,
            NamedSharding(mesh, PartitionSpec(*([AXIS_DATA] + [None] * (a.ndim - 1)))),
        )
        for a in arrays
    )
    return out if len(out) > 1 else out[0]
