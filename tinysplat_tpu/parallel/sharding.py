"""Device mesh + sharding-spec helpers for the splat trainer.

Mesh layout (axes are logical; sizes come from config / jax.devices()):

  'data' — camera batch: each data group renders different training views
           per step; parameter gradients are summed across it (the psum is
           fused into the FSDP reduce-scatter, see train_step.py).
  'tile' — image pixel rows: each shard rasterizes a horizontal band of every
           view it touches. This is the reference's 16x16 CUDA tile grid
           (/root/reference/tinysplat/splatting/rasterize.py:19-20,88-94)
           lifted to the mesh level (SURVEY.md section 2.3).

Splat-capacity arrays (parameters, Adam moments, alive mask, grad accumulator)
are sharded over BOTH axes flattened — ZeRO-3/FSDP-style — so per-chip HBM for
the model and optimizer scales as 1/N_devices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPLAT_AXES = ("data", "tile")


def make_mesh(
    data: int = 1,
    tile: int = 0,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'tile') mesh.

    tile=0 means "use all remaining devices on the tile axis".
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tile <= 0:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        tile = n // data
    assert data * tile <= n, f"mesh {data}x{tile} exceeds {n} devices"
    dev = np.asarray(devices[: data * tile]).reshape(data, tile)
    return Mesh(dev, SPLAT_AXES)


def _capacity_spec(ndim: int) -> P:
    """PartitionSpec sharding axis 0 over the flattened mesh."""
    return P(SPLAT_AXES, *([None] * (ndim - 1)))


def capacity_leaf_spec(leaf) -> P:
    """Spec for one pytree leaf: shard axis 0 if it is a capacity array."""
    ndim = getattr(leaf, "ndim", 0)
    if ndim >= 1:
        return _capacity_spec(ndim)
    return P()


def state_specs(state_like) -> "jax.tree_util.PyTreeDef":
    """PartitionSpecs for a GaussianState-shaped pytree.

    Every (capacity, ...) array is sharded over ('data', 'tile'); scalars
    (active_sh_degree, Adam step count) are replicated.
    """
    return jax.tree.map(capacity_leaf_spec, state_like)


def state_shardings(mesh: Mesh, state_like):
    """NamedShardings for a GaussianState / optimizer-state pytree."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, capacity_leaf_spec(leaf)), state_like
    )


def host_to_global(mesh: Mesh, spec: P, value) -> jax.Array:
    """Stage one host value as a global array on a possibly multi-process mesh.

    Multi-controller JAX runs the host loop in lockstep on every process;
    every process passes the SAME full (global-shape) host value and gets
    back a global jax.Array of which it materializes only its addressable
    shards. Single-process reduces to a plain device_put."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    arr = np.asarray(value)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_state(mesh: Mesh, state):
    """Place a (host or replicated) state pytree onto the mesh, sharded.

    Multi-process: host/local leaves are staged shard-by-shard (every process
    holds the same full value — see host_to_global); already-global leaves
    (e.g. grown arrays after a capacity doubling) go through device_put's
    cross-host resharding."""
    if jax.process_count() == 1:
        return jax.device_put(state, state_shardings(mesh, state))

    def put(leaf):
        sh = NamedSharding(mesh, capacity_leaf_spec(leaf))
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return jax.device_put(leaf, sh)
        return host_to_global(mesh, capacity_leaf_spec(leaf), leaf)

    return jax.tree.map(put, state)
