"""Gaussian splat parameter model: fixed-capacity pytrees + alive mask.

TPU-native redesign of the reference's ``GaussianModel``
(/root/reference/tinysplat/splatting/model_gaussian.py:21-110). The reference
mutates the *length* of every parameter tensor during densification
(model_gaussian.py:199-242) — impossible under XLA's static-shape compilation
model. Here the six learnable per-splat arrays live in arrays of static
``capacity`` >= live count, with a boolean ``alive`` mask; densify/prune are
masked scatters (see ``models/densify.py``), and capacity growth is a rare,
explicit host-side reallocation (one recompile per doubling).

Parameter semantics (names, shapes, activations) match the reference:
  means (C, 3) world positions;  scales (C, 3) log-scales (exp() applied at
  projection, rasterize.py:72);  quats (C, 4) unnormalized (w, x, y, z);
  colors_dc (C, 3) SH band-0;  colors_rest (C, K-1, 3) higher SH bands;
  opacities (C, 1) logits (sigmoid applied at rasterization,
  rasterize.py:86).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import num_sh_bases, deg_from_sh
from ..utils.color import RGB2SH
from ..utils.quaternions import random_quats


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """The six learnable per-splat arrays (leading dim = capacity)."""

    means: jax.Array  # (C, 3)
    colors_dc: jax.Array  # (C, 3)
    colors_rest: jax.Array  # (C, K-1, 3)
    scales: jax.Array  # (C, 3) log-space
    quats: jax.Array  # (C, 4)
    opacities: jax.Array  # (C, 1) logit-space

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_bases(self) -> int:
        return self.colors_rest.shape[1] + 1

    def sh_coeffs(self) -> jax.Array:
        """(C, K, 3) concatenated SH coefficients (dc first).

        Matches /root/reference/tinysplat/splatting/rasterize.py:80.
        """
        return jnp.concatenate([self.colors_dc[:, None, :], self.colors_rest], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    """Full trainable state: parameters + structural/bookkeeping arrays."""

    params: GaussianParams
    alive: jax.Array  # (C,) bool — slot holds a live splat
    means_grad_accum: jax.Array  # (C,) accumulated ||dL/d xys|| for densify
    # Traced scalar so SH warm-up doesn't recompile
    # (reference model_gaussian.py:126-128).
    active_sh_degree: jax.Array  # () int32

    @property
    def capacity(self) -> int:
        return self.params.capacity

    def num_live(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


def _knn_mean_log_dist(xyz: np.ndarray, k: int = 3) -> np.ndarray:
    """log(mean distance to the k nearest neighbors), per point.

    Host-side init-time computation, matching the reference's sklearn 4-NN
    scale initialization (/root/reference/tinysplat/splatting/model_gaussian.py:75-81).
    """
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k + 1, algorithm="auto", metric="euclidean").fit(xyz)
    distances, _ = nn.kneighbors(xyz)
    mean_dist = np.maximum(np.mean(distances[:, 1:], axis=1), 1e-10)
    return np.log(mean_dist.astype(np.float32))


def init_from_pcd(
    xyz: np.ndarray,
    colors: np.ndarray,
    sh_degree: int = 3,
    capacity: Optional[int] = None,
    opacity_init: float = 0.1,
    seed: int = 0,
) -> GaussianState:
    """Initialize splats from an SfM point cloud.

    Semantics of ``GaussianModel.from_pcd``
    (/root/reference/tinysplat/splatting/model_gaussian.py:65-90): SH dc from
    point colors, log-mean-3NN-distance isotropic scales, random rotations,
    opacity = logit(0.1). Arrays are padded to ``capacity`` (default: next
    power of two >= 2N) with dead slots.

    Args:
      xyz: (N, 3) float point positions.
      colors: (N, 3) uint8/float point colors in [0, 255].
    """
    xyz = np.asarray(xyz, dtype=np.float32)
    colors = np.asarray(colors, dtype=np.float32)
    n = xyz.shape[0]
    if capacity is None:
        capacity = max(1 << int(np.ceil(np.log2(max(2 * n, 1024)))), 1024)
    assert capacity >= n

    dim_sh = num_sh_bases(sh_degree)
    dc = RGB2SH(colors / 255.0)
    log_scales = _knn_mean_log_dist(xyz)

    def pad(arr, fill=0.0):
        out = np.full((capacity,) + arr.shape[1:], fill, dtype=np.float32)
        out[:n] = arr
        return jnp.asarray(out)

    quats = np.asarray(random_quats(jax.random.PRNGKey(seed), n))
    dead_quat = np.zeros((capacity, 4), np.float32)
    dead_quat[:, 0] = 1.0
    dead_quat[:n] = quats

    params = GaussianParams(
        means=pad(xyz),
        colors_dc=pad(dc),
        colors_rest=pad(np.zeros((n, dim_sh - 1, 3), np.float32)),
        scales=pad(np.repeat(log_scales[:, None], 3, axis=1), fill=-10.0),
        quats=jnp.asarray(dead_quat),
        # Dead slots get a very negative logit => sigmoid ~ 0 (invisible).
        opacities=pad(np.full((n, 1), _logit(opacity_init), np.float32), fill=-20.0),
    )
    alive = jnp.asarray(np.arange(capacity) < n)
    return GaussianState(
        params=params,
        alive=alive,
        means_grad_accum=jnp.zeros((capacity,), jnp.float32),
        active_sh_degree=jnp.int32(1),
    )


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


def state_dict(state: GaussianState) -> Dict[str, np.ndarray]:
    """Compact (live-only) numpy snapshot, reference-compatible field names.

    Mirrors what ``torch.save(model.state_dict())`` captures in the reference
    (scripts/train.py:122-124): the six parameter tensors with dead slots
    stripped, plus the active SH degree.
    """
    alive = np.asarray(state.alive)
    out = {}
    for name in ("means", "colors_dc", "colors_rest", "scales", "quats", "opacities"):
        out[name] = np.asarray(getattr(state.params, name))[alive]
    out["active_sh_degree"] = np.asarray(state.active_sh_degree)
    return out


def from_state_dict(sd: Dict[str, np.ndarray], capacity: Optional[int] = None) -> GaussianState:
    """Rebuild a GaussianState from a compact snapshot.

    Shape-inferred like ``GaussianModel.from_state_checkpoint``
    (/root/reference/tinysplat/splatting/model_gaussian.py:92-110): N from
    means, SH degree from colors_rest.
    """
    n = sd["means"].shape[0]
    if capacity is None:
        capacity = max(1 << int(np.ceil(np.log2(max(2 * n, 1024)))), 1024)
    assert capacity >= n, (
        f"capacity {capacity} < {n} splats in the state dict")
    dim_sh = sd["colors_rest"].shape[1] + 1
    sh_degree = deg_from_sh(dim_sh)

    def pad(arr, fill=0.0):
        out = np.full((capacity,) + arr.shape[1:], fill, dtype=np.float32)
        out[:n] = arr
        return jnp.asarray(out)

    # Dead-slot quats must be the identity (w=1), never all-zero: a
    # zero-norm quaternion makes the normalization VJP emit NaN gradients
    # for that row (0/0 inside the norm's backward), which would poison the
    # Adam moments of every dead slot on resume (init_from_pcd and
    # grow_capacity already use w=1).
    quats = np.zeros((capacity, 4), np.float32)
    quats[:, 0] = 1.0
    quats[:n] = sd["quats"]
    params = GaussianParams(
        means=pad(sd["means"]),
        colors_dc=pad(sd["colors_dc"]),
        colors_rest=pad(sd["colors_rest"]),
        scales=pad(sd["scales"], fill=-10.0),
        quats=jnp.asarray(quats),
        opacities=pad(sd["opacities"], fill=-20.0),
    )
    active = sd.get("active_sh_degree")
    active_deg = int(active) if active is not None else sh_degree
    return GaussianState(
        params=params,
        alive=jnp.asarray(np.arange(capacity) < n),
        means_grad_accum=jnp.zeros((capacity,), jnp.float32),
        active_sh_degree=jnp.int32(active_deg),
    )


def compact_state(state: GaussianState, opt_state, min_capacity: int = 64,
                  margin: float = 2.0):
    """Repack live splats contiguously and shrink capacity — the inverse of
    grow_capacity (beyond the reference, whose prune physically reallocates
    tensors every pass, model_gaussian.py:199-242; here dead slots
    accumulate until explicitly reclaimed).

    Shrinks to the smallest power of two >= n_live * margin (HBM headroom
    for future densification), but never below ``min_capacity``. Live
    order is preserved (stable sort), and every capacity-sized optimizer
    leaf (Adam moments) follows its splat through the permutation.

    Returns (state, opt_state, compacted: bool) — a no-op (False) when the
    target would not be smaller. Host-side; triggers one recompile of
    capacity-shaped executables when it fires.
    """
    import math

    cap = state.capacity
    n_live = int(jax.device_get(jnp.sum(state.alive.astype(jnp.int32))))
    target = max(
        int(min_capacity),
        1 << max(0, math.ceil(math.log2(max(n_live * margin, 1.0)))),
        # A margin < 1 must never make compaction DESTROY live splats: the
        # truncating perm below assumes every live row fits.
        1 << max(0, math.ceil(math.log2(max(n_live, 1)))),
    )
    if target >= cap:
        return state, opt_state, False
    perm = jnp.argsort(~state.alive, stable=True)[:target]

    def take(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cap:
            return x[perm]
        return x

    params = jax.tree.map(take, state.params)
    alive = state.alive[perm]
    # Tail dead slots: re-assert benign sentinels (cheap, defensive).
    dead = ~alive
    params.opacities = jnp.where(dead[:, None], -20.0, params.opacities)
    params.scales = jnp.where(dead[:, None], -10.0, params.scales)
    new_state = GaussianState(
        params=params,
        alive=alive,
        means_grad_accum=state.means_grad_accum[perm],
        active_sh_degree=state.active_sh_degree,
    )
    new_opt = jax.tree.map(take, opt_state)
    return new_state, new_opt, True


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity growth (rare; triggers one recompile)."""
    assert new_capacity >= state.capacity

    def pad_leaf(x):
        pad_width = [(0, new_capacity - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    params = jax.tree.map(pad_leaf, state.params)
    # Keep dead-slot sentinels benign.
    params.opacities = params.opacities.at[state.capacity :].set(-20.0)
    params.quats = params.quats.at[state.capacity :, 0].set(1.0)
    params.scales = params.scales.at[state.capacity :].set(-10.0)
    return GaussianState(
        params=params,
        alive=pad_leaf(state.alive),
        means_grad_accum=pad_leaf(state.means_grad_accum),
        active_sh_degree=state.active_sh_degree,
    )
