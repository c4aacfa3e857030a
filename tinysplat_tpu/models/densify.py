"""Adaptive densification: clone / split / prune on fixed-capacity arrays.

TPU-native redesign of the reference's dynamic-shape parameter surgery
(/root/reference/tinysplat/splatting/model_gaussian.py:138-242). The reference
concatenates/masks every parameter tensor AND its Adam moments each densify
step; under XLA all shapes are static, so here densification is a bounded
scatter into the dead slots of the capacity-sized arrays:

  1. grad_norm_avg = means_grad_accum / interval / 2 * max(W, H);
     grad_mask = grad_norm_avg >= tau_means                (:149-152)
  2. clone:  grad_mask & max(exp(scales)) <  thresh — exact copy   (:154-164)
  3. split:  grad_mask & max(exp(scales)) >  thresh — 2 samples from
     N(mean, R diag(s^2) R^T), new scales = log(exp(scales)/phi)   (:166-177,
     GaussianDistribution :533-572)
  4. prune:  (sigmoid(opacity) < 0.1 & max(exp(scales)) > 0.5) | split
     originals                                              (:179-184)
  5. Adam moment carry: survivors keep exp_avg/exp_avg_sq, newcomers (and
     freed slots) get zeros                                 (:227-235)
  6. means_grad_accum resets to zero                        (:196-197)

Candidate layout: every live slot can spawn at most two new splats (clone=1,
split=2, mutually exclusive), so candidates live in a static (C, 2) grid;
valid candidates are rank-compacted into dead slots via one argsort over the
alive mask. Candidates beyond the free-slot budget are dropped and counted —
the host loop checks `stats['dropped']` and grows capacity (one recompile,
models/gaussians.grow_capacity) before the next densify.

All ops are plain jnp on the (possibly mesh-sharded) capacity axis; under
GSPMD the few global ops (cumsum, argsort) lower to collectives, which is fine
at a once-per-100-steps cadence.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils.quaternions import quat_to_rotmat
from .gaussians import GaussianParams, GaussianState


def _max_scale(params: GaussianParams) -> jax.Array:
    return jnp.max(jnp.exp(params.scales), axis=-1)


@partial(jax.jit, static_argnames=("interval", "max_dim", "cfg"))
def densify_and_prune(
    state: GaussianState,
    opt_state: Any,
    key: jax.Array,
    interval: int,
    max_dim: int,
    cfg: Config,
) -> Tuple[GaussianState, Any, Dict[str, jax.Array]]:
    """One densify/prune pass (the caller gates on step, reference :139-147).

    Args:
      interval: steps since the last pass (reference uses interval_densify,
        set to the camera count at scripts/train.py:277).
      max_dim: max(image width, height) of the training views.

    Returns (new_state, new_opt_state, stats) where stats reports clone /
    split / prune / dropped counts as device scalars.
    """
    params, alive = state.params, state.alive
    cap = params.capacity

    grad_avg = state.means_grad_accum / interval / 2.0 * max_dim
    grad_mask = (grad_avg >= cfg.tau_means) & alive
    scale_max = _max_scale(params)

    clone_mask = grad_mask & (scale_max < cfg.densify_scale_thresh)
    split_mask = grad_mask & (scale_max > cfg.densify_scale_thresh)
    prune_mask = (
        (jax.nn.sigmoid(params.opacities[:, 0]) < 0.1) & (scale_max > 0.5)
    ) | split_mask
    prune_mask = prune_mask & alive

    # Reference hard cap (model_gaussian.py:145-147): skip if over budget.
    over_cap = jnp.sum(alive.astype(jnp.int32)) > cfg.max_gaussians
    clone_mask = clone_mask & ~over_cap
    split_mask = split_mask & ~over_cap
    prune_mask = prune_mask & ~over_cap

    survivors = alive & ~prune_mask

    # --- candidate construction: (C, 2) static grid -------------------------
    # candidate (i, 0): clone copy OR split sample 0; (i, 1): split sample 1.
    eps = jax.random.normal(key, (2, cap, 3), dtype=params.means.dtype)
    R = quat_to_rotmat(params.quats)  # (C, 3, 3)
    pert = jnp.einsum("cij,scj->sci", R, eps * jnp.exp(params.scales)[None])
    split_means = params.means[None] + pert  # (2, C, 3)
    split_scales = params.scales - jnp.log(cfg.phi)

    cand_valid = jnp.stack([clone_mask | split_mask, split_mask])  # (2, C)

    def cand_leaf(name):
        v = getattr(params, name)
        first = v
        if name == "means":
            first = jnp.where(split_mask[:, None], split_means[0], v)
            second = split_means[1]
        elif name == "scales":
            first = jnp.where(split_mask[:, None], split_scales, v)
            second = split_scales
        else:
            second = v
        return jnp.stack([first, second])  # (2, C, ...)

    cand = GaussianParams(
        means=cand_leaf("means"),
        colors_dc=cand_leaf("colors_dc"),
        colors_rest=cand_leaf("colors_rest"),
        scales=cand_leaf("scales"),
        quats=cand_leaf("quats"),
        opacities=cand_leaf("opacities"),
    )

    # --- compact candidates into dead slots ---------------------------------
    flat_valid = cand_valid.reshape(-1)  # (2C,) sample-major, then slot order
    cand_rank = jnp.cumsum(flat_valid) - 1  # rank among valid candidates
    n_new = jnp.sum(flat_valid.astype(jnp.int32))

    free = ~survivors
    n_free = jnp.sum(free.astype(jnp.int32))
    # Free slots in ascending index order (stable argsort of ~free).
    free_slots = jnp.argsort(~free, stable=True)  # first n_free entries free

    placed = flat_valid & (cand_rank < n_free)
    # Each placed candidate goes to free_slots[cand_rank]; dropped ones park
    # at an out-of-range index (scatter mode='drop').
    target = jnp.where(placed, free_slots[jnp.minimum(cand_rank, cap - 1)], cap)

    def place(new_leaf_2c, old_leaf):
        flat = new_leaf_2c.reshape((2 * cap,) + new_leaf_2c.shape[2:])
        return old_leaf.at[target].set(flat, mode="drop")

    # Freed (pruned) slots first get dead-slot sentinels so they stay
    # invisible if not reused.
    def clear_dead(leaf, fill):
        return jnp.where(
            _expand(survivors, leaf.ndim), leaf, jnp.asarray(fill, leaf.dtype)
        )

    base = GaussianParams(
        means=clear_dead(params.means, 0.0),
        colors_dc=clear_dead(params.colors_dc, 0.0),
        colors_rest=clear_dead(params.colors_rest, 0.0),
        scales=clear_dead(params.scales, -10.0),
        quats=_reset_quats(params.quats, survivors),
        opacities=clear_dead(params.opacities, -20.0),
    )
    new_params = jax.tree.map(place, cand, base)

    new_alive = survivors.at[target].set(placed, mode="drop")

    # --- Adam moment carry (reference :227-235) ------------------------------
    keep = survivors  # survivors keep moments; everything else zeroes

    def fix_moment(m_leaf):
        if getattr(m_leaf, "ndim", 0) >= 1 and m_leaf.shape[:1] == (cap,):
            return jnp.where(_expand(keep, m_leaf.ndim), m_leaf, 0.0)
        return m_leaf

    new_opt_state = jax.tree.map(fix_moment, opt_state)

    new_state = dataclasses.replace(
        state,
        params=new_params,
        alive=new_alive,
        means_grad_accum=jnp.zeros_like(state.means_grad_accum),
    )
    stats = {
        "cloned": jnp.sum(clone_mask.astype(jnp.int32)),
        "split": jnp.sum(split_mask.astype(jnp.int32)),
        "pruned": jnp.sum(prune_mask.astype(jnp.int32)),
        "dropped": jnp.maximum(n_new - n_free, 0),
        "num_live": jnp.sum(new_alive.astype(jnp.int32)),
    }
    return new_state, new_opt_state, stats


def _expand(mask: jax.Array, ndim: int) -> jax.Array:
    return mask.reshape(mask.shape + (1,) * (ndim - 1))


def _reset_quats(quats: jax.Array, survivors: jax.Array) -> jax.Array:
    dead_quat = jnp.zeros_like(quats).at[:, 0].set(1.0)
    return jnp.where(survivors[:, None], quats, dead_quat)


@jax.jit
def prune_by_mask(state: GaussianState, opt_state: Any, prune_mask: jax.Array):
    """Kill the masked splats and zero their Adam moments.

    Used at the density-regularization start step, where the reference prunes
    every splat with sigmoid(opacity) < 0.5 via ``update_state``
    (/root/reference/scripts/train.py:105-107).
    """
    survivors = state.alive & ~prune_mask
    cap = state.capacity

    params = GaussianParams(
        means=jnp.where(_expand(survivors, 2), state.params.means, 0.0),
        colors_dc=jnp.where(_expand(survivors, 2), state.params.colors_dc, 0.0),
        colors_rest=jnp.where(_expand(survivors, 3), state.params.colors_rest, 0.0),
        scales=jnp.where(_expand(survivors, 2), state.params.scales, -10.0),
        quats=_reset_quats(state.params.quats, survivors),
        opacities=jnp.where(_expand(survivors, 2), state.params.opacities, -20.0),
    )

    def fix_moment(m_leaf):
        if getattr(m_leaf, "ndim", 0) >= 1 and m_leaf.shape[:1] == (cap,):
            return jnp.where(_expand(survivors, m_leaf.ndim), m_leaf, 0.0)
        return m_leaf

    new_opt = jax.tree.map(fix_moment, opt_state)
    new_state = dataclasses.replace(
        state,
        params=params,
        alive=survivors,
        means_grad_accum=jnp.where(survivors, state.means_grad_accum, 0.0),
    )
    return new_state, new_opt


@partial(jax.jit, static_argnames=("epsilon_alpha",))
def reset_opacities(state: GaussianState, epsilon_alpha: float = 0.005,
                    opt_state=None):
    """Periodic opacity reset (reference model_gaussian.py:134-136).

    The reference writes the *raw logit* to epsilon_alpha/2 (sigmoid ~ 0.5) —
    and never calls the method (scripts/train.py has no call site; SURVEY.md
    section 2.1). We wire it behind --interval-opacity-reset with the
    standard 3DGS/gsplat semantics the knob intends: clamp live opacities to
    at most **2 * epsilon_alpha** in probability space (gsplat's
    reset_opa = 2 * prune_opa — the reset value must sit ABOVE the prune
    floor so splats get a recovery window), and ZERO the opacity Adam
    moments (3DGS replace_tensor_to_optimizer) so stale momentum doesn't
    keep pushing the fresh logits in the pre-reset direction.

    Returns state, or (state, opt_state) when opt_state is given.
    """
    p = min(2.0 * epsilon_alpha, 0.99)
    target_logit = float(np.log(p / (1.0 - p)))
    op = jnp.minimum(state.params.opacities, target_logit)
    op = jnp.where(state.alive[:, None], op, state.params.opacities)
    new_state = dataclasses.replace(
        state, params=dataclasses.replace(state.params, opacities=op)
    )
    if opt_state is None:
        return new_state

    was_reset = op < state.params.opacities  # clamped entries only

    def zero_opacity_moments(node):
        # Adam moments are GaussianParams-shaped pytrees (mu/nu) inside the
        # optax state; zero exactly their opacities leaf where the clamp
        # fired. Plain array leaves (e.g. the shared step count) pass
        # through.
        if not hasattr(node, "opacities"):
            return node
        return dataclasses.replace(
            node, opacities=jnp.where(was_reset, 0.0, node.opacities))

    new_opt = jax.tree.map(
        zero_opacity_moments, opt_state,
        is_leaf=lambda t: hasattr(t, "opacities"),
    )
    return new_state, new_opt
