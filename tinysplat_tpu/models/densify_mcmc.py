"""MCMC densification: relocation + noise injection on fixed-capacity arrays.

Implements the 3DGS-MCMC strategy (Kheradmand et al. 2024, "3D Gaussian
Splatting as Markov Chain Monte Carlo"; the semantics of gsplat's
``MCMCStrategy`` + ``compute_relocation``) as an alternative to the
reference's clone/split/prune heuristics (densify.py; reference
model_gaussian.py:138-242). Training is viewed as sampling: instead of
spawning/destroying splats, DEAD splats (opacity below a floor) are
*relocated* onto high-opacity live splats — sampled with probability
proportional to opacity — and every step the means are perturbed with
covariance-shaped noise gated to near-dead splats (an SGLD-style explore
move). The splat count only ever grows toward a fixed cap.

This is the most TPU-idiomatic densifier of the two: capacity is FIXED by
design (no growth recompiles — the cap IS the capacity), relocation is a
gather + two masked scatters, and multiplicity counting is one scatter-add —
all static-shape, GSPMD-compatible ops, so the same function runs on
FSDP-sharded state.

Relocation math (gsplat ``relocation.cu`` / paper eq. 9): a splat of opacity
``o`` split into ``r`` identical copies keeps its rendered footprint when

    o_new      = 1 - (1 - o)^(1/r)
    scale_new  = scale * o / sum_{i=1..r} sum_{k=0..i-1}
                   C(i-1, k) (-1)^k o_new^{k+1} / sqrt(k+1)

(r = 1 is the identity: o_new = o, denominator = o.) The double sum is
reorganized here as a per-k coefficient table so the per-splat cost is one
(R_MAX,)-power contraction.
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

R_MAX = 32  # max relocation multiplicity per target (gsplat caps at 51)


def _coeff_table() -> np.ndarray:
    """(R_MAX + 1, R_MAX) table: row r, col k holds
    sum_{i=k+1..r} C(i-1, k) * (-1)^k / sqrt(k+1), so that
    denom(o, r) = sum_k table[r, k] * o^{k+1}."""
    from math import comb, sqrt

    t = np.zeros((R_MAX + 1, R_MAX), np.float64)
    for r in range(1, R_MAX + 1):
        for i in range(1, r + 1):
            for k in range(i):
                t[r, k] += comb(i - 1, k) * ((-1.0) ** k) / sqrt(k + 1.0)
    return t.astype(np.float32)


_COEFFS = _coeff_table()


def relocation_adjustment(opacity: jax.Array, ratio: jax.Array):
    """(o_new, scale_mult) for splitting splats into ``ratio`` copies.

    opacity: (...,) in (0, 1); ratio: (...,) int >= 1 (clipped to R_MAX).
    Returns the per-copy opacity and the multiplier on exp(scales).
    """
    ratio = jnp.clip(ratio, 1, R_MAX)
    o = jnp.clip(opacity, 1e-7, 1.0 - 1e-7)
    o_new = 1.0 - jnp.power(1.0 - o, 1.0 / ratio.astype(o.dtype))
    coeffs = jnp.asarray(_COEFFS)[ratio]  # (..., R_MAX)
    powers = jnp.power(
        o_new[..., None], jnp.arange(1, R_MAX + 1, dtype=o.dtype)
    )  # (..., R_MAX)
    denom = jnp.sum(coeffs * powers, axis=-1)
    scale_mult = o / jnp.maximum(denom, 1e-12)
    return o_new, scale_mult


def _logit(p: jax.Array) -> jax.Array:
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    return jnp.log(p) - jnp.log1p(-p)


@partial(jax.jit, static_argnames=("cfg",))
def relocate_and_grow(
    state: GaussianState,
    opt_state: Any,
    key: jax.Array,
    cfg: Config,
) -> Tuple[GaussianState, Any, Dict[str, jax.Array]]:
    """One MCMC refine pass: relocate dead splats + grow toward the cap.

    1. Sources = live splats with sigmoid(opacity) < mcmc_min_opacity, plus
       enough dead capacity slots to grow the live count by
       mcmc_growth_factor (toward min(mcmc_cap or capacity, max_gaussians)).
    2. Each source samples a target from the remaining live splats with
       probability proportional to opacity (inverse-CDF on the opacity
       cumsum — O(C log C), no per-sample categorical).
    3. Targets with n sources attached become n+1 copies: their opacity and
       scales are adjusted by ``relocation_adjustment``; sources copy the
       adjusted target parameters. Adam moments of sources AND touched
       targets reset to zero (gsplat MCMCStrategy semantics).
    """
    params, alive = state.params, state.alive
    cap = params.capacity
    o = jax.nn.sigmoid(params.opacities[:, 0])

    # --- source selection ---------------------------------------------------
    dead_live = alive & (o < cfg.mcmc_min_opacity)
    n_live = jnp.sum(alive.astype(jnp.int32))
    cap_target = min(cfg.mcmc_cap or cap, cfg.max_gaussians, cap)
    n_target = jnp.minimum(
        jnp.asarray(cap_target, jnp.int32),
        (n_live.astype(jnp.float32) * cfg.mcmc_growth_factor).astype(jnp.int32),
    )
    n_grow = jnp.maximum(n_target - n_live, 0)
    # First n_grow free capacity slots (ascending index; stable argsort).
    free_rank = jnp.cumsum((~alive).astype(jnp.int32)) - 1
    grow_mask = (~alive) & (free_rank < n_grow)
    src_mask = dead_live | grow_mask

    # --- target sampling: prob ∝ opacity over live non-sources --------------
    probs = jnp.where(alive & ~src_mask, o, 0.0)
    cdf = jnp.cumsum(probs)
    total = cdf[-1]
    u = jax.random.uniform(key, (cap,)) * total
    target = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, cap - 1)
    ok = total > 0.0  # degenerate scene: nothing to sample from -> no-op

    # --- multiplicity + adjustment ------------------------------------------
    counts = jnp.zeros((cap,), jnp.int32).at[target].add(
        src_mask.astype(jnp.int32)
    )
    ratio = 1 + counts
    o_new, scale_mult = relocation_adjustment(o, ratio)
    # gsplat relocate() clamps the per-copy opacity to min_opacity: without
    # it, a barely-alive target split r ways is born BELOW the dead floor
    # and gets relocated again next pass — a relocation-thrash loop that
    # wastes the grow budget and re-zeroes moments forever.
    o_new = jnp.maximum(o_new, cfg.mcmc_min_opacity)
    touched = (counts > 0) & alive & ok

    adj_opac = jnp.where(
        touched[:, None], _logit(o_new)[:, None], params.opacities
    )
    adj_scales = jnp.where(
        touched[:, None], params.scales + jnp.log(scale_mult)[:, None],
        params.scales,
    )
    adjusted = dataclasses.replace(
        params, opacities=adj_opac, scales=adj_scales
    )

    # --- place sources onto their targets -----------------------------------
    place = src_mask & ok

    def copy_from_target(leaf):
        return jnp.where(
            place.reshape((cap,) + (1,) * (leaf.ndim - 1)), leaf[target], leaf
        )

    new_params = jax.tree.map(copy_from_target, adjusted)
    new_alive = alive | place

    # --- reset optimizer moments + densify accum for changed slots ----------
    changed = place | touched

    def fix_moment(m):
        if getattr(m, "ndim", 0) >= 1 and m.shape[:1] == (cap,):
            return jnp.where(
                changed.reshape((cap,) + (1,) * (m.ndim - 1)), 0.0, m
            )
        return m

    new_opt = jax.tree.map(fix_moment, opt_state)
    new_state = dataclasses.replace(
        state,
        params=new_params,
        alive=new_alive,
        means_grad_accum=jnp.where(changed, 0.0, state.means_grad_accum),
    )
    stats = {
        "relocated": jnp.sum((dead_live & ok).astype(jnp.int32)),
        "grown": jnp.sum((grow_mask & ok).astype(jnp.int32)),
        "num_live": jnp.sum(new_alive.astype(jnp.int32)),
        # parity keys with densify_and_prune stats consumers:
        "cloned": jnp.zeros((), jnp.int32),
        "split": jnp.zeros((), jnp.int32),
        "pruned": jnp.zeros((), jnp.int32),
        "dropped": jnp.zeros((), jnp.int32),
    }
    return new_state, new_opt, stats


def apply_noise(
    params: GaussianParams,
    alive: jax.Array,
    eps: jax.Array,
    lr_scaler: jax.Array,
    cfg: Config,
) -> GaussianParams:
    """Core of inject_noise with the standard normals given explicitly —
    the sharded step slices one global eps array per shard so 1-device and
    N-device training produce identical noise (tests/test_parallel.py)."""
    o = jax.nn.sigmoid(params.opacities[:, 0])
    gate = jax.nn.sigmoid(100.0 * ((1.0 - o) - 0.995))
    R = quat_to_rotmat(params.quats)  # (C, 3, 3)
    s2 = jnp.exp(2.0 * params.scales)  # (C, 3) = diag of S^2
    # Sigma @ eps = R S^2 R^T eps, composed right-to-left as column ops.
    v = jnp.einsum("cji,cj->ci", R, eps)  # R^T eps
    v = v * s2
    v = jnp.einsum("cij,cj->ci", R, v)
    noise = v * (gate * alive.astype(v.dtype) * lr_scaler)[:, None]
    return dataclasses.replace(params, means=params.means + noise)


def inject_noise(
    params: GaussianParams,
    alive: jax.Array,
    key: jax.Array,
    lr_scaler: jax.Array,
    cfg: Config,
) -> GaussianParams:
    """Per-step SGLD-style position noise (gsplat inject_noise_to_position).

    means += Sigma @ eps * gate(opacity) * (mcmc_noise_lr * current means
    LR), with Sigma = R diag(exp(2*scales)) R^T and
    gate(o) = sigmoid(k * ((1 - o) - x0)), k=100, x0=0.995 — i.e. only
    near-dead splats (o ≲ 0.005) explore; converged splats stay put.
    Called inside the jitted train step AFTER the Adam update.
    """
    eps = jax.random.normal(key, params.means.shape, params.means.dtype)
    return apply_noise(params, alive, eps, lr_scaler, cfg)
