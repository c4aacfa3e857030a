"""Densify/prune on fixed-capacity arrays vs the reference algorithm's masks.

Spec: /root/reference/tinysplat/splatting/model_gaussian.py:138-242 (clone /
split / prune rules + Adam-state carry), recast as masked scatters
(SURVEY.md section 4 item 2).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.config import Config
from tinysplat_tpu.models.densify import densify_and_prune, reset_opacities
from tinysplat_tpu.models.gaussians import GaussianParams, GaussianState
from tinysplat_tpu.train import init_opt_state

CAP = 64
N = 16


def _state(grad_accum, log_scales_max, opac_sigmoid):
    """Build a CAP-capacity state with N live splats with given properties."""
    rng = np.random.default_rng(0)
    means = rng.normal(size=(CAP, 3)).astype(np.float32)
    scales = np.full((CAP, 3), -10.0, np.float32)
    scales[:N] = np.log(np.asarray(log_scales_max, np.float32))[:, None] - np.log([2.0, 1.5, 1.0])
    # max over the 3 axes = the requested value (last column).
    scales[:N, 2] = np.log(np.asarray(log_scales_max, np.float32))
    quats = np.zeros((CAP, 4), np.float32)
    quats[:, 0] = 1.0
    opac = np.full((CAP, 1), -20.0, np.float32)
    p = np.clip(np.asarray(opac_sigmoid, np.float32), 1e-6, 1 - 1e-6)
    opac[:N, 0] = np.log(p / (1 - p))
    params = GaussianParams(
        means=jnp.asarray(means),
        colors_dc=jnp.asarray(rng.normal(size=(CAP, 3)).astype(np.float32)),
        colors_rest=jnp.asarray(np.zeros((CAP, 8, 3), np.float32)),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
    )
    accum = np.zeros((CAP,), np.float32)
    accum[:N] = grad_accum
    return GaussianState(
        params=params,
        alive=jnp.asarray(np.arange(CAP) < N),
        means_grad_accum=jnp.asarray(accum),
        active_sh_degree=jnp.int32(3),
    )


def test_clone_split_prune_masks():
    cfg = Config()
    interval, max_dim = 100, 1000
    # grad_norm_avg = accum / 100 / 2 * 1000 = accum * 5; tau = 2e-4
    # -> accum >= 4e-5 triggers the grad mask.
    grad = np.zeros(N, np.float32)
    grad[:8] = 1e-3  # strong gradient signal
    smax = np.linspace(0.004, 0.006, N).astype(np.float32)  # small -> clone
    smax[4:8] = [0.02, 0.03, 0.04, 0.05]  # large -> split candidates
    smax[12] = 0.6  # huge + transparent -> prune
    op = np.full(N, 0.9, np.float32)
    op[12] = 0.05
    state = _state(grad, smax, op)
    opt = init_opt_state(cfg, state)
    # Give survivors nonzero Adam moments to verify carry.
    opt = jax.tree.map(
        lambda x: jnp.ones_like(x) if getattr(x, "ndim", 0) >= 1 and x.shape[:1] == (CAP,) else x,
        opt,
    )

    new_state, new_opt, stats = densify_and_prune(
        state, opt, jax.random.PRNGKey(0), interval, max_dim, cfg
    )
    stats = jax.device_get(stats)
    assert stats["cloned"] == 4  # splats 0-3: small + grad
    assert stats["split"] == 4  # splats 4-7: large + grad
    assert stats["pruned"] == 5  # splat 12 (transparent+huge) + 4 split originals
    assert stats["dropped"] == 0
    # live: 16 - 5 pruned + 4 clones + 8 split samples = 23
    assert stats["num_live"] == 23
    assert int(jnp.sum(new_state.alive)) == 23

    # Clones are exact copies: every live splat's full param row must appear
    # at least twice for the cloned sources.
    means = np.asarray(new_state.params.means)
    alive = np.asarray(new_state.alive)
    src = np.asarray(state.params.means)
    for i in range(4):
        matches = np.isclose(means[alive], src[i], atol=0).all(axis=1).sum()
        assert matches == 2, f"clone {i}: {matches}"

    # Split samples: scales divided by phi (in log space).
    old_scales = np.asarray(state.params.scales)
    new_scales = np.asarray(new_state.params.scales)
    expected = old_scales[4] - np.log(cfg.phi)
    live_rows = new_scales[alive]
    n_match = np.isclose(live_rows, expected, atol=1e-5).all(axis=1).sum()
    assert n_match == 2  # two samples of split original 4

    # Pruned splats' exact parameter rows no longer exist among live splats
    # (their slots may be reused by newcomers, so check content, not index).
    for i in [12] + list(range(4, 8)):
        matches = np.isclose(means[alive], src[i], atol=0).all(axis=1).sum()
        assert matches == 0, f"pruned splat {i} still present"

    # Adam carry: surviving slots keep moments; reused/new slots zeroed.
    adam = new_opt[0]
    mu = np.asarray(adam.mu.means)
    survivor_slots = np.asarray(state.alive) & ~np.isin(np.arange(CAP), [4, 5, 6, 7, 12])
    newcomer_slots = alive & ~survivor_slots
    assert np.all(mu[survivor_slots] == 1.0)
    assert np.all(mu[newcomer_slots] == 0.0)

    # Grad accumulator resets.
    assert np.all(np.asarray(new_state.means_grad_accum) == 0.0)


def test_densify_overflow_drops_and_reports():
    cfg = Config()
    grad = np.full(N, 1e-2, np.float32)  # everyone wants to split
    smax = np.full(N, 0.02, np.float32)
    op = np.full(N, 0.9, np.float32)
    state = _state(grad, smax, op)
    # Shrink capacity headroom: only 8 free slots.
    small_cap = N + 8
    state = jax.tree.map(
        lambda x: x[:small_cap] if getattr(x, "ndim", 0) >= 1 and x.shape[0] == CAP else x,
        state,
    )
    opt = init_opt_state(cfg, state)
    new_state, _, stats = densify_and_prune(
        state, opt, jax.random.PRNGKey(1), 100, 1000, cfg
    )
    stats = jax.device_get(stats)
    # 16 split originals pruned -> 16+8=24 free; 32 samples -> 8 dropped.
    assert stats["split"] == 16
    assert stats["dropped"] == 8
    assert stats["num_live"] == 24
    assert int(jnp.sum(new_state.alive)) == small_cap


def test_reset_opacities_clamps_live_only():
    state = _state(
        np.zeros(N, np.float32), np.full(N, 0.01, np.float32), np.full(N, 0.9, np.float32)
    )
    out = reset_opacities(state, epsilon_alpha=0.005)
    op = jax.nn.sigmoid(np.asarray(out.params.opacities[:, 0]))
    # gsplat convention: reset value = 2 * the prune floor, ABOVE it so the
    # reset splats get a recovery window instead of being mass-pruned.
    assert np.all(op[:N] <= 2 * 0.005 + 1e-6)
    assert np.all(op[:N] > 0.005)
    # Dead slots untouched (still sentinel -20).
    assert np.all(np.asarray(out.params.opacities[N:, 0]) == -20.0)


def test_reset_opacities_zeroes_adam_moments():
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.train import init_opt_state

    state = _state(
        np.zeros(N, np.float32), np.full(N, 0.9, np.float32),
        np.full(N, 0.9, np.float32)
    )
    opt = init_opt_state(Config(), state)
    opt = jax.tree.map(lambda x: jnp.ones_like(x), opt)  # fake nonzero moments
    new_state, new_opt = reset_opacities(state, 0.005, opt_state=opt)
    mu = np.asarray(new_opt[0].mu.opacities[:, 0])
    assert np.all(mu[:N] == 0.0)  # reset entries: moments cleared
    assert np.all(np.asarray(new_opt[0].mu.means) == 1.0)  # others untouched
