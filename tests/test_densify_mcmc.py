"""3DGS-MCMC densification strategy (models/densify_mcmc.py): relocation
math vs a direct numpy implementation, relocate/grow state surgery on
fixed-capacity arrays, noise-injection gating, and an end-to-end training
smoke. Beyond the reference (which only has clone/split/prune,
model_gaussian.py:138-242); semantics follow gsplat's MCMCStrategy."""
import dataclasses
from math import comb, sqrt

import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.config import Config
from tinysplat_tpu.models.densify_mcmc import (
    R_MAX,
    apply_noise,
    inject_noise,
    relocate_and_grow,
    relocation_adjustment,
)
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.train import init_opt_state


def _numpy_adjustment(o, r):
    o_new = 1.0 - (1.0 - o) ** (1.0 / r)
    denom = 0.0
    for i in range(1, r + 1):
        for k in range(i):
            denom += comb(i - 1, k) * ((-1.0) ** k) * o_new ** (k + 1) / sqrt(k + 1)
    return o_new, o / denom


def test_relocation_adjustment_matches_reference_formula():
    rng = np.random.default_rng(0)
    os_ = rng.uniform(0.01, 0.99, size=32).astype(np.float32)
    rs = rng.integers(1, R_MAX + 1, size=32)
    o_new, mult = relocation_adjustment(jnp.asarray(os_), jnp.asarray(rs))
    for i in range(32):
        eo, em = _numpy_adjustment(float(os_[i]), int(rs[i]))
        np.testing.assert_allclose(float(o_new[i]), eo, rtol=1e-4)
        np.testing.assert_allclose(float(mult[i]), em, rtol=5e-3)
    # ratio == 1 is the exact identity
    o1, m1 = relocation_adjustment(jnp.asarray(os_), jnp.ones(32, jnp.int32))
    np.testing.assert_allclose(np.asarray(o1), os_, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), 1.0, rtol=1e-4)
    # opacity conservation: compositing r copies of o_new reproduces o
    comp = 1.0 - (1.0 - np.asarray(o_new)) ** rs
    np.testing.assert_allclose(comp, os_, rtol=1e-4)


def _state(cap=64, n_live=24, n_dead_live=8, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n_live, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, size=(n_live, 3)).astype(np.float32)
    st = init_from_pcd(xyz, colors, sh_degree=1, capacity=cap)
    op = np.full((cap, 1), -20.0, np.float32)
    op[:n_dead_live] = -8.0  # sigmoid ~ 3e-4 < mcmc_min_opacity
    op[n_dead_live:n_live] = rng.uniform(0.5, 2.5, size=(n_live - n_dead_live, 1))
    return dataclasses.replace(
        st, params=dataclasses.replace(st.params, opacities=jnp.asarray(op))
    )


def test_relocate_and_grow():
    cap, n_live, n_dead = 64, 24, 8
    st = _state(cap, n_live, n_dead)
    cfg = Config(sh_degree=1, densify_strategy="mcmc", mcmc_cap=32,
                 mcmc_growth_factor=1.5)
    opt = init_opt_state(cfg, st)
    new_st, new_opt, stats = relocate_and_grow(st, opt, jax.random.PRNGKey(0), cfg)
    stats = jax.device_get(stats)
    # 8 dead-live relocated; live grows 24 -> min(32, int(24*1.5)=36) = 32.
    assert int(stats["relocated"]) == n_dead
    assert int(stats["grown"]) == 8
    assert int(stats["num_live"]) == 32

    # Every relocated/grown slot landed exactly on some healthy target.
    healthy = np.asarray(st.params.means[n_dead:n_live])
    placed = list(range(n_dead)) + list(range(n_live, n_live + 8))
    nm = np.asarray(new_st.params.means)
    for i in placed:
        d = np.abs(healthy - nm[i]).sum(axis=1).min()
        assert d < 1e-6, (i, d)
        assert bool(new_st.alive[i])

    # Touched targets + their copies conserve composited opacity:
    # 1 - (1 - o_new)^(count+1) == o_old.
    o_old = np.asarray(jax.nn.sigmoid(st.params.opacities[:, 0]))
    o_new = np.asarray(jax.nn.sigmoid(new_st.params.opacities[:, 0]))
    nmf = nm
    for t in range(n_dead, n_live):
        copies = [i for i in placed if np.abs(nmf[i] - np.asarray(st.params.means[t])).sum() < 1e-6]
        if copies:
            r = len(copies) + 1
            np.testing.assert_allclose(
                1.0 - (1.0 - o_new[t]) ** r, o_old[t], rtol=1e-3)
            # copies carry the target's adjusted opacity
            for i in copies:
                np.testing.assert_allclose(o_new[i], o_new[t], rtol=1e-5)

    # Adam moments of changed slots are zeroed.
    mu = jax.tree.leaves(new_opt)[0]  # a capacity-sized moment leaf
    # (just assert the relocated rows are zero in every capacity-sized leaf)
    for leaf in jax.tree.leaves(new_opt):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[:1] == (cap,):
            assert float(jnp.abs(leaf[jnp.asarray(placed)]).max()) == 0.0
    del mu


def test_inject_noise_gating():
    cap = 16
    rng = np.random.default_rng(1)
    st = init_from_pcd(rng.normal(size=(cap, 3)).astype(np.float32),
                       rng.uniform(0, 255, size=(cap, 3)).astype(np.float32),
                       sh_degree=1, capacity=cap)
    op = np.full((cap, 1), 2.0, np.float32)  # converged: sigmoid ~ 0.88
    op[:4] = -9.0  # near-dead: sigmoid ~ 1e-4
    alive = np.ones(cap, bool)
    alive[8:12] = False  # dead slots must not move even if low-opacity
    op[8:12] = -9.0
    params = dataclasses.replace(st.params, opacities=jnp.asarray(op))
    cfg = Config(sh_degree=1, densify_strategy="mcmc")
    out = inject_noise(params, jnp.asarray(alive), jax.random.PRNGKey(0),
                       jnp.asarray(0.1), cfg)
    delta = np.abs(np.asarray(out.means - params.means)).sum(axis=1)
    assert (delta[:4] > 0).all()  # near-dead explore
    assert (delta[4:8] < 1e-7).all()  # converged stay put (gate ~ 0)
    assert (delta[8:12] == 0).all()  # dead slots pinned
    # deterministic eps path == keyed path
    eps = jax.random.normal(jax.random.PRNGKey(0), (cap, 3))
    out2 = apply_noise(params, jnp.asarray(alive), eps, jnp.asarray(0.1), cfg)
    np.testing.assert_allclose(np.asarray(out.means), np.asarray(out2.means))


def test_mcmc_training_smoke():
    """End-to-end: strategy='mcmc' trains on a toy scene — loss decreases,
    live count grows toward the cap, no NaNs, opacity reset stays off."""
    from tests.test_train_loop import _toy_scene  # reuse the GT fixture
    from tinysplat_tpu.data.synthetic import synthetic_pcd
    from tinysplat_tpu.train_loop import Trainer

    scene = _toy_scene()
    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=40,
                 densify_strategy="mcmc", warmup_densify=5,
                 interval_opacity_reset=0, densify_end=10**9,
                 mcmc_growth_factor=1.3, lr_means_final=1.6e-6)
    pcd = synthetic_pcd(80, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    n0 = int(state.num_live())
    tr = Trainer(cfg, scene, state)
    tr.run(40)
    assert tr.step == 40
    n1 = int(tr.state.num_live())
    assert n1 > n0  # grew toward the cap via relocation of free slots
    assert np.isfinite(np.asarray(tr.state.params.means)).all()


def test_relocate_sharded_matches_unsharded():
    """relocate_and_grow is plain jnp on the capacity axis, so the same
    jitted function must produce identical results on FSDP-sharded state
    over a virtual mesh (GSPMD) — the MeshTrainer calls it as-is."""
    from tinysplat_tpu.parallel import make_mesh, shard_state

    st = _state(64, 24, 8)
    cfg = Config(sh_degree=1, densify_strategy="mcmc", mcmc_cap=32,
                 mcmc_growth_factor=1.5)
    opt = init_opt_state(cfg, st)
    key = jax.random.PRNGKey(3)
    s1, o1, st1 = relocate_and_grow(st, opt, key, cfg)
    mesh = make_mesh(2, 2)
    sts, opts = shard_state(mesh, st), shard_state(mesh, opt)
    s2, o2, st2 = relocate_and_grow(sts, opts, key, cfg)
    np.testing.assert_allclose(np.asarray(s1.params.means), np.asarray(s2.params.means))
    np.testing.assert_allclose(np.asarray(s1.params.opacities), np.asarray(s2.params.opacities))
    assert (np.asarray(s1.alive) == np.asarray(s2.alive)).all()
    assert int(st1["num_live"]) == int(st2["num_live"])
