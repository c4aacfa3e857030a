"""Capacity compaction (models/gaussians.compact_state, beyond-reference
memory management: the reference physically reallocates on every prune,
model_gaussian.py:199-242; we reclaim dead slots explicitly)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import orbit_cameras, synthetic_pcd
from tinysplat_tpu.models.gaussians import compact_state, init_from_pcd
from tinysplat_tpu.render import render
from tinysplat_tpu.train import init_opt_state


def _fragmented_state(cap=256, n_live=40):
    pcd = synthetic_pcd(n_live, seed=4)
    st = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=cap)
    # Scatter the live splats across the capacity (fragmentation): move
    # them to every 5th slot.
    idx = np.arange(0, cap, cap // n_live)[:n_live]
    perm = np.full(cap, -1)
    perm[idx] = np.arange(n_live)

    def scatter(x):
        out = np.zeros((cap,) + x.shape[1:], x.dtype)
        out[idx] = np.asarray(x[:n_live])
        return jnp.asarray(out)

    params = jax.tree.map(scatter, st.params)
    params.opacities = jnp.where(
        jnp.asarray(perm < 0)[:, None], -20.0, params.opacities)
    params.scales = jnp.where(
        jnp.asarray(perm < 0)[:, None], -10.0, params.scales)
    alive = jnp.asarray(perm >= 0)
    return dataclasses.replace(st, params=params, alive=alive)


def test_compact_preserves_render_and_moments():
    st = _fragmented_state()
    cfg = Config(sh_degree=1)
    opt = init_opt_state(cfg, st)
    # Nonzero moments so we can verify they follow their splats.
    opt = jax.tree.map(
        lambda x: (jnp.arange(x.shape[0], dtype=x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1)) + x)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == st.capacity else x,
        opt,
    )
    cam = orbit_cameras(1, width=64, height=64)[0].params()
    rgb0, ex0 = render(st.params, st.alive, cam, 64, 64, jnp.int32(1),
                       jnp.zeros(3), rasterizer="dense")

    st2, opt2, did = compact_state(st, opt, margin=1.5)
    assert did
    assert st2.capacity == 64  # next pow2 >= 40 * 1.5 = 60
    assert int(st2.num_live()) == 40
    assert bool(st2.alive[:40].all()) and not bool(st2.alive[40:].any())

    rgb1, ex1 = render(st2.params, st2.alive, cam, 64, 64, jnp.int32(1),
                       jnp.zeros(3), rasterizer="dense")
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ex0["depth"]),
                               np.asarray(ex1["depth"]), atol=1e-5)

    # Moments followed their splats: row i of the compacted moment leaf
    # equals row perm[i] of the original (we encoded the row index).
    live_src = np.arange(0, 256, 256 // 40)[:40]
    for leaf in jax.tree.leaves(opt2):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == 64:
            got = np.asarray(leaf[:40]).reshape(40, -1)[:, 0]
            exp = np.asarray(live_src, got.dtype)
            np.testing.assert_allclose(got, exp)
            break

    # No-op when the target would not shrink.
    _, _, did2 = compact_state(st2, opt2, margin=1.5)
    assert not did2


def test_trainer_compact_hook():
    """cfg.compact_interval reclaims capacity mid-training after a mass
    prune, and training continues across the recompile."""
    from tests.test_train_loop import _toy_scene
    from tinysplat_tpu.models.densify import prune_by_mask
    from tinysplat_tpu.train_loop import Trainer

    scene = _toy_scene(n_cams=2, size=48)
    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=8,
                 warmup_densify=10**9, interval_opacity_reset=0,
                 compact_interval=4, compact_margin=1.5)
    pcd = synthetic_pcd(200, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=512)
    tr = Trainer(cfg, scene, state)
    tr.run(2)
    # Mass prune: kill all but 30 splats.
    mask = jnp.arange(tr.state.capacity) >= 30
    tr.state, tr.opt_state = prune_by_mask(tr.state, tr.opt_state,
                                           mask & tr.state.alive)
    tr.run(8)
    assert tr.state.capacity == 64  # pow2 >= 30 * 1.5 = 45
    assert np.isfinite(np.asarray(tr.state.params.means)).all()


def test_mesh_trainer_compact_reshards():
    from tests.test_mesh_trainer import _toy_scene as _mesh_scene
    from tinysplat_tpu.models.densify import prune_by_mask
    from tinysplat_tpu.parallel import MeshTrainer, make_mesh

    scene = _mesh_scene(n_cams=4, size=64, rendered_gt=False)
    cfg = Config(rasterizer="tiled", sh_degree=1, max_iter=6,
                 warmup_densify=10**9, interval_opacity_reset=0,
                 warmup_grad=0, compact_interval=2, compact_margin=1.5)
    pcd = synthetic_pcd(200, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=512)
    mesh = make_mesh(2, 2)
    tr = MeshTrainer(cfg, scene, state, mesh=mesh)
    tr.run(1)
    mask = jnp.arange(tr.state.capacity) >= 32
    tr.state, tr.opt_state = prune_by_mask(tr.state, tr.opt_state,
                                           mask & tr.state.alive)
    tr.run(6)
    assert tr.state.capacity == 64
    # Still sharded over the mesh after compaction.
    assert len(tr.state.params.means.sharding.device_set) == 4
    assert np.isfinite(np.asarray(tr.state.params.means)).all()
