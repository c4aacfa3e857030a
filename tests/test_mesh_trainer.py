"""MeshTrainer: multi-device host loop on the 8-device virtual CPU mesh."""
import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud, synthetic_pcd
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.parallel import MeshTrainer, make_mesh
from tinysplat_tpu.render import render
from tinysplat_tpu.scene import Scene


def _toy_scene(n_cams=4, size=64):
    cams = orbit_cameras(n_cams, width=size, height=size)
    means, log_scales, quats, colors, opac = random_gaussian_cloud(60, seed=7)
    gt_state = init_from_pcd(means, colors * 255, sh_degree=1, capacity=64)
    for cam in cams:
        rgb, _ = render(gt_state.params, gt_state.alive, cam.params(), size, size,
                        jnp.int32(1), jnp.zeros(3), rasterizer="tiled")
        cam._image = np.asarray(rgb)
    return Scene(cams)


@pytest.mark.slow
def test_mesh_trainer_runs_and_improves():
    scene = _toy_scene()
    cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                 interval_opacity_reset=0, warmup_grad=0)
    pcd = synthetic_pcd(80, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    mesh = make_mesh(2, 4)
    tr = MeshTrainer(cfg, scene, state, mesh=mesh)
    tr.run(6)
    assert tr.step == 6
    # Params moved and stayed finite; grad accumulator collected signal.
    assert np.isfinite(np.asarray(tr.state.params.means)).all()
    assert float(jnp.sum(tr.state.means_grad_accum)) > 0


@pytest.mark.slow
def test_mesh_trainer_densify_growth_resharding():
    scene = _toy_scene()
    cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=1,
                 densify_end=100, tau_means=0.0, densify_scale_thresh=1e-6,
                 interval_opacity_reset=0, warmup_grad=0)
    pcd = synthetic_pcd(48, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=64)
    mesh = make_mesh(2, 4)
    tr = MeshTrainer(cfg, scene, state, mesh=mesh)
    tr.interval_densify = 2
    tr.run(5)
    assert tr.state.capacity > 64  # grew + resharded without shape errors
    assert tr.opt_state[0].mu.means.shape[0] == tr.state.capacity
