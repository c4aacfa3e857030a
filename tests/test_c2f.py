"""Coarse-to-fine training schedule (--coarse-to-fine, beyond-reference):
resolution stages, tile snapping, intrinsics rescale, both trainers."""
import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import synthetic_pcd
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.train_loop import Trainer

from tests.test_train_loop import _toy_scene


def test_c2f_schedule_and_snapping():
    scene = _toy_scene(n_cams=2, size=64)
    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=100,
                 coarse_to_fine=True, c2f_start_scale=0.25, c2f_end=80,
                 warmup_densify=10**9, interval_opacity_reset=0)
    pcd = synthetic_pcd(40, seed=1)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=64)
    tr = Trainer(cfg, scene, state)
    cam = scene.cameras[0]
    dims = {}
    for step in (0, 10, 39, 41, 79, 81, 200):
        tr.step = step
        dims[step] = tr._c2f_dims(cam)
    # 2 stages over 80 steps (0.25 -> 0.5 -> 1.0): stage boundary at 40.
    assert dims[0] == (16, 16)      # 64 * 0.25 = 16, tile-snapped
    assert dims[39] == (16, 16)
    assert dims[41] == (32, 32)     # 64 * 0.5
    assert dims[81] == (64, 64)     # full res past c2f_end
    assert dims[200] == (64, 64)
    for h, w in dims.values():
        assert h % cfg.tile_size == 0 and w % cfg.tile_size == 0
    # Intrinsics rescale keeps the FOV: fx halves with the width.
    cp = cam.params()
    cp2 = tr._scale_cam_params(cp, cam, 32, 32)
    np.testing.assert_allclose(float(cp2.fx), float(cp.fx) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cp2.viewmat), np.asarray(cp.viewmat))


def test_c2f_trainer_end_to_end():
    """Training runs through the stage transitions (multiple compiled
    shapes) and improves; the final stage trains at full resolution."""
    scene = _toy_scene(n_cams=2, size=64)
    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=24,
                 coarse_to_fine=True, c2f_start_scale=0.25, c2f_end=16,
                 warmup_densify=10**9, interval_opacity_reset=0)
    pcd = synthetic_pcd(60, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    tr = Trainer(cfg, scene, state)
    tr.run(24)
    shapes = {k for k in tr._step_fns if isinstance(k, tuple) and len(k) == 2}
    assert (16, 16) in shapes and (32, 32) in shapes and (64, 64) in shapes
    assert np.isfinite(np.asarray(tr.state.params.means)).all()
    assert tr.last_rendered.shape == (64, 64, 3)  # ended at full res


def test_c2f_mesh_trainer_end_to_end():
    """The sharded trainer rebuilds its step per resolution stage; band
    heights stay divisible by n_tile * tile_size at every stage."""
    from tests.test_mesh_trainer import _toy_scene as _mesh_scene
    from tinysplat_tpu.parallel import MeshTrainer, make_mesh

    scene = _mesh_scene(n_cams=4, size=64, rendered_gt=False)
    cfg = Config(rasterizer="tiled", sh_degree=1, max_iter=8,
                 coarse_to_fine=True, c2f_start_scale=0.5, c2f_end=4,
                 warmup_densify=10**9, interval_opacity_reset=0,
                 warmup_grad=0)
    pcd = synthetic_pcd(48, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    mesh = make_mesh(2, 2)
    tr = MeshTrainer(cfg, scene, state, mesh=mesh)
    # quantum = n_tile * 16 = 32: the 0.5 stage trains at 32x32.
    tr.step = 0
    assert tr._c2f_dims(scene.cameras[0]) == (32, 32)
    tr.run(8)
    assert np.isfinite(np.asarray(tr.state.params.means)).all()
