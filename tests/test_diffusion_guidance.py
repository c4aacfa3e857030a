"""Diffusion-guided novel-view regularization (regularizers/diffusion_guidance.py).

The reference ships its diffusion stack as dead code (README.md:14 "[upcoming]");
here it is wired into training behind --regularize-diffusion. These tests
drive the full loop: novel-pose synthesis -> model render init -> pipeline
refinement -> synthetic training cameras -> finite training steps.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import orbit_cameras, synthetic_pcd
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.render import render
from tinysplat_tpu.scene import Scene
from tinysplat_tpu.train_loop import Trainer


def test_interpolate_camera_pose_between_endpoints():
    from tinysplat_tpu.regularizers.diffusion_guidance import (
        _cam_quat, interpolate_camera)

    cams = orbit_cameras(8, width=64, height=48)
    mid = interpolate_camera(cams[0], cams[1], 0.5, size=32, name="m")
    assert (mid.height, mid.width) == (32, 32)
    # Position is the midpoint; orientation is between the endpoints.
    np.testing.assert_allclose(
        mid.position, (cams[0].position + cams[1].position) / 2, atol=1e-5)
    qa, qm = _cam_quat(cams[0]), _cam_quat(mid)
    qb = _cam_quat(cams[1])
    assert abs(np.dot(qm, qa)) > abs(np.dot(qa, qb))  # closer than endpoints
    # Round-trip: quat extraction matches the view matrix it rebuilds.
    from tinysplat_tpu.cameras import make_view_matrix
    vm = make_view_matrix(mid.position, qm)
    np.testing.assert_allclose(vm, mid.view_matrix, atol=1e-5)


@pytest.mark.slow
def test_regularize_diffusion_trains_without_nans():
    size = 32
    cams = orbit_cameras(4, width=size, height=size)
    pcd = synthetic_pcd(40, seed=3)
    gt_state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=64)
    for cam in cams:
        rgb, _ = render(gt_state.params, gt_state.alive, cam.params(), size,
                        size, jnp.int32(1), jnp.zeros(3), rasterizer="tiled")
        cam._image = np.asarray(rgb)

    cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                 interval_opacity_reset=0, warmup_grad=0,
                 regularize_diffusion=True, lambda_diffusion=0.5,
                 regularize_diffusion_start=2, regularize_diffusion_end=8,
                 interval_diffusion=3, diffusion_inference_steps=2,
                 diffusion_strength=0.5)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=64)
    tr = Trainer(cfg, Scene(cams), state)
    tr.run(6)  # crosses the refresh boundary at step 2 and again at 3
    assert tr._diffusion_guidance is not None
    synth = [c for c in tr.scene.cameras if c.name and c.name.startswith("diffusion_")]
    assert len(synth) == 2  # lambda 0.5 * 4 real views
    assert synth[0].get_original_image().shape[2] == 3
    assert np.isfinite(np.asarray(synth[0].get_original_image())).all()
    losses = [float(jax.device_get(v)) for v in tr.metrics._pending.get("loss", [])]
    assert all(np.isfinite(l) for l in losses + [0.0])
    assert np.isfinite(np.asarray(tr.state.params.means)).all()
    # Window END: the synthetic views must be removed, not trained against
    # as stale frames forever (regularize_diffusion_end=8).
    tr.run(10)
    synth_after = [c for c in tr.scene.cameras
                   if c.name and c.name.startswith("diffusion_")]
    assert synth_after == []
    assert len(tr.scene.cameras) == 4  # the real set is back
