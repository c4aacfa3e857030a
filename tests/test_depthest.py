"""Depth estimation subsystem tests (sparse SfM depth + scale alignment).

Spec: /root/reference/tinysplat/depth.py:73-145 (sparse projection, weighted
L1 affine alignment, disparity variant). Backends needing network weights are
exercised via FunctionBackend.
"""
import numpy as np

from tinysplat_tpu.data.synthetic import orbit_cameras, synthetic_pcd
from tinysplat_tpu.depthest import DepthEstimator, estimate_sparse, match_scale, match_scale_disparity
from tinysplat_tpu.depthest.backends import FunctionBackend
from tinysplat_tpu.scene import Scene


def _scene_with_points():
    pcd = synthetic_pcd(300, seed=4)
    cams = orbit_cameras(2, width=64, height=64, radius=3.0)
    for c in cams:
        c.visible_point_ids = pcd.point_ids[::2]
    return Scene(cams), pcd


def test_sparse_depth_projects_points():
    scene, pcd = _scene_with_points()
    cam = scene.cameras[0]
    rows, cols, z, err = estimate_sparse(cam, pcd)
    assert len(rows) > 50  # most points visible from radius 3 orbit
    assert np.all((rows >= 0) & (rows < cam.height))
    assert np.all((cols >= 0) & (cols < cam.width))
    assert np.all(z > 0)
    # Depths around the orbit radius for a unit cloud.
    assert 1.0 < np.median(z) < 5.0
    # Round-trip: backproject the pixel+depth, compare against the 3D point.
    xyz, _, _ = pcd.get_points(np.asarray(cam.visible_point_ids))
    view = np.asarray(cam.view_matrix, np.float64)
    xyz_cam = xyz @ view[:3, :3].T + view[:3, 3]
    keep = xyz_cam[:, 2] > 0
    px = np.round(xyz_cam[:, 0] / xyz_cam[:, 2] * cam.f_x + cam.width / 2)
    inb = keep & (px >= 0) & (px < cam.width)
    assert abs(inb.sum() - len(rows)) < 10  # y-bounds may trim a few


def test_match_scale_recovers_affine():
    rng = np.random.default_rng(0)
    true = rng.uniform(1, 5, size=(48, 48))
    dense = (true - 0.7) / 1.8  # dense = (true - t)/s  => true = 1.8*dense + 0.7
    rows = rng.integers(0, 48, 200)
    cols = rng.integers(0, 48, 200)
    err = rng.uniform(0.5, 1.5, 200)
    out = match_scale(dense, rows, cols, true[rows, cols], err)
    np.testing.assert_allclose(out, true, atol=2e-3)


def test_match_scale_disparity_recovers():
    rng = np.random.default_rng(1)
    true = rng.uniform(1, 5, size=(32, 32))
    disparity = (1.0 / true - 0.05) / 2.0  # 1/true = 2*disp + 0.05
    rows = rng.integers(0, 32, 300)
    cols = rng.integers(0, 32, 300)
    err = np.ones(300)
    out = match_scale_disparity(disparity, rows, cols, true[rows, cols], err)
    np.testing.assert_allclose(out, true, rtol=2e-2)


def test_estimator_caches_and_aligns(tmp_path):
    scene, pcd = _scene_with_points()

    # "Model" that predicts depth at half the true scale; alignment should
    # recover the SfM scale to within the sparse sampling noise.
    def half_scale_depth(camera):
        rows, cols, z, _ = estimate_sparse(camera, pcd)
        full = np.full((camera.height, camera.width), np.median(z))
        full[rows, cols] = z
        return 0.5 * full

    backend = FunctionBackend(half_scale_depth, space="depth")
    est = DepthEstimator(scene, pcd=pcd, depths_path=str(tmp_path), model_name=backend)
    for cam in scene.cameras:
        assert cam.estimated_depth is not None
        rows, cols, z, _ = estimate_sparse(cam, pcd)
        # >=95% of sparse pixels recovered (pixels hit by two different
        # points keep only one depth — those few can't match both).
        close = np.isclose(cam.estimated_depth[rows, cols], z, rtol=5e-2, atol=5e-2)
        assert close.mean() > 0.95, close.mean()

    # Second construction loads from cache without a backend.
    for cam in scene.cameras:
        cam.estimated_depth = None
    est2 = DepthEstimator(scene, pcd=pcd, depths_path=str(tmp_path),
                          model_name="nonexistent-model")
    assert est2.backend is None  # never needed to load
    for cam in scene.cameras:
        assert cam.estimated_depth is not None
