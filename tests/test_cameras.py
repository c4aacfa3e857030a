import numpy as np
import pytest

from tinysplat_tpu.cameras import Camera, make_view_matrix, make_proj_matrix
from tinysplat_tpu.utils.quaternions import quat_to_rotmat_np, random_quats, quat_to_rotmat
import jax
import jax.numpy as jnp


def make_camera(width=64, height=48):
    quat = np.asarray([0.9239, 0.0, 0.3827, 0.0])  # 45 deg about y
    quat = quat / np.linalg.norm(quat)
    pos = np.asarray([0.5, -0.2, -3.0])
    fov_x, fov_y = 0.9, 0.7
    f_x = width / (2 * np.tan(fov_x / 2))
    f_y = height / (2 * np.tan(fov_y / 2))
    return Camera(
        position=pos, f_x=f_x, f_y=f_y, fov_x=fov_x, fov_y=fov_y,
        quat=quat, near=0.001, far=1000.0, width=width, height=height,
    )


def test_view_matrix_inverse_position():
    """inv(view)[:3,3] == camera position (reference scene.py:96-110 doc)."""
    cam = make_camera()
    inv = np.linalg.inv(cam.view_matrix)
    np.testing.assert_allclose(inv[:3, 3], cam.position, atol=1e-5)


def test_rotation_orthonormal():
    key = jax.random.PRNGKey(0)
    quats = random_quats(key, 32)
    rots = quat_to_rotmat(quats)
    eye = jnp.eye(3)[None].repeat(32, axis=0)
    np.testing.assert_allclose(rots @ jnp.swapaxes(rots, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(rots)), 1.0, atol=1e-5)


def test_quat_np_matches_batched():
    q = np.asarray([0.5, -0.5, 0.5, 0.5])
    np.testing.assert_allclose(
        quat_to_rotmat_np(q), np.asarray(quat_to_rotmat(jnp.asarray(q))), atol=1e-6
    )


def test_project_backproject_roundtrip():
    """project o backproject == identity (reference scene.py:138-192)."""
    cam = make_camera()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32) * 0.5
    # Keep points in front of the camera.
    proj = np.asarray(cam.project_points(jnp.asarray(pts), return_depth=True))
    in_front = proj[:, 2] > 0.1
    pts, proj = pts[in_front], proj[in_front]
    back = np.asarray(cam.backproject_points(jnp.asarray(proj)))
    np.testing.assert_allclose(back, pts, atol=1e-2)


def test_proj_matrix_ndc_range():
    proj = make_proj_matrix(0.9, 0.7, znear=0.01, zfar=100.0)
    # A point on the optical axis at znear maps to ndc z ~ 0, at zfar to ~1.
    for z, expect in [(0.01, 0.0), (100.0, 1.0)]:
        p = proj @ np.asarray([0, 0, z, 1.0])
        assert abs(p[2] / p[3] - expect) < 5e-4


def test_rescale():
    cam = make_camera(width=64, height=48)
    cam.rescale(0.5)
    assert cam.width == 32 and cam.height == 24
