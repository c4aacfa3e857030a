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


def test_principal_point_offset_shifts_render():
    """An off-center principal point (cx_off) must translate the rendered
    image by exactly that many pixels (ndc2pix shift), and project_points /
    backproject_points must stay a round-trip under the offset."""
    import dataclasses

    import jax.numpy as jnp

    from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud
    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.render import render

    size, shift = 64, 8
    cam_c = orbit_cameras(1, width=size, height=size)[0]
    means, log_scales, quats, colors, opac = random_gaussian_cloud(40, seed=3)
    st = init_from_pcd(means, colors * 255, sh_degree=1, capacity=64)

    base = cam_c.params()
    shifted = dataclasses.replace(base, cx_off=jnp.float32(shift))
    rgb_c, _ = render(st.params, st.alive, base, size, size, jnp.int32(1),
                      jnp.zeros(3), rasterizer="tiled")
    rgb_s, _ = render(st.params, st.alive, shifted, size, size, jnp.int32(1),
                      jnp.zeros(3), rasterizer="tiled")
    # Shifted-pp render == centered render translated right by `shift`
    # (interior columns; the wrap-in band is excluded).
    np.testing.assert_allclose(np.asarray(rgb_s[:, shift:]),
                               np.asarray(rgb_c[:, :-shift]), atol=2e-5)

    # Camera-level pp: absolute cx -> the same render shift.
    cam_pp = orbit_cameras(1, width=size, height=size)[0]
    cam_pp.cx_off = float(shift)
    np.testing.assert_allclose(
        np.asarray(render(st.params, st.alive, cam_pp.params(), size, size,
                          jnp.int32(1), jnp.zeros(3), rasterizer="tiled")[0]),
        np.asarray(rgb_s), atol=1e-6)

    # project/backproject round-trip honors the offset.
    pts = np.asarray(means[:8], np.float32)
    scr = cam_pp.project_points(pts, return_depth=False)
    scr_c = cam_c.project_points(pts, return_depth=False)
    np.testing.assert_allclose(np.asarray(scr[:, 0]),
                               np.asarray(scr_c[:, 0]) + shift, atol=1e-4)
    back = cam_pp.backproject_points(  # scr[:, 2] is NDC z already
        np.asarray(scr), scale_depth=False)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)
