import numpy as np
import jax
import jax.numpy as jnp

from tinysplat_tpu.cameras import make_view_matrix
from tinysplat_tpu.ops.projection import project_gaussians, scale_rot_to_cov3d
from tinysplat_tpu.utils.quaternions import quat_to_rotmat


W, H = 64, 48
FX = FY = 40.0


def identity_camera():
    view = jnp.eye(4)
    fovx = 2 * np.arctan(W / (2 * FX))
    fovy = 2 * np.arctan(H / (2 * FY))
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1 / np.tan(fovx / 2)
    proj[1, 1] = 1 / np.tan(fovy / 2)
    proj[2, 2] = 1.0
    proj[3, 2] = 1.0
    return view, jnp.asarray(proj)


def project(means, scales=None, quats=None):
    n = means.shape[0]
    if scales is None:
        scales = jnp.full((n, 3), 0.05)
    if quats is None:
        quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    view, proj = identity_camera()
    return project_gaussians(
        means, scales, 1.0, quats, view, proj @ view,
        FX, FY, W / 2, H / 2, H, W,
    )


def test_center_point_projects_to_image_center():
    out = project(jnp.asarray([[0.0, 0.0, 2.0]]))
    # ndc (0,0) -> pixel (W/2 - 0.5, H/2 - 0.5)
    np.testing.assert_allclose(np.asarray(out.xys[0]), [W / 2 - 0.5, H / 2 - 0.5], atol=1e-4)
    assert float(out.depths[0]) == 2.0
    assert bool(out.valid[0])
    assert int(out.radii[0]) > 0


def test_pinhole_projection_offsets():
    """Offset point lands at cx + fx * x/z."""
    x, y, z = 0.3, -0.2, 2.5
    out = project(jnp.asarray([[x, y, z]]))
    np.testing.assert_allclose(
        np.asarray(out.xys[0]),
        [W / 2 - 0.5 + FX * x / z, H / 2 - 0.5 + FY * y / z],
        rtol=1e-4,
    )


def test_behind_camera_culled():
    out = project(jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, 0.001]]))
    assert not bool(out.valid[0]) and not bool(out.valid[1])
    assert int(out.radii[0]) == 0
    assert int(out.num_tiles_hit[0]) == 0


def test_isotropic_cov2d_radius_scales_with_depth():
    """An isotropic splat twice as far has ~half the pixel radius."""
    s = 0.2
    out = project(jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]]),
                  scales=jnp.full((2, 3), s))
    r_near, r_far = int(out.radii[0]), int(out.radii[1])
    assert r_near > r_far >= 1
    # Expected radius ~ 3 * fx * s / z (plus blur), loose factor-of-2 check
    expect = 3 * FX * s / 2.0
    assert 0.5 * expect < r_near < 2 * expect


def test_cov3d_matches_R_S2_Rt():
    rng = np.random.default_rng(0)
    quats = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.1, 1.0, size=(5, 3)).astype(np.float32))
    cov = scale_rot_to_cov3d(scales, 1.0, quats)
    R = quat_to_rotmat(quats)
    S2 = jnp.eye(3) * (scales**2)[:, None, :]
    expect = R @ S2 @ jnp.swapaxes(R, -1, -2)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(expect), atol=1e-5)
    # symmetric PSD
    np.testing.assert_allclose(np.asarray(cov), np.asarray(jnp.swapaxes(cov, -1, -2)), atol=1e-6)


def test_conic_is_inverse_cov2d():
    out = project(jnp.asarray([[0.1, 0.1, 2.0]]))
    a, b, c = [float(v) for v in out.conics[0]]
    cov = np.linalg.inv(np.asarray([[a, b], [b, c]]))
    # Radius consistent with 3 * sqrt(max eigenvalue)
    lam = np.linalg.eigvalsh(cov).max()
    assert abs(int(out.radii[0]) - np.ceil(3 * np.sqrt(lam))) <= 1


def test_num_tiles_hit():
    out = project(jnp.asarray([[0.0, 0.0, 2.0]]), scales=jnp.full((1, 3), 0.001))
    # Tiny splat: min blur radius ~ 3*sqrt(0.3+eps) ~ 2px -> 1..4 tiles
    assert 1 <= int(out.num_tiles_hit[0]) <= 4


def test_projection_differentiable():
    means = jnp.asarray([[0.1, -0.1, 2.0], [0.3, 0.2, 3.0]])
    # Anisotropic scales: isotropic splats have zero quat gradient by symmetry.
    scales = jnp.asarray([[0.05, 0.2, 0.08], [0.3, 0.02, 0.1]])
    quats = jnp.asarray([[1.0, 0.1, -0.2, 0.05], [0.9, -0.3, 0.1, 0.2]])
    view, proj = identity_camera()

    def f(m, s, q):
        out = project_gaussians(m, s, 1.0, q, view, proj @ view, FX, FY, W / 2, H / 2, H, W)
        return jnp.sum(out.xys) + jnp.sum(out.conics) + jnp.sum(out.depths)

    grads = jax.grad(f, argnums=(0, 1, 2))(means, scales, quats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def test_cov2d_scalar_matches_matrix_form():
    """The production scalarized EWA covariance (_cov2d_scalar) must equal
    the readable matrix-form implementation (scale_rot_to_cov3d +
    project_cov3d_ewa) — the matrix form is kept as the parity oracle so
    the two can never silently diverge."""
    from tinysplat_tpu.ops.projection import (
        _cov2d_scalar,
        project_cov3d_ewa,
        scale_rot_to_cov3d,
    )
    from tinysplat_tpu.utils.quaternions import random_quats

    rng = np.random.default_rng(11)
    n = 257
    quats = np.asarray(random_quats(jax.random.PRNGKey(4), n))
    scales = rng.uniform(0.01, 0.4, (n, 3)).astype(np.float32)
    means_cam = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(0.5, 6, n)
    ], axis=1).astype(np.float32)
    W_rot = np.asarray(make_view_matrix(np.zeros(3), np.array([1.0, 0, 0, 0]))
                       )[:3, :3]
    fx = fy = jnp.float32(120.0)
    tanx = tany = jnp.float32(0.6)

    cov3d = scale_rot_to_cov3d(jnp.asarray(scales), 1.0, jnp.asarray(quats))
    ref = project_cov3d_ewa(jnp.asarray(means_cam), cov3d, jnp.asarray(W_rot),
                            fx, fy, tanx, tany)
    a, b, c = _cov2d_scalar(jnp.asarray(means_cam), jnp.asarray(scales),
                            jnp.asarray(quats), jnp.asarray(W_rot),
                            fx, fy, tanx, tany)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref[:, 0, 0]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref[:, 0, 1]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref[:, 1, 1]),
                               rtol=2e-5, atol=2e-6)


def test_quat_gradients_finite_at_zero_quat():
    """Dead slots can carry degenerate quats; the normalization gradient
    must be finite at q = 0 (the norm VJP's 0/0 NaN would poison the
    optimizer rows of every dead slot)."""
    from tinysplat_tpu.ops.projection import _rotmat_elems

    def f(q):
        return sum(jnp.sum(e) for e in _rotmat_elems(q))

    g = jax.grad(f)(jnp.zeros((3, 4)))
    assert np.isfinite(np.asarray(g)).all()
