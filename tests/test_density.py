"""SuGaR density regularizer tests.

Oracle: brute-force numpy mixture density (the semantics of reference
model_gaussian.py:247-274) and hand-checkable depth-map geometry for the
approximate density (model_gaussian.py:276-316, intended projection).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.cameras import Camera
from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud
from tinysplat_tpu.models.gaussians import GaussianParams
from tinysplat_tpu.regularizers import (
    approximate_density,
    density_at_points,
    density_loss,
    knn_indices,
    make_density_probe,
    sample_points,
)
from tinysplat_tpu.utils.quaternions import quat_to_rotmat


def _params(n=32, seed=0):
    means, log_scales, quats, colors, opac = random_gaussian_cloud(n, seed=seed)
    return GaussianParams(
        means=jnp.asarray(means),
        colors_dc=jnp.asarray(colors),
        colors_rest=jnp.zeros((n, 8, 3)),
        scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
    )


def _numpy_density(points, params, idx):
    """Brute-force oracle of model_gaussian.py:257-274."""
    means = np.asarray(params.means)
    scales = np.exp(np.asarray(params.scales))
    R = np.asarray(quat_to_rotmat(params.quats))
    opac = 1 / (1 + np.exp(-np.asarray(params.opacities)[:, 0]))
    out = np.zeros(len(points))
    for i, p in enumerate(points):
        d = 0.0
        for j in idx[i]:
            sigma = R[j] @ np.diag(scales[j] ** 2) @ R[j].T
            mu = p - means[j]
            q = float(np.clip(mu @ np.linalg.inv(sigma) @ mu, 0, 1e8))
            d += np.exp(-0.5 * q) * opac[j]
        out[i] = min(d, 1 + 1e-12)
    return out


def test_knn_matches_numpy():
    params = _params(64)
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(33, 3)).astype(np.float32))
    alive = jnp.ones((64,), bool)
    idx = np.asarray(knn_indices(pts, params.means, alive, k=5, chunk=16))
    d = np.linalg.norm(np.asarray(pts)[:, None] - np.asarray(params.means)[None], axis=-1)
    ref = np.argsort(d, axis=1)[:, :5]
    # Compare as sets per row (ties may reorder).
    for a, b in zip(idx, ref):
        assert set(a.tolist()) == set(b.tolist())


def test_knn_excludes_dead():
    params = _params(16)
    alive = jnp.asarray(np.arange(16) % 2 == 0)
    pts = params.means[:4] + 0.001
    idx = np.asarray(knn_indices(pts, params.means, alive, k=4))
    assert np.all(idx % 2 == 0)


def test_density_matches_numpy_oracle():
    params = _params(24)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(17, 3)).astype(np.float32) * 0.3)
    alive = jnp.ones((24,), bool)
    idx = knn_indices(pts, params.means, alive, k=16)
    d = np.asarray(density_at_points(pts, idx, params))
    ref = _numpy_density(np.asarray(pts), params, np.asarray(idx))
    np.testing.assert_allclose(d, ref, rtol=2e-4, atol=1e-6)


def test_sample_points_respects_alive_and_distribution():
    params = _params(8)
    alive = jnp.asarray([True, False] * 4)
    pts, idxs = sample_points(params, alive, jax.random.PRNGKey(0), 512)
    assert pts.shape == (512, 3)
    assert np.all(np.asarray(idxs) % 2 == 0)  # dead never sampled
    # Samples should be near their source splat (within ~5 sigma).
    src = np.asarray(params.means)[np.asarray(idxs)]
    smax = np.exp(np.asarray(params.scales)).max(axis=-1)[np.asarray(idxs)]
    dist = np.linalg.norm(np.asarray(pts) - src, axis=-1)
    assert np.all(dist < 6 * smax * np.sqrt(3))


def test_approximate_density_geometry():
    cam = orbit_cameras(1, width=32, height=32, radius=3.0)[0]
    cp = cam.params()
    # Points along the optical axis at known camera-space depths.
    view = np.asarray(cam.view_matrix)
    Rw = view[:3, :3]
    t = view[:3, 3]
    zs = np.array([1.0, 2.0, 2.5], np.float32)
    pts_world = (np.linalg.inv(Rw) @ (np.stack([np.zeros(3), np.zeros(3), zs], 0) - t[:, None])).T
    depth_map = jnp.full((32, 32), 2.0, jnp.float32)
    beta = jnp.full((3,), 0.5, jnp.float32)
    sdf, mask = approximate_density(
        jnp.asarray(pts_world), depth_map, cp, beta, 32, 32, return_sdf=True
    )
    assert bool(mask.all())
    np.testing.assert_allclose(np.asarray(sdf), 2.0 - zs, atol=1e-4)
    d, mask2 = approximate_density(
        jnp.asarray(pts_world), depth_map, cp, beta, 32, 32, return_sdf=False
    )
    np.testing.assert_allclose(
        np.asarray(d), np.exp(-0.5 * (2.0 - zs) ** 2 / 0.25), atol=1e-4
    )
    # A point behind the camera is masked out.
    behind = (np.linalg.inv(Rw) @ (np.array([[0.0], [0.0], [-1.0]]) - t[:, None])).T
    _, m3 = approximate_density(jnp.asarray(behind), depth_map, cp, beta, 32, 32)
    assert not bool(m3[0])


def test_density_loss_runs_and_differentiates():
    params = _params(32)
    alive = jnp.ones((32,), bool)
    probe = make_density_probe(params, alive, jax.random.PRNGKey(3), num_samples=64, k=8)
    cam = orbit_cameras(1, width=32, height=32)[0].params()
    depth = jnp.full((32, 32), 3.0, jnp.float32)

    def f(p):
        return density_loss(probe, p, depth, cam, 32, 32, use_sdf=False)

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grads.means)).all()
    assert float(jnp.abs(grads.opacities).sum()) > 0

    def f_sdf(p):
        return density_loss(probe, p, depth, cam, 32, 32, use_sdf=True)

    val2, grads2 = jax.value_and_grad(f_sdf)(params)
    assert np.isfinite(float(val2))
    assert np.isfinite(np.asarray(grads2.scales)).all()


def test_covariance_inverse_analytic():
    from tinysplat_tpu.regularizers import covariance_inverse

    params = _params(12)
    inv = np.asarray(covariance_inverse(params))
    R = np.asarray(quat_to_rotmat(params.quats))
    s2 = np.exp(2 * np.asarray(params.scales))
    sigma = np.einsum("nij,nj,nkj->nik", R, s2, R)
    prod = np.einsum("nij,njk->nik", inv, sigma)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)
