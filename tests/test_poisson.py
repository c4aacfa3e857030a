"""First-party screened-Poisson reconstruction (poisson.py).

Reference behavior replaced: Open3D normal estimation + outlier removal +
create_from_point_cloud_poisson at
/root/reference/tinysplat/splatting/model_gaussian.py:458-480.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tinysplat_tpu.poisson import (
    estimate_normals,
    reconstruct,
    remove_statistical_outliers,
)


def _sphere(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    return p.astype(np.float32)


def test_estimate_normals_sphere():
    p = _sphere()
    vo = (p * 5.0).astype(np.float32)  # cameras radially outside
    n = np.asarray(estimate_normals(jnp.asarray(p), jnp.asarray(vo), k=12))
    # True normal of a unit sphere at p is p itself (outward).
    dots = np.sum(n * p, axis=1)
    assert (dots > 0.9).mean() > 0.98, dots.mean()


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_reconstruct_sphere_geometry():
    p = _sphere(6000)
    vo = (p * 5.0).astype(np.float32)
    v, f, n = reconstruct(p, vo, resolution=64)
    assert len(v) > 500 and len(f) > 1000
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 1.0) < 0.02, r.mean()
    assert r.std() < 0.02, r.std()
    # Vertex normals face outward.
    nd = np.sum(n * (v / r[:, None]), axis=1)
    assert (nd > 0).mean() > 0.99
    # Faces index the (compacted) vertex array consistently.
    assert f.min() >= 0 and f.max() < len(v)


def test_outlier_removal():
    p = _sphere(2000)
    outliers = np.asarray([[10, 10, 10], [-8, 4, 9]], np.float32)
    allp = np.concatenate([p, outliers])
    keep = remove_statistical_outliers(allp, std_ratio=2.0)
    assert len(allp) - 2 <= len(keep) < len(allp)
    assert 2000 not in keep and 2001 not in keep
