"""SuGaR-style density / SDF regularization (Guédon & Lepetit 2023, eqs. 1+5).

TPU-native re-implementation of the reference's surface regularization
(/root/reference/tinysplat/splatting/model_gaussian.py:247-326 and its wiring
at scripts/train.py:77-91):

- points are sampled from the splat mixture (areas ~ prod(scales); the
  reference passes a *cumsum* of the areas to torch.multinomial,
  model_gaussian.py:321-322, which skews sampling toward high indices — here
  the intended categorical-by-area sampling is used);
- the true mixture density at each point sums opacity-weighted Gaussian
  values over its K=16 nearest splats (model_gaussian.py:257-274). The
  covariance inverse is computed analytically as R diag(s^-2) R^T instead of
  the reference's matrix inverse + pinverse fallback (:251-254) — exact for
  this parameterization and far cheaper;
- KNN is a chunked brute-force ||p - m||^2 top-k: the distance matrix is one
  (chunk x N) MXU matmul per chunk. Runs once per densify interval and is
  cached between steps (train.py:79-81), so brute force at 100k x N is fine;
- the *approximate* density comes from the rendered depth map: project each
  point into the camera, bilinearly sample the depth, sdf = depth_sampled -
  z_cam, density ~ exp(-sdf^2 / (2 beta^2)) (model_gaussian.py:276-316). The
  reference feeds *unnormalized* pixel coordinates in [-W, 0] to
  torch.grid_sample (which expects [-1, 1]; model_gaussian.py:288-316), so
  it effectively samples the border depth for nearly every point; here the
  projection uses the intended normalized coordinates;
- loss: |d - d_hat| masked-mean, or the SDF variant
  |beta * sqrt(-2 log d) - sdf_hat| (train.py:82-89).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..cameras import CameraParams
from ..models.gaussians import GaussianParams
from ..utils.quaternions import quat_to_rotmat


def covariance_inverse(params: GaussianParams) -> jax.Array:
    """(N, 3, 3) inverse covariances Sigma^{-1} = R diag(s^-2) R^T.

    API counterpart of the reference ``GaussianModel.covariance``
    (model_gaussian.py:247-255), which materializes Sigma and calls
    ``.inverse()`` with a pinverse fallback; for the R S^2 R^T
    parameterization the inverse is analytic and exact.
    """
    R = quat_to_rotmat(params.quats)
    inv_s2 = jnp.exp(-2.0 * params.scales)
    return jnp.einsum("nij,nj,nkj->nik", R, inv_s2, R)


class DensityProbe(NamedTuple):
    """Cached per-interval density-regularizer inputs (train.py:79-81)."""

    points: jax.Array  # (S, 3) sampled surface-candidate points
    knn_idx: jax.Array  # (S, K) nearest-splat indices
    beta: jax.Array  # (S,) SDF length scale per point


def sample_points(
    params: GaussianParams,
    alive: jax.Array,
    key: jax.Array,
    num_samples: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sample points from the splat mixture, weighted by ellipsoid area.

    Semantics of model_gaussian.py:318-326 (with the intended categorical
    weighting — see module docstring).
    """
    scales = jnp.exp(params.scales)
    areas = jnp.where(alive, jnp.abs(jnp.prod(scales, axis=-1)), 0.0)
    logits = jnp.log(jnp.maximum(areas, 1e-30))
    k1, k2 = jax.random.split(key)
    idxs = jax.random.categorical(k1, logits, shape=(num_samples,))
    eps = jax.random.normal(k2, (num_samples, 3), dtype=params.means.dtype)
    xi = eps * scales[idxs]
    R = quat_to_rotmat(params.quats[idxs])  # (S, 3, 3)
    offs = jnp.einsum("sij,sj->si", R, xi)
    return params.means[idxs] + offs, idxs


def knn_indices(
    points: jax.Array,
    means: jax.Array,
    alive: jax.Array,
    k: int = 16,
    chunk: int = 256,
) -> jax.Array:
    """Indices of the k nearest live splat means for each point.

    Chunked brute force: one (chunk, N) distance block per scan step (the
    -2 p.m term is an MXU matmul), top_k per row. Replaces pytorch3d
    knn_points (model_gaussian.py:16, :260).
    """
    s = points.shape[0]
    # top_k must still return k rows even when fewer than k splats are
    # alive — the +inf-distance ties would FILL the remainder with dead
    # splats' (stale, generally non-zero-opacity) indices. Clamp k so only
    # live neighbors are ever returned; callers are eager (host paths).
    n_live = int(jax.device_get(jnp.sum(alive.astype(jnp.int32))))
    if n_live == 0:
        raise ValueError("knn_indices: no live splats to query against")
    k = min(k, n_live)
    pad = (-s) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    m_sq = jnp.sum(means * means, axis=-1)
    # Dead splats never selected.
    m_sq = jnp.where(alive, m_sq, jnp.inf)

    def body(_, p_chunk):
        d = (
            m_sq[None, :]
            - 2.0 * (p_chunk @ means.T)
            + jnp.sum(p_chunk * p_chunk, axis=-1)[:, None]
        )
        _, idx = jax.lax.top_k(-d, k)
        return None, idx

    _, idx = jax.lax.scan(body, None, pts.reshape(-1, chunk, 3))
    return idx.reshape(-1, k)[:s]


def density_at_points(
    points: jax.Array,
    knn_idx: jax.Array,
    params: GaussianParams,
) -> jax.Array:
    """Opacity-weighted Gaussian mixture density over the KNN set.

    Semantics of model_gaussian.py:257-274: d = sum_k sigmoid(o_k) *
    exp(-0.5 mu^T Sigma_k^{-1} mu), quadratic form clamped to [0, 1e8],
    result clamped to <= 1 + 1e-12.
    """
    mu = points[:, None, :] - params.means[knn_idx]  # (S, K, 3)
    R = quat_to_rotmat(params.quats[knn_idx])  # (S, K, 3, 3)
    inv_s2 = jnp.exp(-2.0 * params.scales[knn_idx])  # (S, K, 3)
    # Sigma^{-1} = R diag(s^-2) R^T  =>  q = || diag(s^-1) R^T mu ||^2
    rt_mu = jnp.einsum("skij,ski->skj", R, mu)  # R^T mu
    q = jnp.sum(rt_mu * rt_mu * inv_s2, axis=-1)
    q = jnp.clip(q, 0.0, 1e8)
    opac = jax.nn.sigmoid(params.opacities[knn_idx, 0])
    d = jnp.sum(jnp.exp(-0.5 * q) * opac, axis=-1)
    return jnp.where(d > 1.0, 1.0 + 1e-12, d)


def _bilinear_border(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample of (H, W) img at float pixel coords, border-clamped."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    fx = x - x0
    fy = y - y0
    xi0, yi0, xi1, yi1 = (a.astype(jnp.int32) for a in (x0, y0, x1, y1))
    v00 = img[yi0, xi0]
    v01 = img[yi0, xi1]
    v10 = img[yi1, xi0]
    v11 = img[yi1, xi1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def approximate_density(
    points: jax.Array,
    depth_map: jax.Array,
    camera: CameraParams,
    beta: jax.Array,
    img_height: int,
    img_width: int,
    znear: float = 0.001,
    return_sdf: bool = False,
):
    """Depth-map-based density (or SDF) estimate at world points.

    Semantics of model_gaussian.py:276-316 with the intended projection (see
    module docstring): transform to camera space, project to pixels, sample
    the rendered depth bilinearly (border padding), sdf_hat = depth(px) - z.

    Returns (estimate, mask): mask marks points inside the frustum; the
    estimate is exp(-sdf^2/(2 beta^2)) or the raw sdf when return_sdf.
    """
    cam_pts = points @ camera.viewmat[:3, :3].T + camera.viewmat[:3, 3]
    z = cam_pts[:, 2]
    mask = z > znear

    hom = jnp.concatenate([cam_pts, jnp.ones_like(z[:, None])], axis=1) @ camera.projmat.T
    ndc = hom[:, :2] / jnp.maximum(jnp.abs(hom[:, 3:4]), 1e-9) * jnp.sign(hom[:, 3:4])
    # Principal-point offset must match the renderer's ndc2pix (the depth
    # map being sampled was rasterized with cx = W/2 + cx_off): without it
    # every probe point samples depth cx_off pixels off its projection.
    px = 0.5 * img_width * ndc[:, 0] + img_width / 2.0 + camera.cx_off - 0.5
    py = (0.5 * img_height * ndc[:, 1] + img_height / 2.0
          + camera.cy_off - 0.5)
    mask &= (px >= 0) & (px <= img_width - 1) & (py >= 0) & (py <= img_height - 1)

    z_map = _bilinear_border(depth_map, px, py)
    sdf_hat = z_map - z
    if return_sdf:
        return sdf_hat, mask
    d_hat = jnp.exp(-0.5 * sdf_hat**2 / jnp.maximum(beta, 1e-9) ** 2)
    return d_hat, mask


def make_density_probe(
    params: GaussianParams,
    alive: jax.Array,
    key: jax.Array,
    num_samples: int = 100_000,
    k: int = 16,
) -> DensityProbe:
    """Refresh the cached sample points / KNN / beta (train.py:79-83).

    beta = mean over the K neighbors of the smallest scale axis
    (train.py:83).
    """
    points, _ = sample_points(params, alive, key, num_samples)
    idx = knn_indices(points, params.means, alive, k=k)
    # Snapshot beta for inspection/fallback; the LOSS recomputes it from
    # the live scales each step (probe_beta) like the reference.
    beta = probe_beta(params, idx)
    return DensityProbe(points=points, knn_idx=idx, beta=beta)


def probe_beta(params: GaussianParams, knn_idx: jax.Array) -> jax.Array:
    """Per-point SDF length scale beta from the CURRENT scales.

    The reference recomputes ``exp(scales).min(-1)[idx].mean(1)`` inside
    every training step (train.py:83): beta must track the live scales —
    and carry gradient into them through exp(-sdf^2/2beta^2) and the
    SDF-mode ``beta * sqrt(-2 log d)`` — rather than being frozen into the
    probe for a whole densify interval."""
    min_scale = jnp.min(jnp.exp(params.scales), axis=-1)
    return jnp.mean(min_scale[knn_idx], axis=-1)


def density_loss(
    probe: DensityProbe,
    params: GaussianParams,
    depth_map: jax.Array,
    camera: CameraParams,
    img_height: int,
    img_width: int,
    use_sdf: bool = False,
) -> jax.Array:
    """The scheduled density loss term (train.py:84-91): masked-mean
    |d - d_hat|, or |beta*sqrt(-2 log d) - sdf_hat| in SDF mode."""
    d = density_at_points(probe.points, probe.knn_idx, params)
    beta = probe_beta(params, probe.knn_idx)  # live scales, with gradient
    est, mask = approximate_density(
        probe.points, depth_map, camera, beta,
        img_height, img_width, return_sdf=use_sdf,
    )
    if use_sdf:
        sdf = beta * jnp.sqrt(-2.0 * jnp.log(jnp.clip(d, 0.001, 0.999)))
        err = jnp.abs(sdf - est)
    else:
        err = jnp.abs(d - est)
    denom = jnp.maximum(jnp.sum(mask.astype(err.dtype)), 1.0)
    return jnp.sum(jnp.where(mask, err, 0.0)) / denom
