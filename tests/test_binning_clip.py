"""Exactness of the opacity-aware ellipse cull in binning.

The cull may only drop (splat, tile) pairs whose alpha is below ALPHA_EPS at
EVERY pixel of the tile — such pairs are masked to zero by the compositing
rule (rasterize_dense.alpha_matrix), so dropping them must leave images and
gradients bit-identical. Reference behavior: the rect binning the CUDA path
uses (/root/reference/tinysplat/splatting/rasterize.py:88-94) keeps the full
circle-AABB; the cull is a strict, provably-inert subset of it.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tinysplat_tpu.ops.binning import bin_splats
from tinysplat_tpu.ops.rasterize_dense import ALPHA_EPS


def random_aniso_case(n=120, tiles_x=5, tiles_y=4, tile_size=16, seed=3):
    rng = np.random.default_rng(seed)
    W, H = tiles_x * tile_size, tiles_y * tile_size
    xys = rng.uniform([-10, -10], [W + 10, H + 10], size=(n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, size=(n,)).astype(np.float32)
    # Anisotropic covariances with random orientation.
    sx = rng.uniform(1.0, 12.0, size=n)
    sy = rng.uniform(1.0, 12.0, size=n)
    th = rng.uniform(0, np.pi, size=n)
    ct, st = np.cos(th), np.sin(th)
    # cov = R diag(sx^2, sy^2) R^T
    c00 = ct * ct * sx**2 + st * st * sy**2
    c01 = ct * st * (sx**2 - sy**2)
    c11 = st * st * sx**2 + ct * ct * sy**2
    det = c00 * c11 - c01 * c01
    conics = np.stack([c11 / det, -c01 / det, c00 / det], axis=1).astype(np.float32)
    # 3-sigma circle radius from the max eigenvalue (projection.py semantics).
    tr2 = 0.5 * (c00 + c11)
    lam = tr2 + np.sqrt(np.maximum(tr2 * tr2 - det, 0.0))
    radii = np.ceil(3.0 * np.sqrt(lam)).astype(np.int32)
    valid = rng.uniform(size=n) > 0.1
    opac = rng.uniform(0.002, 1.0, size=n).astype(np.float32)
    return xys, depths, radii, valid, conics, opac, tiles_x, tiles_y, tile_size


def tile_lists(bins, num_tiles):
    out = []
    lists = np.asarray(bins.idx_lists)
    counts = np.asarray(bins.counts)
    for t in range(num_tiles):
        out.append(list(lists[t, : counts[t]]))
    return out


def test_clip_is_subset_and_exact():
    (xys, depths, radii, valid, conics, opac, tx, ty, ts) = random_aniso_case()
    args = (jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
            jnp.asarray(valid), tx, ty, ts)
    rect = bin_splats(*args)
    clip = bin_splats(*args, conics=jnp.asarray(conics), opacities=jnp.asarray(opac))

    num_tiles = tx * ty
    rect_l = tile_lists(rect, num_tiles)
    clip_l = tile_lists(clip, num_tiles)
    assert int(clip.total_intersections) < int(rect.total_intersections), \
        "anisotropic case must cull something"

    dropped = 0
    for t in range(num_tiles):
        # The clipped list must be the rect list with pairs removed (same
        # depth order, no additions).
        assert set(clip_l[t]) <= set(rect_l[t]), t
        # Order: clipped list is rect list filtered.
        filt = [s for s in rect_l[t] if s in set(clip_l[t])]
        assert filt == clip_l[t], t
        # Every dropped pair must be alpha-masked at every pixel of the tile.
        tx0, ty0 = (t % tx) * ts, (t // tx) * ts
        px, py = np.meshgrid(np.arange(tx0, tx0 + ts), np.arange(ty0, ty0 + ts))
        for s in set(rect_l[t]) - set(clip_l[t]):
            dropped += 1
            dx = px.ravel() - xys[s, 0]
            dy = py.ravel() - xys[s, 1]
            a, b, c = conics[s]
            sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
            alpha = np.minimum(0.999, opac[s] * np.exp(-sigma))
            assert alpha.max() < ALPHA_EPS, (t, s, alpha.max())
    assert dropped > 0


def test_clip_culls_transparent_splats():
    (xys, depths, radii, valid, conics, opac, tx, ty, ts) = random_aniso_case()
    opac = np.full_like(opac, ALPHA_EPS * 0.5)  # below the alpha test anywhere
    clip = bin_splats(jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
                      jnp.asarray(valid), tx, ty, ts,
                      conics=jnp.asarray(conics), opacities=jnp.asarray(opac))
    assert int(clip.total_intersections) == 0
