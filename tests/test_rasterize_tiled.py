"""Tiled rasterizer must match the dense oracle: images AND gradients
(the north-star correctness bar, BASELINE.md)."""
import numpy as np
import jax
import jax.numpy as jnp

from tinysplat_tpu.ops.rasterize import rasterize_tiled
from tinysplat_tpu.ops.rasterize_dense import rasterize_dense


def random_case(n=120, H=40, W=56, seed=0, channels=4):
    rng = np.random.default_rng(seed)
    xys = rng.uniform([-6, -6], [W + 6, H + 6], size=(n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, size=(n,)).astype(np.float32)
    L = rng.normal(size=(n, 2, 2)).astype(np.float32) * 2.0
    cov = L @ np.swapaxes(L, 1, 2) + 1.0 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], axis=1).astype(np.float32)
    # Production uses 3-sigma radii (like gsplat CUDA), which culls pixels in
    # uncovered tiles where alpha is still >= 1/255 (support extends to
    # sqrt(2*ln(255)) ~ 3.33 sigma). The dense oracle has no radius concept,
    # so for exact comparison use radii covering the full alpha support.
    eig = np.linalg.eigvalsh(cov).max(axis=1)
    radii = np.ceil(3.5 * np.sqrt(eig)).astype(np.int32)
    colors = rng.uniform(0, 1, size=(n, channels)).astype(np.float32)
    opac = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
    valid = rng.uniform(size=(n,)) > 0.1
    background = rng.uniform(0, 1, size=(channels,)).astype(np.float32)
    return xys, depths, radii, conics, colors, opac, valid, H, W, background


def to_jnp(case):
    xys, depths, radii, conics, colors, opac, valid, H, W, bg = case
    return (jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
            jnp.asarray(conics), jnp.asarray(colors), jnp.asarray(opac),
            jnp.asarray(valid), H, W, jnp.asarray(bg))


def dense_reference(case):
    xys, depths, radii, conics, colors, opac, valid, H, W, bg = to_jnp(case)
    return rasterize_dense(xys, depths, conics, colors, opac, valid, H, W, bg)


def test_tiled_matches_dense_image():
    for seed in (0, 1):
        case = random_case(seed=seed)
        img_d, alpha_d = dense_reference(case)
        args = to_jnp(case)
        img_t, alpha_t = rasterize_tiled(*args, tile_size=16, chunk=16)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=3e-5)
        np.testing.assert_allclose(np.asarray(alpha_t), np.asarray(alpha_d), atol=3e-5)


def test_tiled_matches_dense_nonmultiple_dims():
    """Image dims not a multiple of the tile size (crop path)."""
    case = random_case(H=35, W=49, seed=2)
    img_d, alpha_d = dense_reference(case)
    img_t, alpha_t = rasterize_tiled(*to_jnp(case), tile_size=16, chunk=8)
    assert img_t.shape == (35, 49, 4)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=3e-5)


def test_tiled_matches_dense_gradients():
    """Pixel gradients w.r.t. xys/conics/colors/opacities match the oracle."""
    case = random_case(n=60, H=32, W=32, seed=3)
    xys, depths, radii, conics, colors, opac, valid, H, W, bg = to_jnp(case)
    tgt = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (H, W, 4)).astype(np.float32))

    def loss_dense(xys, conics, colors, opac):
        img, _ = rasterize_dense(xys, depths, conics, colors, opac, valid, H, W, bg)
        return jnp.mean((img - tgt) ** 2)

    def loss_tiled(xys, conics, colors, opac):
        img, _ = rasterize_tiled(xys, depths, radii, conics, colors, opac, valid, H, W, bg,
                                 tile_size=16, chunk=16)
        return jnp.mean((img - tgt) ** 2)

    g_d = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3)))(xys, conics, colors, opac)
    g_t = jax.jit(jax.grad(loss_tiled, argnums=(0, 1, 2, 3)))(xys, conics, colors, opac)
    for gd, gt, name in zip(g_d, g_t, ("xys", "conics", "colors", "opac")):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gd), atol=2e-5, err_msg=name)


def test_tiled_empty_scene():
    bg = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    img, alpha = rasterize_tiled(
        jnp.zeros((8, 2)), jnp.ones(8), jnp.zeros(8, jnp.int32),
        jnp.tile(jnp.asarray([1.0, 0.0, 1.0]), (8, 1)), jnp.zeros((8, 4)),
        jnp.zeros(8), jnp.zeros(8, bool), 20, 24, bg)
    np.testing.assert_allclose(np.asarray(img), np.broadcast_to(np.asarray(bg), (20, 24, 4)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def test_tiled_early_exit_across_chunk_boundary():
    """A pixel that crossed T_EPS inside one scan chunk must STAY dead in
    the next (regression: carrying only the frozen transmittance let the
    pixel 'resurrect' — the killing splat's factor was dropped from the
    carry, so later chunks composited splats the CUDA early-exit rule
    excludes)."""
    n = 8
    xys = np.tile(np.array([[8.0, 8.0]], np.float32), (n, 1))
    depths = np.arange(1, n + 1, dtype=np.float32)
    conics = np.tile(np.array([[0.5, 0.0, 0.5]], np.float32), (n, 1))
    radii = np.full((n,), 12, np.int32)
    colors = np.linspace(0.1, 0.9, n)[:, None].repeat(3, 1).astype(np.float32)
    opac = np.concatenate([np.full(2, 0.999), np.full(n - 2, 0.5)]).astype(
        np.float32)
    valid = np.ones(n, bool)
    H = W = 16
    bg = np.zeros(3, np.float32)
    ref_img, ref_alpha = rasterize_dense(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(conics),
        jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(valid),
        H, W, jnp.asarray(bg))
    # chunk=2: the pixel dies inside chunk 1 (two 0.999-alpha splats).
    img, alpha = rasterize_tiled(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
        jnp.asarray(conics), jnp.asarray(colors), jnp.asarray(opac),
        jnp.asarray(valid), H, W, jnp.asarray(bg), tile_size=16, chunk=2)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               atol=3e-6)
