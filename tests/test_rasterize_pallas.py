"""Pallas kernel vs dense oracle: images and gradients (interpret mode on CPU;
the same kernels compile for TPU — bench.py exercises that path)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tinysplat_tpu.ops.rasterize_pallas import rasterize_pallas
from tinysplat_tpu.ops.rasterize_dense import rasterize_dense

from test_rasterize_tiled import random_case, to_jnp, dense_reference


def test_pallas_matches_dense_image():
    case = random_case(n=100, H=40, W=56, seed=0)
    img_d, alpha_d = dense_reference(case)
    img_p, alpha_p = rasterize_pallas(*to_jnp(case), chunk=32)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d), atol=5e-5)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_d), atol=5e-5)


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_pallas_matches_dense_multiblock():
    """Force multiple chunks per tile (chunk smaller than per-tile counts)."""
    case = random_case(n=200, H=32, W=32, seed=1)
    img_d, _ = dense_reference(case)
    img_p, _ = rasterize_pallas(*to_jnp(case), chunk=8)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d), atol=5e-5)


@pytest.mark.parametrize("grad_reduce", ["sorted", "scatter", "segment", "mxu"])
def test_pallas_gradients_match_dense(grad_reduce):
    case = random_case(n=80, H=32, W=48, seed=2)
    xys, depths, radii, conics, colors, opac, valid, H, W, bg = to_jnp(case)
    tgt = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (H, W, 4)).astype(np.float32))

    def loss_dense(xys, conics, colors, opac):
        img, _ = rasterize_dense(xys, depths, conics, colors, opac, valid, H, W, bg)
        return jnp.mean((img - tgt) ** 2)

    def loss_pallas(xys, conics, colors, opac):
        img, _ = rasterize_pallas(xys, depths, radii, conics, colors, opac, valid,
                                  H, W, bg, chunk=16, grad_reduce=grad_reduce)
        return jnp.mean((img - tgt) ** 2)

    g_d = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3)))(xys, conics, colors, opac)
    g_p = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3)))(xys, conics, colors, opac)
    for gd, gp, name in zip(g_d, g_p, ("xys", "conics", "colors", "opac")):
        scale = np.maximum(np.abs(np.asarray(gd)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=2e-4 * scale + 1e-7, err_msg=name
        )


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_pallas_gradients_with_heavy_occlusion():
    """Early-exit boundary: opaque stacks exercise the n_contrib machinery."""
    n, H, W = 48, 16, 16
    rng = np.random.default_rng(3)
    xys = rng.uniform(2, 14, size=(n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, size=(n,)).astype(np.float32)
    conics = np.tile(np.asarray([[0.15, 0.0, 0.15]], np.float32), (n, 1))
    radii = np.full(n, 14, np.int32)
    colors = rng.uniform(0, 1, size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.9, 1.0, size=(n,)).astype(np.float32)  # near-opaque
    valid = np.ones(n, bool)
    bg = np.asarray([0.3, 0.1, 0.2, 0.5], np.float32)
    args = (jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
            jnp.asarray(conics), jnp.asarray(colors), jnp.asarray(opac),
            jnp.asarray(valid))

    def loss_dense(colors, opac):
        img, _ = rasterize_dense(args[0], args[1], args[3], colors, opac,
                                 args[6], H, W, jnp.asarray(bg))
        return jnp.sum(img**2)

    def loss_pallas(colors, opac):
        img, _ = rasterize_pallas(args[0], args[1], args[2], args[3], colors, opac,
                                  args[6], H, W, jnp.asarray(bg), chunk=8)
        return jnp.sum(img**2)

    img_d, _ = rasterize_dense(args[0], args[1], args[3], args[4], args[5], args[6], H, W, jnp.asarray(bg))
    img_p, _ = rasterize_pallas(args[0], args[1], args[2], args[3], args[4], args[5], args[6], H, W, jnp.asarray(bg), chunk=8)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d), atol=5e-5)

    g_d = jax.grad(loss_dense, argnums=(0, 1))(args[4], args[5])
    g_p = jax.grad(loss_pallas, argnums=(0, 1))(args[4], args[5])
    for gd, gp, name in zip(g_d, g_p, ("colors", "opac")):
        scale = np.maximum(np.abs(np.asarray(gd)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=5e-4 * scale, err_msg=name
        )


def test_pallas_empty_scene():
    bg = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    img, alpha = rasterize_pallas(
        jnp.zeros((8, 2)), jnp.ones(8), jnp.zeros(8, jnp.int32),
        jnp.tile(jnp.asarray([1.0, 0.0, 1.0]), (8, 1)), jnp.zeros((8, 4)),
        jnp.zeros(8), jnp.zeros(8, bool), 20, 24, bg, chunk=8)
    np.testing.assert_allclose(np.asarray(img), np.broadcast_to(np.asarray(bg), (20, 24, 4)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def test_pallas_rect_tiles_match_dense():
    """Wider-than-tall tiles (tile_x = 32, 64): identical images, alphas and
    gradients — the binning x-clip, tile-local shifts, kernel pixel coords
    and output assembly all reparameterize on the tile width."""
    case = random_case(n=160, H=48, W=96, seed=5)
    img_d, alpha_d = dense_reference(case)
    for tile_x in (32, 64):
        img_p, alpha_p = rasterize_pallas(*to_jnp(case), tile_x=tile_x)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_d),
                                   atol=5e-5)

    xys0, depths, radii, conics0, colors, opac0, valid, H, W, bg = to_jnp(case)

    def loss(xys, conics, opac, tile_x):
        img, _ = rasterize_pallas(xys, depths, radii, conics, colors, opac,
                                  valid, H, W, bg, tile_x=tile_x)
        return jnp.sum(img * img)

    g32 = jax.grad(loss, argnums=(0, 1, 2))(xys0, conics0, opac0, 32)
    g16 = jax.grad(loss, argnums=(0, 1, 2))(xys0, conics0, opac0, 16)
    for a, b in zip(g32, g16):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale)
