"""Dense-oracle rasterizer tests, including an independent numpy per-pixel
loop that implements the CUDA (gsplat legacy) compositing semantics verbatim
— the 'torch/CPU oracle' of SURVEY.md section 4 item 1."""
import numpy as np
import jax
import jax.numpy as jnp

from tinysplat_tpu.ops.rasterize_dense import (
    rasterize_dense,
    ALPHA_EPS,
    ALPHA_MAX,
    T_EPS,
)


def numpy_oracle(xys, depths, conics, colors, opacities, valid, H, W, background):
    """Sequential per-pixel front-to-back compositing (CUDA semantics)."""
    order = np.argsort(np.where(valid, depths, np.inf), kind="stable")
    img = np.zeros((H, W, colors.shape[1]), np.float64)
    alpha_img = np.zeros((H, W), np.float64)
    for iy in range(H):
        for ix in range(W):
            T = 1.0
            acc = np.zeros(colors.shape[1])
            for k in order:
                if not valid[k]:
                    continue
                dx = ix - xys[k, 0]
                dy = iy - xys[k, 1]
                a, b, c = conics[k]
                sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                alpha = min(ALPHA_MAX, opacities[k] * np.exp(-sigma))
                if sigma < 0 or alpha < ALPHA_EPS:
                    continue
                next_T = T * (1 - alpha)
                if next_T <= T_EPS:
                    break
                acc += colors[k] * alpha * T
                T = next_T
            img[iy, ix] = acc + T * background
            alpha_img[iy, ix] = 1.0 - T
    return img, alpha_img


def random_case(n=60, H=24, W=32, seed=0, channels=4):
    rng = np.random.default_rng(seed)
    xys = rng.uniform([-4, -4], [W + 4, H + 4], size=(n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, size=(n,)).astype(np.float32)
    # Random SPD conics via random 2x2 covariances
    L = rng.normal(size=(n, 2, 2)).astype(np.float32)
    cov = L @ np.swapaxes(L, 1, 2) + 0.5 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], axis=1).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, channels)).astype(np.float32)
    opac = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
    valid = rng.uniform(size=(n,)) > 0.1
    background = rng.uniform(0, 1, size=(channels,)).astype(np.float32)
    return xys, depths, conics, colors, opac, valid, H, W, background


def test_matches_numpy_oracle():
    case = random_case()
    expect_img, expect_alpha = numpy_oracle(*case)
    xys, depths, conics, colors, opac, valid, H, W, bg = case
    img, alpha = rasterize_dense(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(conics),
        jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(valid), H, W, jnp.asarray(bg),
    )
    np.testing.assert_allclose(np.asarray(img), expect_img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), expect_alpha, atol=2e-5)


def test_empty_scene_is_background():
    bg = jnp.asarray([0.2, 0.4, 0.6])
    img, alpha = rasterize_dense(
        jnp.zeros((4, 2)), jnp.ones(4), jnp.tile(jnp.asarray([1.0, 0, 1.0]), (4, 1)),
        jnp.zeros((4, 3)), jnp.zeros(4), jnp.zeros(4, dtype=bool), 8, 8, bg,
    )
    np.testing.assert_allclose(np.asarray(img), np.broadcast_to(np.asarray(bg), (8, 8, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)


def test_opaque_front_splat_occludes():
    """A nearly opaque near splat hides a far one at the pixel center."""
    xys = jnp.asarray([[4.0, 4.0], [4.0, 4.0]])
    depths = jnp.asarray([1.0, 2.0])
    conics = jnp.tile(jnp.asarray([4.0, 0.0, 4.0]), (2, 1))  # tight splats
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    opac = jnp.asarray([0.999, 0.999])
    valid = jnp.ones(2, dtype=bool)
    img, _ = rasterize_dense(xys, depths, conics, colors, opac, valid, 9, 9, jnp.zeros(3))
    center = np.asarray(img[4, 4])
    assert center[0] > 0.97 and center[1] < 0.03


def test_order_independence_of_input_permutation():
    """Compositing sorts by depth internally: input order must not matter."""
    case = random_case(seed=3)
    xys, depths, conics, colors, opac, valid, H, W, bg = case
    img1, _ = rasterize_dense(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(conics),
        jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(valid), H, W, jnp.asarray(bg))
    perm = np.random.default_rng(0).permutation(len(depths))
    img2, _ = rasterize_dense(
        jnp.asarray(xys[perm]), jnp.asarray(depths[perm]), jnp.asarray(conics[perm]),
        jnp.asarray(colors[perm]), jnp.asarray(opac[perm]), jnp.asarray(valid[perm]), H, W, jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)


def test_gradients_match_finite_differences():
    """Pixel gradients vs central differences (north-star correctness bar)."""
    n, H, W = 8, 10, 12
    case = random_case(n=n, H=H, W=W, seed=5)
    xys, depths, conics, colors, opac, valid, _, _, bg = case
    valid = np.ones(n, dtype=bool)

    @jax.jit
    def loss(xys_j, colors_j, opac_j):
        img, _ = rasterize_dense(
            xys_j, jnp.asarray(depths), jnp.asarray(conics), colors_j,
            opac_j, jnp.asarray(valid), H, W, jnp.asarray(bg))
        return jnp.sum(img**2)

    g_xys, g_col, g_opac = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        jnp.asarray(xys), jnp.asarray(colors), jnp.asarray(opac))

    eps = 1e-3
    for (arr, grad, name) in [(xys, g_xys, "xys"), (colors, g_col, "colors"), (opac, g_opac, "opac")]:
        flat = arr.reshape(-1)
        idxs = np.random.default_rng(1).choice(flat.size, size=min(6, flat.size), replace=False)
        for i in idxs:
            fp = flat.copy(); fp[i] += eps
            fm = flat.copy(); fm[i] -= eps
            args_p = {"xys": xys, "colors": colors, "opac": opac}
            args_m = {"xys": xys, "colors": colors, "opac": opac}
            args_p[name] = fp.reshape(arr.shape)
            args_m[name] = fm.reshape(arr.shape)
            lp = float(loss(jnp.asarray(args_p["xys"]), jnp.asarray(args_p["colors"]), jnp.asarray(args_p["opac"])))
            lm = float(loss(jnp.asarray(args_m["xys"]), jnp.asarray(args_m["colors"]), jnp.asarray(args_m["opac"])))
            fd = (lp - lm) / (2 * eps)
            an = float(np.asarray(grad).reshape(-1)[i])
            assert abs(fd - an) < 5e-2 * max(1.0, abs(fd), abs(an)), (name, i, fd, an)
