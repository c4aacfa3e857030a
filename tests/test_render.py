import numpy as np
import jax
import pytest
import jax.numpy as jnp

from tinysplat_tpu.data.synthetic import random_gaussian_cloud, orbit_cameras
from tinysplat_tpu.models.gaussians import GaussianParams, init_from_pcd
from tinysplat_tpu.render import render
from tinysplat_tpu.utils.color import RGB2SH


def make_params(n=200, sh_bases=9, seed=0):
    means, log_scales, quats, colors, opac = random_gaussian_cloud(n, seed=seed)
    return GaussianParams(
        means=jnp.asarray(means),
        colors_dc=jnp.asarray(RGB2SH(colors)),
        colors_rest=jnp.zeros((n, sh_bases - 1, 3)),
        scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(opac),
    )


# One geometry for the three fast tests below: identical (n, H, W, sh) means
# the second and third reuse the first's jitted render executable.
FAST_N, FAST_HW = 100, (48, 64)


def test_render_smoke_and_ranges():
    h, w = FAST_HW
    params = make_params(FAST_N)
    cam = orbit_cameras(1, width=w, height=h)[0]
    rgb, extras = render(
        params, jnp.ones(FAST_N, dtype=bool), cam.params(), h, w,
        active_sh_degree=1, background=jnp.zeros(3),
    )
    rgb = np.asarray(rgb)
    assert rgb.shape == (h, w, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    assert np.asarray(extras["alpha"]).max() > 0.1  # something rendered
    depth = np.asarray(extras["depth"])
    assert depth.shape == (h, w)
    # Where alpha is high, depth should be near the camera-orbit radius (3.0)
    mask = np.asarray(extras["alpha"]) > 0.9
    if mask.any():
        assert 1.0 < depth[mask].mean() < 5.0


def test_dead_splats_invisible():
    h, w = FAST_HW
    params = make_params(FAST_N)
    cam = orbit_cameras(1, width=w, height=h)[0]
    alive_half = jnp.arange(FAST_N) < 50
    rgb_half, _ = render(params, alive_half, cam.params(), h, w, 1, jnp.zeros(3))

    # Same render with the dead splats' parameters scrambled: must be identical
    scrambled = GaussianParams(
        means=params.means.at[50:].add(123.0),
        colors_dc=params.colors_dc.at[50:].set(5.0),
        colors_rest=params.colors_rest,
        scales=params.scales.at[50:].set(2.0),
        quats=params.quats,
        opacities=params.opacities.at[50:].set(10.0),
    )
    rgb_scrambled, _ = render(scrambled, alive_half, cam.params(), h, w, 1, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(rgb_half), np.asarray(rgb_scrambled), atol=1e-6)


def test_render_jits_and_grads():
    h, w = FAST_HW
    params = make_params(FAST_N)
    cam = orbit_cameras(1, width=w, height=h)[0]
    alive = jnp.ones(FAST_N, dtype=bool)

    @jax.jit
    def loss_fn(p):
        rgb, _ = render(p, alive, cam.params(), h, w, 1, jnp.zeros(3))
        return jnp.mean(rgb)

    g = jax.grad(loss_fn)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # means gradient should be nonzero (geometry affects the image)
    assert np.abs(np.asarray(g.means)).sum() > 0


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_xys_probe_gradient():
    """The zero probe's gradient equals the screen-space xy gradient."""
    params = make_params(n=32)
    cam = orbit_cameras(1, width=32, height=24)[0]
    alive = jnp.ones(32, dtype=bool)
    probe = jnp.zeros((32, 2))

    def loss_fn(probe):
        rgb, _ = render(params, alive, cam.params(), 24, 32, 1, jnp.zeros(3), xys_probe=probe)
        return jnp.sum(rgb**2)

    g = jax.grad(loss_fn)(probe)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_init_from_pcd_shapes():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(300, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, size=(300, 3)).astype(np.float32)
    state = init_from_pcd(xyz, colors, sh_degree=3)
    assert state.capacity >= 600
    assert int(state.num_live()) == 300
    assert state.params.colors_rest.shape[1] == 15
    # live scales are log-mean-knn distances; dead slots are tiny
    assert float(jnp.exp(state.params.scales[0]).max()) < 10.0
    sig = jax.nn.sigmoid(state.params.opacities.reshape(-1))
    np.testing.assert_allclose(np.asarray(sig[:300]), 0.1, atol=1e-5)
    assert float(sig[300:].max()) < 1e-6


def test_antialias_compensation_formula():
    """antialias_compensation recovers sqrt(det(S)/det(S+blur*I)) from the
    conic of the BLURRED covariance alone (Mip-Splatting eq. 9 /
    gsplat rasterize_mode='antialiased'; beyond-reference — the legacy
    gsplat API at reference rasterize.py:32 has no such mode)."""
    from tinysplat_tpu.ops.projection import COV2D_BLUR
    from tinysplat_tpu.render import antialias_compensation

    rng = np.random.default_rng(3)
    comps, expected = [], []
    for _ in range(20):
        a = rng.uniform(0.05, 4.0, size=(2, 2))
        sigma = a @ a.T + 1e-3 * np.eye(2)  # SPD pre-blur covariance
        blurred = sigma + COV2D_BLUR * np.eye(2)
        conic_m = np.linalg.inv(blurred)
        comps.append([conic_m[0, 0], conic_m[0, 1], conic_m[1, 1]])
        expected.append(
            np.sqrt(np.linalg.det(sigma) / np.linalg.det(blurred)))
    got = np.asarray(antialias_compensation(jnp.asarray(comps, jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)
    assert (got > 0).all() and (got < 1).all()  # blur always shrinks density


def test_antialiased_render_backend_parity_and_grads():
    """Antialiased rendering agrees across dense/tiled backends, strictly
    dims small splats vs the non-antialiased render, and differentiates."""
    h, w = FAST_HW
    # Small scales -> sub-pixel footprints where the blur bias is largest.
    params = make_params(FAST_N)
    params = GaussianParams(
        means=params.means, colors_dc=params.colors_dc,
        colors_rest=params.colors_rest,
        scales=jnp.full_like(params.scales, -5.5),
        quats=params.quats, opacities=params.opacities,
    )
    alive = jnp.ones(FAST_N, dtype=bool)
    cam = orbit_cameras(1, width=w, height=h)[0].params()
    bg = jnp.zeros(3)

    rgb_d, ex_d = render(params, alive, cam, h, w, 1, bg,
                         rasterizer="dense", antialiased=True)
    rgb_t, ex_t = render(params, alive, cam, h, w, 1, bg,
                         rasterizer="tiled", antialiased=True)
    np.testing.assert_allclose(np.asarray(rgb_d), np.asarray(rgb_t),
                               rtol=1e-5, atol=1e-5)
    _, ex_plain = render(params, alive, cam, h, w, 1, bg, rasterizer="dense")
    a_aa = float(jnp.sum(ex_d["alpha"]))
    a_plain = float(jnp.sum(ex_plain["alpha"]))
    assert a_aa < a_plain * 0.9  # compensation dims sub-pixel splats

    def loss_fn(scales):
        p = GaussianParams(
            means=params.means, colors_dc=params.colors_dc,
            colors_rest=params.colors_rest, scales=scales,
            quats=params.quats, opacities=params.opacities,
        )
        rgb, _ = render(p, alive, cam, h, w, 1, bg,
                        rasterizer="dense", antialiased=True)
        return jnp.sum(rgb**2)

    g = np.asarray(jax.grad(loss_fn)(params.scales))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_antialias_compensation_needle_grad_finite():
    """Needle/sub-blur splats round det_orig to <= 0 in f32; the
    compensation's sqrt-of-clip must not emit NaN gradients there
    (inf * 0 at the old zero clip floor)."""
    import jax
    from tinysplat_tpu.render import antialias_compensation

    def inv2x2(a, c):  # diagonal covariance -> conic
        return jnp.stack([1.0 / a, jnp.zeros(()), 1.0 / c])

    conics = jnp.stack([
        inv2x2(jnp.float32(0.3 + 1e-9), jnp.float32(0.3 + 1e-9)),  # sub-blur
        inv2x2(jnp.float32(1.3), jnp.float32(0.3 + 1e-8)),         # needle
        inv2x2(jnp.float32(2.0), jnp.float32(1.5)),                # normal
    ])
    comp, grads = jax.value_and_grad(
        lambda c: jnp.sum(antialias_compensation(c)), allow_int=True
    )(conics)
    assert np.isfinite(float(comp))
    assert np.isfinite(np.asarray(grads)).all()
    # The normal splat keeps a meaningful compensation value.
    vals = np.asarray(antialias_compensation(conics))
    assert vals[2] > 0.5 and vals[0] < 0.05
