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
