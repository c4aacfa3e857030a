import numpy as np
import jax.numpy as jnp
from scipy.ndimage import convolve1d

from tinysplat_tpu.ops.ssim import ssim, psnr, _gaussian_window


def numpy_ssim(x, y, data_range=1.0, win_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent reimplementation (scipy), valid-window like pytorch_msssim."""
    win = _gaussian_window(win_size, sigma).astype(np.float64)
    r = win_size // 2

    def blur(img):
        out = convolve1d(img, win, axis=0)
        out = convolve1d(out, win, axis=1)
        return out[r:-r, r:-r]

    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for c in range(x.shape[2]):
        xc, yc = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        mx, my = blur(xc), blur(yc)
        sxx = blur(xc * xc) - mx * mx
        syy = blur(yc * yc) - my * my
        sxy = blur(xc * yc) - mx * my
        m = ((2 * mx * my + c1) / (mx * mx + my * my + c1)) * ((2 * sxy + c2) / (sxx + syy + c2))
        vals.append(m)
    return np.mean(vals)


def test_ssim_identity():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(32, 40, 3)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-5


def test_ssim_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(32, 40, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, size=x.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    expect = numpy_ssim(x, y)
    assert abs(got - expect) < 1e-4


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    assert float(ssim(jnp.asarray(x), jnp.asarray(small))) > float(ssim(jnp.asarray(x), jnp.asarray(big)))


def test_psnr():
    x = np.zeros((8, 8, 3), np.float32)
    y = np.full((8, 8, 3), 0.1, np.float32)
    np.testing.assert_allclose(float(psnr(jnp.asarray(x), jnp.asarray(y))), 20.0, atol=1e-3)
