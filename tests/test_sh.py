import numpy as np
import jax
import jax.numpy as jnp

from tinysplat_tpu.ops.sh import eval_sh, num_sh_bases, deg_from_sh, sh_basis
from tinysplat_tpu.utils.color import RGB2SH, SH2RGB


def test_num_sh_bases():
    assert [num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]
    assert deg_from_sh(16) == 3
    assert deg_from_sh(1) == 0


def test_dc_only_constant_color():
    """Degree-0: color independent of view direction, SH2RGB inverse."""
    rgb = jnp.asarray([[0.25, 0.5, 0.75]])
    coeffs = jnp.zeros((1, 16, 3)).at[:, 0, :].set(RGB2SH(rgb))
    for d in [jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 1.0])]:
        out = eval_sh(0, d[None], coeffs)
        np.testing.assert_allclose(np.asarray(out + 0.5), np.asarray(rgb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(SH2RGB(RGB2SH(rgb))), np.asarray(rgb), atol=1e-7)


def test_active_degree_masks_higher_bands():
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # degree 1 result must equal zeroing bands 2..3 manually
    manual = coeffs.at[:, 4:, :].set(0.0)
    np.testing.assert_allclose(
        np.asarray(eval_sh(1, dirs, coeffs)),
        np.asarray(eval_sh(3, dirs, manual)),
        atol=1e-6,
    )


def test_sh_orthogonality():
    """Monte-Carlo check: int Y_i Y_j dOmega ~ delta_ij (validates constants)."""
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(200000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = np.asarray(sh_basis(jnp.asarray(dirs, dtype=jnp.float32), 16))
    gram = 4 * np.pi * basis.T @ basis / dirs.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_eval_sh_differentiable():
    coeffs = jnp.ones((4, 9, 3)) * 0.1
    dirs = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    g = jax.grad(lambda c: eval_sh(2, dirs, c).sum())(coeffs)
    assert np.isfinite(np.asarray(g)).all()
