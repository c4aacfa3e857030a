"""The round-5 chip A/B flipped the kernel-precision defaults (split2 scans,
exact-rhs moments, VPU Q — ABLATION_r05.json). The non-default paths stay
A/B-able knobs; pin each one against the dense oracle so a later edit can't
silently rot them."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tinysplat_tpu.ops.rasterize_pallas as rp

from test_rasterize_tiled import random_case, to_jnp, dense_reference


def _grads_vs_dense(monkeypatch, **overrides):
    for name, val in overrides.items():
        monkeypatch.setattr(rp, name, val)
    case = random_case(n=60, H=32, W=32, seed=7)
    xys, depths, radii, conics, colors, opac, valid, H, W, bg = to_jnp(case)
    tgt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (H, W, 4)).astype(np.float32))

    from tinysplat_tpu.ops.rasterize_dense import rasterize_dense

    def loss_dense(xys, conics, colors, opac):
        img, _ = rasterize_dense(xys, depths, conics, colors, opac, valid,
                                 H, W, bg)
        return jnp.mean((img - tgt) ** 2)

    def loss_pallas(xys, conics, colors, opac):
        img, _ = rp.rasterize_pallas(xys, depths, radii, conics, colors, opac,
                                     valid, H, W, bg, chunk=16)
        return jnp.mean((img - tgt) ** 2)

    g_d = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3)))(
        xys, conics, colors, opac)
    g_p = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3)))(
        xys, conics, colors, opac)
    for gd, gp, name in zip(g_d, g_p, ("xys", "conics", "colors", "opac")):
        scale = np.maximum(np.abs(np.asarray(gd)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=2e-4 * scale + 1e-7,
            err_msg=name)


@pytest.mark.parametrize("scan_mode", ["highest", "split2"])
def test_scan_mode_gradients(monkeypatch, scan_mode):
    _grads_vs_dense(monkeypatch, _SCAN_MODE=scan_mode)


def test_bf16x3_moments_gradients(monkeypatch):
    """Legacy bf16x3 moment path (exact-rhs off)."""
    _grads_vs_dense(monkeypatch, _EXACT_MOMENTS=False)


def test_unfused_moments_gradients(monkeypatch):
    _grads_vs_dense(monkeypatch, _FUSED_MOMENTS=False, _EXACT_MOMENTS=False)


def test_mxu_q_gradients(monkeypatch):
    """Q contraction on the MXU (non-default since round 5)."""
    _grads_vs_dense(monkeypatch, _Q_VPU=False)
