"""Chip probe: gradient accuracy of the in-kernel matmul precision choice.

Runs the Pallas render fwd+bwd twice on the SAME device inputs — once with
the kernels' design precision (TINYSPLAT_MM_PRECISION default 'bf16x3',
manual bf16 hi/lo decomposition over DEFAULT-precision MXU passes) and once
at 'highest' (the full f32 decomposition, the old implicit behavior from
the package-global jax_default_matmul_precision) — and prints per-leaf max
relative gradient differences. bf16x3 is f32-equivalent for tile-local
magnitudes (see rasterize_pallas._dot); this probe is the measurement
backing that claim on real hardware.

The two variants are built by reloading the module with the env var set —
run this script directly, not under pytest.
"""
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def grads_with_precision(prec: str, case):
    os.environ["TINYSPLAT_MM_PRECISION"] = prec
    import tinysplat_tpu.ops.rasterize_pallas as rp

    importlib.reload(rp)
    rp._cached_pallas_fns.cache_clear()
    xys, depths, radii, conics, colors, opac, valid, H, W, bg = case

    def loss(xys, conics, colors, opac):
        img, alpha = rp.rasterize_pallas(
            xys, depths, radii, conics, colors, opac, valid, H, W, bg
        )
        return jnp.sum(img * img) + jnp.sum(alpha)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(xys, conics, colors, opac)
    return jax.device_get(g)


def main():
    rng = np.random.default_rng(7)
    n, H, W = 4096, 256, 320
    xys = rng.uniform([0, 0], [W, H], (n, 2)).astype(np.float32)
    depths = rng.uniform(1, 10, n).astype(np.float32)
    radii = rng.uniform(4, 40, n).astype(np.float32)
    L = rng.normal(size=(n, 2, 2)).astype(np.float32) * 0.05
    cov_inv = np.array([np.linalg.inv(l @ l.T + 0.02 * np.eye(2)) for l in L])
    conics = np.stack(
        [cov_inv[:, 0, 0], cov_inv[:, 0, 1], cov_inv[:, 1, 1]], -1
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    bg = np.zeros(4, np.float32)
    case = tuple(
        jnp.asarray(a) for a in
        (xys, depths, radii, conics, colors, opac, valid)
    ) + (H, W, jnp.asarray(bg))

    g_hi = grads_with_precision("highest", case)
    g_high = grads_with_precision("bf16x3", case)
    names = ("xys", "conics", "colors", "opac")
    for name, a, b in zip(names, g_hi, g_high):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-30
        rel = np.abs(a - b).max() / scale
        print(f"{name:8s} max|grad|={scale:.3e}  max rel diff={rel:.3e}")


if __name__ == "__main__":
    main()
