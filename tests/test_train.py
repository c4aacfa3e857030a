"""End-to-end training tests on a synthetic scene (SURVEY.md section 4 item 3)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import random_gaussian_cloud, orbit_cameras
from tinysplat_tpu.models.gaussians import GaussianParams, GaussianState
from tinysplat_tpu.render import render
from tinysplat_tpu.train import make_train_step, make_optimizer, init_opt_state, lr_tree
from tinysplat_tpu.utils.color import RGB2SH
from tinysplat_tpu.ops.ssim import psnr


H, W = 48, 64
N = 128


def target_params(seed=0):
    means, log_scales, quats, colors, _ = random_gaussian_cloud(N, seed=seed)
    return GaussianParams(
        means=jnp.asarray(means),
        colors_dc=jnp.asarray(RGB2SH(colors)),
        colors_rest=jnp.zeros((N, 3, 3)),
        scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        opacities=jnp.full((N, 1), 2.0),
    )


def make_state(params):
    return GaussianState(
        params=params,
        alive=jnp.ones(N, dtype=bool),
        means_grad_accum=jnp.zeros(N),
        active_sh_degree=jnp.int32(1),
    )


def test_adam_step_matches_torch_semantics():
    """One optax step == torch.optim.Adam step (per-group LRs)."""
    import torch

    cfg = Config(rasterizer="dense")
    params = target_params()
    g = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, params)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    updates, _ = opt.update(g, opt_state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)

    lrs = lr_tree(cfg)
    for name in ("means", "colors_dc", "scales", "quats", "opacities"):
        p = torch.tensor(np.asarray(getattr(params, name)), requires_grad=True)
        topt = torch.optim.Adam([{"params": [p], "lr": getattr(lrs, name)}])
        p.grad = torch.full_like(p, 0.1)
        topt.step()
        np.testing.assert_allclose(
            np.asarray(getattr(new, name)), p.detach().numpy(), atol=1e-6, err_msg=name
        )


@pytest.mark.slow
def test_training_improves_psnr():
    cfg = Config(rasterizer="dense", sh_degree=1, sh_increment_interval=10_000, warmup_grad=0)
    target = target_params(seed=0)
    tstate = make_state(target)
    cams = orbit_cameras(6, width=W, height=H)
    gts = []
    for cam in cams:
        rgb, _ = render(target, tstate.alive, cam.params(), H, W, 1, jnp.zeros(3), rasterizer="dense")
        gts.append(rgb)

    # Init: same geometry, wrong colors/opacities.
    init = dataclasses.replace(
        target,
        colors_dc=jnp.zeros_like(target.colors_dc),
        opacities=jnp.full((N, 1), -1.0),
        means=target.means + 0.01,
    )
    state = make_state(init)
    opt_state = init_opt_state(cfg, state)
    step_fn = make_train_step(cfg, H, W)

    def eval_psnr(state):
        vals = []
        for cam, gt in zip(cams, gts):
            rgb, _ = render(
                state.params, state.alive, cam.params(), H, W,
                state.active_sh_degree, jnp.zeros(3), rasterizer="dense")
            vals.append(float(psnr(rgb, gt)))
        return float(np.mean(vals))

    before = eval_psnr(state)
    key = jax.random.PRNGKey(0)
    for step in range(1, 121):
        cam = cams[step % len(cams)]
        gt = gts[step % len(cams)]
        key, sub = jax.random.split(key)
        out = step_fn(state, opt_state, cam.params(), gt, None, jnp.int32(step), sub)
        state, opt_state = out.state, out.opt_state
    after = eval_psnr(state)

    metrics = jax.device_get(out.metrics)
    assert np.isfinite(metrics["loss"])
    assert after > before + 3.0, (before, after)
    # grad accum populated (warmup_grad=0)
    assert float(jnp.sum(state.means_grad_accum)) > 0


def test_schedule_gates_and_sh_ramp():
    cfg = Config(
        rasterizer="dense", sh_degree=3, sh_increment_interval=5,
        regularize_opacity=True, regularize_opacity_start=3, regularize_opacity_end=6,
    )
    state = make_state(target_params())
    opt_state = init_opt_state(cfg, state)
    step_fn = make_train_step(cfg, H, W)
    cam = orbit_cameras(1, width=W, height=H)[0]
    gt = jnp.zeros((H, W, 3))
    key = jax.random.PRNGKey(0)
    out = step_fn(state, opt_state, cam.params(), gt, None, jnp.int32(10), key)
    # At step 10 with interval 5: active degree = min(3, 1 + 2) = 3
    assert int(out.state.active_sh_degree) == 3
    assert "loss_opacity" in out.metrics


def test_means_lr_exponential_decay():
    """3DGS-style position LR schedule (reference leaves it as a TODO)."""
    import dataclasses

    import optax

    from tinysplat_tpu.config import Config
    from tinysplat_tpu.models.gaussians import GaussianParams
    from tinysplat_tpu.train import make_optimizer

    cfg = Config(lr_means=1e-2, lr_means_final=1e-4, lr_means_decay_steps=100)
    opt = make_optimizer(cfg)
    params = GaussianParams(
        means=jnp.zeros((4, 3)), colors_dc=jnp.zeros((4, 3)),
        colors_rest=jnp.zeros((4, 0, 3)), scales=jnp.zeros((4, 3)),
        quats=jnp.zeros((4, 4)), opacities=jnp.zeros((4, 1)),
    )
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    # Huge-gradient regime: Adam's normalized update magnitude == LR.
    updates0, state = opt.update(grads, state, params)
    mag0 = float(jnp.abs(updates0.means).mean())
    for _ in range(99):
        updates, state = opt.update(grads, state, params)
    mag_end = float(jnp.abs(updates.means).mean())
    # First-step Adam bias correction makes mag0 ~ lr exactly.
    assert 0.5e-2 < mag0 < 1.5e-2
    assert 0.5e-4 < mag_end < 2.0e-4
    # Non-means leaves keep their constant LR.
    assert 0.5 * 0.0025 < float(jnp.abs(updates.colors_dc).mean()) < 1.5 * 0.0025
