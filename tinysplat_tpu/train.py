"""Training step + optimizer: one fused, jitted XLA executable per step.

TPU-native redesign of the reference training loop
(/root/reference/scripts/train.py:19-127). Differences that matter on TPU:

- The whole step (render -> loss -> backward -> Adam -> grad-accum) is ONE
  jitted function; no per-step host syncs (the reference `.item()`s metrics
  every step, train.py:109-112 — a known scaling hazard). Metrics are
  returned as device arrays and fetched asynchronously by the loop.
- Regularizer schedules (train.py:29-40, :152-159) are traced step gates
  (`jnp.where`), so the step count never triggers recompilation.
- The SH-degree warm-up (train.py:49-50) is a traced update of
  ``active_sh_degree`` (masked SH bands), not a structural change.
- Per-parameter learning rates (model_gaussian.py:112-120) use torch-Adam
  semantics via ``optax.scale_by_adam(eps_root=0)`` + a per-leaf LR scale.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from numpy import log as np_log

from .cameras import CameraParams
from .config import Config
from .models.gaussians import GaussianParams, GaussianState
from .ops.ssim import ssim, psnr
from .render import render


def _resolve_background(cfg: Config, key: jax.Array) -> jax.Array:
    """Per-step training background: random (reference train.py:51) or the
    fixed color GT frames were composited onto (cfg.background)."""
    if cfg.background == "white":
        return jnp.ones((3,))
    if cfg.background == "black":
        return jnp.zeros((3,))
    return jax.random.uniform(key, (3,))


def fixed_background(cfg: Config) -> jax.Array:
    """Eval/viewer background: the fixed training color, black otherwise."""
    return (jnp.ones(3) if cfg.background == "white" else jnp.zeros(3))


def lr_tree(cfg: Config) -> GaussianParams:
    """Per-parameter learning rates as a GaussianParams-shaped pytree."""
    return GaussianParams(
        means=cfg.lr_means,
        colors_dc=cfg.lr_colors_dc,
        colors_rest=cfg.lr_colors_rest,
        scales=cfg.lr_scales,
        quats=cfg.lr_quats,
        opacities=cfg.lr_opacities,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with torch defaults + per-leaf LRs.

    Matches ``optim.Adam(model.parameters())`` with per-group LRs
    (reference scripts/train.py:26, model_gaussian.py:112-120):
    betas=(0.9, 0.999), eps=1e-8 added *outside* the sqrt (eps_root=0).

    Optional 3DGS-style exponential means-LR decay (the reference's
    ``update_learning_rate`` is a no-op TODO, scripts/train.py:48): with
    lr_means_final > 0, the means LR interpolates log-linearly from lr_means
    to lr_means_final over lr_means_decay_steps (default max_iter).

    NOTE: 3DGS also multiplies the position LR by the scene extent
    (spatial_lr_scale); the reference omits that factor and so do we — on
    scenes far from unit scale, tune --lr-means accordingly.
    """
    lrs = lr_tree(cfg)
    decay_steps = cfg.lr_means_decay_steps or cfg.max_iter
    use_decay = cfg.lr_means_final > 0.0 and decay_steps > 0

    def scale_init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def scale_update(updates, state, params=None):
        del params
        if use_decay:
            # ONE schedule definition (means_lr_at) for the optimizer and
            # the MCMC noise scale — two inline copies once skewed by a
            # tick and had to be edited in lockstep.
            step_lrs = dataclasses.replace(
                lrs, means=means_lr_at(cfg, state.count))
        else:
            step_lrs = lrs
        scaled = jax.tree.map(lambda g, lr: -lr * g, updates, step_lrs)
        return scaled, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0),
        optax.GradientTransformation(scale_init, scale_update),
    )


def means_lr_at(cfg: Config, step: jax.Array) -> jax.Array:
    """The means learning rate at ``step`` (same schedule as
    make_optimizer's scale_update; used by the MCMC noise injector)."""
    decay_steps = cfg.lr_means_decay_steps or cfg.max_iter
    if cfg.lr_means_final > 0.0 and decay_steps > 0:
        log_ratio = float(np_log(cfg.lr_means_final / cfg.lr_means))
        frac = jnp.clip(step / decay_steps, 0.0, 1.0)
        return cfg.lr_means * jnp.exp(log_ratio * frac)
    return jnp.asarray(cfg.lr_means)


class StepOutput(NamedTuple):
    state: GaussianState
    opt_state: Any
    metrics: Dict[str, jax.Array]
    rendered: jax.Array  # (H, W, 3) for viewer/metrics reuse


def apply_appearance(rgb: jax.Array, app_params: jax.Array) -> jax.Array:
    """Per-camera affine exposure compensation (--app-opt, beyond-reference).

    app_params (12,) = flattened 3x3 delta-from-identity + 3 bias:
    rgb' = rgb @ (I + A)^T + b, clipped to [0, 1]. Zero params are the
    exact identity, so enabling the flag never changes the initial loss.
    Applied to the RENDERED image inside the training loss only — the
    splat colors stay in a canonical exposure; per-view white-balance /
    auto-exposure drift is absorbed by the 12 scalars instead.
    """
    A = jnp.eye(3, dtype=rgb.dtype) + app_params[:9].reshape(3, 3)
    b = app_params[9:]
    return jnp.clip(rgb @ A.T + b, 0.0, 1.0)


def _schedule_gate(active: bool, start: int, stop: int, step: jax.Array) -> jax.Array:
    """Traced window gate; semantics of reference Scheduler (train.py:152-159)."""
    if not active:
        return jnp.asarray(0.0)
    return jnp.where((step >= start) & (step < stop), 1.0, 0.0)


def compute_losses(
    params: GaussianParams,
    probe: jax.Array,
    state: GaussianState,
    camera: CameraParams,
    gt_image: jax.Array,
    est_depth: Optional[jax.Array],
    background: jax.Array,
    step: jax.Array,
    cfg: Config,
    img_height: int,
    img_width: int,
    density_probe=None,
    pose_delta=None,
    app_params=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + aux dict; reference loss stack scripts/train.py:57-91."""
    if pose_delta is not None:  # --pose-opt: refine the view by an SE(3) delta
        from .cameras import apply_pose_delta

        camera = apply_pose_delta(camera, pose_delta)
    rgb, extras = render(
        params,
        state.alive,
        camera,
        img_height,
        img_width,
        state.active_sh_degree,
        background,
        rasterizer=cfg.rasterizer,
        xys_probe=probe,
        viewdirs_mode=cfg.viewdirs_mode,
        tile_size=cfg.tile_size,
        dup_capacity=cfg.dup_capacity,
        max_per_tile=cfg.max_per_tile,
        span_capacity=cfg.span_capacity,
        grad_reduce=cfg.grad_reduce,
        tiles_per_block=cfg.tiles_per_block,
        tile_x=cfg.tile_x,
        antialiased=cfg.antialiased,
    )
    if app_params is not None:
        # --app-opt: per-camera affine exposure compensation ON THE RENDER,
        # inside the loss only. Zero params = exact identity.
        rgb = apply_appearance(rgb, app_params)
    loss_l1 = jnp.mean(jnp.abs(rgb - gt_image))
    loss_ssim = 1.0 - ssim(rgb, gt_image)
    loss = (1.0 - cfg.lambda_dssim) * loss_l1 + cfg.lambda_dssim * loss_ssim

    aux: Dict[str, jax.Array] = {
        "loss_l1": loss_l1,
        "loss_ssim": loss_ssim,
        "rgb": rgb,
        "depth": extras["depth"],
        "alpha": extras["alpha"],
    }
    if "binning" in extras:
        aux["n_intersections"] = extras["binning"]["intersections"]
        aux["n_dup_dropped"] = extras["binning"]["dup_dropped"]
        aux["n_tile_dropped"] = extras["binning"]["tile_dropped"]

    # Depth-guided regularization (Chung et al.; train.py:65-69).
    if cfg.regularize_depth and est_depth is not None:
        gate = _schedule_gate(True, cfg.regularize_depth_start, cfg.regularize_depth_end, step)
        loss_depth = jnp.mean(jnp.abs(extras["depth"] - est_depth))
        loss = loss + gate * cfg.lambda_depth * loss_depth
        aux["loss_depth"] = loss_depth

    # Opacity entropy regularization (train.py:71-75), over live splats only.
    if cfg.regularize_opacity:
        gate = _schedule_gate(True, cfg.regularize_opacity_start, cfg.regularize_opacity_end, step)
        o = jax.nn.sigmoid(params.opacities.reshape(-1))
        ent = -(o * jnp.log(o + 1e-10) + (1 - o) * jnp.log(1 - o + 1e-10))
        n_live = jnp.maximum(jnp.sum(state.alive), 1)
        loss_opacity = jnp.sum(jnp.where(state.alive, ent, 0.0)) / n_live
        loss = loss + gate * cfg.lambda_opacity * loss_opacity
        aux["loss_opacity"] = loss_opacity

    # SuGaR density / SDF regularization (train.py:77-91), against the
    # cached per-interval probe (points + KNN + beta; see regularizers/).
    if cfg.regularize_density and density_probe is not None:
        from .regularizers.density import density_loss

        gate = _schedule_gate(True, cfg.regularize_density_start, cfg.regularize_density_end, step)
        loss_density = density_loss(
            density_probe, params, extras["depth"], camera,
            img_height, img_width, use_sdf=cfg.regularize_sdf,
        )
        loss = loss + gate * cfg.lambda_density * loss_density
        aux["loss_density"] = loss_density

    # MCMC sparsity regularizers (3DGS-MCMC eq. 12 / gsplat MCMCStrategy
    # opacity_reg + scale_reg), over live splats only.
    if cfg.densify_strategy == "mcmc":
        n_live = jnp.maximum(jnp.sum(state.alive), 1)
        if cfg.lambda_mcmc_opacity > 0:
            o = jax.nn.sigmoid(params.opacities.reshape(-1))
            loss_mo = jnp.sum(jnp.where(state.alive, o, 0.0)) / n_live
            loss = loss + cfg.lambda_mcmc_opacity * loss_mo
            aux["loss_mcmc_opacity"] = loss_mo
        if cfg.lambda_mcmc_scale > 0:
            s = jnp.exp(params.scales)
            # Mean over the live (N, 3) entries — gsplat MCMCStrategy's
            # scale_reg is .mean() over the full tensor, so divide by
            # 3*n_live, not n_live (else the effective weight is 3x a
            # ported gsplat config's).
            loss_ms = (
                jnp.sum(jnp.where(state.alive[:, None], s, 0.0))
                / (3 * n_live)
            )
            loss = loss + cfg.lambda_mcmc_scale * loss_ms
            aux["loss_mcmc_scale"] = loss_ms

    return loss, aux


def make_train_step(cfg: Config, img_height: int, img_width: int, optimizer=None):
    """Build the jitted train step for a given image shape.

    The returned function performs reference steps 1-6 + grad accumulation
    (scripts/train.py:45-101) as one XLA executable.
    """
    if optimizer is None:
        optimizer = make_optimizer(cfg)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(
        state: GaussianState,
        opt_state,
        camera: CameraParams,
        gt_image: jax.Array,
        est_depth: Optional[jax.Array],
        step: jax.Array,
        key: jax.Array,
        density_probe=None,
        pose_delta=None,
        app_params=None,
    ) -> StepOutput:
        # SH degree warm-up: +1 every sh_increment_interval steps, capped
        # (train.py:49-50, model_gaussian.py:126-128).
        active_deg = jnp.minimum(
            jnp.int32(cfg.sh_degree), jnp.int32(1) + (step // cfg.sh_increment_interval).astype(jnp.int32)
        )
        state = dataclasses.replace(state, active_sh_degree=active_deg)

        # Random background each step (train.py:51), or the fixed color the
        # GT frames were composited onto (--background black|white —
        # Blender/NeRF-synthetic scenes; a mismatched backdrop wastes splat
        # capacity on an opaque shell).
        background = _resolve_background(cfg, key)

        probe = jnp.zeros((state.capacity, 2), gt_image.dtype)
        use_pose = cfg.pose_opt and pose_delta is not None
        use_app = cfg.app_opt and app_params is not None
        argnums = (0, 1) + ((12,) if use_pose else ()) + ((13,) if use_app else ())
        (loss, aux), gs = jax.value_and_grad(
            compute_losses, argnums=argnums, has_aux=True
        )(
            state.params, probe, state, camera, gt_image, est_depth,
            background, step, cfg, img_height, img_width, density_probe,
            pose_delta if use_pose else None, app_params if use_app else None,
        )
        grads, probe_grad = gs[0], gs[1]
        rest = list(gs[2:])
        pose_grad = rest.pop(0) if use_pose else None
        app_grad = rest.pop(0) if use_app else None

        updates, new_opt_state = optimizer.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if cfg.densify_strategy == "mcmc":
            from .models import densify_mcmc

            new_params = densify_mcmc.inject_noise(
                new_params, state.alive, jax.random.fold_in(key, 1),
                cfg.mcmc_noise_lr * means_lr_at(cfg, step), cfg,
            )

        # Densification signal: accumulate ||dL/d(screen xy)|| once past the
        # gradient warm-up (train.py:101, model_gaussian.py:130-132).
        gnorm = jnp.linalg.norm(probe_grad, axis=-1)
        accum = state.means_grad_accum + jnp.where(step >= cfg.warmup_grad, gnorm, 0.0)

        new_state = dataclasses.replace(state, params=new_params, means_grad_accum=accum)

        metrics = {
            "loss": loss,
            "loss_l1": aux["loss_l1"],
            "loss_ssim": aux["loss_ssim"],
            "psnr": psnr(aux["rgb"], gt_image),
            "num_live": new_state.num_live(),
        }
        for k in ("loss_depth", "loss_opacity", "loss_density",
                  "n_intersections", "n_dup_dropped", "n_tile_dropped"):
            if k in aux:
                metrics[k] = aux[k]
        if pose_grad is not None:
            metrics["pose_grad"] = pose_grad  # (6,); host applies pose Adam
        if app_grad is not None:
            metrics["app_grad"] = app_grad  # (12,); host applies app Adam
        return StepOutput(new_state, new_opt_state, metrics, aux["rgb"])

    return train_step


def init_opt_state(cfg: Config, state: GaussianState, optimizer=None):
    if optimizer is None:
        optimizer = make_optimizer(cfg)
    return optimizer.init(state.params)
