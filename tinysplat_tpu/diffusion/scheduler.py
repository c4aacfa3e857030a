"""DDIM noise scheduler (self-contained, jit-friendly).

Counterpart of the diffusers scheduler used by the reference pipeline
(/root/reference/tinysplat/diffusion/pipeline.py:321-335 add-noise, :496-520
denoise loop). Standard DDIM (Song et al. 2020) with a scaled-linear beta
schedule (the Stable-Diffusion default); all state is precomputed arrays so
`step` is pure and usable under lax.fori_loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DDIMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
    ):
        self.num_train_timesteps = num_train_timesteps
        if prediction_type not in ("epsilon", "v_prediction"):
            raise NotImplementedError(
                f"prediction_type={prediction_type!r} (epsilon / v_prediction only)"
            )
        self.prediction_type = prediction_type
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps)
        else:
            raise ValueError(beta_schedule)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas), jnp.float32)
        self.init_noise_sigma = 1.0

    @classmethod
    def from_config_file(cls, path: str) -> "DDIMScheduler":
        """Build from a diffusers scheduler_config.json.

        Semantics-bearing fields are honored (prediction_type raises
        NotImplementedError for anything but epsilon / v_prediction instead of
        silently denoising with the wrong objective — SD 2.x-v checkpoints
        ship v_prediction); other unrecognized fields that would change
        semantics get a warning rather than silence.
        """
        import json
        import logging

        with open(path) as f:
            cfg = json.load(f)
        if cfg.get("clip_sample", False):
            logging.getLogger(__name__).warning(
                "scheduler_config clip_sample=true is not implemented; "
                "denoising proceeds without x0 clipping"
            )
        if cfg.get("steps_offset", 0):
            logging.getLogger(__name__).warning(
                "scheduler_config steps_offset=%s ignored (timesteps() uses "
                "the trailing schedule)", cfg["steps_offset"],
            )
        # Other semantics-bearing fields this implementation fixes: warn
        # whenever the checkpoint's training-time settings deviate.
        if cfg.get("timestep_spacing", "trailing") != "trailing":
            logging.getLogger(__name__).warning(
                "scheduler_config timestep_spacing=%r ignored (trailing "
                "schedule is used)", cfg["timestep_spacing"])
        if cfg.get("set_alpha_to_one", True) is False:
            logging.getLogger(__name__).warning(
                "scheduler_config set_alpha_to_one=false ignored (final "
                "alpha_prev is fixed at 1.0)")
        if cfg.get("rescale_betas_zero_snr", False):
            logging.getLogger(__name__).warning(
                "scheduler_config rescale_betas_zero_snr=true is not "
                "implemented; the beta schedule is NOT zero-SNR rescaled")
        if cfg.get("thresholding", False):
            logging.getLogger(__name__).warning(
                "scheduler_config thresholding=true is not implemented")
        return cls(
            num_train_timesteps=cfg.get("num_train_timesteps", 1000),
            beta_start=cfg.get("beta_start", 0.00085),
            beta_end=cfg.get("beta_end", 0.012),
            beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
            prediction_type=cfg.get("prediction_type", "epsilon"),
        )

    def timesteps(self, num_inference_steps: int) -> jax.Array:
        """Descending inference timestep schedule."""
        step = self.num_train_timesteps // num_inference_steps
        return jnp.arange(self.num_train_timesteps - 1, -1, -step, dtype=jnp.int32)[
            :num_inference_steps
        ]

    def add_noise(self, sample: jax.Array, noise: jax.Array, t) -> jax.Array:
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def step(self, model_out: jax.Array, t, sample: jax.Array, prev_t) -> jax.Array:
        """One deterministic DDIM update x_t -> x_{prev_t}.

        ``model_out`` is interpreted per ``prediction_type``: an epsilon
        prediction, or a v prediction (Salimans & Ho 2022:
        v = sqrt(a) eps - sqrt(1-a) x0, so x0 = sqrt(a) x_t - sqrt(1-a) v and
        eps = sqrt(a) v + sqrt(1-a) x_t).
        """
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        if self.prediction_type == "v_prediction":
            sq_a, sq_1a = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
            x0 = sq_a * sample - sq_1a * model_out
            eps = sq_a * model_out + sq_1a * sample
        else:
            eps = model_out
            x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
