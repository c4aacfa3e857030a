"""Adapters exposing the SD-topology modules through the pipeline's
channel-first interface (unet.py / vae.py conventions), so a ported
checkpoint drops into TinysplatDiffusionPipeline unchanged."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_hwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _to_chw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class SDUNetAdapter:
    def __init__(self, model):
        self.model = model
        cfg = model.config
        self.in_channels = cfg.get("in_channels", 4)
        self.out_channels = cfg.get("out_channels", 4)
        self.cross_attention_dim = cfg.get("cross_attention_dim", 768)
        self.sample_size = cfg.get("sample_size", 64)

    def apply(self, params, sample, timesteps, encoder_hidden_states):
        out = self.model.apply(
            params, _to_hwc(sample), jnp.atleast_1d(timesteps),
            encoder_hidden_states,
        )
        return _to_chw(out)


class SDVAEAdapter:
    def __init__(self, model, scaling_factor: float = 0.18215):
        self.model = model
        self.scaling_factor = scaling_factor
        self.latent_channels = model.config.get("latent_channels", 4)

    def apply(self, params, *args, method=None):
        name = getattr(method, "__name__", "__call__")
        if name == "encode":
            images, key = args
            z = self.model.apply(params, _to_hwc(images), key,
                                 method=type(self.model).encode)
            return _to_chw(z) * self.scaling_factor
        if name == "decode":
            (latents,) = args
            img = self.model.apply(params, _to_hwc(latents) / self.scaling_factor,
                                   method=type(self.model).decode)
            return _to_chw(img)
        images, key = args
        img, z = self.model.apply(params, _to_hwc(images), key)
        return _to_chw(img), _to_chw(z)
