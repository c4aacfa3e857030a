"""Minimal flax KL-autoencoder (latent-diffusion VAE counterpart).

Stands in for the diffusers `AutoencoderKL` the reference pipeline loads from
the HF hub (/root/reference/tinysplat/diffusion/pipeline.py:296-335): encode
images to a diagonal-Gaussian latent (sample with the provided key, scale by
`scaling_factor`), decode latents back to images. NCHW at the API boundary to
match the reference call sites; NHWC internally.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import _gn  # single GroupNorm-group helper (was duplicated)


class _Down(nn.Module):
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels[0], (3, 3), padding=1)(x)
        for ch in self.channels:
            h = _gn(h.shape[-1])(h)
            h = nn.silu(h)
            h = nn.Conv(ch, (3, 3), strides=2, padding=1)(h)
        return h


class _Up(nn.Module):
    channels: Sequence[int]
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = x
        for ch in self.channels:
            b, hh, ww, cc = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
            h = nn.Conv(ch, (3, 3), padding=1)(h)
            h = _gn(h.shape[-1])(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1)(h)


class AutoencoderKL(nn.Module):
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (32, 64, 128)  # 3 downsamples = /8
    scaling_factor: float = 0.18215

    def setup(self):
        self.encoder = _Down(self.block_out_channels)
        self.quant = nn.Conv(2 * self.latent_channels, (1, 1))
        self.post_quant = nn.Conv(self.block_out_channels[-1], (1, 1))
        self.decoder = _Up(tuple(reversed(self.block_out_channels)), self.in_channels)

    def encode(self, images: jax.Array, key: jax.Array) -> jax.Array:
        """images (B, 3, H, W) -> sampled scaled latents (B, C, H/8, W/8)."""
        x = jnp.transpose(images, (0, 2, 3, 1))
        moments = self.quant(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return jnp.transpose(z, (0, 3, 1, 2)) * self.scaling_factor

    def decode(self, latents: jax.Array) -> jax.Array:
        """latents (B, C, h, w) -> images (B, 3, 8h, 8w) in [-1, 1]."""
        z = jnp.transpose(latents / self.scaling_factor, (0, 2, 3, 1))
        img = self.decoder(self.post_quant(z))
        return jnp.transpose(jnp.tanh(img), (0, 3, 1, 2))

    def __call__(self, images: jax.Array, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        z = self.encode(images, key)
        return self.decode(z), z
