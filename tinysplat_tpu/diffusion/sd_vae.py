"""Stable-Diffusion-topology AutoencoderKL in flax (diffusers-compatible).

Counterpart of the diffusers ``AutoencoderKL`` the reference pipeline
decodes latents with (/root/reference/tinysplat/diffusion/pipeline.py:10,92).
Module names mirror the diffusers parameter tree (see sd_unet.py) so
pretrained checkpoints port via the generic name-walk in port.py.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .sd_unet import Downsample2D, Upsample2D


class VaeResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        att = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) / jnp.sqrt(c), axis=-1)
        y = att @ v
        y = nn.Dense(c, name="to_out_0")(y)
        return residual + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        chans: Sequence[int] = cfg["block_out_channels"]
        layers = cfg.get("layers_per_block", 2)
        groups = cfg.get("norm_num_groups", 32)
        h = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(x)
        for i in range(len(chans)):
            for j in range(layers):
                h = VaeResnetBlock(chans[i], groups,
                                   name=f"down_blocks_{i}.resnets_{j}")(h)
            if i < len(chans) - 1:
                h = Downsample2D(chans[i], asymmetric_pad=True,  # VAE pad(0,1)
                                 name=f"down_blocks_{i}.downsamplers_0")(h)
        h = VaeResnetBlock(chans[-1], groups, name="mid_block.resnets_0")(h)
        h = VaeAttention(chans[-1], groups, name="mid_block.attentions_0")(h)
        h = VaeResnetBlock(chans[-1], groups, name="mid_block.resnets_1")(h)
        h = nn.GroupNorm(num_groups=groups, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.get("latent_channels", 4), (3, 3), padding=1,
                       name="conv_out")(h)


class Decoder(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans: Sequence[int] = cfg["block_out_channels"]
        layers = cfg.get("layers_per_block", 2) + 1
        groups = cfg.get("norm_num_groups", 32)
        rev = list(reversed(chans))
        h = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in")(z)
        h = VaeResnetBlock(rev[0], groups, name="mid_block.resnets_0")(h)
        h = VaeAttention(rev[0], groups, name="mid_block.attentions_0")(h)
        h = VaeResnetBlock(rev[0], groups, name="mid_block.resnets_1")(h)
        for i in range(len(rev)):
            for j in range(layers):
                h = VaeResnetBlock(rev[i], groups,
                                   name=f"up_blocks_{i}.resnets_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample2D(rev[i], name=f"up_blocks_{i}.upsamplers_0")(h)
        h = nn.GroupNorm(num_groups=groups, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.get("out_channels", 3), (3, 3), padding=1,
                       name="conv_out")(h)


class SDAutoencoderKL(nn.Module):
    """diffusers-compatible AutoencoderKL (encode/decode/forward)."""

    config: Dict[str, Any]

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        lc = self.config.get("latent_channels", 4)
        self.quant_conv = nn.Conv(2 * lc, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(lc, (1, 1), name="post_quant_conv")

    def encode(self, images, key=None):
        """Returns (mean, logvar) — sample with `mean + exp(0.5 lv) * eps`."""
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if key is not None:
            return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape)
        return mean, logvar

    def decode(self, latents):
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, images, key):
        z = self.encode(images, key)
        return self.decode(z), z
