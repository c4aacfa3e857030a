"""Minimal flax UNets (unconditional + cross-attention conditional).

First-party replacements for the diffusers models the reference instantiates
(`UNet2DModel.from_config` at /root/reference/tinysplat/diffusion/
model_diffusion.py:44; the conditional denoiser inside pipeline.py). Config
field names follow the diffusers conventions (sample_size, in_channels,
out_channels, block_out_channels, layers_per_block) so reference configs map
one to one. Architecture: timestep sinusoidal embedding -> MLP; resnet blocks
with GroupNorm + SiLU; self-attention at the bottleneck; optional
cross-attention on an encoder_hidden_states sequence (CLIP tokens) in every
block of the conditional variant.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gn(channels: int) -> nn.GroupNorm:
    """GroupNorm with the largest power-of-two group count (<=32) that
    divides `channels` (flax requires num_groups | channels)."""
    g = 32
    while g > 1 and channels % g:
        g //= 2
    return nn.GroupNorm(num_groups=g)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10_000.0) -> jax.Array:
    """Sinusoidal timestep embedding (DDPM convention). t: (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, temb):
        h = _gn(x.shape[-1])(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        h = h + nn.Dense(self.out_channels)(nn.silu(temb))[:, None, None, :]
        h = _gn(self.out_channels)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return x + h


class Attention(nn.Module):
    """Self- or cross-attention over spatial positions (NHWC)."""

    num_heads: int = 4

    @nn.compact
    def __call__(self, x, context: Optional[jax.Array] = None):
        b, h, w, c = x.shape
        ctx = x.reshape(b, h * w, c) if context is None else context
        q = nn.Dense(c)(x.reshape(b, h * w, c))
        k = nn.Dense(c)(ctx)
        v = nn.Dense(c)(ctx)
        hd = c // self.num_heads
        split = lambda a: a.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c)(out)
        return x + out.reshape(b, h, w, c)


class _UNetCore(nn.Module):
    out_channels: int
    block_out_channels: Sequence[int]
    layers_per_block: int
    cross_attention: bool
    attn_head_dim: int = 32

    @nn.compact
    def __call__(self, x, t, context: Optional[jax.Array] = None):
        ch0 = self.block_out_channels[0]
        temb = timestep_embedding(jnp.atleast_1d(t), ch0)
        temb = nn.Dense(ch0 * 4)(temb)
        temb = nn.Dense(ch0 * 4)(nn.silu(temb))
        if temb.shape[0] == 1 and x.shape[0] > 1:
            temb = jnp.broadcast_to(temb, (x.shape[0], temb.shape[1]))

        h = nn.Conv(ch0, (3, 3), padding=1)(x)
        skips = [h]
        # Down path.
        for i, ch in enumerate(self.block_out_channels):
            for _ in range(self.layers_per_block):
                h = ResnetBlock(ch)(h, temb)
                if self.cross_attention and context is not None:
                    h = Attention(max(ch // self.attn_head_dim, 1))(h, context)
                skips.append(h)
            if i < len(self.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1)(h)
                skips.append(h)
        # Bottleneck.
        mid = self.block_out_channels[-1]
        h = ResnetBlock(mid)(h, temb)
        h = Attention(max(mid // self.attn_head_dim, 1))(h)
        if self.cross_attention and context is not None:
            h = Attention(max(mid // self.attn_head_dim, 1))(h, context)
        h = ResnetBlock(mid)(h, temb)
        # Up path.
        for i, ch in enumerate(reversed(self.block_out_channels)):
            for _ in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch)(h, temb)
                if self.cross_attention and context is not None:
                    h = Attention(max(ch // self.attn_head_dim, 1))(h, context)
            if i < len(self.block_out_channels) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1)(h)
        h = _gn(h.shape[-1])(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1)(h)


class UNet2D(nn.Module):
    """Unconditional UNet; diffusers `UNet2DModel` counterpart.

    Inputs/outputs are NCHW to match the reference call sites
    (model_diffusion.py:70-71); internally NHWC (TPU-native conv layout).
    """

    sample_size: int = 64
    in_channels: int = 3
    out_channels: int = 64
    block_out_channels: Sequence[int] = (32, 64)
    layers_per_block: int = 1

    @nn.compact
    def __call__(self, sample, timestep):
        x = jnp.transpose(sample, (0, 2, 3, 1))
        out = _UNetCore(
            self.out_channels, self.block_out_channels, self.layers_per_block,
            cross_attention=False,
        )(x, timestep)
        return jnp.transpose(out, (0, 3, 1, 2))


class UNet2DCondition(nn.Module):
    """Cross-attention-conditioned UNet; diffusers `UNet2DConditionModel`
    counterpart (the denoiser in reference pipeline.py:496-520)."""

    sample_size: int = 32
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (64, 128)
    layers_per_block: int = 1
    cross_attention_dim: int = 768

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states):
        x = jnp.transpose(sample, (0, 2, 3, 1))
        # Context k/v projections live inside each Attention block, so the
        # raw (B, S, cross_attention_dim) sequence passes straight through.
        out = _UNetCore(
            self.out_channels, self.block_out_channels, self.layers_per_block,
            cross_attention=True,
        )(x, timestep, encoder_hidden_states)
        return jnp.transpose(out, (0, 3, 1, 2))
