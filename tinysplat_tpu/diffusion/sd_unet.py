"""Stable-Diffusion-topology UNet2DConditionModel in flax.

Faithful re-implementation of the diffusers ``UNet2DConditionModel`` the
reference pipeline denoises with (/root/reference/tinysplat/diffusion/
pipeline.py:10,93 — loaded via ``from_pretrained``). Module names mirror the
diffusers parameter tree one-to-one (``down_blocks.0.attentions.1.
transformer_blocks.0.attn2.to_q`` etc., with flax's dot-free naming
``down_blocks_0`` for list entries), so a pretrained checkpoint ports by the
generic name-walk in ``port.py`` — no per-layer tables.

Supported config surface (the SD 1.x / 2.x family):
  sample_size, in_channels, out_channels, block_out_channels,
  down_block_types (CrossAttnDownBlock2D | DownBlock2D),
  up_block_types (CrossAttnUpBlock2D | UpBlock2D), layers_per_block,
  cross_attention_dim, attention_head_dim, norm_num_groups,
  use_linear_projection (SD2), flip_sin_to_cos, freq_shift.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10_000.0,
) -> jax.Array:
    """diffusers ``get_timestep_embedding`` semantics."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    time_embed_dim: int

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.time_embed_dim, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, name="linear_2")(h)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = h + nn.Dense(self.out_channels, name="time_emb_proj")(
            nn.silu(temb)
        )[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(self.dim_head)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        # diffusers: to_out = ModuleList([Linear, Dropout]) -> "to_out.0"
        return nn.Dense(self.query_dim, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(b)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = GEGLU(self.dim * self.mult, name="net_0")(x)
        return nn.Dense(self.dim, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               self.context_dim, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + FeedForward(self.dim, name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class Transformer2DModel(nn.Module):
    channels: int
    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    groups: int = 32
    use_linear_projection: bool = False

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(self.channels, name="proj_in")(x)
        else:
            x = nn.Conv(self.channels, (1, 1), name="proj_in")(x)
            x = x.reshape(b, h * w, self.channels)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                self.channels, self.heads, self.dim_head, self.context_dim,
                name=f"transformer_blocks_{d}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(self.channels, name="proj_out")(x)
            x = x.reshape(b, h, w, self.channels)
        else:
            x = x.reshape(b, h, w, self.channels)
            x = nn.Conv(self.channels, (1, 1), name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    """Stride-2 conv downsample.

    torch-SD padding semantics differ by module: the UNet uses SYMMETRIC
    padding=1 (downsample_padding=1 — output pixel o reads inputs
    2o-1..2o+1), while the VAE uses padding=0 plus an asymmetric
    F.pad(0,1,0,1). Porting a checkpoint onto the wrong one silently
    shifts every downsampled activation by one input pixel."""

    channels: int
    asymmetric_pad: bool = False  # True: VAE semantics; False: UNet

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.channels, (3, 3), strides=2, padding="VALID",
                           name="conv")(x)
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1,
                       name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


def _heads_for(attention_head_dim, block_index, channels):
    """diffusers semantics: attention_head_dim is the NUMBER OF HEADS in
    UNet2DConditionModel (historical naming); may be per-block."""
    if isinstance(attention_head_dim, (tuple, list)):
        n_heads = attention_head_dim[block_index]
    else:
        n_heads = attention_head_dim
    return n_heads, channels // n_heads


class UNet2DConditionModel(nn.Module):
    """diffusers-compatible conditional UNet (see module docstring)."""

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        cfg = self.config
        chans: Sequence[int] = cfg["block_out_channels"]
        layers: int = cfg.get("layers_per_block", 2)
        groups: int = cfg.get("norm_num_groups", 32)
        ctx_dim: int = cfg.get("cross_attention_dim", 768)
        head_dim = cfg.get("attention_head_dim", 8)
        lin_proj = cfg.get("use_linear_projection", False)
        tf_depth = cfg.get("transformer_layers_per_block", 1)
        down_types = cfg["down_block_types"]
        up_types = cfg["up_block_types"]

        if jnp.ndim(timesteps) == 0:
            timesteps = timesteps[None]
        t_emb = timestep_embedding(
            timesteps, chans[0],
            flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
            freq_shift=cfg.get("freq_shift", 0.0),
        )
        temb = TimestepEmbedding(chans[0] * 4, name="time_embedding")(t_emb)

        h = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(sample)
        skips = [h]

        # --- down ---------------------------------------------------------
        for i, btype in enumerate(down_types):
            ch = chans[i]
            n_heads, dh = _heads_for(head_dim, i, ch)
            for j in range(layers):
                h = ResnetBlock2D(ch, groups,
                                  name=f"down_blocks_{i}.resnets_{j}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = Transformer2DModel(
                        ch, n_heads, dh, ctx_dim, tf_depth, groups, lin_proj,
                        name=f"down_blocks_{i}.attentions_{j}",
                    )(h, encoder_hidden_states)
                skips.append(h)
            if i < len(down_types) - 1:
                h = Downsample2D(ch, name=f"down_blocks_{i}.downsamplers_0")(h)
                skips.append(h)

        # --- mid ----------------------------------------------------------
        ch = chans[-1]
        n_heads, dh = _heads_for(head_dim, len(chans) - 1, ch)
        h = ResnetBlock2D(ch, groups, name="mid_block.resnets_0")(h, temb)
        h = Transformer2DModel(
            ch, n_heads, dh, ctx_dim, tf_depth, groups, lin_proj,
            name="mid_block.attentions_0",
        )(h, encoder_hidden_states)
        h = ResnetBlock2D(ch, groups, name="mid_block.resnets_1")(h, temb)

        # --- up -----------------------------------------------------------
        for i, btype in enumerate(up_types):
            ch = chans[len(chans) - 1 - i]
            n_heads, dh = _heads_for(head_dim, len(chans) - 1 - i, ch)
            for j in range(layers + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(ch, groups,
                                  name=f"up_blocks_{i}.resnets_{j}")(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = Transformer2DModel(
                        ch, n_heads, dh, ctx_dim, tf_depth, groups, lin_proj,
                        name=f"up_blocks_{i}.attentions_{j}",
                    )(h, encoder_hidden_states)
            if i < len(up_types) - 1:
                h = Upsample2D(ch, name=f"up_blocks_{i}.upsamplers_0")(h)

        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.get("out_channels", 4), (3, 3), padding=1,
                       name="conv_out")(h)
