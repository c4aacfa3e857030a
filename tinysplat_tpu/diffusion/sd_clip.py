"""CLIP text encoder in flax, transformers-checkpoint compatible.

The reference pipeline's ``text_encoder`` is a transformers
``CLIPTextModel`` (/root/reference/tinysplat/diffusion/pipeline.py:91).
Module names mirror the transformers parameter tree so checkpoints port via
the generic name-walk in port.py; tests validate NUMERICALLY against the
installed torch transformers implementation.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        hd = self.hidden // self.heads
        b, n, _ = x.shape
        q = nn.Dense(self.hidden, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(self.hidden, name="k_proj")(x)
        v = nn.Dense(self.hidden, name="v_proj")(x)
        q = q.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k) + mask
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden)
        return nn.Dense(self.hidden, name="out_proj")(out)


class CLIPLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    hidden_act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden, self.heads, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate, name="mlp.fc1")(h)
        # SD 1.x text encoders use quick_gelu; SD 2.x (OpenCLIP ViT-H)
        # configs say hidden_act="gelu" — hardcoding either silently
        # mis-ports the other family.
        if self.hidden_act == "quick_gelu":
            h = quick_gelu(h)
        elif self.hidden_act == "gelu":
            h = jax.nn.gelu(h, approximate=False)
        else:
            raise NotImplementedError(
                f"CLIP hidden_act={self.hidden_act!r}")
        return x + nn.Dense(self.hidden, name="mlp.fc2")(h)


class CLIPTextModel(nn.Module):
    """transformers-compatible CLIP text encoder.

    Returns (last_hidden_state, pooled_output) where pooled is the
    final-LN hidden at each sequence's EOS position (argmax of input ids,
    the transformers convention for CLIP's vocab layout).
    """

    config: Dict[str, Any]

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        hidden = cfg["hidden_size"]
        b, n = input_ids.shape
        tok = nn.Embed(cfg["vocab_size"], hidden,
                       name="text_model.embeddings.token_embedding")(input_ids)
        pos = nn.Embed(cfg["max_position_embeddings"], hidden,
                       name="text_model.embeddings.position_embedding")(
            jnp.arange(n)[None, :])
        x = tok + pos
        # Causal mask (CLIP text is autoregressive-masked).
        causal = jnp.where(
            jnp.arange(n)[None, :] <= jnp.arange(n)[:, None], 0.0, -jnp.inf
        )[None, None]
        for i in range(cfg["num_hidden_layers"]):
            x = CLIPLayer(hidden, cfg["num_attention_heads"],
                          cfg["intermediate_size"],
                          hidden_act=cfg.get("hidden_act", "quick_gelu"),
                          name=f"text_model.encoder.layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="text_model.final_layer_norm")(x)
        # transformers pooling: hidden at the first EOS position; configs
        # with eos_token_id == 2 keep the legacy argmax-of-ids behavior
        # (transformers CLIPTextTransformer backward-compat branch).
        eos = cfg.get("eos_token_id", 49407)
        if eos == 2:
            pos = jnp.argmax(input_ids, axis=-1)
        else:
            pos = jnp.argmax((input_ids == eos).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), pos]
        return x, pooled
