"""CLIP conditioning helpers for the diffusion pipeline (host-side).

Counterparts of the reference's encode_images / encode_cross_attention_inputs
(/root/reference/tinysplat/diffusion/model_diffusion.py:374-435): empty-text
CLIP embedding + per-view CLIP image embeddings -> EmbeddingMLP -> 2
cross-attention tokens (negative = text embedding when doing CFG). The CLIP
models load from the HF hub via transformers (torch, CPU) — gated, since
offline sandboxes cannot download weights; the pipeline accepts precomputed
embeddings instead.
"""
from __future__ import annotations

from typing import List

import numpy as np


class ClipEncoders:
    """Lazy holder for the tokenizer/text/image CLIP models."""

    def __init__(self, model_id: str = "openai/clip-vit-large-patch14"):
        from transformers import (
            CLIPTextModel,
            CLIPTokenizer,
            CLIPVisionModelWithProjection,
        )

        self.tokenizer = CLIPTokenizer.from_pretrained(model_id)
        self.text_encoder = CLIPTextModel.from_pretrained(model_id)
        self.image_encoder = CLIPVisionModelWithProjection.from_pretrained(model_id)

    def encode_text(self, prompts: List[str]) -> np.ndarray:
        """(B, seq, 768) text embeddings (reference :399-421 uses "")."""
        import torch

        inputs = self.tokenizer(prompts, return_tensors="pt", padding=True)
        with torch.no_grad():
            out = self.text_encoder(inputs.input_ids)[0]
        return out.numpy()

    def encode_images(self, images: np.ndarray) -> np.ndarray:
        """images (B, 3, H, W) in [-1, 1] -> (B, 768) projected embeddings
        (reference encode_images, :374-397)."""
        import torch

        from .model_diffusion import clip_preprocess

        if images.min() < -1.0 or images.max() > 1.0:
            raise ValueError("Image should be in [-1, 1] range")
        import jax.numpy as jnp

        pre = np.asarray(clip_preprocess(jnp.asarray(images)))
        with torch.no_grad():
            out = self.image_encoder(torch.from_numpy(pre).float())
        return out.image_embeds.numpy()


def encode_cross_attention_inputs(
    clip: ClipEncoders,
    embedding_mlp,
    embedding_params,
    input_images: np.ndarray,  # (B, N, 3, H, W) in [0, 1]
    do_classifier_free_guidance: bool = False,
) -> np.ndarray:
    """Combined empty-text + image-embedding tokens (reference :399-435)."""
    import jax.numpy as jnp

    b, n = input_images.shape[:2]
    text = clip.encode_text([""])  # (1, seq, 768)
    text = np.repeat(text[:, :2], b, axis=0)  # first 2 tokens, per batch
    flat = input_images.reshape(b * n, *input_images.shape[2:]) * 2.0 - 1.0
    img = clip.encode_images(flat).reshape(b, n, -1)
    prompt = np.asarray(
        embedding_mlp.apply(embedding_params, jnp.asarray(text), jnp.asarray(img))
    )
    if do_classifier_free_guidance:
        prompt = np.concatenate([text, prompt])
    return prompt
