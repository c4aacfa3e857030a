"""PixelNeRF-style feature-volume conditioning (flax/jnp).

TPU-native rebuild of /root/reference/tinysplat/diffusion/model_diffusion.py:

- FeatureVolumeEncoder (:19-217): UNet-encode N input views into per-view
  feature maps; cast rays through the target camera; sample points along each
  ray linearly in disparity (:158-183); reproject the points onto every input
  view and trilinearly sample pixel-aligned features (:185-217); downsample
  to (C, D, D) volumes.
- FeatureAggregator (:220-321): positional-encode the reprojected
  coordinates, run per-(view, pixel) MLP, sigmoid-weighted sum over views,
  second MLP to (C+3, D, D).
- EmbeddingMLP (:323-355): project concatenated CLIP text+image embeddings
  into 2 cross-attention tokens.

API difference (deliberate, TPU-first): the reference passes host Camera
objects and decodes images inside forward; here cameras arrive as batched
``CameraParams`` pytrees and images as arrays, so the whole module jits.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..cameras import CameraParams
from ..utils.rays import unproj_map
from .unet import UNet2D


def _trilinear_border(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear sample of (D0, D1, D2) `volume` at float coords (P, 3) in
    index space, border-clamped (counterpart of the reference's
    grid_sample(..., padding_mode='border', align_corners=True))."""
    d = jnp.asarray(volume.shape, jnp.float32) - 1.0
    c = jnp.clip(coords, 0.0, d)
    lo = jnp.floor(c)
    f = c - lo
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.asarray(volume.shape, jnp.int32) - 1)

    def at(a, b, cc):
        return volume[a[:, 0], b[:, 1], cc[:, 2]]

    idx = [lo, hi]
    out = 0.0
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                w = (
                    (f[:, 0] if i else 1 - f[:, 0])
                    * (f[:, 1] if j else 1 - f[:, 1])
                    * (f[:, 2] if k else 1 - f[:, 2])
                )
                out = out + w * volume[idx[i][:, 0], idx[j][:, 1], idx[k][:, 2]]
    return out


def project_points_ndc(cam: CameraParams, points: jax.Array) -> jax.Array:
    """World points -> (ndc_x, ndc_y, clip_z); semantics of the reference
    Camera.project_points(screen_coordinates=False, return_depth=True)
    (scene.py:138-163), used at model_diffusion.py:84-87."""
    camp = points @ cam.viewmat[:3, :3].T + cam.viewmat[:3, 3]
    hom = jnp.concatenate([camp, jnp.ones_like(camp[:, :1])], axis=1) @ cam.projmat.T
    xy = hom[:, :2] / jnp.where(jnp.abs(hom[:, 3:4]) < 1e-9, 1e-9, hom[:, 3:4])
    return jnp.concatenate([xy, hom[:, 2:3]], axis=1)


class FeatureVolumeEncoder(nn.Module):
    """UNet image encoder + ray-sampled, reprojected feature volumes."""

    sample_size: int = 64  # encoder input resolution (reference uses 512)
    num_channels: int = 32  # C: feature channels == ray sample count
    latent_dim: int = 16  # D
    unet_block_out_channels: Sequence[int] = (32, 64)
    z_near: float = 0.1
    z_far: float = 100.0

    def setup(self):
        self.encoder = UNet2D(
            sample_size=self.sample_size,
            in_channels=3,
            out_channels=self.num_channels,
            block_out_channels=self.unet_block_out_channels,
        )

    def __call__(
        self,
        target_cams: CameraParams,  # batched (B,)
        input_images: jax.Array,  # (B, N, 3, S, S) in [0, 1]
        input_cams: CameraParams,  # batched (B, N)
    ) -> Tuple[jax.Array, jax.Array]:
        B, N = input_images.shape[:2]
        S = self.sample_size
        C = self.num_channels
        D = self.latent_dim

        feats = self.encoder(input_images.reshape(B * N, 3, S, S), jnp.ones((1,)))
        feats = feats.reshape(B, N, C, S, S)

        # Rays through the target cameras (reference _cast_rays, :113-156).
        def rays_one(cam: CameraParams):
            # Focal for the S x S ray grid, resolution-independent: the
            # projection matrix stores 1/tan(fov/2) (reference rescales fx by
            # new_width / orig_width, model_diffusion.py:125-130).
            fx_s = cam.projmat[0, 0] * S / 2
            fy_s = cam.projmat[1, 1] * S / 2
            dirs_cam = unproj_map(S, S, fx_s, fy_s)  # (S, S, 3)
            R_inv = jnp.linalg.inv(cam.viewmat[:3, :3])
            dirs = -(dirs_cam.reshape(-1, 3) @ R_inv.T)
            origins = jnp.broadcast_to(cam.cam_pos, dirs.shape)
            return origins, dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        origins, dirs = jax.vmap(rays_one)(target_cams)  # (B, S*S, 3) each

        # Disparity-space depth samples (reference _sample_rays, :158-183).
        steps = jnp.linspace(0.0, 1.0 - 1.0 / C, C)
        z_samp = 1.0 / (1.0 / self.z_near * (1 - steps) + 1.0 / self.z_far * steps)
        points = (
            origins[:, :, None, :] + z_samp[None, None, :, None] * dirs[:, :, None, :]
        )  # (B, S*S, C, 3)

        # Reproject onto every input camera (ndc xy + clip z).
        flat_pts = points.reshape(B, -1, 3)

        def proj_one(cam: CameraParams, pts):
            return project_points_ndc(cam, pts)

        xyz = jax.vmap(jax.vmap(proj_one, in_axes=(0, None)), in_axes=(0, 0))(
            input_cams, flat_pts
        )  # (B, N, S*S*C, 3)

        # Pixel-aligned trilinear feature lookup (reference _sample_features).
        # Traced (not float()-materialized) bounds: the guidance path runs
        # the whole pipeline under one jit.
        z_min, z_max = z_samp[0], z_samp[-1]

        def sample_one(fvol, coords):
            # fvol (C, S, S); coords (P, 3) = (ndc_x, ndc_y, clip_z)
            zc = 2 * (coords[:, 2] - z_min) / jnp.maximum(z_max - z_min, 1e-9) - 1
            ic = jnp.stack(
                [
                    (zc * 0.5 + 0.5) * (fvol.shape[0] - 1),
                    (coords[:, 1] * 0.5 + 0.5) * (fvol.shape[1] - 1),
                    (coords[:, 0] * 0.5 + 0.5) * (fvol.shape[2] - 1),
                ],
                axis=1,
            )
            return _trilinear_border(fvol, ic)

        sampled = jax.vmap(jax.vmap(sample_one))(feats, xyz)  # (B, N, S*S*C)
        sampled = sampled.reshape(B, N, S, S, C)

        # Downsample to (B, N, C, D, D) + matching coordinates volume.
        feats_p = jax.image.resize(
            jnp.moveaxis(sampled, -1, 2), (B, N, C, D, D), "linear"
        )
        xyz_vol = xyz.reshape(B, N, S, S, C, 3)
        xyz_vol = jnp.transpose(xyz_vol, (0, 1, 5, 4, 2, 3))  # (B, N, 3, C, S, S)
        xyz_vol = jax.image.resize(xyz_vol, (B, N, 3, C, D, D), "linear")
        xyz_vol = jnp.nan_to_num(xyz_vol)
        return feats_p, xyz_vol


class FeatureAggregator(nn.Module):
    """Sigmoid-weighted view aggregation (reference :220-321)."""

    input_dim: int = 32  # C
    hidden_dim: int = 64
    code_len: int = 10

    @nn.compact
    def __call__(self, features: jax.Array, xyz: jax.Array) -> jax.Array:
        B, N, C, D, _ = features.shape
        code = self._positional_encode(xyz)  # (B*N*D*D, C*6L or C*3)
        f = jnp.transpose(features, (0, 1, 3, 4, 2)).reshape(-1, C)
        h = jnp.concatenate([f, code], axis=1)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.Dense(2 * self.input_dim)(h)
        tmp = nn.silu(h[:, : self.input_dim])
        weights = nn.sigmoid(h[:, self.input_dim :])
        tmp = (tmp * weights).reshape(B, N, D, D, C).sum(axis=1)
        out = nn.silu(nn.Dense(self.hidden_dim)(tmp))
        out = nn.Dense(self.input_dim + 3)(out)
        return jnp.transpose(out, (0, 3, 1, 2))  # (B, C+3, D, D)

    def _positional_encode(self, xyz: jax.Array) -> jax.Array:
        B, N, _, C, D, _ = xyz.shape
        comps = jnp.transpose(xyz, (2, 0, 1, 4, 5, 3)).reshape(3, -1, C)
        if self.code_len == 0:
            return jnp.concatenate([comps[0], comps[1], comps[2]], axis=1)
        outs = []
        for axis in range(3):
            t = comps[axis]
            enc = [jnp.sin((2.0**i) * t * math.pi) for i in range(self.code_len)]
            enc += [jnp.cos((2.0**i) * t * math.pi) for i in range(self.code_len)]
            outs.append(jnp.concatenate(enc, axis=1))
        return jnp.concatenate(outs, axis=1)


class EmbeddingMLP(nn.Module):
    """CLIP text+image embeds -> 2 cross-attention tokens (reference :323-355)."""

    conditioned_images: int = 3
    embed_dim: int = 768

    @nn.compact
    def __call__(self, text_embeds: jax.Array, image_embeds: jax.Array) -> jax.Array:
        B = image_embeds.shape[0]
        x = jnp.concatenate([text_embeds, image_embeds], axis=1).reshape(B, -1)
        out = nn.Dense(2 * self.embed_dim)(x)
        return out.reshape(B, 2, self.embed_dim)


def clip_preprocess(images: jax.Array) -> jax.Array:
    """[-1, 1] NCHW images -> CLIP-normalized 224x224 (reference :357-372)."""
    b, c, h, w = images.shape
    x = jax.image.resize(images, (b, c, 224, 224), "cubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])[None, :, None, None]
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])[None, :, None, None]
    return (x - mean) / std
