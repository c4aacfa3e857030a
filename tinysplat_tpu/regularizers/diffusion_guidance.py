"""Diffusion-guided novel-view regularization (ReconFusion-flavored).

GOES BEYOND THE REFERENCE: its diffusion stack exists but is dead code
("[upcoming]", /root/reference/README.md:14 — `tinysplat/diffusion/` is
never imported by the trainer). Here the pipeline IS wired into training,
behind ``--regularize-diffusion``.

Mechanism (host-cadenced data augmentation — the TPU-friendly wiring):
every ``interval_diffusion`` steps inside the schedule window, novel
cameras are synthesized between random pairs of training views; the
current model renders each novel view (the SDEdit-style init image), the
diffusion pipeline refines it at ``diffusion_strength`` conditioned on the
two neighbouring real views (PixelNeRF feature volumes + aggregator, the
reference's model_diffusion.py design), and the refined frames become
SYNTHETIC TRAINING CAMERAS appended to the scene. The regular loss then
distills the diffusion prior into the splats at those poses — no change to
the jitted train step, no per-step pipeline cost, and the effective
regularization weight is the synthetic/real view ratio
(``lambda_diffusion``). Single-device Trainer only (synthetic views render
at the pipeline's native square resolution, and MeshTrainer requires one
uniform image shape).
"""
from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera

log = logging.getLogger(__name__)


def _rotmat_to_quat(r: np.ndarray) -> np.ndarray:
    """Shepperd's method; w-first, matches utils.quaternions conventions."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                      (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(r)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
        q = np.empty(4)
        q[0] = (r[k, j] - r[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (r[j, i] + r[i, j]) / s
        q[1 + k] = (r[k, i] + r[i, k]) / s
    return q / np.linalg.norm(q)


def _cam_quat(cam: Camera) -> np.ndarray:
    return _rotmat_to_quat(np.asarray(cam.view_matrix)[:3, :3])


def _slerp(qa: np.ndarray, qb: np.ndarray, t: float) -> np.ndarray:
    qa = qa / np.linalg.norm(qa)
    qb = qb / np.linalg.norm(qb)
    d = float(np.dot(qa, qb))
    if d < 0.0:
        qb, d = -qb, -d
    if d > 0.9995:
        q = qa + t * (qb - qa)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1.0, 1.0))
    return (np.sin((1 - t) * th) * qa + np.sin(t * th) * qb) / np.sin(th)


def interpolate_camera(cam_a: Camera, cam_b: Camera, t: float, size: int,
                       name: str) -> Camera:
    """Novel pose between two training views, at the pipeline's square
    resolution (intrinsics rescaled accordingly)."""
    pos = (1 - t) * cam_a.position + t * cam_b.position
    quat = _slerp(_cam_quat(cam_a), _cam_quat(cam_b), t)
    sx = size / cam_a.width
    sy = size / cam_a.height
    return Camera(
        position=pos,
        f_x=cam_a.f_x * sx,
        f_y=cam_a.f_y * sy,
        fov_x=cam_a.fov_x,
        fov_y=cam_a.fov_y,
        quat=quat,
        width=size,
        height=size,
        name=name,
    )


class DiffusionGuidance:
    """Owns the pipeline + the synthetic camera set; refreshed on cadence."""

    def __init__(self, cfg, rng_seed: int = 0):
        self.cfg = cfg
        self.size: Optional[int] = None
        self.pipeline = None
        self.cameras: List[Camera] = []
        self._rng = np.random.default_rng(rng_seed)

    def _ensure_pipeline(self):
        if self.pipeline is not None:
            return
        from ..diffusion.pipeline import TinysplatDiffusionPipeline

        if self.cfg.diffusion_model_dir:
            self.pipeline = TinysplatDiffusionPipeline.from_pretrained(
                self.cfg.diffusion_model_dir
            )
            self.size = self.pipeline.unet.sample_size * 8
        else:
            # No checkpoint shipped in the sandbox: a tiny random-init
            # pipeline exercises the full wiring (structure-preserving at
            # moderate strength because denoising starts from the model's
            # own render).
            self.pipeline = TinysplatDiffusionPipeline.tiny(
                jax.random.PRNGKey(7)
            )
            self.size = self.pipeline.unet.sample_size * 8
            log.warning(
                "regularize_diffusion: no --diffusion-model-dir given; "
                "using a tiny random-init pipeline (wiring check, not a "
                "real prior)"
            )

    def refresh(self, trainer, real_cams: List[Camera]) -> List[Camera]:
        """(Re)generate the synthetic view set from the current model."""
        self._ensure_pipeline()
        cfg = self.cfg
        n_synth = max(1, int(round(cfg.lambda_diffusion * len(real_cams))))
        s = self.size
        new_cams: List[Camera] = []
        for i in range(n_synth):
            ia = int(self._rng.integers(len(real_cams)))
            ib = (ia + 1) % len(real_cams)
            t = float(self._rng.uniform(0.3, 0.7))
            novel = interpolate_camera(
                real_cams[ia], real_cams[ib], t, s, name=f"diffusion_{i}"
            )
            # SDEdit init: the model's own render of the novel pose.
            rgb, _ = trainer.render_camera(novel, dims=(s, s))
            init = jnp.transpose(rgb, (2, 0, 1))[None] * 2.0 - 1.0
            # Conditioning views feed the PixelNeRF feature encoder at ITS
            # resolution (feature_encoder.sample_size), not pixel space.
            fe = self.pipeline.feature_encoder
            s_fe = fe.sample_size if fe is not None else s
            inp = []
            for c in (real_cams[ia], real_cams[ib]):
                img = jnp.asarray(c.get_original_image((c.width, c.height)))
                img = jax.image.resize(img, (s_fe, s_fe, 3), "linear")
                inp.append(jnp.transpose(img, (2, 0, 1)))
            input_imgs = jnp.stack(inp)[None]  # (1, 2, 3, S, S)
            cam_in = jax.tree.map(
                lambda *xs: jnp.stack(xs)[None],
                real_cams[ia].params(), real_cams[ib].params(),
            )
            cam_tg = jax.tree.map(lambda x: x[None], novel.params())
            # One compiled executable for the whole pipeline: shapes are
            # identical across views and refreshes, so the eager per-op
            # dispatch (VAE + UNet graph re-traced per call — minutes over
            # a tunneled TPU) collapses into a single cached jit.
            if getattr(self, "_jit_pipe", None) is None:
                pipe, steps, strength = (self.pipeline,
                                         cfg.diffusion_inference_steps,
                                         cfg.diffusion_strength)

                @jax.jit
                def _jit_pipe(init, cam_tg, cam_in, input_imgs, key):
                    return pipe(init, cam_tg, cam_in, input_imgs,
                                num_inference_steps=steps,
                                strength=strength, key=key)

                self._jit_pipe = _jit_pipe
            out = self._jit_pipe(
                init, cam_tg, cam_in, input_imgs,
                jax.random.PRNGKey(int(self._rng.integers(1 << 31))),
            )
            frame = np.clip(
                (np.asarray(jax.device_get(out[0])).transpose(1, 2, 0) + 1.0)
                / 2.0, 0.0, 1.0,
            ).astype(np.float32)
            novel._image = frame
            new_cams.append(novel)
        self.cameras = new_cams
        return new_cams
