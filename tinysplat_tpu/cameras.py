"""Pinhole camera model (host-side object + traced pytree view).

Re-designed for JAX from the reference camera layer
(/root/reference/tinysplat/scene.py:49-195):

- ``Camera`` is a lightweight host object holding pose, intrinsics, and the
  (lazily materialized) ground-truth image — it is never traced by jit.
- ``CameraParams`` is the traced pytree (view/proj matrices + intrinsics) that
  jitted render/train steps consume; image height/width travel as static ints.

Matrix conventions match the reference exactly:
- view matrix from quaternion + position: scene.py:96-110
  (R = R(qvec) world->cam, t = -R @ p)
- OpenGL-ish projection matrix with +z forward and w = z: scene.py:112-121
- project/backproject round-trip: scene.py:138-192. We fix the reference's
  width/height transposition in the screen-coordinate conversion
  (scene.py:157-158 scales x by height): here x scales by width and y by
  height, consistent with the rasterizer's ndc->pixel mapping, and
  backproject inverts it so the round-trip property is preserved.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.quaternions import quat_to_rotmat_np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Traced camera parameters consumed by jitted code."""

    viewmat: jax.Array  # (4, 4) world -> camera
    projmat: jax.Array  # (4, 4) camera -> clip
    cam_pos: jax.Array  # (3,) camera center in world coordinates
    fx: jax.Array  # () focal length x in pixels
    fy: jax.Array  # () focal length y in pixels
    # Principal-point offset from the image center, in pixels at this
    # params' resolution (0 = centered). Real captures (nerfstudio cx/cy)
    # are rarely exactly centered; the offset shifts the projected splat
    # centers (ndc2pix cx/cy) — beyond the reference, which assumes the
    # center and only rescales focals (dataset.py:53-55).
    cx_off: jax.Array = 0.0
    cy_off: jax.Array = 0.0

    @property
    def full_projmat(self) -> jax.Array:
        return self.projmat @ self.viewmat


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues' rotation: (3,) axis-angle -> (3, 3) rotation matrix.

    Differentiable at omega == 0 (Taylor guards on sin/cos factors).
    """
    theta = jnp.sqrt(jnp.sum(omega * omega) + 1e-24)  # eps: smooth at 0
    k = omega / theta  # unit axis (0 at omega == 0)
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    return jnp.eye(3) + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)


def apply_pose_delta(cam: CameraParams, delta: jax.Array) -> CameraParams:
    """Left-multiply the view matrix by an SE(3) delta (pose refinement).

    delta = (omega[3], tau[3]): R' = exp(omega) R, t' = exp(omega) t + tau.
    Differentiable wrt delta — the gradient path for --pose-opt (camera
    pose optimization, beyond the reference: its cameras are fixed
    buffers, scene.py:49-110). delta == 0 is the exact identity.
    """
    Rd = so3_exp(delta[:3])
    R = cam.viewmat[:3, :3]
    t = cam.viewmat[:3, 3]
    R2 = Rd @ R
    t2 = Rd @ t + delta[3:]
    view = jnp.eye(4, dtype=cam.viewmat.dtype)
    view = view.at[:3, :3].set(R2).at[:3, 3].set(t2)
    return dataclasses.replace(
        cam, viewmat=view, cam_pos=-(R2.T @ t2)
    )


def make_view_matrix(position: np.ndarray, quat: np.ndarray) -> np.ndarray:
    """World->camera matrix from camera center + world->cam quaternion.

    Semantics of /root/reference/tinysplat/scene.py:96-110.
    """
    rot = quat_to_rotmat_np(np.asarray(quat, dtype=np.float64))
    view = np.zeros((4, 4), dtype=np.float64)
    view[:3, :3] = rot
    view[:3, 3] = -rot @ np.asarray(position, dtype=np.float64)
    view[3, 3] = 1.0
    return view.astype(np.float32)


def make_proj_matrix(fov_x: float, fov_y: float, znear: float = 0.001, zfar: float = 1000.0) -> np.ndarray:
    """Projection matrix; semantics of /root/reference/tinysplat/scene.py:112-121."""
    proj = np.zeros((4, 4), dtype=np.float64)
    proj[0, 0] = 1.0 / np.tan(fov_x / 2)
    proj[1, 1] = 1.0 / np.tan(fov_y / 2)
    proj[2, 2] = (zfar + znear) / (zfar - znear)
    proj[2, 3] = -1.0 * zfar * znear / (zfar - znear)
    proj[3, 2] = 1.0
    return proj.astype(np.float32)


class Camera:
    """Host-side camera: pose, intrinsics, ground-truth image, aux maps.

    Mirrors /root/reference/tinysplat/scene.py:49-195 with numpy state; use
    :meth:`params` to get the traced pytree for jitted code.
    """

    _ids = 0

    def __init__(
        self,
        position,
        f_x: float,
        f_y: float,
        fov_x: float,
        fov_y: float,
        quat=None,
        view_matrix: Optional[np.ndarray] = None,
        proj_matrix: Optional[np.ndarray] = None,
        near: float = 0.001,
        far: float = 1000.0,
        visible_point_ids: Optional[np.ndarray] = None,
        image=None,
        width: Optional[int] = None,
        height: Optional[int] = None,
        name: Optional[str] = None,
        cx: Optional[float] = None,
        cy: Optional[float] = None,
    ):
        Camera._ids += 1
        self.id = Camera._ids
        self.position = np.asarray(position, dtype=np.float32)
        self.f_x = float(f_x)
        self.f_y = float(f_y)
        self.fov_x = float(fov_x)
        self.fov_y = float(fov_y)
        self.z_near = float(near)
        self.z_far = float(far)
        self.visible_point_ids = visible_point_ids
        self.name = name
        self.estimated_depth: Optional[np.ndarray] = None

        # Image may be a numpy HxWx3 array (uint8 or float in [0,1]), a PIL
        # image, or None (pose-only camera, e.g. a viewer client camera).
        self._pil_image = None
        self._image = None
        if image is None:
            assert width is not None and height is not None
            self.width, self.height = int(width), int(height)
        elif isinstance(image, np.ndarray):
            self._image = self._to_float01(image)
            self.height, self.width = self._image.shape[:2]
        else:  # PIL image — decode lazily
            self._pil_image = image
            self.width, self.height = image.width, image.height
        if width is not None:
            self.width = int(width)
        if height is not None:
            self.height = int(height)

        # Principal-point offset (pixels at THIS width/height, which are
        # final by here): absolute cx/cy minus the image center.
        self.cx_off = float(cx) - self.width / 2.0 if cx is not None else 0.0
        self.cy_off = float(cy) - self.height / 2.0 if cy is not None else 0.0

        if view_matrix is not None:
            self.view_matrix = np.asarray(view_matrix, dtype=np.float32)
        else:
            assert quat is not None
            self.update_view_matrix(self.position, quat)
        if proj_matrix is not None:
            self.proj_matrix = np.asarray(proj_matrix, dtype=np.float32)
        else:
            self.update_proj_matrix(self.fov_x, self.fov_y, self.z_near, self.z_far)

    # -- construction helpers ------------------------------------------------

    @staticmethod
    def _to_float01(arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(arr)
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) / 255.0
        return arr.astype(np.float32)

    def update_view_matrix(self, position, quat) -> None:
        self.position = np.asarray(position, dtype=np.float32)
        self.view_matrix = make_view_matrix(self.position, quat)

    def update_proj_matrix(self, fov_x: float, fov_y: float, znear: float = 0.001, zfar: float = 1000.0) -> None:
        self.fov_x, self.fov_y = float(fov_x), float(fov_y)
        self.proj_matrix = make_proj_matrix(fov_x, fov_y, znear, zfar)

    def rescale(self, factor: float) -> None:
        """Semantics of /root/reference/tinysplat/scene.py:123-128."""
        self.width = int(self.width * factor)
        self.height = int(self.height * factor)
        self.fov_x *= factor
        self.fov_y *= factor
        self.cx_off *= factor  # pixel-space offset scales with resolution
        self.cy_off *= factor
        self.update_proj_matrix(self.fov_x, self.fov_y)

    # -- traced view ---------------------------------------------------------

    def params(self) -> CameraParams:
        return CameraParams(
            viewmat=jnp.asarray(self.view_matrix),
            projmat=jnp.asarray(self.proj_matrix),
            cam_pos=jnp.asarray(self.position),
            fx=jnp.float32(self.f_x),
            fy=jnp.float32(self.f_y),
            cx_off=jnp.float32(self.cx_off),
            cy_off=jnp.float32(self.cy_off),
        )

    @property
    def dims(self) -> Tuple[int, int]:
        return (self.width, self.height)

    # -- image access ----------------------------------------------------------

    def get_original_image(self, dims: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """Ground-truth image as float32 HxWx3 in [0, 1].

        Semantics of /root/reference/tinysplat/scene.py:130-136 (lazy decode
        + /255); optional resize to (width, height) ``dims``.
        """
        if self._image is None:
            if self._pil_image is None:
                raise ValueError("Camera has no image")
            self._image = self._to_float01(np.array(self._pil_image.convert("RGB")))
        img = self._image
        if dims is not None and (dims[0] != img.shape[1] or dims[1] != img.shape[0]):
            try:
                import cv2

                img = cv2.resize(img, (dims[0], dims[1]), interpolation=cv2.INTER_AREA)
            except ImportError:  # pragma: no cover
                from PIL import Image

                img = (
                    np.array(
                        Image.fromarray((img * 255).astype(np.uint8)).resize(dims)
                    ).astype(np.float32)
                    / 255.0
                )
        return img

    def get_estimated_depth(self) -> Optional[np.ndarray]:
        return self.estimated_depth

    # -- geometry helpers ------------------------------------------------------

    def project_points(self, points, screen_coordinates: bool = True, return_depth: bool = False):
        """Project world points to screen/NDC coordinates.

        Semantics of /root/reference/tinysplat/scene.py:138-163 with the
        width/height screen-scale transposition corrected (see module doc).
        """
        points = jnp.asarray(points)
        view = jnp.asarray(self.view_matrix)
        proj = jnp.asarray(self.proj_matrix)
        cam = points @ view[:3, :3].T + view[:3, 3]
        hom = jnp.concatenate([cam, jnp.ones_like(cam[:, :1])], axis=1)
        clip = hom @ proj.T
        if return_depth:
            xy = clip[:, :2] / clip[:, 3:4]
            out = jnp.concatenate([xy, clip[:, 2:3]], axis=1)
        else:
            out = (clip / clip[:, 3:4])[:, :3]
        if screen_coordinates:
            c_x = self.width // 2 + self.cx_off
            c_y = self.height // 2 + self.cy_off
            x = 0.5 * self.width * out[:, 0] - 0.5 + c_x
            y = 0.5 * self.height * out[:, 1] - 0.5 + c_y
            out = jnp.stack([x, y, out[:, 2]], axis=1)
        return out

    def backproject_points(self, points, scale_depth: bool = True, screen_coordinates: bool = True):
        """Backproject (x, y, depth) screen points to world coordinates.

        Semantics of /root/reference/tinysplat/scene.py:165-192 (camera-z
        depth -> NDC z via the projection matrix, then full inverse).
        """
        points = jnp.asarray(points)
        view = jnp.asarray(self.view_matrix)
        proj = jnp.asarray(self.proj_matrix)
        full_inv = jnp.linalg.inv(proj @ view)
        x, y, z = points[:, 0], points[:, 1], points[:, 2]
        if scale_depth:
            f1 = self.proj_matrix[2, 2]
            f2 = self.proj_matrix[2, 3]
            z = (f1 * points[:, 2] + f2) / points[:, 2]
        if screen_coordinates:
            c_x = self.width // 2 + self.cx_off
            c_y = self.height // 2 + self.cy_off
            x = (points[:, 0] + 0.5 - c_x) / self.width * 2
            y = (points[:, 1] + 0.5 - c_y) / self.height * 2
        hom = jnp.stack([x, y, z, jnp.ones_like(x)], axis=1)
        world = hom @ full_inv.T
        return world[:, :3] / world[:, 3:4]
