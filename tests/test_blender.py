"""Blender / nerfstudio transforms.json loader (data/blender.py).

The pose test is a CONVENTION ROUND-TRIP: known framework cameras are
exported to OpenGL camera-to-world matrices (the transforms.json dialect)
and reloaded — view matrices, positions, and intrinsics must come back
bit-close. That pins the GL->CV axis flip, which a rendering smoke test
alone would not (a globally flipped scene can still produce an image).
"""
import json
import os

import numpy as np
import pytest

from tinysplat_tpu.data.blender import BlenderDataset
from tinysplat_tpu.data.synthetic import orbit_cameras

_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0])


def _write_scene(tmp_path, cams, dialect="blender"):
    from PIL import Image

    frames = []
    for i, cam in enumerate(cams):
        view = np.asarray(cam.view_matrix, np.float64)
        c2w = np.linalg.inv(view) @ _GL_TO_CV  # inverse of the loader's map
        name = f"r_{i}"
        mode, suffix = ("RGBA", ".png") if dialect == "blender" else ("RGB", ".png")
        img = Image.new(mode, (cam.width, cam.height),
                        (40 * i, 80, 120, 255)[: len(mode)])
        img.save(tmp_path / f"{name}{suffix}")
        frame = {"file_path": f"./{name}" if dialect == "blender" else f"./{name}{suffix}",
                 "transform_matrix": c2w.tolist()}
        frames.append(frame)
    meta = {"frames": frames}
    if dialect == "blender":
        meta["camera_angle_x"] = cams[0].fov_x
    else:  # nerfstudio explicit intrinsics
        meta.update({"fl_x": cams[0].f_x, "fl_y": cams[0].f_y,
                     "w": cams[0].width, "h": cams[0].height})
    path = tmp_path / ("transforms_train.json" if dialect == "blender"
                       else "transforms.json")
    path.write_text(json.dumps(meta))
    return path


@pytest.mark.parametrize("dialect", ["blender", "nerfstudio"])
def test_transforms_round_trip(tmp_path, dialect):
    cams = orbit_cameras(3, width=32, height=32)
    _write_scene(tmp_path, cams, dialect)
    ds = BlenderDataset(str(tmp_path))  # directory auto-detect
    assert len(ds.cameras) == 3
    for src, dst in zip(cams, ds.cameras):
        np.testing.assert_allclose(dst.view_matrix, src.view_matrix,
                                   atol=1e-5)
        np.testing.assert_allclose(dst.position, src.position, atol=1e-5)
        assert dst.fov_x == pytest.approx(src.fov_x, rel=1e-6)
        assert dst.f_x == pytest.approx(src.f_x, rel=1e-6)
        assert (dst.width, dst.height) == (32, 32)


def test_rgba_composited_onto_background(tmp_path):
    from PIL import Image

    cams = orbit_cameras(1, width=8, height=8)
    path = _write_scene(tmp_path, cams, "blender")
    # Overwrite the frame with a half-transparent red image.
    Image.new("RGBA", (8, 8), (255, 0, 0, 128)).save(tmp_path / "r_0.png")
    ds = BlenderDataset(str(path), background=(1.0, 1.0, 1.0))
    img = ds.cameras[0].get_original_image((8, 8))
    a = 128 / 255.0
    expect = np.array([a * 1.0 + (1 - a), (1 - a), (1 - a)])
    np.testing.assert_allclose(np.asarray(img)[0, 0], expect, atol=2 / 255)


def test_random_init_pcd_spans_rig(tmp_path):
    cams = orbit_cameras(4, width=8, height=8)
    path = _write_scene(tmp_path, cams, "blender")
    ds = BlenderDataset(str(path), num_init_points=512)
    assert ds.pcd.xyz.shape == (512, 3)
    pos = np.stack([c.position for c in cams])
    extent = np.linalg.norm(pos - pos.mean(0), axis=1).max()
    assert np.abs(ds.pcd.xyz - pos.mean(0)).max() <= 0.5 * extent + 1e-6
