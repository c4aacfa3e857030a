"""Mesh extraction tests: marching-tetrahedra iso-surfacer + density grid.

Oracles: an analytic sphere SDF (surface area, vertex-on-isosurface,
watertightness via boundary-edge count) — capability parity with the
reference's mcubes path (model_gaussian.py:482-515).
"""
import numpy as np
import pytest

from tinysplat_tpu.mesh import extract_mesh, marching_tetrahedra, vertex_normals
from tinysplat_tpu.models.gaussians import init_from_pcd


def _sphere_field(res=48, radius=0.6):
    axes = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(axes, axes, axes, indexing="ij"), -1)
    return radius - np.linalg.norm(g, axis=-1), np.array([-1.0, -1.0, -1.0]), 2.0 / (res - 1)


def test_sphere_isosurface_geometry():
    field, origin, spacing = _sphere_field()
    verts, faces = marching_tetrahedra(field, 0.0, origin, spacing)
    assert len(verts) > 500 and len(faces) > 1000
    # All vertices on the sphere (within a cell diagonal).
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.6, atol=2 * spacing)
    # Surface area ~ 4 pi r^2.
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
    assert abs(area - 4 * np.pi * 0.6**2) / (4 * np.pi * 0.6**2) < 0.05
    # Watertight: every edge shared by exactly two triangles.
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # Normals point outward on average.
    n = vertex_normals(verts, faces)
    outward = np.sign(np.sum(n * verts, axis=-1))
    assert abs(outward.mean()) > 0.95


@pytest.mark.slow
def test_extract_mesh_from_splats():
    # A blob of splats at the origin -> some closed surface around it.
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(200, 3)).astype(np.float32) * 0.1
    colors = rng.uniform(0, 255, size=(200, 3)).astype(np.float32)
    state = init_from_pcd(xyz, colors, sh_degree=1, capacity=256, opacity_init=0.95)
    verts, faces, normals = extract_mesh(state, "marching_cubes", resolution=32,
                                         surface_level=0.3)
    assert len(verts) > 50
    assert len(faces) > 50
    assert normals.shape == verts.shape
    # Surface sits near the blob, not at the grid border.
    assert np.linalg.norm(verts, axis=-1).max() < 1.0


@pytest.mark.slow
def test_extract_mesh_poisson_from_scene():
    """End-to-end poisson path: render depth -> level-surface points ->
    first-party screened-Poisson reconstruction (replaces the reference's
    Open3D call at model_gaussian.py:458-480)."""
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.scene import Scene
    from tinysplat_tpu.render import render
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    # Spherical shell of opaque splats -> a closed surface.
    u = rng.normal(size=(600, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    xyz = (u * 0.5).astype(np.float32)
    colors = rng.uniform(100, 255, size=(600, 3)).astype(np.float32)
    state = init_from_pcd(xyz, colors, sh_degree=1, capacity=1024,
                          opacity_init=0.95)

    cams = orbit_cameras(6, width=96, height=96, radius=2.5)

    def render_fn(cam, dims=None):
        rgb, extras = render(state.params, state.alive, cam.params(), 96, 96,
                             active_sh_degree=jnp.int32(1),
                             background=jnp.zeros(3), rasterizer="tiled")
        return rgb, extras

    scene = Scene(cams, render_fn=render_fn)
    verts, faces, normals = extract_mesh(
        state, "poisson", scene=scene, poisson_depth=6,
    )
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    # Surface near the shell radius (level-surface points ride the density).
    assert 0.2 < np.median(r) < 0.9, np.median(r)
    assert normals.shape == verts.shape


def test_marching_tets_vectorized_matches_reference():
    """The vectorized extractor must produce the same surface as the
    per-cell Python oracle: identical vertex SETS (merge order may differ)
    and identical triangle sets up to the shared re-indexing."""
    from tinysplat_tpu.mesh import _marching_tetrahedra_reference, marching_tetrahedra

    rng = np.random.default_rng(3)
    n = 14
    ax = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = np.exp(-4 * (X**2 + 1.3 * Y**2 + 0.7 * Z**2))
    field += 0.05 * rng.standard_normal(field.shape)  # exercise odd cases
    origin = np.array([-1.0, -1.0, -1.0])
    spacing = 2.0 / (n - 1)

    v_ref, f_ref = _marching_tetrahedra_reference(field, 0.5, origin, spacing)
    v_new, f_new = marching_tetrahedra(field, 0.5, origin, spacing)

    assert len(v_ref) == len(v_new)
    assert len(f_ref) == len(f_new)
    # Vertex sets match under lexicographic sort.
    pr = np.lexsort(v_ref.T)
    pn = np.lexsort(v_new.T)
    np.testing.assert_allclose(v_ref[pr], v_new[pn], atol=1e-9)
    # Triangle sets match as sets of (sorted) vertex-position triples.
    inv_r = np.empty(len(v_ref), np.int64); inv_r[pr] = np.arange(len(pr))
    inv_n = np.empty(len(v_new), np.int64); inv_n[pn] = np.arange(len(pn))
    tr = np.sort(inv_r[f_ref], axis=1)
    tn = np.sort(inv_n[f_new], axis=1)
    tr = tr[np.lexsort(tr.T)]
    tn = tn[np.lexsort(tn.T)]
    np.testing.assert_array_equal(tr, tn)
    # Winding agreed too: orientation counts match.
    def signed_volume(v, f):
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        return np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0
    np.testing.assert_allclose(signed_volume(v_ref, f_ref),
                               signed_volume(v_new, f_new), rtol=1e-6)
