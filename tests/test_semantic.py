"""Semantic segmenter cache/assignment logic (injectable backend).

The reference module is dead code with missing imports
(/root/reference/tinysplat/semantic.py; SURVEY.md section 2.1) — these tests
cover the working re-implementation's contract.
"""
import numpy as np

from tinysplat_tpu.data.synthetic import orbit_cameras
from tinysplat_tpu.scene import Scene
from tinysplat_tpu.semantic import SemanticSegmenter


def test_segmenter_caches_and_assigns(tmp_path):
    cams = orbit_cameras(3, width=16, height=16)
    scene = Scene(cams)
    calls = []

    def fake_backend(camera):
        calls.append(camera.name)
        return np.full((camera.height, camera.width), len(calls), np.int32)

    SemanticSegmenter(scene, semantic_path=str(tmp_path), model=fake_backend)
    assert len(calls) == 3
    for cam in cams:
        assert cam.semantic_map.shape == (16, 16)

    # Re-run: everything served from cache, backend never called.
    calls.clear()
    for cam in cams:
        cam.semantic_map = None
    SemanticSegmenter(scene, semantic_path=str(tmp_path), model=fake_backend)
    assert calls == []
    for cam in cams:
        assert cam.semantic_map is not None
