"""Viewer server protocol tests (no real websocket — fake transport).

Spec: /root/reference/tinysplat/viewer.py (message types, per-client camera
clone, depth-1 queue with stale eviction, JPEG-base64 frames).
"""
import asyncio
import base64
import json

import numpy as np
import pytest

from tinysplat_tpu.data.synthetic import orbit_cameras
from tinysplat_tpu.scene import Scene
from tinysplat_tpu.viewer import Client, Viewer, encode_jpeg_base64


class FakeWS:
    def __init__(self):
        self.sent = []

    async def send(self, data):
        self.sent.append(data)


def test_encode_jpeg_base64_roundtrip():
    img = np.zeros((16, 16, 3), np.float32)
    img[:, :8] = [1.0, 0.0, 0.0]
    s = encode_jpeg_base64(img)
    raw = base64.b64decode(s)
    assert raw[:2] == b"\xff\xd8"  # JPEG SOI marker
    import cv2

    decoded = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
    assert decoded.shape == (16, 16, 3)
    # Left half red (BGR order from cv2).
    assert decoded[0, 0, 2] > 200 and decoded[0, 0, 0] < 50


def _scene_with_render():
    cams = orbit_cameras(2, width=32, height=32)
    scene = Scene(cams)
    calls = []

    def render_fn(camera, dims=None):
        calls.append(camera)
        return np.full((32, 32, 3), 0.5, np.float32), {}

    scene.render_fn = render_fn
    return scene, calls


def test_camera_info_and_render_request_flow():
    scene, calls = _scene_with_render()
    viewer = Viewer(scene)
    ws = FakeWS()
    client = Client(ws)

    async def run():
        await viewer.handle_message(client, json.dumps({
            "type": "cameraInfo", "position": [0, 0, 0], "quat": [0, 0, 0, 1],
            "aspectRatio": 1.0,
        }))
        assert client.camera is not None
        assert client.camera is not scene.cameras[0]  # cloned, not shared
        # Serve exactly the queued request.
        task = asyncio.create_task(viewer.process_queue())
        await asyncio.sleep(0.1)
        task.cancel()

    asyncio.run(run())
    assert len(ws.sent) == 1
    msg = json.loads(ws.sent[0])
    assert "image" in msg
    assert len(calls) == 1


def test_viewer_e2e_over_real_websocket():
    """Full loop with the real websockets library: connect, send cameraInfo,
    receive a JPEG frame — the browser client's exact handshake."""
    import websockets

    scene, calls = _scene_with_render()
    viewer = Viewer(scene, ip="127.0.0.1", port=18765)

    async def run():
        server_task = asyncio.create_task(viewer.run())
        await asyncio.sleep(0.3)
        async with websockets.connect("ws://127.0.0.1:18765") as ws:
            await ws.send(json.dumps({
                "type": "cameraInfo", "position": [0, 0, 0],
                "quat": [0, 0, 0, 1], "fovX": 60, "fovY": 60,
                "near": 0.1, "far": 1000, "aspectRatio": 1.0,
            }))
            msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=10))
            assert "image" in msg
            raw = base64.b64decode(msg["image"])
            assert raw[:2] == b"\xff\xd8"
            # Movement request -> another frame.
            await ws.send(json.dumps({
                "type": "renderRequest", "position": [0, 0, 1],
                "quat": [0, 0, 0, 1], "aspectRatio": 1.0,
            }))
            msg2 = json.loads(await asyncio.wait_for(ws.recv(), timeout=10))
            assert "image" in msg2
        viewer.stop()
        server_task.cancel()

    asyncio.run(run())
    assert len(calls) >= 2


def test_stale_request_eviction():
    scene, calls = _scene_with_render()
    viewer = Viewer(scene)
    ws = FakeWS()
    client = Client(ws)
    client.camera = scene.cameras[0]

    async def run():
        for i in range(5):  # only the last survives the depth-1 queue
            await viewer.handle_message(client, json.dumps({
                "type": "renderRequest", "position": [0, 0, float(i)],
                "quat": [1, 0, 0, 0], "aspectRatio": 1.0,
            }))
        assert viewer.queue.qsize() == 1
        _, msg = await viewer.queue.get()
        assert msg["position"][2] == 4.0

    asyncio.run(run())
