"""CLI smoke tests: scripts/train.py arg parity + scripts/export.py.

The reference export CLI is bit-rotted (wrong import, arg typos — SURVEY.md
section 2.1); these tests pin the working behavior.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
# The sandbox's sitecustomize registers the TPU plugin whenever
# PALLAS_AXON_POOL_IPS is set — JAX_PLATFORMS=cpu then loses, and the CLI
# subprocesses silently run on (and can hang on) the shared TPU. Dropping
# the trigger variable keeps these smoke tests CPU-only and hermetic.
ENV.pop("PALLAS_AXON_POOL_IPS", None)


def test_train_cli_flag_parity():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import importlib

    train_mod = importlib.import_module("train")
    parser = train_mod.arg_parser()
    # Reference argparse flags (scripts/train.py:162-245) all exist.
    for flag in [
        "--train", "--viewer", "--load-checkpoint", "--save-checkpoints",
        "--checkpoint-dir", "--sh-degree", "--max-iter", "--sh-increment-interval",
        "--checkpoint-interval", "--viewer-ip", "--viewer-port", "--dataset-dir",
        "--colmap-path", "--images-path", "--lr-means", "--lr-colors-dc",
        "--lr-colors-rest", "--lr-scales", "--lr-quats", "--lr-opacities",
        "--lambda-dssim", "--lambda-depth", "--lambda-opacity", "--lambda-density",
        "--warmup-densify", "--warmup-grad", "--interval-densify",
        "--interval-opacity-reset", "--densify-end", "--epsilon-alpha",
        "--tau-means", "--semantic-path", "--semantic-model", "--depths-path",
        "--depth-model", "--regularize-depth", "--regularize-depth-start",
        "--regularize-depth-end", "--regularize-opacity", "--regularize-density",
        "--regularize-sdf",
    ]:
        args = parser.parse_args([])  # defaults parse
        assert flag.lstrip("-").replace("-", "_") in vars(args), flag

    args = parser.parse_args(["--max-iter", "123", "--regularize-depth",
                              "--lr-means", "0.001", "--no-viewer"])
    assert args.max_iter == 123
    assert args.regularize_depth is True
    assert args.lr_means == 0.001
    assert args.viewer is False


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    from tinysplat_tpu.io.checkpoint import save_checkpoint
    from tinysplat_tpu.models.gaussians import init_from_pcd

    rng = np.random.default_rng(0)
    state = init_from_pcd(
        rng.normal(size=(50, 3)).astype(np.float32) * 0.2,
        rng.uniform(0, 255, size=(50, 3)).astype(np.float32),
        sh_degree=1, capacity=64, opacity_init=0.9,
    )
    ck = str(tmp_path / "model.npz")
    save_checkpoint(ck, state, None, step=10)

    for filetype, name in [("PLY", "out.ply"), ("SPLAT", "out.splat")]:
        out = str(tmp_path / name)
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "export.py"),
             "--filetype", filetype, ck, out],
            capture_output=True, text=True, env=ENV, timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert os.path.getsize(out) > 0

    out = str(tmp_path / "mesh.obj")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export.py"),
         "--filetype", "OBJ", "--resolution", "24", ck, out],
        capture_output=True, text=True, env=ENV, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    content = open(out).read()
    assert content.count("\nf ") > 10


def test_render_path_cli(tmp_path):
    """scripts/render_path.py: checkpoint -> turntable PNG frames
    (beyond-reference tooling; reference ships only train/export CLIs)."""
    from tinysplat_tpu.io.checkpoint import save_checkpoint
    from tinysplat_tpu.models.gaussians import init_from_pcd

    rng = np.random.default_rng(1)
    state = init_from_pcd(
        rng.normal(size=(50, 3)).astype(np.float32) * 0.2,
        rng.uniform(0, 255, size=(50, 3)).astype(np.float32),
        sh_degree=1, capacity=64, opacity_init=0.9,
    )
    ck = str(tmp_path / "model.npz")
    save_checkpoint(ck, state, None, step=10)
    outdir = str(tmp_path / "frames")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "render_path.py"),
         ck, outdir, "--frames", "3", "--width", "64", "--height", "48",
         "--rasterizer", "tiled"],
        capture_output=True, text=True, env=ENV, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import glob as _glob
    frames = sorted(_glob.glob(os.path.join(outdir, "frame_*.png")))
    assert len(frames) == 3
    from PIL import Image
    arr = np.asarray(Image.open(frames[0]))
    assert arr.shape == (48, 64, 3)
    assert arr.max() > 0  # something rendered


def test_evaluate_cli_synthetic(tmp_path):
    """scripts/evaluate.py: checkpoint + synthetic GT scene -> PSNR/SSIM
    JSON (beyond-reference tooling; the reference only logs train-view
    metrics in-loop)."""
    import json as _json

    from tinysplat_tpu.io.checkpoint import save_checkpoint
    from tinysplat_tpu.models.gaussians import init_from_pcd

    rng = np.random.default_rng(2)
    state = init_from_pcd(
        rng.normal(size=(60, 3)).astype(np.float32) * 0.3,
        rng.uniform(0, 255, size=(60, 3)).astype(np.float32),
        sh_degree=1, capacity=64, opacity_init=0.9,
    )
    ck = str(tmp_path / "model.npz")
    save_checkpoint(ck, state, None, step=10)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate.py"),
         ck, "--synthetic", "--max-views", "2", "--rasterizer", "tiled"],
        capture_output=True, text=True, env=ENV, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = _json.loads(res.stdout.strip().splitlines()[-1])
    assert out["views"] == 2
    assert 0 < out["psnr"] < 60 and 0 <= out["ssim"] <= 1
    assert len(out["per_view"]) == 2
