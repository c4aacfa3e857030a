"""REAL multi-process distributed execution (2 processes, gloo collectives).

Everything else in the suite simulates a pod slice with one process and 8
virtual devices; this test runs the actual multi-controller stack —
jax.distributed.initialize, cross-process collectives inside the sharded
train step, per-process sharded checkpoint IO with barriers — the way a
multi-host TPU run would (SURVEY.md section 2.3 / section 5 bars; VERDICT r2
component #31). CPU backend + gloo stands in for ICI; the topology and the
JAX multi-controller semantics are the real thing.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(local_devices: int) -> dict:
    env = dict(os.environ)
    # Escape the ambient TPU relay (sitecustomize registers the axon plugin
    # at interpreter startup; JAX_PLATFORMS alone does not win).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Share the suite's persistent compilation cache (keyed by topology).
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


def _run_workers(nprocs: int, local_devices: int, workdir: str,
                 timeout: float = 540.0, scenario: str = "train",
                 resume_from: str = None):
    port = _free_port()
    extra = [scenario] + ([resume_from] if resume_from else [])
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nprocs), str(port), workdir]
            + extra,
            env=_worker_env(local_devices),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=_REPO,
        )
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:  # exact PIDs we started — never pattern-kill
            if p.poll() is None:
                p.kill()
                outs.append(p.communicate()[0])
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out[-4000:]}"
    return [
        json.load(open(os.path.join(workdir, f"result_p{i}.json")))
        for i in range(nprocs)
    ]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    d2 = tmp_path / "mp2"
    d1 = tmp_path / "mp1"
    d2.mkdir(), d1.mkdir()
    res2 = _run_workers(2, local_devices=2, workdir=str(d2))
    res1 = _run_workers(1, local_devices=4, workdir=str(d1))

    # The replicated loss/psnr outputs must agree ACROSS the two processes.
    np.testing.assert_allclose(res2[0]["losses"], res2[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(res2[0]["psnrs"], res2[1]["psnrs"], rtol=1e-6)
    # ... and with a single-process run over the same 4-device mesh (gloo
    # reduction order may differ from XLA's single-process order -> rtol).
    np.testing.assert_allclose(res2[0]["losses"], res1[0]["losses"], rtol=1e-4)
    np.testing.assert_allclose(res2[0]["psnrs"], res1[0]["psnrs"], rtol=1e-4)
    assert res2[0]["num_live"] == res1[0]["num_live"]
    # Held-out eval (sharded collective render) agrees everywhere too.
    assert res2[0]["eval_psnr"] == pytest.approx(res2[1]["eval_psnr"], rel=1e-6)
    assert res2[0]["eval_psnr"] == pytest.approx(res1[0]["eval_psnr"], rel=1e-4)
    assert res2[0]["eval_ssim"] == pytest.approx(res1[0]["eval_ssim"], rel=1e-4)

    # Checkpoint layout: every process wrote exactly its own shard dir, and
    # only process 0 published the manifest.
    assert (d2 / "ckpt" / "manifest.npz").exists()
    assert (d2 / "ckpt" / "p0").is_dir() and (d2 / "ckpt" / "p1").is_dir()
    # Aggregate shard bytes ~= one copy of the global state (replicated
    # leaves written once): the 2-process layout must not duplicate data.
    def shard_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs if not f.endswith("idx.npy")
        )
    b2 = shard_bytes(d2 / "ckpt")
    b1 = shard_bytes(d1 / "ckpt")
    assert abs(b2 - b1) <= 0.01 * b1, (b2, b1)

    # Elastic restart: the checkpoint written by TWO processes restores into
    # a ONE-process run of the same 4-device mesh (reads the other process's
    # shard files) and training continues from the saved step.
    dr = tmp_path / "resume"
    dr.mkdir()
    res_r = _run_workers(1, local_devices=4, workdir=str(dr),
                         scenario="resume", resume_from=str(d2 / "ckpt"))
    assert res_r[0]["start_step"] == 3
    assert res_r[0]["end_step"] == 5
    assert np.isfinite(res_r[0]["losses"]).all()


@pytest.mark.slow
def test_cli_two_process_launch(tmp_path):
    """The PRODUCT surface: scripts/train.py launched once per host with
    --coordinator-address/--num-processes/--process-id (multi-controller
    init before backend touch), training a 2x2 mesh across two processes
    and writing ONE sharded checkpoint (process-0 manifest, broadcast
    timestamp)."""
    port = _free_port()
    cks = tmp_path / "cks"
    procs = [
        subprocess.Popen(
            [sys.executable, "scripts/train.py", "--train", "--no-viewer",
             "--synthetic", "--max-iter", "4", "--rasterizer", "tiled",
             "--mesh-splat", "2", "--mesh-tile", "2",
             "--coordinator-address", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--save-checkpoints", "--checkpoint-interval", "4",
             "--checkpoint-dir", str(cks)],
            env=_worker_env(2), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, cwd=_REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:  # exact PIDs we started — never pattern-kill
            if p.poll() is None:
                p.kill()
                outs.append(p.communicate()[0])
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"CLI rc={p.returncode}:\n{out[-4000:]}"
    ckpts = list(cks.glob("*.ckpt"))
    assert len(ckpts) == 1, ckpts  # ONE run dir despite two processes
    assert (ckpts[0] / "manifest.npz").exists()
    assert (ckpts[0] / "p0").is_dir() and (ckpts[0] / "p1").is_dir()


@pytest.mark.slow
def test_two_process_density_regularizer(tmp_path):
    """Probe refresh (KNN over global arrays, reshard to 'tile') + density
    loss term run lockstep across two real processes."""
    d2 = tmp_path / "dn2"
    d1 = tmp_path / "dn1"
    d2.mkdir(), d1.mkdir()
    res2 = _run_workers(2, local_devices=2, workdir=str(d2),
                        scenario="density")
    res1 = _run_workers(1, local_devices=4, workdir=str(d1),
                        scenario="density")
    np.testing.assert_allclose(res2[0]["losses"], res2[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(
        res2[0]["loss_density"], res2[1]["loss_density"], rtol=1e-6)
    np.testing.assert_allclose(res2[0]["losses"], res1[0]["losses"], rtol=1e-4)
    np.testing.assert_allclose(
        res2[0]["loss_density"], res1[0]["loss_density"], rtol=1e-3)


@pytest.mark.slow
def test_two_process_densify_growth(tmp_path):
    """Capacity overflow -> grow -> cross-host reshard -> redo, lockstep."""
    d2 = tmp_path / "g2"
    d1 = tmp_path / "g1"
    d2.mkdir(), d1.mkdir()
    res2 = _run_workers(2, local_devices=2, workdir=str(d2), scenario="grow")
    res1 = _run_workers(1, local_devices=4, workdir=str(d1), scenario="grow")
    np.testing.assert_allclose(res2[0]["losses"], res2[1]["losses"], rtol=1e-6)
    assert res2[0]["capacity"] > 32  # grew (and resharded) without errors
    assert res2[0]["capacity"] == res1[0]["capacity"]
    assert res2[0]["num_live"] == res1[0]["num_live"]
    np.testing.assert_allclose(res2[0]["losses"], res1[0]["losses"], rtol=1e-4)
