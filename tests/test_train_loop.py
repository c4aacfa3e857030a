"""Host trainer orchestration: loop, densify cadence, capacity growth,
checkpoint save/resume equivalence (SURVEY.md section 4 item 3)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud, synthetic_pcd
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.render import render
from tinysplat_tpu.scene import Scene
from tinysplat_tpu.train_loop import Trainer, grow_opt_state
from tinysplat_tpu.train import init_opt_state


def _toy_scene(n_cams=3, size=48):
    cams = orbit_cameras(n_cams, width=size, height=size)
    means, log_scales, quats, colors, opac = random_gaussian_cloud(60, seed=7)
    gt_state = init_from_pcd(means, colors * 255, sh_degree=1, capacity=64)
    p = dataclasses.replace(
        gt_state.params,
        scales=jnp.asarray(np.pad(log_scales, ((0, 4), (0, 0)), constant_values=-10.0)),
        opacities=jnp.asarray(np.pad(opac, ((0, 4), (0, 0)), constant_values=-20.0)),
    )
    for cam in cams:
        rgb, _ = render(p, gt_state.alive, cam.params(), size, size,
                        jnp.int32(1), jnp.zeros(3), rasterizer="dense")
        cam._image = np.asarray(rgb)
    return Scene(cams)


def _cfg(**kw):
    base = dict(rasterizer="dense", sh_degree=1, warmup_densify=10**9,
                interval_opacity_reset=0, max_iter=6)
    base.update(kw)
    return Config(**base)


def test_trainer_runs_and_loss_decreases():
    scene = _toy_scene()
    cfg = _cfg()
    pcd = synthetic_pcd(80, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    tr = Trainer(cfg, scene, state)
    tr.run(6)
    assert tr.step == 6
    assert tr.last_rendered is not None


@pytest.mark.slow
def test_checkpoint_resume_equivalence(tmp_path):
    from tinysplat_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    scene = _toy_scene()
    cfg = _cfg()
    pcd = synthetic_pcd(80, seed=2)
    state0 = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)

    # Path A: 4 straight steps.
    trA = Trainer(cfg, scene, jax.tree.map(jnp.copy, state0))
    trA.run(4)

    # Path B: 2 steps, checkpoint, resume, 2 more steps.
    sceneB = _toy_scene()
    trB = Trainer(cfg, sceneB, jax.tree.map(jnp.copy, state0))
    trB.run(2)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, trB.state, trB.opt_state, trB.step, trB.key)
    state, opt, step, key = load_checkpoint(path, cfg)
    sceneB2 = _toy_scene()
    trB2 = Trainer(cfg, sceneB2, state, opt, step, key)
    trB2.run(4)

    for name in ("means", "scales", "opacities"):
        a = np.asarray(getattr(trA.state.params, name))
        b = np.asarray(getattr(trB2.state.params, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_densify_capacity_growth():
    scene = _toy_scene()
    # Tiny capacity so densification must grow it: high-grad splats all split.
    cfg = _cfg(warmup_densify=1, densify_end=100, tau_means=0.0,
               densify_scale_thresh=1e-6, max_iter=10)
    pcd = synthetic_pcd(40, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=64)
    tr = Trainer(cfg, scene, state)
    tr.interval_densify = 3
    cap_before = tr.state.capacity
    tr.run(7)
    # All ~40 splats split every 3 steps; 64 slots can't hold 2x -> growth.
    assert tr.state.capacity > cap_before
    # Optimizer moments stayed shape-consistent.
    mu = tr.opt_state[0].mu.means
    assert mu.shape[0] == tr.state.capacity


def test_grow_opt_state_pads_capacity_leaves():
    cfg = _cfg()
    pcd = synthetic_pcd(16, seed=0)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
    opt = init_opt_state(cfg, state)
    opt = jax.tree.map(
        lambda x: jnp.ones_like(x) if getattr(x, "ndim", 0) >= 1 and x.shape[:1] == (32,) else x,
        opt,
    )
    grown = grow_opt_state(opt, 32, 64)
    mu = grown[0].mu.means
    assert mu.shape[0] == 64
    assert float(mu[:32].sum()) == 32 * 3  # originals kept
    assert float(mu[32:].sum()) == 0.0  # new slots zeroed
    # Scalar leaves (Adam step count) untouched.
    assert grown[0].count.shape == ()


@pytest.mark.slow
def test_budget_autotune_shrinks_and_grows():
    scene = _toy_scene()
    cfg = _cfg(rasterizer="tiled", max_iter=8)
    pcd = synthetic_pcd(80, seed=2)
    # Oversized capacity -> default budget 8*2048 is far beyond the toy
    # scene's few hundred intersections -> the tuner must shrink it.
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=2048)
    tr = Trainer(cfg, scene, state)
    tr.interval_densify = 2  # retune cadence
    tr.run(4)
    assert tr.cfg.dup_capacity != 0
    assert tr.cfg.dup_capacity < 8 * tr.state.capacity
    # Steps keep running after the retune recompile.
    tr.run(6)
    assert tr.step == 6


def test_holdout_evaluation():
    scene = _toy_scene(n_cams=4)
    cfg = _cfg()
    pcd = synthetic_pcd(80, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    tr = Trainer(cfg, scene, state)
    tr.eval_cameras = [scene.cameras[0]]
    out = tr.evaluate()
    assert "eval_psnr" in out and np.isfinite(out["eval_psnr"])
    assert 0.0 <= out["eval_ssim"] <= 1.0
    assert out["num_eval_cameras"] == 1


def test_nan_guard_rollback():
    """Failure-recovery subsystem: a non-finite loss rolls training back to
    the last in-memory snapshot with fresh RNG (reference has no failure
    detection at all — SURVEY §5)."""
    scene = _toy_scene()
    # Same cfg family/shapes as test_trainer_runs_and_loss_decreases: the
    # jitted train step is shared, not recompiled (guard logic is host-side).
    cfg = _cfg(nan_guard_interval=2)
    pcd = synthetic_pcd(60, seed=4)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)

    tr = Trainer(cfg, scene, state)
    for _ in range(4):
        tr.train_step()
    assert tr._guard_snapshot is not None
    snap_step = tr._guard_snapshot[2]

    # Poison one camera's cached GT to force a non-finite loss.
    cam = scene.get_random_camera(tr.step)  # next step samples index `step`
    key = (cam.name, cam.width, cam.height)
    good = tr._device_image(cam, cam.width, cam.height)
    tr._image_cache[key] = good * jnp.nan
    tr.train_step()
    assert tr._rollbacks == 1
    assert tr.step == snap_step
    # Restore the image; training continues and stays finite.
    tr._image_cache[key] = good
    before = tr.step
    tr.train_step()
    assert tr._rollbacks == 1 and tr.step == before + 1
    for leaf in jax.tree.leaves(tr.state.params):
        assert bool(jnp.isfinite(leaf).all())


def test_profile_window_fires(tmp_path):
    """--profile-steps: the trace window opens at profile_start, closes after
    profile_steps steps, and leaves a trace on disk (the per-op parse is
    allowed to no-op on CPU traces)."""
    scene = _toy_scene()
    cfg = _cfg(max_iter=8, profile_steps=2, profile_start=3,
               profile_dir=str(tmp_path / "trace"))
    pcd = synthetic_pcd(80, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    tr = Trainer(cfg, scene, state)
    tr.run(8)
    assert not getattr(tr, "_prof_on", False)  # window closed again
    assert os.path.isdir(os.path.join(str(tmp_path / "trace"), "plugins"))


@pytest.mark.slow
def test_trainer_kitchen_sink_integration():
    """Every host-loop feature ON simultaneously: densify with forced
    capacity growth, periodic compaction, coarse-to-fine, opacity reset,
    pose + appearance optimization, antialiased rendering, the density
    regularizer window, NaN guard, and checkpointing — 40 steps must stay
    finite and structurally consistent. Features are unit-tested in
    isolation elsewhere; this catches cross-feature interactions (e.g. a
    compaction permuting rows under a cached density-probe knn)."""
    import tempfile

    scene = _toy_scene(n_cams=2, size=32)
    with tempfile.TemporaryDirectory() as d:
        cfg = Config(
            rasterizer="tiled", sh_degree=1,
            warmup_densify=4, densify_end=100, tau_means=0.0,
            densify_scale_thresh=1e-6,           # force clone/split
            compact_interval=17, compact_margin=1.25,
            coarse_to_fine=True, c2f_start_scale=0.5, c2f_end=20,
            interval_opacity_reset=15, epsilon_alpha=0.01,
            pose_opt=True, lr_pose=1e-4, app_opt=True, lr_app=1e-3,
            antialiased=True,
            regularize_opacity=True, regularize_opacity_start=0,
            regularize_opacity_end=100,
            regularize_density=True, regularize_density_start=10,
            regularize_density_end=30, density_samples=512,
            nan_guard_interval=10,
            save_checkpoints=True, checkpoint_interval=20,
            checkpoint_dir=d, warmup_grad=0,
        )
        pcd = synthetic_pcd(24, seed=2)
        state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
        # Start opaque: the density window's start-step prune drops
        # sigmoid(opacity) < 0.5 (reference train.py:105-107 semantics,
        # meant for late-stage saturated models) — a fresh 0.1-alpha init
        # would be wiped out in this 40-step run.
        state = dataclasses.replace(
            state, params=dataclasses.replace(
                state.params,
                opacities=jnp.where(state.alive[:, None], 2.2,
                                    state.params.opacities)))
        tr = Trainer(cfg, scene, state)
        tr.interval_densify = 5
        tr.run(40)
        assert tr.step == 40
        assert np.isfinite(np.asarray(tr.state.params.means)).all()
        assert int(tr.state.num_live()) > 0
        # densify with tau 0 must have grown past the tiny start capacity
        assert tr.state.capacity > 32
        # pose/app tables moved (gradients reached the host Adam)
        assert float(jnp.abs(tr.pose_deltas).sum()) > 0
        assert float(jnp.abs(tr.app_params).sum()) > 0
        # a checkpoint landed
        import glob as _g
        assert _g.glob(f"{d}/*.npz")


def test_metrics_csv_sink(tmp_path):
    """--metrics-file appends one epoch-mean CSV row per logging boundary."""
    scene = _toy_scene(n_cams=2, size=32)
    csv = tmp_path / "metrics.csv"
    cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                 interval_opacity_reset=0, warmup_grad=0,
                 metrics_file=str(csv))
    pcd = synthetic_pcd(24, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
    tr = Trainer(cfg, scene, state)
    tr.run(4)  # 2 cameras -> 2 epoch boundaries
    lines = csv.read_text().strip().splitlines()
    assert lines[0].startswith("step,")
    assert len(lines) == 3  # header + 2 rows
    header = lines[0].split(",")
    assert "loss" in header and "psnr" in header
    row = dict(zip(header, lines[1].split(",")))
    assert float(row["loss"]) > 0


def test_async_checkpoint_equivalence(tmp_path):
    """--async-checkpoint writes the SAME bytes a sync save would (the
    writer thread gets a device copy taken before the next donating step
    invalidates the buffers) and run() joins the in-flight writer."""
    from tinysplat_tpu.io.checkpoint import load_checkpoint

    scene = _toy_scene(n_cams=2, size=32)
    pcd = synthetic_pcd(24, seed=2)
    mk = lambda: init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
    outs = {}
    for mode in (False, True):
        d = tmp_path / ("async" if mode else "sync")
        cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                     interval_opacity_reset=0, warmup_grad=0,
                     save_checkpoints=True, checkpoint_interval=2,
                     checkpoint_dir=str(d), async_checkpoint=mode)
        tr = Trainer(cfg, scene, mk())
        tr.run(4)  # checkpoints at steps 2 and 4; run() joins the writer
        files = sorted(p.name.split("-")[-1] for p in d.glob("*.npz"))
        assert files == ["2.npz", "4.npz"], files
        st, opt, step, key = load_checkpoint(
            str(sorted(d.glob("*-4.npz"))[0]), cfg)
        outs[mode] = (st, opt, step)
    assert outs[False][2] == outs[True][2] == 4
    for a, b in zip(jax.tree.leaves(outs[False][0]),
                    jax.tree.leaves(outs[True][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prefetch_images_warms_cache():
    scene = _toy_scene(n_cams=3, size=32)
    cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                 interval_opacity_reset=0, warmup_grad=0)
    pcd = synthetic_pcd(24, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
    tr = Trainer(cfg, scene, state)
    tr.prefetch_images(workers=2)
    import concurrent.futures as cf
    cf.wait(tr._prefetch_futures, timeout=30)
    assert len(tr._image_cache) == 3  # every camera pinned
    # The cached entries are exactly what a lazy fetch would produce.
    cam = scene.cameras[0]
    np.testing.assert_array_equal(
        np.asarray(tr._device_image(cam, cam.width, cam.height)),
        np.asarray(cam.get_original_image((cam.width, cam.height))))
