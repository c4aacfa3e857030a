"""Camera pose optimization (--pose-opt, beyond the reference whose camera
poses are fixed buffers, scene.py:49-110): SE(3) math, gradient plumbing,
and end-to-end recovery of a known pose perturbation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tinysplat_tpu.cameras import apply_pose_delta, so3_exp
from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import synthetic_pcd
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.train_loop import Trainer

from tests.test_train_loop import _toy_scene


def _np_rodrigues(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def test_so3_exp_properties():
    rng = np.random.default_rng(0)
    for _ in range(5):
        w = rng.normal(scale=0.7, size=3).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        np.testing.assert_allclose(R, _np_rodrigues(w), atol=1e-5)
    # identity + finite gradients at omega == 0
    np.testing.assert_allclose(np.asarray(so3_exp(jnp.zeros(3))), np.eye(3), atol=1e-6)
    g = jax.grad(lambda w: jnp.sum(so3_exp(w)))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_apply_pose_delta_identity_and_math():
    from tinysplat_tpu.data.synthetic import orbit_cameras

    cam = orbit_cameras(3, width=32, height=32)[1].params()
    out = apply_pose_delta(cam, jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(out.viewmat), np.asarray(cam.viewmat), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.cam_pos), np.asarray(cam.cam_pos), atol=1e-5)

    delta = jnp.asarray([0.05, -0.02, 0.03, 0.01, 0.02, -0.01])
    out = apply_pose_delta(cam, delta)
    Rd = _np_rodrigues(np.asarray(delta[:3]))
    V = np.asarray(cam.viewmat)
    np.testing.assert_allclose(np.asarray(out.viewmat[:3, :3]), Rd @ V[:3, :3], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.viewmat[:3, 3]), Rd @ V[:3, 3] + np.asarray(delta[3:]), atol=1e-5)
    # cam_pos consistency: viewmat @ [cam_pos, 1] == [0, 0, 0, 1]
    p = np.asarray(out.viewmat) @ np.append(np.asarray(out.cam_pos), 1.0)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


def test_pose_recovery_end_to_end():
    """GT images rendered from TRUE poses with the SAME splat cloud the
    trainer holds (so the photometric minimum is exactly at the true pose);
    the trainer's cameras are perturbed by a known SE(3) error; with all
    splat LRs zero the ONLY way to reduce the loss is through the pose
    deltas — the learned deltas must undo most of the perturbation."""
    import jax.numpy as jnp_
    from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud
    from tinysplat_tpu.render import render
    from tinysplat_tpu.scene import Scene

    size = 48
    cams = orbit_cameras(3, width=size, height=size)
    means, log_scales, quats, colors, opac = random_gaussian_cloud(60, seed=7)
    state = init_from_pcd(means, colors * 255, sh_degree=1, capacity=64)
    state = dataclasses.replace(
        state,
        params=dataclasses.replace(
            state.params,
            scales=jnp_.asarray(np.pad(log_scales, ((0, 4), (0, 0)),
                                       constant_values=-10.0)),
            opacities=jnp_.asarray(np.pad(opac, ((0, 4), (0, 0)),
                                          constant_values=-20.0)),
        ),
    )
    for cam in cams:
        rgb, _ = render(state.params, state.alive, cam.params(), size, size,
                        jnp_.int32(1), jnp_.zeros(3), rasterizer="dense")
        cam._image = np.asarray(rgb)
    scene = Scene(cams)
    rng = np.random.default_rng(5)
    true_views = [c.view_matrix.copy() for c in scene.cameras]
    for c in scene.cameras:
        w = rng.normal(scale=0.02, size=3)
        t = rng.normal(scale=0.02, size=3)
        Rd = _np_rodrigues(w)
        V = c.view_matrix.copy()
        V2 = V.copy()
        V2[:3, :3] = Rd @ V[:3, :3]
        V2[:3, 3] = Rd @ V[:3, 3] + t
        c.view_matrix = V2.astype(np.float32)

    def err(trainer=None):
        tot = 0.0
        for i, c in enumerate(scene.cameras):
            V = jnp.asarray(c.view_matrix)
            if trainer is not None:
                V = apply_pose_delta(c.params(), trainer.pose_deltas[i]).viewmat
            tot += float(jnp.abs(V - jnp.asarray(true_views[i])).sum())
        return tot

    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=150,
                 warmup_densify=10**9, interval_opacity_reset=0,
                 pose_opt=True, lr_pose=3e-3,
                 lr_means=0.0, lr_colors_dc=0.0, lr_colors_rest=0.0,
                 lr_scales=0.0, lr_quats=0.0, lr_opacities=0.0)
    means0 = np.asarray(state.params.means).copy()  # donated below
    tr = Trainer(cfg, scene, jax.tree.map(jnp.copy, state))
    e0 = err()
    tr.run(150)
    e1 = err(tr)
    assert e1 < 0.5 * e0, (e0, e1)
    # splats must not have moved (their LRs are zero)
    np.testing.assert_allclose(np.asarray(tr.state.params.means), means0, atol=1e-6)


def test_apply_appearance_identity_and_math():
    from tinysplat_tpu.train import apply_appearance

    rng = np.random.default_rng(2)
    rgb = jnp.asarray(rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32))
    out = apply_appearance(rgb, jnp.zeros(12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-7)
    # known transform: rgb' = clip(rgb @ (I+A)^T + b)
    app = jnp.asarray(np.concatenate([
        np.diag([-0.3, -0.3, -0.3]).reshape(-1), [0.05, 0.05, 0.05]
    ]).astype(np.float32))
    out = apply_appearance(rgb, app)
    np.testing.assert_allclose(np.asarray(out),
                               np.clip(np.asarray(rgb) * 0.7 + 0.05, 0, 1),
                               atol=1e-6)


def test_app_opt_recovers_exposure():
    """GT images are exposure-shifted copies of the model's own renders;
    with all splat LRs zero, only the per-camera affine appearance params
    can close the gap — they must converge to the applied shift."""
    import jax.numpy as jnp_
    from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud
    from tinysplat_tpu.render import render
    from tinysplat_tpu.scene import Scene

    size = 48
    cams = orbit_cameras(2, width=size, height=size)
    # Opaque, frame-covering cloud: training uses RANDOM backgrounds
    # (reference train.py:51), so any visible background would make the
    # exposure fit chase a moving target. Big near-opaque splats -> the
    # residual transmittance is ~0 everywhere and only splat color matters.
    means, log_scales, quats, colors, opac = random_gaussian_cloud(300, seed=7)
    # Enclosing dome of fat opaque splats (quality_bench's trick) so every
    # ray terminates on geometry.
    rng0 = np.random.default_rng(11)
    sph = rng0.normal(size=(500, 3))
    sph = 6.0 * sph / np.linalg.norm(sph, axis=1, keepdims=True)
    all_means = np.concatenate([means, sph.astype(np.float32)])
    all_colors = np.concatenate(
        [colors, rng0.uniform(0.2, 0.9, size=(500, 3)).astype(np.float32)])
    n = 800
    state = init_from_pcd(all_means, all_colors * 255, sh_degree=1, capacity=1024)
    sc = np.full((1024, 3), -10.0, np.float32)
    sc[:300] = log_scales + 0.8
    sc[300:800] = np.log(1.6)
    op = np.full((1024, 1), -20.0, np.float32)
    op[:n] = 4.0
    state = dataclasses.replace(
        state,
        params=dataclasses.replace(
            state.params,
            scales=jnp_.asarray(sc),
            opacities=jnp_.asarray(op),
        ),
    )
    for cam in cams:
        rgb, extras = render(state.params, state.alive, cam.params(), size,
                             size, jnp_.int32(1), jnp_.zeros(3),
                             rasterizer="dense")
        assert float(extras["alpha"].min()) > 0.99, "fixture must cover frame"
        cam._image = np.clip(np.asarray(rgb) * 0.7 + 0.05, 0, 1)
    scene = Scene(cams)

    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=60,
                 warmup_densify=10**9, interval_opacity_reset=0,
                 app_opt=True, lr_app=4e-2,
                 lr_means=0.0, lr_colors_dc=0.0, lr_colors_rest=0.0,
                 lr_scales=0.0, lr_quats=0.0, lr_opacities=0.0)
    tr = Trainer(cfg, scene, jax.tree.map(jnp.copy, state))
    tr.run(60)
    # The affine fit is not unique parameter-wise (off-diagonals/bias trade
    # against the diagonal on correlated scene colors); assert the
    # functional contract: the compensated render matches the shifted GT
    # far better than the raw render does.
    from tinysplat_tpu.train import apply_appearance

    for i, cam in enumerate(cams):
        rgb, _ = render(tr.state.params, tr.state.alive, cam.params(), size,
                        size, jnp_.int32(1), jnp_.zeros(3), rasterizer="dense")
        gt = jnp_.asarray(cam.get_original_image((size, size)))
        e_raw = float(jnp.mean(jnp.abs(rgb - gt)))
        e_fit = float(jnp.mean(jnp.abs(
            apply_appearance(rgb, tr.app_params[i]) - gt)))
        assert e_fit < 0.25 * e_raw, (i, e_raw, e_fit)


def test_pose_app_state_checkpoint_roundtrip(tmp_path):
    """--pose-opt/--app-opt tables ride checkpoints via the extras channel
    and restore into a fresh trainer (resume equivalence for the new
    optimizer state)."""
    from tinysplat_tpu.io.checkpoint import (
        load_checkpoint, load_checkpoint_extras, save_checkpoint)

    scene = _toy_scene(n_cams=2, size=48)
    cfg = Config(rasterizer="dense", sh_degree=1, max_iter=4,
                 warmup_densify=10**9, interval_opacity_reset=0,
                 pose_opt=True, app_opt=True, save_checkpoints=True,
                 checkpoint_interval=4, checkpoint_dir=str(tmp_path))
    pcd = synthetic_pcd(60, seed=3)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=128)
    tr = Trainer(cfg, scene, state)
    tr.run(4)
    assert float(jnp.abs(tr.pose_deltas).sum()) > 0  # actually trained
    import glob
    path = sorted(glob.glob(str(tmp_path / "*.npz")))[-1]
    st2, opt2, step2, key2 = load_checkpoint(path, cfg)
    tr2 = Trainer(cfg, scene, st2, opt2, step2, key2)
    tr2.restore_pose_state(load_checkpoint_extras(path))
    np.testing.assert_allclose(np.asarray(tr2.pose_deltas),
                               np.asarray(tr.pose_deltas))
    np.testing.assert_allclose(np.asarray(tr2.app_params),
                               np.asarray(tr.app_params))
    np.testing.assert_allclose(np.asarray(tr2._pose_m), np.asarray(tr._pose_m))
    np.testing.assert_allclose(np.asarray(tr2._app_v), np.asarray(tr._app_v))


def test_app_opt_only_render_camera():
    """--app-opt without --pose-opt: eval/viewer renders must not try to
    apply a (nonexistent) pose delta — _pose_slot returns a slot whenever
    EITHER table exists (regression: None[slot] TypeError)."""
    scene = _toy_scene(n_cams=2, size=32)
    cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                 interval_opacity_reset=0, warmup_grad=0, app_opt=True)
    pcd = synthetic_pcd(24, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
    tr = Trainer(cfg, scene, state)
    rgb, extras = tr.render_camera(scene.cameras[0])
    assert rgb.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(rgb)).all()
