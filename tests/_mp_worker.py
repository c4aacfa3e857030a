"""Worker for the REAL multi-process distributed test (test_multiprocess.py).

Launched N times by the parent test with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=2 so that 2 processes x 2 local CPU
devices form a 4-device global mesh with cross-process gloo collectives —
the same multi-controller topology as a real multi-host TPU pod slice
(SURVEY.md section 2.3; every process runs this identical script in
lockstep, as jax.distributed requires).

Runs the full MeshTrainer loop (sharded train step, shared post-step hooks)
for a few steps, saves + restores a sharded checkpoint across processes, and
writes a per-process result JSON for the parent to cross-check:
  - loss/psnr history must MATCH across processes (replicated psum outputs),
  - and match a single-process 4-device run of the same scenario,
  - the checkpoint round-trip must be exact on every addressable shard,
  - only process 0 may write the manifest; each process writes only p{i}/.
"""
import json
import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    workdir = sys.argv[4]
    scenario = sys.argv[5] if len(sys.argv) > 5 else "train"
    resume_from = sys.argv[6] if len(sys.argv) > 6 else None

    import jax

    if nprocs > 1:
        from tinysplat_tpu.parallel import init_distributed

        init_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp

    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.synthetic import orbit_cameras, synthetic_pcd
    from tinysplat_tpu.io.checkpoint import (
        restore_checkpoint_sharded,
        save_checkpoint_sharded,
    )
    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.parallel import MeshTrainer, make_mesh
    from tinysplat_tpu.scene import Scene

    # Deterministic toy scene — identical on every process (lockstep rule).
    size = 32
    cams = orbit_cameras(2, width=size, height=size)
    rng = np.random.default_rng(7)
    for cam in cams:
        cam._image = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    scene = Scene(cams)
    if scenario == "grow":
        # Densification with forced capacity overflow: exercises the
        # grow-capacity -> cross-host reshard -> redo-densify path and the
        # shared _maybe_densify hook (staged RNG key) under multi-process.
        cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=1,
                     densify_end=100, tau_means=0.0,
                     densify_scale_thresh=1e-6, interval_opacity_reset=0,
                     warmup_grad=0)
    elif scenario == "density":
        # SuGaR density regularizer: probe refresh (global-array KNN +
        # reshard to the 'tile' axis) and the density loss term, lockstep.
        cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                     interval_opacity_reset=0, warmup_grad=0,
                     regularize_density=True, regularize_density_start=1,
                     regularize_density_end=100, density_samples=2048)
    else:
        cfg = Config(rasterizer="tiled", sh_degree=1, warmup_densify=10**9,
                     interval_opacity_reset=0, warmup_grad=0)
    pcd = synthetic_pcd(24, seed=2)
    state = init_from_pcd(pcd.xyz, pcd.colors, sh_degree=1, capacity=32)
    if scenario == "density":
        # The density window's start-step prune drops sigmoid(opacity)<0.5
        # (reference semantics for late-stage models); a fresh 0.1-alpha
        # init would be wiped out and the probe KNN would have nothing
        # live to query. Start opaque.
        import dataclasses

        state = dataclasses.replace(
            state, params=dataclasses.replace(
                state.params,
                opacities=jnp.where(state.alive[:, None], 2.2,
                                    state.params.opacities)))
    tr = MeshTrainer(cfg, scene, state, mesh=make_mesh(2, 2))

    if scenario == "resume":
        # Elastic restart: restore a checkpoint written by a DIFFERENT
        # process count (reads other processes' shard files off the shared
        # filesystem) and keep training on this mesh.
        r_state, r_opt, r_step, r_key = restore_checkpoint_sharded(
            resume_from, cfg, tr.mesh)
        tr.state, tr.opt_state, tr.step = r_state, r_opt, r_step
        if r_key is not None:
            tr.key = r_key
        losses = []
        orig_update = tr.metrics.update

        def capture(step, values):
            losses.append(float(jax.device_get(values["loss"])))
            orig_update(step, values)

        tr.metrics.update = capture
        for _ in range(2):
            tr.train_step()
        assert all(np.isfinite(losses)), losses
        with open(os.path.join(workdir, f"result_p{pid}.json"), "w") as f:
            json.dump({"losses": losses, "start_step": r_step,
                       "end_step": tr.step}, f)
        return 0

    if scenario == "density":
        losses, dens = [], []
        orig_update = tr.metrics.update

        def capture(step, values):
            losses.append(float(jax.device_get(values["loss"])))
            dens.append(float(jax.device_get(values["loss_density"])))
            orig_update(step, values)

        tr.metrics.update = capture
        for _ in range(2):
            tr.train_step()
        assert all(np.isfinite(losses)), losses
        assert all(np.isfinite(dens)), dens
        with open(os.path.join(workdir, f"result_p{pid}.json"), "w") as f:
            json.dump({"losses": losses, "loss_density": dens}, f)
        return 0

    if scenario == "grow":
        losses = []
        orig_update = tr.metrics.update

        def capture(step, values):
            losses.append(float(jax.device_get(values["loss"])))
            orig_update(step, values)

        tr.metrics.update = capture
        tr.interval_densify = 2
        for _ in range(5):
            tr.train_step()
        assert all(np.isfinite(losses)), losses
        # Collective-safe finiteness check (means is non-addressable here).
        assert bool(jax.device_get(jnp.isfinite(tr.state.params.means).all()))
        with open(os.path.join(workdir, f"result_p{pid}.json"), "w") as f:
            json.dump({"losses": losses, "capacity": int(tr.state.capacity),
                       "num_live": int(jax.device_get(tr.state.num_live()))},
                      f)
        return 0

    losses, psnrs = [], []
    orig_update = tr.metrics.update

    def capture(step, values):  # Metrics.log clears on epoch boundaries
        losses.append(float(jax.device_get(values["loss"])))
        psnrs.append(float(jax.device_get(values["psnr"])))
        orig_update(step, values)

    tr.metrics.update = capture
    for _ in range(3):
        tr.train_step()

    # Sharded checkpoint across processes: every process writes only its
    # addressable shards; process 0 publishes the manifest after the barrier.
    ckpt = os.path.join(workdir, "ckpt")
    save_checkpoint_sharded(ckpt, tr.state, tr.opt_state, tr.step, tr.key)
    r_state, r_opt, r_step, r_key = restore_checkpoint_sharded(
        ckpt, cfg, tr.mesh)
    assert r_step == tr.step
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(r_state)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))
    for a, b in zip(jax.tree.leaves(tr.opt_state), jax.tree.leaves(r_opt)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(r_key)),
        np.asarray(jax.random.key_data(tr.key)))

    # One more step from the RESTORED state proves the restored arrays carry
    # valid shardings for the compiled step (not just matching bytes).
    tr.state, tr.opt_state = r_state, r_opt
    tr.train_step()

    # Held-out evaluation as a lockstep collective (sharded render spans the
    # whole mesh; PSNR/SSIM reduce to replicated scalars).
    ev = tr.evaluate([scene.cameras[0]])

    with open(os.path.join(workdir, f"result_p{pid}.json"), "w") as f:
        json.dump({"losses": losses, "psnrs": psnrs,
                   "eval_psnr": ev["eval_psnr"], "eval_ssim": ev["eval_ssim"],
                   "num_live": int(jax.device_get(tr.state.num_live()))}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
