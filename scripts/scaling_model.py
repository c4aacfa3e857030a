"""SCALING_r04: chip-anchored multi-chip rays/s efficiency model.

Real pod-slice hardware is unavailable in this sandbox (one v5e chip behind
the axon relay), so the >=85% north-star scaling clause (BASELINE.md) cannot
be measured end-to-end. This script produces the honest substitute the
round-3 verdict asked for (item 6): a predicted rays/s efficiency curve for
1xN 'tile' meshes anchored to THREE real-chip measurements plus the
virtual-mesh structural constants from SCALING_r03.json:

  1. t_plain      — the plain single-device train step (bench scale);
  2. t_sharded_11 — the SAME work through make_sharded_train_step on a
                    1x1 mesh on the real chip: the sharded-step machinery
                    overhead A/B (shard_map, spec plumbing, banding path);
  3. t_proj       — projection+SH alone: the per-splat phase every 'tile'
                    shard replicates (each band projects ALL splats, then
                    bins only its rows).

Model (1xN tile mesh, B=1 camera):
  T(N) = t_proj + (t_sharded_11 - t_proj) * work_overhead * imbalance / N
         + t_coll(N)
  t_coll(N) = 2 * C*12*4 * (N-1)/N bytes / ICI_BW   (projected-attr
              all_gather + its reduce-scatter transpose; assumed NOT
              overlapped — pessimistic, XLA schedules them against the
              rasterize phase in practice)
  efficiency(N) = t_plain / (N * T(N))      [rays/s per chip vs 1 chip]

work_overhead (1.01x) and post-interleave imbalance (1.07x) are measured on
the virtual 8-device CPU mesh (SCALING_r03.json; structural properties of
the banding/binning decomposition, independent of the compute backend).
ICI_BW is v5e's ~400 GB/s bidirectional per chip (public spec).

Writes SCALING_r04.json. Run on the real chip: python scripts/scaling_model.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, *args, iters=20, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 18)
    p.add_argument("--height", type=int, default=1056)  # 66 tile rows
    p.add_argument("--width", type=int, default=1600)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--work-overhead", type=float, default=1.01)
    p.add_argument("--imbalance", type=float, default=1.07)
    p.add_argument("--ici-gbps", type=float, default=400.0)
    p.add_argument("--out", default="SCALING_r04.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_state
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_state,
    )
    from tinysplat_tpu.train import init_opt_state, make_train_step

    H, W, n = args.height, args.width, args.n
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    cfg = Config(rasterizer=backend, sh_degree=3,
                 dup_capacity=1_280_000, span_capacity=786_432,
                 max_per_tile=2048)
    state = _example_state(n=n, capacity=n, scale_range=(0.002, 0.01))
    opt = init_opt_state(cfg, state)
    cam = orbit_cameras(1, width=W, height=H)[0]
    gt = jnp.zeros((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    def _time_step(step, st, op, *rest, iters):
        # The train steps DONATE state/opt buffers — thread them through.
        out = step(st, op, *rest)
        st, op = out.state, out.opt_state
        jax.block_until_ready(st.params.means)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(st, op, *rest)
            st, op = out.state, out.opt_state
        jax.block_until_ready(st.params.means)
        return (time.perf_counter() - t0) / iters * 1e3

    # 1. plain single-device step
    tstep = make_train_step(cfg, H, W)
    t_plain = _time_step(
        tstep, state, opt, cam.params(), gt, None, jnp.int32(1), key,
        iters=args.iters)
    print(f"t_plain = {t_plain:.1f} ms")

    # 2. sharded step on a REAL 1x1 mesh (machinery overhead A/B)
    mesh = make_mesh(data=1, tile=1)
    state = _example_state(n=n, capacity=n, scale_range=(0.002, 0.01))
    sstate = shard_state(mesh, state)
    sopt = shard_state(mesh, init_opt_state(cfg, state))
    cam_batch = jax.tree.map(lambda x: x[None], cam.params())
    sstep = make_sharded_train_step(cfg, H, W, 1, mesh)
    t_sharded = _time_step(
        sstep, sstate, sopt, cam_batch, gt[None], None, 1, key,
        iters=args.iters)
    print(f"t_sharded_1x1 = {t_sharded:.1f} ms "
          f"(overhead {t_sharded / t_plain:.3f}x)")

    # 3. the replicated per-splat phase: projection + SH eval alone (the
    # same call shape render() uses; see render.py:129-150)
    from tinysplat_tpu.ops.projection import project_gaussians
    from tinysplat_tpu.ops.sh import eval_sh
    from tinysplat_tpu.render import compute_viewdirs

    camera = cam.params()

    def proj_fn(params):
        proj = project_gaussians(
            means=params.means, scales=jnp.exp(params.scales),
            glob_scale=1.0, quats=params.quats, viewmat=camera.viewmat,
            full_projmat=camera.projmat @ camera.viewmat,
            fx=camera.fx, fy=camera.fy,
            cx=W / 2.0 + camera.cx_off, cy=H / 2.0 + camera.cy_off,
            img_height=H, img_width=W)
        viewdirs = compute_viewdirs(params.means, camera)
        rgbs = eval_sh(jnp.int32(3), viewdirs, params.sh_coeffs())
        return proj.xys, proj.depths, proj.radii, proj.conics, rgbs

    pj = jax.jit(proj_fn)
    # fresh params: the step timings above DONATED the earlier buffers
    params = _example_state(n=n, capacity=n, scale_range=(0.002, 0.01)).params
    t_proj = _time(pj, params, iters=args.iters)
    print(f"t_proj = {t_proj:.1f} ms")

    # Predicted efficiency curve
    C = state.params.means.shape[0]
    coll_bytes = 2 * C * 12 * 4  # gather + reduce-scatter transpose, full
    scal = args.work_overhead * args.imbalance
    t_entry = max(t_sharded - t_proj, 0.0)
    pred = {}
    for N in (1, 2, 4, 8, 16):
        t_coll = (coll_bytes * (N - 1) / N) / (args.ici_gbps * 1e9) * 1e3
        s = scal if N > 1 else 1.0  # no bands/imbalance on a 1x1 mesh
        t_n = t_proj + t_entry * s / N + t_coll
        eff = t_plain / (N * t_n)
        pred[str(N)] = {
            "t_step_ms": round(t_n, 2),
            "t_coll_ms": round(t_coll, 4),
            "rays_per_s": round(N * H * W / t_n * 1e3, 0),
            "efficiency_vs_1chip": round(eff, 3),
        }
        print(f"N={N:2d}: T={t_n:7.1f} ms  eff={eff:.3f}")

    out = {
        "metric": "predicted_scaling_efficiency",
        "value": pred["8"]["efficiency_vs_1chip"],
        "unit": "rays/s efficiency at 8 chips vs 1",
        "measured_on_chip": {
            "t_plain_ms": round(t_plain, 2),
            "t_sharded_1x1_ms": round(t_sharded, 2),
            "sharded_machinery_overhead": round(t_sharded / t_plain, 4),
            "t_proj_ms": round(t_proj, 2),
        },
        "virtual_mesh_constants": {
            "work_overhead": args.work_overhead,
            "imbalance_interleaved": args.imbalance,
            "source": "SCALING_r03.json (8-dev CPU mesh, structural)",
        },
        "assumptions": [
            "1xN 'tile' mesh, B=1 camera (pure pixel parallelism)",
            f"ICI {args.ici_gbps} GB/s bidirectional per chip (v5e spec)",
            "collectives NOT overlapped with compute (pessimistic)",
            "projection+SH replicated per band (measured t_proj floor)",
            "per-entry phase scales 1/N x work_overhead x imbalance",
        ],
        "predicted": pred,
        "n_splats": n,
        "resolution": [H, W],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit")}))


if __name__ == "__main__":
    main()
