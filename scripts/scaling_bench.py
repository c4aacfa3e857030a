"""Scaling-structure measurement on the virtual CPU mesh (VERDICT r2 item 5).

The analytic ICI model (NOTES.md) says collective volume is ~0.5 ms of a
>=100 ms step at 1M splats — bandwidth-safe by orders of magnitude. The two
risks it CANNOT see are (a) per-band load imbalance (dense tiles cluster in
few bands) and (b) per-band replicated binning work. This script puts
numbers on both at a realistic scene scale, without TPU hardware:

1. Per-band intersection spread: project the quality-bench GT scene
   (clustered shells + slab + dome, the distribution a trained scene has)
   from orbit cameras and bin each horizontal band exactly as the sharded
   step does. max/mean over bands IS the band imbalance factor — the
   worst band sets the step time on a real slice.
2. Sharded-step total-work overhead: time the (data x tile) sharded train
   step vs (1,1) x batch on virtual CPU devices. Virtual devices timeshare
   the host's core(s), so speedup is meaningless; TOTAL work
   (t_sharded / (t_1dev * batch)) isolates replicated binning + imbalance.

Writes SCALING_r03.json. Run: python scripts/scaling_bench.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force a virtual CPU mesh BEFORE jax initializes (sitecustomize registers
# the TPU plugin; see __graft_entry__.dryrun_multichip for the recipe).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--cameras", type=int, default=4)
    p.add_argument("--out", default="SCALING_r03.json")
    args = p.parse_args()

    import jax
    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < args.devices:
        from jax.extend import backend as _jax_backend

        _jax_backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", args.devices)
        jax.clear_caches()

    import jax.numpy as jnp
    from quality_bench import make_gt_scene
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.ops.binning import bin_splats_dense
    from tinysplat_tpu.ops.projection import project_gaussians
    from tinysplat_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_state)
    from tinysplat_tpu.train import init_opt_state

    H, W = args.height, args.width
    n_tile = 4
    n_data = args.devices // n_tile
    Hl = H // n_tile

    # --- 1. per-band intersection spread at realistic scale ----------------
    import dataclasses

    means, log_scales, quats, colors, opac = make_gt_scene(
        n_clusters=40, per_cluster=400, seed=0)
    n = len(means)
    st = init_from_pcd(means, colors * 255.0, sh_degree=1, capacity=n)
    st = dataclasses.replace(st, params=dataclasses.replace(
        st.params, scales=jnp.asarray(log_scales), quats=jnp.asarray(quats),
        opacities=jnp.asarray(opac)))
    cams = orbit_cameras(args.cameras, width=W, height=H, radius=3.2, fov=0.9)

    @jax.jit
    def band_counts(cam):
        proj = project_gaussians(
            means=st.params.means, scales=jnp.exp(st.params.scales),
            glob_scale=1.0, quats=st.params.quats, viewmat=cam.viewmat,
            full_projmat=cam.projmat @ cam.viewmat, fx=cam.fx, fy=cam.fy,
            cx=W / 2.0, cy=H / 2.0, img_height=H, img_width=W, tile_size=16)
        opacs = jax.nn.sigmoid(st.params.opacities.reshape(-1))
        contig, inter = [], []
        for b in range(n_tile):
            # Contiguous band b: rows [b*Hl, (b+1)*Hl), band-local coords.
            shift = jnp.asarray([0.0, b * Hl], jnp.float32)
            bins = bin_splats_dense(
                proj.xys - shift, proj.depths, proj.radii,
                proj.valid & st.alive, W // 16, Hl // 16, 16,
                dup_capacity=16 * n, conics=proj.conics, opacities=opacs)
            contig.append(bins.total_intersections)
            # Interleaved band b (cfg.band_interleave default): global tile
            # rows {b, b + n_tile, ...} via the strided grid.
            bins_i = bin_splats_dense(
                proj.xys, proj.depths, proj.radii,
                proj.valid & st.alive, W // 16, Hl // 16, 16,
                dup_capacity=16 * n, conics=proj.conics, opacities=opacs,
                row_stride=n_tile, row_offset=b)
            inter.append(bins_i.total_intersections)
        return jnp.stack(contig), jnp.stack(inter)

    both = [jax.device_get(band_counts(c.params())) for c in cams]

    def spread(idx):
        per_band = np.stack([np.asarray(b[idx]) for b in both])
        mean = float(per_band.mean())
        mx = float(per_band.max(axis=1).mean())  # mean over cams of max band
        return mean, mx, mx / max(mean, 1.0)

    band_mean, band_max, imbalance = spread(0)
    _, band_max_i, imbalance_i = spread(1)

    # --- 2. sharded-step total-work overhead ------------------------------
    cfg = Config(rasterizer="tiled", sh_degree=1)
    state = init_from_pcd(means[: 1 << 14], colors[: 1 << 14] * 255.0,
                          sh_degree=1, capacity=1 << 14)

    def timed_step(mesh, B):
        s = shard_state(mesh, state)
        o = shard_state(mesh, init_opt_state(cfg, s))
        cb = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[c.params() for c in cams[:B]])
        rng = np.random.default_rng(0)
        gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        ed = jnp.zeros((B, H, W), jnp.float32)
        fn = make_sharded_train_step(cfg, H, W, B, mesh)
        # state/opt are donated by the jitted step — rebind each call.
        out = fn(s, o, cb, gt, ed, 0, jax.random.PRNGKey(0))
        s, o = out.state, out.opt_state
        jax.block_until_ready(out.metrics["loss"])
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = fn(s, o, cb, gt, ed, 0, jax.random.PRNGKey(0))
            s, o = out.state, out.opt_state
        jax.block_until_ready(out.metrics["loss"])
        return (time.perf_counter() - t0) / iters

    B = n_data
    t_n = timed_step(make_mesh(data=n_data, tile=n_tile), B)
    t_1 = timed_step(make_mesh(data=1, tile=1), 1)
    overhead = t_n / max(t_1 * B, 1e-9)

    out = {
        "metric": "scaling_structure",
        "devices": args.devices,
        "mesh": [n_data, n_tile],
        "resolution": [H, W],
        "scene_splats": n,
        "band_intersections_mean": round(band_mean),
        "band_intersections_max_over_cams": round(band_max),
        "band_imbalance_factor": round(imbalance, 2),
        "band_intersections_max_interleaved": round(band_max_i),
        "band_imbalance_factor_interleaved": round(imbalance_i, 2),
        "note_imbalance": "max-band/mean-band intersections; the worst band "
                          "bounds real-slice step time at this mesh shape. "
                          "_interleaved = cfg.band_interleave (default on): "
                          "16px tile rows round-robined over bands",
        "step_ms_1dev_x_batch": round(t_1 * B * 1e3, 1),
        "step_ms_sharded": round(t_n * 1e3, 1),
        "sharded_work_overhead": round(overhead, 2),
        "note_overhead": "virtual CPU devices timeshare the host core; "
                         "total-work ratio isolates replicated binning + "
                         "imbalance (1.0 = none), not ICI",
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
