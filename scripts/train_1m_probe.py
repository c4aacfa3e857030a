"""1M-splat training validation (round-4 VERDICT item 4).

The reference hard-caps models at 1e6 splats
(/root/reference/tinysplat/splatting/model_gaussian.py:145-147). This probe
runs the REAL host training loop (Trainer: budget auto-tuning, densify
cadence, NaN guard, metrics) for a short window at that scale — 1M live
splats from step 0 — and reports: loss trajectory, budget-tuner
convergence (dup/span capacities, zero dropped entries), HBM survival with
Adam + worklists, and steps/s.

Run on the chip: python scripts/train_1m_probe.py [--steps 100]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--height", type=int, default=1056)
    p.add_argument("--width", type=int, default=1600)
    p.add_argument("--cameras", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _example_state
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.render import render
    from tinysplat_tpu.scene import Scene
    from tinysplat_tpu.train_loop import Trainer

    H, W = args.height, args.width
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"

    # 1M-splat model; GT = its own clean render from a second state copy so
    # the loss has signal (the trainee is perturbed).
    gt_state = _example_state(n=args.n, capacity=args.n,
                              scale_range=(0.002, 0.008), seed=0)
    cams = orbit_cameras(args.cameras, width=W, height=H)

    @jax.jit
    def render_gt(cam_params):
        rgb, extras = render(gt_state.params, gt_state.alive, cam_params,
                             H, W, active_sh_degree=jnp.int32(3),
                             background=jnp.zeros(3), rasterizer=backend,
                             dup_capacity=4_000_000,
                             span_capacity=3_200_000, max_per_tile=8192)
        d = extras["binning"]
        return rgb, d["dup_dropped"] + d["tile_dropped"]

    dropped_total = 0
    for cam in cams:
        rgb, dropped = render_gt(cam.params())
        dropped_total += int(jax.device_get(dropped))
        cam._image = np.asarray(jax.device_get(rgb)).astype(np.float32)
    print(f"GT rendered: {dropped_total} dropped entries", flush=True)

    # Trainee: the SAME cloud perturbed (positions jittered) — a realistic
    # late-training state at full scale, not a from-scratch fit.
    state = _example_state(n=args.n, capacity=args.n,
                           scale_range=(0.002, 0.008), seed=0)
    import dataclasses
    key = jax.random.PRNGKey(7)
    state = dataclasses.replace(
        state, params=dataclasses.replace(
            state.params,
            means=state.params.means
            + 0.003 * jax.random.normal(key, state.params.means.shape)))

    # warmup_densify > steps: fixed 1M capacity (the cap is the test).
    cfg = Config(rasterizer=backend, sh_degree=3, max_iter=args.steps,
                 eval_interval=0, warmup_densify=args.steps + 1)
    trainer = Trainer(cfg, Scene(cams), state)
    trainer.eval_cameras = cams[:1]

    ev0 = trainer.evaluate()
    t0 = time.perf_counter()
    trainer.run(args.steps)
    dt = time.perf_counter() - t0
    ev1 = trainer.evaluate()
    diag = trainer._last_diag
    diag = [int(jax.device_get(x)) for x in diag] if diag else [-1, -1, -1]
    out = {
        "metric": "train_1m_probe",
        "value": round(args.steps / dt, 3),
        "unit": "steps/s at 1M live splats",
        "n_splats": args.n,
        "steps": args.steps,
        "psnr_start": round(float(ev0["eval_psnr"]), 2),
        "psnr_end": round(float(ev1["eval_psnr"]), 2),
        "n_intersections": diag[0],
        "dup_dropped": diag[1],
        "tile_dropped": diag[2],
        "tuned_budgets": {"dup_capacity": int(trainer.cfg.dup_capacity),
                          "span_capacity": int(trainer.cfg.span_capacity),
                          "max_per_tile": int(trainer.cfg.max_per_tile)},
        "resolution": [H, W],
        "gt_dropped": dropped_total,
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
