"""Few-view A/B: --regularize-diffusion on vs off (VERDICT r4 item 8).

Trains the SAME few-view scene twice from the same seed — once plain, once
with diffusion-guided novel-view regularization using the in-sandbox-trained
prior (scripts/train_diffusion_prior.py) — and reports held-out PSNR/SSIM
for both arms. This is the efficacy evidence the reference never produced
(its diffusion module is never imported by training;
/root/reference/README.md:14 calls the feature "upcoming").

Run after train_diffusion_prior.py:
  python scripts/diffusion_ab.py --prior-dir /tmp/diffusion_prior
Writes DIFFUSION_AB_r05.json.
"""
import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prior-dir", default="/tmp/diffusion_prior")
    p.add_argument("--iters", type=int, default=2500)
    p.add_argument("--train-views", type=int, default=6)
    p.add_argument("--eval-views", type=int, default=6)
    p.add_argument("--size", type=int, default=128,
                   help="image side; must equal the prior's image size")
    p.add_argument("--init-points", type=int, default=4000)
    p.add_argument("--capacity", type=int, default=1 << 15)
    p.add_argument("--lambda-diffusion", type=float, default=0.5)
    p.add_argument("--diffusion-start", type=int, default=600)
    p.add_argument("--out", default="DIFFUSION_AB_r05.json")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("diffusion_ab")

    import dataclasses

    import jax
    import jax.numpy as jnp

    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from quality_bench import make_gt_scene
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.render import render
    from tinysplat_tpu.scene import Scene
    from tinysplat_tpu.train_loop import Trainer

    S = args.size
    rng = np.random.default_rng(args.seed)
    means, log_scales, quats, colors, opac = make_gt_scene(
        n_clusters=40, per_cluster=400, seed=args.seed)
    n = len(means)
    gt_state = init_from_pcd(means, colors * 255.0, sh_degree=1, capacity=n)
    gt_state = dataclasses.replace(gt_state, params=dataclasses.replace(
        gt_state.params, scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats), opacities=jnp.asarray(opac)))
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"

    @jax.jit
    def render_view(cp):
        rgb, _ = render(gt_state.params, gt_state.alive, cp, S, S,
                        active_sh_degree=jnp.int32(1),
                        background=jnp.zeros(3), rasterizer=backend,
                        dup_capacity=24 * n, span_capacity=10 * n,
                        max_per_tile=16384)
        return rgb

    total = args.train_views + args.eval_views
    cams = orbit_cameras(total, width=S, height=S, radius=3.2, fov=0.9)
    for c in cams:
        c._image = np.asarray(jax.device_get(render_view(c.params()))
                              ).astype(np.float32)
    train_cams = cams[0::2][: args.train_views]
    eval_cams = cams[1::2][: args.eval_views]

    lo, hi = means.min(axis=0), means.max(axis=0)
    init_xyz = rng.uniform(lo, hi, size=(args.init_points, 3)).astype(
        np.float32)
    init_rgb = rng.uniform(0.2, 0.8, size=(args.init_points, 3))

    def run_arm(use_diffusion: bool):
        state = init_from_pcd(init_xyz, init_rgb * 255.0, sh_degree=2,
                              capacity=args.capacity, seed=args.seed)
        cfg = Config(
            rasterizer="auto", sh_degree=2, max_iter=args.iters,
            eval_interval=0, densify_end=args.iters * 10 // 15,
            regularize_diffusion=use_diffusion,
            diffusion_model_dir=args.prior_dir if use_diffusion else "",
            lambda_diffusion=args.lambda_diffusion,
            regularize_diffusion_start=args.diffusion_start,
            regularize_diffusion_end=args.iters * 10 // 12,
            interval_diffusion=400,
        )
        trainer = Trainer(cfg, Scene(list(train_cams), seed=args.seed), state)
        trainer.eval_cameras = list(eval_cams)
        t0 = time.perf_counter()
        trainer.run(args.iters)
        ev = trainer.evaluate()
        return {"eval_psnr": round(ev["eval_psnr"], 2),
                "eval_ssim": round(ev["eval_ssim"], 4),
                "train_minutes": round((time.perf_counter() - t0) / 60, 1)}

    log.info("arm A: plain few-view (%d train views)", len(train_cams))
    plain = run_arm(False)
    log.info("arm A: %s", plain)
    log.info("arm B: --regularize-diffusion with prior %s", args.prior_dir)
    guided = run_arm(True)
    log.info("arm B: %s", guided)

    out = {
        "metric": "diffusion_guidance_psnr_delta",
        "value": round(guided["eval_psnr"] - plain["eval_psnr"], 2),
        "unit": "dB (guided - plain, held-out)",
        "plain": plain,
        "guided": guided,
        "prior_dir": args.prior_dir,
        "train_views": len(train_cams),
        "eval_views": len(eval_cams),
        "iters": args.iters,
        "resolution": [S, S],
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
