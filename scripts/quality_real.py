"""Real-photo end-to-end quality benchmark (VERDICT r4 item 5).

The reference's stated domain is few-view REAL indoor captures
(/root/reference/README.md:3). This runs the complete real-data path on
actual photographs inside the zero-egress sandbox:

  1. generate a dense multi-view capture of real-photograph textures
     (make_real_fixture: grace_hopper.jpg crops on three 3D planes, rendered
     through an OPENCV camera WITH radial/tangential distortion) — every
     observed pixel originates from a real photo;
  2. load it through the production COLMAP loader + undistortion
     (data/colmap.py + data/dataset.py — the path a user's capture takes);
  3. initialize from the SfM points (init_from_pcd), attach
     --regularize-depth maps via DepthEstimator with the offline
     sparse_interp backend (sparse SfM depth densified per view);
  4. train with densification, evaluate held-out PSNR/SSIM.

Writes QUALITY_r05_real.json. Run: python scripts/quality_real.py
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
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--views", type=int, default=28)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--per-plane-points", type=int, default=500)
    p.add_argument("--holdout", type=int, default=7)
    p.add_argument("--capacity", type=int, default=1 << 16)
    p.add_argument("--no-depth-reg", action="store_true")
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--scene-dir", default="/tmp/real_scene")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("quality_real")

    import jax
    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    # --- 1. dense real-photo capture ---------------------------------------
    if not os.path.exists(os.path.join(args.scene_dir, "sparse/0/images.bin")):
        import make_real_fixture

        log.info("generating %d-view %dx%d capture at %s", args.views,
                 args.width, args.height, args.scene_dir)
        make_real_fixture.main(out_root=args.scene_dir, n_views=args.views,
                               width=args.width, height=args.height,
                               per_plane=args.per_plane_points)

    # --- 2. production data path -------------------------------------------
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.dataset import Dataset
    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.scene import Scene
    from tinysplat_tpu.train_loop import Trainer

    dataset = Dataset(os.path.join(args.scene_dir, "sparse/0"),
                      os.path.join(args.scene_dir, "images"),
                      lazy_images=False)
    cams = sorted(dataset.cameras, key=lambda c: c.name)
    train_cams = [c for i, c in enumerate(cams) if i % args.holdout != 0]
    eval_cams = [c for i, c in enumerate(cams) if i % args.holdout == 0]
    W, H = cams[0].width, cams[0].height
    log.info("loaded %d cams (%d train / %d eval) at %dx%d, %d SfM points",
             len(cams), len(train_cams), len(eval_cams), W, H,
             len(dataset.pcd.xyz))

    scene = Scene(train_cams)
    depth_reg = not args.no_depth_reg
    if depth_reg:
        from tinysplat_tpu.depthest import DepthEstimator

        DepthEstimator(scene, pcd=dataset.pcd,
                       depths_path=os.path.join(args.scene_dir, "depths"),
                       model_name="sparse_interp")

    # --- 3. train ------------------------------------------------------------
    state = init_from_pcd(dataset.pcd.xyz, dataset.pcd.colors, sh_degree=3,
                          capacity=args.capacity)
    # background="black", NOT the "random" training default: the capture is
    # a dark room (make_real_fixture renders onto a black backdrop), and
    # random-bg training on a scene with large unfillable black regions
    # forces a fragmented "black curtain" of splats behind the posters —
    # the first r5 run hit exactly that (199k splats, eval stuck at 12.9 dB
    # while train couldn't pass ~16; the round-2 QUALITY "empty sky"
    # lesson). With the GT's true background the loss is fittable.
    cfg = Config(rasterizer="auto", sh_degree=3, max_iter=args.iters,
                 eval_interval=0, densify_end=args.iters * 10 // 15,
                 regularize_depth=depth_reg, background="black")
    trainer = Trainer(cfg, scene, state)
    trainer.eval_cameras = eval_cams

    t0 = time.perf_counter()
    eval_history = []
    while trainer.step < args.iters:
        trainer.run(min(trainer.step + args.eval_every, args.iters))
        ev_i = trainer.evaluate()
        eval_history.append(
            {"step": trainer.step,
             "minutes": round((time.perf_counter() - t0) / 60, 2),
             "psnr": round(ev_i["eval_psnr"], 2)})
    dt = time.perf_counter() - t0

    ev = trainer.evaluate()
    import jax.numpy as jnp

    num_live = int(jax.device_get(
        jnp.sum(trainer.state.alive.astype(jnp.int32))))
    out = {
        "metric": "real_photo_heldout_psnr",
        "value": round(ev["eval_psnr"], 2),
        "unit": "dB",
        "eval_ssim": round(ev["eval_ssim"], 4),
        "data_path": "COLMAP bin + OPENCV undistortion + SfM-point init",
        "depth_reg": depth_reg,
        "depth_model": "sparse_interp" if depth_reg else None,
        "texture_source": "matplotlib grace_hopper.jpg (real photograph)",
        "eval_history": eval_history,
        "iters": args.iters,
        "steps_per_s": round(args.iters / dt, 2),
        "train_minutes": round(dt / 60, 1),
        "num_splats": num_live,
        "views": len(cams),
        "resolution": [H, W],
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
