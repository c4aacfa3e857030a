"""Held-out evaluation CLI: checkpoint + dataset -> PSNR/SSIM JSON.

Beyond the reference's tooling (it logs train-view metrics in-loop only,
scripts/train.py:109-119): renders every selected camera from a checkpoint
with one jitted executable per image shape and reports per-view and mean
PSNR/SSIM against ground truth.

Usage:
    # COLMAP dataset, every k-th camera held out (as train.py --eval-holdout):
    python scripts/evaluate.py ckpt.npz --dataset-dir datasets/truck \
        --holdout 8
    # or the synthetic scene used by --synthetic training:
    python scripts/evaluate.py ckpt.npz --synthetic

Prints one JSON line: {"psnr": ..., "ssim": ..., "per_view": [...]}.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))  # for "from train import ..."


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--dataset-dir", default=None)
    p.add_argument("--colmap-path", default=None)
    p.add_argument("--images-path", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--holdout", type=int, default=1,
                   help="evaluate every k-th camera (1 = all)")
    p.add_argument("--rasterizer", default="auto")
    p.add_argument("--max-views", type=int, default=0, help="0 = no cap")
    args = p.parse_args()

    import jax
    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from tinysplat_tpu.io.checkpoint import load_model
    from tinysplat_tpu.ops.ssim import psnr, ssim
    from tinysplat_tpu.render import render

    if args.synthetic:
        # The same self-contained GT scene scripts/train.py --synthetic
        # trains against (one definition, imported from the train CLI).
        from tinysplat_tpu.config import Config
        from train import build_scene

        scene, _, _ = build_scene(Config(synthetic=True))
        cams = scene.cameras
    else:
        from tinysplat_tpu.data.dataset import Dataset

        colmap = args.colmap_path or os.path.join(args.dataset_dir, "sparse", "0")
        images = args.images_path or os.path.join(args.dataset_dir, "images")
        cams = Dataset(colmap, images).cameras

    cams = cams[:: max(args.holdout, 1)]
    if args.max_views:
        cams = cams[: args.max_views]

    state = load_model(args.checkpoint)
    fns = {}

    def frame(cam):
        h, w = cam.height, cam.width
        if (h, w) not in fns:
            @jax.jit
            def f(params, alive, cp):
                rgb, _ = render(params, alive, cp, h, w,
                                jnp.int32(state.active_sh_degree),
                                jnp.zeros(3), rasterizer=args.rasterizer)
                return rgb

            fns[(h, w)] = f
        return fns[(h, w)](state.params, state.alive, cam.params())

    per_view = []
    for cam in cams:
        gt = jnp.asarray(cam.get_original_image((cam.width, cam.height)))
        rgb = frame(cam)
        per_view.append({
            "name": cam.name or f"cam{len(per_view)}",
            "psnr": round(float(psnr(rgb, gt)), 3),
            "ssim": round(float(ssim(rgb, gt)), 4),
        })
    out = {
        "checkpoint": args.checkpoint,
        "views": len(per_view),
        "psnr": round(float(np.mean([v["psnr"] for v in per_view])), 3),
        "ssim": round(float(np.mean([v["ssim"] for v in per_view])), 4),
        "per_view": per_view,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
