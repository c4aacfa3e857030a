"""Render a camera path from a checkpoint to image frames (turntable CLI).

Beyond the reference's tooling (it ships only train/export CLIs,
/root/reference/scripts/): renders an orbit (turntable) path around the
model from a `.npz` checkpoint with ONE jitted executable reused across
frames — the pattern that makes tunneled-TPU rendering interactive
(NOTES.md viewer gotcha).

Usage:
    python scripts/render_path.py ckpt.npz outdir/ --frames 120 \
        --width 800 --height 600 [--radius 3.2] [--rasterizer auto]

Writes outdir/frame_0000.png ... ; assemble with ffmpeg if desired.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("outdir")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--radius", type=float, default=3.0)
    p.add_argument("--fov", type=float, default=0.9)
    p.add_argument("--rasterizer", default="auto")
    p.add_argument("--sh-degree", type=int, default=-1,
                   help="-1 = the checkpoint's full degree")
    p.add_argument("--background", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    args = p.parse_args()

    import jax
    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.io.checkpoint import load_model
    from tinysplat_tpu.render import render

    state = load_model(args.checkpoint)
    deg = state.active_sh_degree if args.sh_degree < 0 else args.sh_degree
    H, W = args.height, args.width
    bg = jnp.asarray(args.background, jnp.float32)

    @jax.jit
    def frame(params, alive, cam_params):
        rgb, extras = render(
            params, alive, cam_params, H, W, jnp.int32(deg), bg,
            rasterizer=args.rasterizer,
        )
        return rgb, extras["alpha"]

    cams = orbit_cameras(args.frames, width=W, height=H, radius=args.radius,
                         fov=args.fov)
    os.makedirs(args.outdir, exist_ok=True)
    from PIL import Image

    for i, cam in enumerate(cams):
        rgb, _ = frame(state.params, state.alive, cam.params())
        arr = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(args.outdir, f"frame_{i:04d}.png"))
        if (i + 1) % 10 == 0 or i == len(cams) - 1:
            print(f"rendered {i + 1}/{len(cams)}", flush=True)


if __name__ == "__main__":
    main()
