"""Sweep rasterizer tuning knobs on the chip; print one JSON line per config.

Times ONLY the differentiable render (fwd+bwd) — the bench.py headline
metric — for a grid of (grad_reduce, tiles_per_block, chunk) configs in one
process (compile cache amortizes across configs).

Usage: python scripts/sweep_bench.py --configs sorted:8:128 segment:8:128 ...
       (each config is grad_reduce:tpb:chunk)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from tinysplat_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 18)
    p.add_argument("--height", type=int, default=1066)
    p.add_argument("--width", type=int, default=1600)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--configs", nargs="+",
                   default=["sorted:8:128", "segment:8:128", "scatter:8:128"])
    p.add_argument("--dup-capacity", type=int, default=1_280_000)
    p.add_argument("--span-capacity", type=int, default=786_432)
    p.add_argument("--diag", action="store_true",
                   help="print intersection/span diagnostics per config")
    args = p.parse_args()

    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.render import render
    from __graft_entry__ import _example_state

    state = _example_state(n=args.n, capacity=args.n,
                           scale_range=(0.002, 0.01))
    cam = orbit_cameras(1, width=args.width, height=args.height)[0].params()
    background = jnp.zeros((3,), jnp.float32)
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"

    for cfg in args.configs:
        parts = cfg.split(":")
        gr, tpb, chunk = parts[0], int(parts[1]), int(parts[2])
        tile_x = int(parts[3]) if len(parts) > 3 else 0

        def loss_fn(params):
            rgb, extras = render(
                params, state.alive, cam, args.height, args.width,
                active_sh_degree=jnp.int32(3), background=background,
                rasterizer=backend, dup_capacity=args.dup_capacity,
                span_capacity=args.span_capacity, max_per_tile=4096,
                grad_reduce=gr, chunk=chunk, tiles_per_block=tpb,
                tile_x=tile_x,
            )
            if args.diag:
                d = extras["binning"]
                return jnp.sum(rgb) + jnp.sum(extras["depth"]), d
            return jnp.sum(rgb) + jnp.sum(extras["depth"])

        step = jax.jit(jax.grad(loss_fn, has_aux=args.diag))
        try:
            if args.diag:
                _, d = step(state.params)
                print(json.dumps({
                    "config": cfg,
                    "diag": {k: int(v) for k, v in jax.device_get(d).items()},
                }), flush=True)
                continue
            g = step(state.params)
            jax.block_until_ready(g)
            for _ in range(args.warmup):
                g = step(state.params)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                g = step(state.params)
            jax.block_until_ready(g)
            dt = time.perf_counter() - t0
            ms = dt / args.iters * 1000.0
            print(json.dumps({
                "config": cfg, "ms_per_iter": round(ms, 2),
                "msplats_s": round(args.n * args.iters / dt / 1e6, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "config": cfg,
                "error": str(e).splitlines()[0][:200],
            }), flush=True)


if __name__ == "__main__":
    main()
