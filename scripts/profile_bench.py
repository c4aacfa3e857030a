"""Profile the headline bench step on the real chip; print top XLA ops.

Usage: python scripts/profile_bench.py [--n 262144] [--iters 3] [--top 30]
"""
import argparse
import os
import sys

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
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--dup-capacity", type=int, default=1_280_000)
    p.add_argument("--span-capacity", type=int, default=786_432)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--grad-reduce", default="scatter",
                   choices=["scatter", "sorted", "segment"])
    p.add_argument("--tpb", type=int, default=8)
    p.add_argument("--tile-x", type=int, default=0)
    p.add_argument("--logdir", default="/tmp/jtrace")
    args = p.parse_args()

    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.render import render
    from __graft_entry__ import _example_state

    state = _example_state(n=args.n, capacity=args.n, scale_range=(0.002, 0.01))
    cam = orbit_cameras(1, width=args.width, height=args.height)[0].params()
    background = jnp.zeros((3,), jnp.float32)
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"

    def loss_fn(params):
        rgb, extras = render(
            params, state.alive, cam, args.height, args.width,
            active_sh_degree=jnp.int32(3), background=background,
            rasterizer=backend, dup_capacity=args.dup_capacity,
            span_capacity=args.span_capacity, max_per_tile=2048,
            grad_reduce=args.grad_reduce, chunk=args.chunk,
            tiles_per_block=args.tpb, tile_x=args.tile_x,
        )
        return jnp.sum(rgb) + jnp.sum(extras["depth"])

    step = jax.jit(jax.grad(loss_fn))
    g = step(state.params)
    jax.block_until_ready(g)

    import shutil
    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        g = step(state.params)
    jax.block_until_ready(g)
    jax.profiler.stop_trace()

    from tinysplat_tpu.utils.xplane import print_top_ops
    print_top_ops(args.logdir, top=args.top, iters=args.iters)


if __name__ == "__main__":
    main()
