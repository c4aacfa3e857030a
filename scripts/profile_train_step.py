"""Profile the FULL train step (render + L1/SSIM + Adam + densify stats)
on the real chip and print the top XLA ops — the render fwd+bwd is covered
by profile_bench.py; this isolates the ~`train_step_ms - render_ms` gap
(loss stack, optimizer, gradient accumulators).

Usage: python scripts/profile_train_step.py [--n 262144] [--top 30]
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
    p.add_argument("--logdir", default="/tmp/jtrace_step")
    args = p.parse_args()

    from tinysplat_tpu.config import Config
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.train import init_opt_state, make_train_step
    from __graft_entry__ import _example_state

    H, W = args.height, args.width
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"
    scale = args.n / (1 << 18)
    cfg = Config(rasterizer=backend, sh_degree=3,
                 dup_capacity=int(760_000 * scale),
                 span_capacity=int(786_432 * scale), max_per_tile=4096)
    state = _example_state(n=args.n, capacity=args.n,
                           scale_range=(0.002, 0.01))
    opt = init_opt_state(cfg, state)
    cam = orbit_cameras(1, width=W, height=H)[0].params()
    gt = jnp.zeros((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    tstep = make_train_step(cfg, H, W)
    st, cur = state, opt
    out = tstep(st, cur, cam, gt, None, jnp.int32(0), key)
    st, cur = out.state, out.opt_state
    jax.block_until_ready(st.params.means)

    import shutil
    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    for i in range(args.iters):
        out = tstep(st, cur, cam, gt, None, jnp.int32(i + 1), key)
        st, cur = out.state, out.opt_state
    jax.block_until_ready(st.params.means)
    jax.profiler.stop_trace()

    from tinysplat_tpu.utils.xplane import print_top_ops
    print_top_ops(args.logdir, top=args.top, iters=args.iters)


if __name__ == "__main__":
    main()
