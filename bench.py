"""Headline benchmark: differentiable rasterization throughput on one chip.

Measures the full forward+backward render path (EWA projection -> SH ->
tile binning -> fused RGB+D compositing -> analytic backward to means /
scales / quats / SH coeffs / opacities) — the work gsplat's CUDA kernels do
for the reference (BASELINE.json "metric": fwd+bwd Msplats/s/chip).

Scene: synthetic Gaussian cloud (BASELINE.json configs[0] scaled up), one
orbit camera, 1066x1600 render (Tanks&Temples Truck-like resolution). Splat
scales are sized so the 3-sigma screen radii land in the ~3-16 px range a
*trained* 3DGS scene exhibits (~4-12 tile hits per splat), so the measured
work per splat matches real training, not a pathological all-giant-splat
cloud.

Prints the headline JSON line immediately after the fwd+bwd timing loop
(crash/timeout-proof), then a final line with the same headline fields plus
the full-train-step numbers. vs_baseline is measured against an estimated 25
Msplats/s fwd+bwd for the reference's gsplat CUDA path on a consumer GPU at
this scene size (the reference publishes no numbers — BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _fail_fast_if_tpu_relay_dead() -> None:
    """Refuse to hang: initializing the axon TPU backend blocks forever when
    the local relay is down (NOTES.md Gotchas). Probe the relay socket BEFORE
    importing/initializing jax; exit with a diagnostic instead of hanging.
    """
    if os.environ.get("PALLAS_AXON_POOL_IPS") is None:
        return  # not routed through the axon relay (e.g. CPU run)
    import socket

    for port in (8082, 8083):
        s = socket.socket()
        s.settimeout(3)
        try:
            s.connect(("127.0.0.1", port))
            return  # relay alive
        except OSError:
            continue
        finally:
            s.close()
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_throughput",
        "error": "axon TPU relay unreachable (127.0.0.1:8082/8083 refused); "
                 "bench requires the chip — refusing to hang in backend init",
    }))
    sys.exit(1)


_fail_fast_if_tpu_relay_dead()

import jax
import jax.numpy as jnp

# Persist compiled executables across invocations (VERDICT r4 weak #1: a cold
# run spends ~17 min compiling over the axon relay BEFORE printing anything,
# and the driver's timeout ate round 4's headline artifact). The env var is
# dead here — sitecustomize imports jax at interpreter startup — so this MUST
# go through the config API (NOTES.md Gotchas).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.join(os.path.dirname(
                                     os.path.abspath(__file__)),
                                     ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_MSPLATS_S = 25.0


def main(n_splats: int = 1 << 18, height: int = 1066, width: int = 1600,
         iters: int = 30, warmup: int = 5, grad_reduce: str = "scatter",
         tiles_per_block: int = 8, tile_x: int = 64,
         dup_capacity: int = 0, span_capacity: int = 0,
         chunk: int = 128, headline_only: bool = False) -> None:
    from tinysplat_tpu.data.synthetic import orbit_cameras
    from tinysplat_tpu.render import render
    from __graft_entry__ import _example_state

    # 3-sigma radius in px ~= 3 * scale * focal / depth; with focal ~1656 px
    # and depth ~3 this range gives ~3-16 px radii (see module docstring).
    state = _example_state(n=n_splats, capacity=n_splats, scale_range=(0.002, 0.01))
    cam = orbit_cameras(1, width=width, height=height)[0].params()
    background = jnp.zeros((3,), jnp.float32)
    backend = "pallas" if jax.default_backend() == "tpu" else "tiled"

    # Tuned from measured diagnostics at the default scene size (exact
    # ellipse cull leaves ~660k intersections at 64x16 tiles — round-4 diag;
    # ~560k row spans) with >=1.1x headroom and ZERO dropped entries — the
    # per-entry glue (attr gather, grad reduction, kernel windows, sorts)
    # all scales with these static sizes, and the per-INDEX-bound gradient
    # scatter scales with the CAPACITY, so oversizing is a direct tax.
    # Other scene sizes scale linearly (intersections are ~per-splat).
    scale = n_splats / (1 << 18)
    dup_capacity = dup_capacity or int(760_000 * scale)
    span_capacity = span_capacity or int(786_432 * scale)

    def loss_fn(params):
        rgb, extras = render(
            params, state.alive, cam, height, width,
            active_sh_degree=jnp.int32(3), background=background,
            rasterizer=backend,
            # max_per_tile keeps every intersection (gsplat has no per-tile
            # cap; tile_dropped stays 0 at this scene size).
            dup_capacity=dup_capacity,
            span_capacity=span_capacity,
            max_per_tile=4096,
            grad_reduce=grad_reduce,
            tiles_per_block=tiles_per_block,
            tile_x=tile_x,
            chunk=chunk,
        )
        return jnp.sum(rgb) + jnp.sum(extras["depth"])

    step = jax.jit(jax.grad(loss_fn))

    grads = None
    for _ in range(warmup):
        grads = step(state.params)
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(iters):
        grads = step(state.params)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    msplats_s = n_splats * iters / dt / 1e6

    # Emit the headline NOW (flushed), before the full-train-step section:
    # if the driver's timeout fires during the second compile, this line is
    # still the round's artifact (VERDICT r4 "Next round" item 1).
    headline = {
        "metric": "rasterize_fwd_bwd_throughput",
        "value": round(msplats_s, 3),
        "unit": "Msplats/s",
        "vs_baseline": round(msplats_s / BASELINE_MSPLATS_S, 3),
        "n_splats": n_splats,
        "resolution": [height, width],
        "config": {"tile_x": tile_x, "grad_reduce": grad_reduce, "chunk": chunk,
                   "tiles_per_block": tiles_per_block,
                   "dup_capacity": dup_capacity,
                   "span_capacity": span_capacity},
    }
    print(json.dumps(headline), flush=True)
    if headline_only:  # A/B probes: skip the train-step section's compile
        return

    # Secondary: the FULL training step (render + L1/SSIM loss + Adam +
    # densify accumulator) — the number a user's wall clock sees — and the
    # rays/s (pixels per second) figure the >=85% scaling-efficiency bar in
    # BASELINE.json is defined over (VERDICT r1 items 5/7).
    from tinysplat_tpu.config import Config
    from tinysplat_tpu.train import init_opt_state, make_train_step

    cfg = Config(rasterizer=backend, sh_degree=3,
                 dup_capacity=dup_capacity, span_capacity=span_capacity,
                 max_per_tile=4096, tile_x=tile_x,
                 grad_reduce=grad_reduce, tiles_per_block=tiles_per_block)
    tstep = make_train_step(cfg, height, width)
    opt = init_opt_state(cfg, state)
    gt = jnp.zeros((height, width, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    st, cur = state, opt
    out = tstep(st, cur, cam, gt, None, jnp.int32(0), key)
    st, cur = out.state, out.opt_state
    jax.block_until_ready(st.params.means)
    t0 = time.perf_counter()
    full_iters = max(iters // 2, 5)
    for i in range(full_iters):
        out = tstep(st, cur, cam, gt, None, jnp.int32(i + 1), key)
        st, cur = out.state, out.opt_state
    jax.block_until_ready(st.params.means)
    dt_full = time.perf_counter() - t0
    steps_s = full_iters / dt_full
    rays_s = steps_s * height * width

    # Final line repeats the headline plus the train-step numbers, so a
    # last-line parser sees the complete record and a timeout still leaves
    # the first line standing.
    print(json.dumps({
        **headline,
        "train_step_ms": round(1000.0 / steps_s, 1),
        "train_steps_per_s": round(steps_s, 2),
        "rays_per_s": round(rays_s, 0),
    }), flush=True)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 18)
    p.add_argument("--height", type=int, default=1066)
    p.add_argument("--width", type=int, default=1600)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--grad-reduce", default="scatter",
                   choices=["scatter", "sorted", "segment", "mxu"])
    p.add_argument("--tpb", type=int, default=8, help="tiles per Pallas block")
    p.add_argument("--tile-x", type=int, default=64,
                   help="Pallas tile width px (height fixed 16)")
    p.add_argument("--dup-capacity", type=int, default=0,
                   help="0 = auto-scale the tuned default with --n")
    p.add_argument("--span-capacity", type=int, default=0)
    p.add_argument("--chunk", type=int, default=128, help="pallas DMA window")
    p.add_argument("--headline-only", action="store_true")
    args = p.parse_args()
    main(args.n, args.height, args.width, args.iters,
         grad_reduce=args.grad_reduce, tiles_per_block=args.tpb,
         tile_x=args.tile_x, dup_capacity=args.dup_capacity,
         span_capacity=args.span_capacity, chunk=args.chunk,
         headline_only=args.headline_only)
