"""Measure per-pass VPU op costs on (128, 256) f32 tiles inside Pallas.

Calibrates the backward-kernel cost model: how many multiply-equivalents do
exp / log2 / exp2 / divide / compare+select cost on this chip? Each probe
kernel runs ITERS dependent iterations of the op over a VMEM-resident
(128, 256) tile, with 4 independent chains to fill the VPU pipeline.

Run on the chip: python scripts/probe_vpu_costs.py
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

S = 128
L = int(__import__("os").environ.get("PROBE_LANES", "256"))
ITERS = 512
CHAINS = 4


def _probe_kernel(op, x_ref, o_ref):
    xs = [x_ref[...] * (1.0 + 0.001 * i) for i in range(CHAINS)]

    def body(i, xs):
        return tuple(op(x, i) for x in xs)

    xs = jax.lax.fori_loop(0, ITERS, body, tuple(xs))
    o_ref[...] = sum(xs)


OPS = {
    # Baseline: one fused multiply-add pass.
    "fma": lambda x, i: x * 1.000001 + 1e-8,
    "mul2": lambda x, i: (x * 1.000001) * 0.999999,
    "exp": lambda x, i: jnp.exp(-jnp.abs(x) * 1e-6),
    "exp2": lambda x, i: jnp.exp2(-jnp.abs(x) * 1e-6),
    "log2": lambda x, i: jnp.log2(jnp.abs(x) + 1.0),
    "div": lambda x, i: x / (jnp.abs(x) + 1.0),
    "recip": lambda x, i: 1.0 / (jnp.abs(x) + 1.0),
    "cmp_sel": lambda x, i: jnp.where(x > 0.5, x * 0.999, x + 1e-7),
    "min": lambda x, i: jnp.minimum(x * 1.000001, 2.0),
    "bf16_split": lambda x, i: (
        x.astype(jnp.bfloat16).astype(jnp.float32) * 1.000001
        + 1e-8 * (x - x.astype(jnp.bfloat16).astype(jnp.float32))
    ),
    # Matmul pass-cost ladder: (S,S)x(S,L) triangular contraction at the
    # three lowerable precisions plus the manual exact-lhs bf16 2-pass
    # (rasterize_pallas._dot) — calibrates what the global 'highest'
    # config costs the kernels vs DEFAULT and the manual decomposition.
    "tri_matmul": None,
    "tri_highest": None,
    "tri_x2_manual": None,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timing-iters", type=int, default=30)
    args = p.parse_args()
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()}")
    x0 = jnp.linspace(0.1, 1.9, S * L, dtype=jnp.float32).reshape(S, L)

    def _tri_kern(mode, x_ref, o_ref):
        tri = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
               <= jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
               ).astype(jnp.float32)

        def mm(x):
            if mode == "x2":
                t16 = tri.astype(jnp.bfloat16)
                hi = x.astype(jnp.bfloat16)
                lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                d = lambda v: jax.lax.dot_general(
                    t16, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                return d(hi) + d(lo)
            prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                    else jax.lax.Precision.DEFAULT)
            return jax.lax.dot_general(
                tri, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        def body(i, x):
            return mm(x) * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, ITERS, body, x_ref[...])

    results = {}
    for name, op in OPS.items():
        if name.startswith("tri_"):
            mode = {"tri_matmul": "default", "tri_highest": "highest",
                    "tri_x2_manual": "x2"}[name]
            kern = functools.partial(_tri_kern, mode)
        else:
            kern = functools.partial(_probe_kernel, op)
        fn = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            interpret=interpret))
        out = fn(x0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.timing_iters):
            out = fn(x0)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        chains = 1 if name.startswith("tri_") else CHAINS
        ns_per_pass = dt / args.timing_iters / (ITERS * chains) * 1e9
        results[name] = ns_per_pass
        rel = ns_per_pass / results.get("fma", ns_per_pass)
        print(f"{name:10s}: {ns_per_pass:8.1f} ns/pass  ({rel:.1f}x fma)")


if __name__ == "__main__":
    main()
