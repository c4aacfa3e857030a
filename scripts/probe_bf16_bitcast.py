"""Probe: can Mosaic reconstruct f32 from bf16 lane PAIRS inside a kernel?

Gates the bf16-attr-window idea (NOTES.md round-3 perf state): the Pallas
worklist DMA row is 512 B because of the 128-lane f32 pad (real data 64 B).
An all-bf16 window would halve it to 256 B/row — but xy/conic must stay
bit-exact f32, so they'd ride as two bf16 lanes per value and be
reconstructed in-kernel. That only works if Mosaic lowers a lane-axis
pair-to-f32 bitcast. This probe tries the candidate lowerings on whatever
backend is active and prints which are exact.

Variants:
  A. reshape (S, 2L) -> (S, L, 2) + lax.bitcast_convert_type -> f32 (S, L)
  B. strided lane slices x[:, 0::2] / x[:, 1::2], bitcast bf16->u16,
     widen to u32, (hi << 16) | lo, bitcast -> f32
  C. contiguous halves (lo lanes | hi lanes) instead of interleaved pairs,
     same integer reconstruction as B  (layout we'd actually use: the
     packer controls lane placement, so halves are as good as pairs)
  D. the NaN-safe design: the window is typed uint16 end-to-end (integer
     lanes are never canonicalized), f32 reconstructed from u16 halves and
     color lanes bitcast u16 -> bf16 in-kernel.

CPU finding (exactness, interpret mode): A and B exact, C NOT exact — f32
mantissa bits that happen to form bf16 NaN patterns get QUIETED somewhere
in the bf16-typed path (0x7fb1 -> 0x7fc0). A bf16-typed window is therefore
unsafe for bit-exact xy/conic transport regardless of what Mosaic lowers;
variant D is the only sound layout.

Run on the chip:  python scripts/probe_bf16_bitcast.py
CPU check (interpret=True semantics only):  without PALLAS_AXON_POOL_IPS.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

S, L = 8, 128  # sublanes x f32 lanes; bf16 input has 2L lanes


def _kernel_a(x_ref, o_ref):
    x = x_ref[...]  # (S, 2L) bf16, interleaved pairs (lo, hi) per f32
    o_ref[...] = jax.lax.bitcast_convert_type(
        x.reshape(S, L, 2), jnp.float32)


def _kernel_b(x_ref, o_ref):
    x = x_ref[...]  # (S, 2L) bf16, interleaved pairs
    lo = jax.lax.bitcast_convert_type(x[:, 0::2], jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(x[:, 1::2], jnp.uint16).astype(jnp.uint32)
    o_ref[...] = jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _kernel_c(x_ref, o_ref):
    x = x_ref[...]  # (S, 2L) bf16, contiguous halves: lanes [0:L)=lo, [L:2L)=hi
    lo = jax.lax.bitcast_convert_type(x[:, :L], jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(x[:, L:], jnp.uint16).astype(jnp.uint32)
    o_ref[...] = jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _kernel_d(x_ref, o_ref, c_ref):
    x = x_ref[...]  # (S, 2L) uint16: lanes [0:L)=f32-lo, [L:3L/2)=bf16 colors
    lo = x[:, :L].astype(jnp.uint32)
    hi = x[:, L:].astype(jnp.uint32)  # reuse hi lanes as both hi16 and colors
    o_ref[...] = jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)
    c_ref[...] = jax.lax.bitcast_convert_type(x[:, L:], jnp.bfloat16)


def _kernel_e(x_ref, o_ref):
    """Reverse direction (grad-output pack): f32 -> u16 lo/hi halves."""
    x = x_ref[...]  # (S, L) f32
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    hi = (u >> 16).astype(jnp.uint16)
    o_ref[...] = jnp.concatenate([lo, hi], axis=1)  # (S, 2L) u16


def main():
    rng = np.random.default_rng(0)
    f32 = (rng.normal(size=(S, L)).astype(np.float32)
           * np.exp2(rng.integers(-20, 20, size=(S, L))).astype(np.float32))
    u32 = f32.view(np.uint32)
    lo16 = (u32 & 0xFFFF).astype(np.uint16)
    hi16 = (u32 >> 16).astype(np.uint16)

    pairs = np.empty((S, 2 * L), np.uint16)
    pairs[:, 0::2], pairs[:, 1::2] = lo16, hi16
    halves = np.concatenate([lo16, hi16], axis=1)

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} interpret={interpret}")
    for name, kern, inp in (("A reshape+bitcast", _kernel_a, pairs),
                            ("B strided pairs  ", _kernel_b, pairs),
                            ("C packed halves  ", _kernel_c, halves)):
        x = jnp.asarray(inp.view(np.uint16)).view(jnp.bfloat16)
        try:
            fn = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                interpret=interpret)
            out = np.asarray(jax.jit(fn)(x))
            exact = np.array_equal(out.view(np.uint32), u32)
            print(f"{name}: lowered, exact={exact}")
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"{name}: FAILED to lower: {msg}")

    # D: uint16-typed window (NaN-safe; see module docstring).
    try:
        fn = pl.pallas_call(
            _kernel_d,
            out_shape=(jax.ShapeDtypeStruct((S, L), jnp.float32),
                       jax.ShapeDtypeStruct((S, L), jnp.bfloat16)),
            interpret=interpret)
        out, col = jax.jit(fn)(jnp.asarray(halves))
        exact_f32 = np.array_equal(np.asarray(out).view(np.uint32), u32)
        exact_col = np.array_equal(
            np.asarray(col).view(np.uint16), halves[:, L:])
        print(f"D uint16 window  : lowered, f32_exact={exact_f32} "
              f"bf16_exact={exact_col}")
    except Exception as e:
        print(f"D uint16 window  : FAILED to lower: {str(e).splitlines()[0][:120]}")

    # F: dynamic-offset DMA window on a (N, 128) uint16 array — u16 arrays
    # tile as T(16, 128); an arbitrary (non-16-aligned) MAJOR offset must
    # still slice correctly for the half-width window plan to work.
    try:
        from jax.experimental.pallas import tpu as pltpu

        N, CH = 256, 32

        def kern_f(off_ref, src_ref, o_ref, buf, sem):
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(off_ref[0], CH), :], buf, sem)
            cp.start()
            cp.wait()
            o_ref[...] = buf[...]

        src = jnp.arange(N * 128, dtype=jnp.uint32).astype(jnp.uint16)
        src = src.reshape(N, 128)
        fn = pl.pallas_call(
            kern_f,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((CH, 128), lambda g, s: (0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((CH, 128), jnp.uint16),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((CH, 128), jnp.uint16),
            interpret=interpret)
        ok = True
        for off in (0, 3, 17, 200):
            out = np.asarray(jax.jit(fn)(jnp.asarray([off], jnp.int32), src))
            ok &= np.array_equal(out, np.asarray(src)[off:off + CH])
        print(f"F u16 dyn-offset window: lowered, exact={ok}")
    except Exception as e:
        print(f"F u16 dyn-offset window: FAILED: {str(e).splitlines()[0][:120]}")

    # E: f32 -> u16 halves (the grad-output pack direction).
    try:
        fn = pl.pallas_call(
            _kernel_e,
            out_shape=jax.ShapeDtypeStruct((S, 2 * L), jnp.uint16),
            interpret=interpret)
        out = np.asarray(jax.jit(fn)(jnp.asarray(f32)))
        exact = (np.array_equal(out[:, :L], lo16)
                 and np.array_equal(out[:, L:], hi16))
        print(f"E f32->u16 pack  : lowered, exact={exact}")
    except Exception as e:
        print(f"E f32->u16 pack  : FAILED to lower: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
