"""Timing & profiling helpers that survive the remote-TPU (tunneled) runtime.

The reference has no profiling subsystem (SURVEY.md section 5 'Tracing:
none'); this module is the framework's replacement. On tunneled TPU backends
``block_until_ready`` can return before execution completes and every host
sync costs a ~25ms RPC, so naive per-call timing is meaningless. ``bench``
measures the *slope*: enqueue K dependent-free runs, force one tiny scalar
fetch, and difference against a 1-run baseline — the per-run execution time
falls out without per-run syncs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _sync_scalar(result) -> None:
    """Force execution of `result` by fetching one scalar to the host."""
    leaf = jax.tree.leaves(result)[0]
    # Reduce device-side so only 4 bytes cross the wire.
    np.asarray(jnp.sum(jnp.ravel(leaf)[:1]))


def bench(f: Callable, *args, iters: int = 8, warmup: int = 2) -> float:
    """Per-run wall time of ``f(*args)`` in milliseconds (slope method)."""
    for _ in range(warmup):
        _sync_scalar(f(*args))

    def run(k: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = f(*args)
        _sync_scalar(r)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(2))
    tk = min(run(iters) for _ in range(2))
    return max((tk - t1) / (iters - 1), 0.0) * 1000.0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
