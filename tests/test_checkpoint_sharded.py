"""Multi-host-aware sharded checkpointing (io/checkpoint.py, SURVEY §5 bar).

Single-process stand-in for the multi-host contract: every shard is written
from the device buffers (addressable_shards) without global materialization,
and restore assembles mesh-sharded arrays directly from memory-mapped shard
files — including into a DIFFERENT mesh shape than the one that saved.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tinysplat_tpu.config import Config
from tinysplat_tpu.data.synthetic import orbit_cameras, random_gaussian_cloud
from tinysplat_tpu.io.checkpoint import (
    restore_checkpoint_sharded,
    save_checkpoint_sharded,
)
from tinysplat_tpu.models.gaussians import init_from_pcd
from tinysplat_tpu.parallel import make_mesh, make_sharded_train_step, shard_state
from tinysplat_tpu.train import init_opt_state


def _setup(cap=256, n=100):
    means, log_scales, quats, colors, opac = random_gaussian_cloud(n, seed=4)
    state = init_from_pcd(means, colors * 255.0, sh_degree=2, capacity=cap)
    state = dataclasses.replace(
        state,
        params=dataclasses.replace(
            state.params,
            scales=jnp.asarray(np.concatenate(
                [log_scales, np.full((cap - n, 3), -10.0, np.float32)])),
        ),
    )
    return state


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_roundtrip_same_mesh(tmp_path):
    cfg = Config(sh_degree=2)
    mesh = make_mesh(2, 4)
    state = shard_state(mesh, _setup())
    opt = shard_state(mesh, init_opt_state(cfg, state))
    key = jax.random.PRNGKey(9)

    save_checkpoint_sharded(str(tmp_path), state, opt, step=42, rng_key=key)
    st2, opt2, step, key2 = restore_checkpoint_sharded(str(tmp_path), cfg, mesh)
    assert step == 42
    np.testing.assert_array_equal(jax.random.key_data(key), jax.random.key_data(key2))
    _trees_equal(state, st2)
    _trees_equal(opt, opt2)
    # Restored arrays are mesh-sharded, not replicated.
    assert len(st2.params.means.sharding.device_set) == 8


def test_sharded_roundtrip_reshard(tmp_path):
    """Save from one mesh shape, restore into another (elastic restart)."""
    cfg = Config(sh_degree=2)
    state = shard_state(make_mesh(2, 4), _setup())
    save_checkpoint_sharded(str(tmp_path), state, None, step=7)
    mesh2 = make_mesh(4, 2)
    st2, opt2, step, _ = restore_checkpoint_sharded(str(tmp_path), cfg, mesh2)
    assert step == 7 and opt2 is None
    _trees_equal(state, st2)


@pytest.mark.slow  # heavy; fast gate keeps a cheaper representative
def test_sharded_resume_equivalence(tmp_path):
    """step -> save -> restore -> step == two uninterrupted steps."""
    cfg = Config(rasterizer="tiled", sh_degree=2, warmup_grad=0)
    mesh = make_mesh(2, 4)
    H = W = 64
    B = 2
    base = _setup()
    cams = orbit_cameras(B, width=W, height=H)
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *[c.params() for c in cams])
    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    est = jnp.zeros((B, H, W), jnp.float32)
    fn = make_sharded_train_step(cfg, H, W, B, mesh)

    def steps(state, opt, n, start=0):
        for i in range(n):
            out = fn(state, opt, cam_batch, gt, est, start + i,
                     jax.random.PRNGKey(start + i))
            state, opt = out.state, out.opt_state
        return state, opt

    s0 = shard_state(mesh, jax.tree.map(jnp.copy, base))
    o0 = shard_state(mesh, init_opt_state(cfg, s0))
    ref_state, _ = steps(s0, o0, 2)

    s1 = shard_state(mesh, jax.tree.map(jnp.copy, base))
    o1 = shard_state(mesh, init_opt_state(cfg, s1))
    s1, o1 = steps(s1, o1, 1)
    save_checkpoint_sharded(str(tmp_path), s1, o1, step=1)
    s2, o2, step, _ = restore_checkpoint_sharded(str(tmp_path), cfg, mesh)
    s2, _ = steps(s2, o2, 1, start=step)

    for x, y in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7)
