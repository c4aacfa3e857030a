"""Training checkpoints: full-state save/resume (params + Adam + step + RNG).

The reference only snapshots the model tensors (`torch.save(state_dict())`,
/root/reference/scripts/train.py:121-124) and cannot resume optimizer state,
step counter, or densification accumulators (SURVEY.md section 5). Here a
checkpoint is one .npz holding:

  - the compact live-splat model snapshot (same field names as the reference
    state_dict — loadable with `load_model` for export / inference parity
    with GaussianModel.from_state_checkpoint, model_gaussian.py:92-110), and
  - the full fixed-capacity training state (params, alive mask, grad
    accumulator, Adam moments, step, RNG key) for exact resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from ..config import Config
from ..models.gaussians import GaussianState, from_state_dict


def save_checkpoint(
    path: str,
    state: GaussianState,
    opt_state: Any = None,
    step: int = 0,
    rng_key: Optional[jax.Array] = None,
    extras: Optional[dict] = None,
) -> None:
    """``extras``: optional {name: array} of auxiliary training state (e.g.
    the --pose-opt per-camera delta table + its Adam moments), stored under
    ``extra/<name>`` and returned by load_checkpoint as the same dict."""
    from ..models.gaussians import state_dict

    payload = {}
    for k, v in (extras or {}).items():
        payload[f"extra/{k}"] = np.asarray(v)
    # Compact model snapshot (reference-compatible keys).
    for k, v in state_dict(state).items():
        payload[f"model/{k}"] = v
    # Full training state.
    state_leaves, _ = jax.tree.flatten(state)
    for i, leaf in enumerate(state_leaves):
        payload[f"state/{i}"] = np.asarray(leaf)
    if opt_state is not None:
        opt_leaves, _ = jax.tree.flatten(opt_state)
        for i, leaf in enumerate(opt_leaves):
            payload[f"opt/{i}"] = np.asarray(leaf)
    payload["meta/step"] = np.int64(step)
    payload["meta/capacity"] = np.int64(state.capacity)
    if rng_key is not None:
        payload["meta/rng"] = np.asarray(jax.random.key_data(rng_key))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_model(path: str, capacity: Optional[int] = None) -> GaussianState:
    """Model-only load (the reference's from_state_checkpoint semantics)."""
    with np.load(path) as z:
        sd = {k.split("/", 1)[1]: z[k] for k in z.files if k.startswith("model/")}
    return from_state_dict(sd, capacity=capacity)


def save_checkpoint_sharded(
    ckpt_dir: str,
    state: GaussianState,
    opt_state: Any = None,
    step: int = 0,
    rng_key: Optional[jax.Array] = None,
    extras: Optional[dict] = None,
) -> None:
    """Multi-host-aware checkpoint: each process writes ONLY its addressable
    shards (orbax-style layout; SURVEY.md section 5 bar). No process ever
    materializes the global arrays.

    Layout:
      ckpt_dir/manifest.npz                  (process 0: tree metadata)
      ckpt_dir/p{proc}/l{leaf}.s{n}.npy      shard data (one .npy per shard)
      ckpt_dir/p{proc}/l{leaf}.s{n}.idx.npy  (ndim, 2) start/stop bounds

    Replicated leaves are written once (replica_id == 0 shards only), so the
    aggregate bytes on disk equal one copy of the global state regardless of
    mesh size. All processes must call this (collectively); a shared
    filesystem is assumed for restore, as with orbax.

    Crash safety: everything is written into ``ckpt_dir/.staging`` first and
    swapped in only after every process finishes — reusing a directory never
    destroys the previous checkpoint before the replacement exists. The
    manifest is moved LAST (atomic os.replace), and restore validates
    leaf-count + shard coverage, so the narrow swap window fails loudly
    rather than resuming from mixed state.

    ``extras``: optional {name: small replicated array} of auxiliary
    training state (e.g. --pose-opt / --app-opt tables + moments), stored in
    the manifest; read back with load_checkpoint_sharded_extras.
    """
    proc = jax.process_index()
    sdir = os.path.join(ckpt_dir, ".staging")
    pdir = os.path.join(sdir, f"p{proc}")
    if proc == 0:
        import shutil

        if os.path.isdir(sdir):  # stale staging from a crashed save
            shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(sdir, exist_ok=True)
    _barrier("ckpt_staging_ready")  # writers must not race the cleanup
    os.makedirs(pdir, exist_ok=True)

    trees = {"state": state} if opt_state is None else {
        "state": state, "opt": opt_state}
    meta = {"meta/step": np.int64(step), "meta/capacity": np.int64(state.capacity),
            "meta/nprocs": np.int64(jax.process_count()),
            "meta/has_opt": np.bool_(opt_state is not None)}
    for k, v in (extras or {}).items():
        meta[f"extra/{k}"] = np.asarray(v)
    if rng_key is not None:
        meta["meta/rng"] = np.asarray(jax.random.key_data(rng_key))

    for prefix, tree in trees.items():
        leaves = jax.tree.leaves(tree)
        meta[f"meta/n_{prefix}"] = np.int64(len(leaves))
        for i, leaf in enumerate(leaves):
            arr = leaf if isinstance(leaf, jax.Array) else jax.device_put(
                np.asarray(leaf))
            meta[f"shape/{prefix}/{i}"] = np.asarray(arr.shape, np.int64)
            meta[f"dtype/{prefix}/{i}"] = np.str_(np.dtype(arr.dtype).str)
            for s_n, shard in enumerate(arr.addressable_shards):
                if shard.replica_id != 0:
                    continue
                bounds = np.asarray(
                    [[sl.start or 0, sl.stop if sl.stop is not None else dim]
                     for sl, dim in zip(shard.index, arr.shape)],
                    np.int64,
                ).reshape(len(arr.shape), 2)
                base = os.path.join(pdir, f"{prefix}{i}.s{s_n}")
                np.save(base + ".npy", np.asarray(shard.data))
                np.save(base + ".idx.npy", bounds)

    # The manifest's presence marks the checkpoint complete: every process
    # must finish its shard files BEFORE process 0 publishes it, and nobody
    # may return (and e.g. start a restore) before it exists.
    _barrier("ckpt_shards_done")
    if proc == 0:
        import glob as _glob
        import shutil

        tmp = os.path.join(sdir, "manifest.npz.tmp")
        with open(tmp, "wb") as f:
            np.savez(f, **meta)
        os.replace(tmp, os.path.join(sdir, "manifest.npz"))
        # Swap the staging contents in: remove the previous shard dirs (a
        # reused directory could hold shards of a DIFFERENT mesh or leaf
        # set), move the new ones up, and publish the manifest LAST.
        for d in _glob.glob(os.path.join(ckpt_dir, "p*")):
            shutil.rmtree(d, ignore_errors=True)
        for entry in sorted(os.listdir(sdir)):
            if entry.startswith("p"):
                os.replace(os.path.join(sdir, entry),
                           os.path.join(ckpt_dir, entry))
        os.replace(os.path.join(sdir, "manifest.npz"),
                   os.path.join(ckpt_dir, "manifest.npz"))
        shutil.rmtree(sdir, ignore_errors=True)
    _barrier("ckpt_manifest_done")


def _barrier(tag: str) -> None:
    """Cross-process barrier (no-op single-process, the common case here)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def restore_checkpoint_sharded(
    ckpt_dir: str,
    cfg: Config,
    mesh,
) -> Tuple[GaussianState, Any, int, Optional[jax.Array]]:
    """Restore a sharded checkpoint directly into mesh-sharded arrays.

    Each target shard is assembled only from the saved pieces that intersect
    it (memory-mapped .npy reads — no process materializes a global array),
    so the saving and restoring meshes may differ in shape or process count.
    """
    import glob

    from jax.sharding import NamedSharding

    from ..models.gaussians import init_from_pcd
    from ..parallel.sharding import capacity_leaf_spec
    from ..train import init_opt_state

    man = np.load(os.path.join(ckpt_dir, "manifest.npz"))
    step = int(man["meta/step"])
    capacity = int(man["meta/capacity"])
    rng_key = (jax.random.wrap_key_data(man["meta/rng"])
               if "meta/rng" in man.files else None)

    # Index the saved pieces per leaf: leaf -> [(bounds, path)].
    pieces: dict = {}
    for idx_path in glob.glob(os.path.join(ckpt_dir, "p*", "*.idx.npy")):
        data_path = idx_path[: -len(".idx.npy")] + ".npy"
        name = os.path.basename(idx_path).split(".")[0]  # e.g. "state3"
        pieces.setdefault(name, []).append((np.load(idx_path), data_path))

    def assemble(prefix, i, template_leaf):
        shape = tuple(man[f"shape/{prefix}/{i}"].tolist())
        dtype = np.dtype(str(man[f"dtype/{prefix}/{i}"]))
        sharding = NamedSharding(mesh, capacity_leaf_spec(template_leaf))
        # Saved pieces partition the global array (replica-0 shards are
        # disjoint); anything less means missing/partially-synced shard
        # files — assembling would hand np.empty garbage to the trainer.
        covered = sum(
            int(np.prod([int(b1) - int(b0) for b0, b1 in bounds]))
            for bounds, _ in pieces.get(f"{prefix}{i}", ())
        )
        if covered != int(np.prod(shape)):
            raise ValueError(
                f"sharded checkpoint leaf {prefix}/{i} is incomplete: "
                f"saved pieces cover {covered} of {int(np.prod(shape))} "
                f"elements (missing or stale p*/ shard files in {ckpt_dir})")

        def cb(index):
            starts = [sl.start or 0 for sl in index]
            stops = [sl.stop if sl.stop is not None else d
                     for sl, d in zip(index, shape)]
            out = np.empty([b - a for a, b in zip(starts, stops)], dtype)
            for bounds, path in pieces.get(f"{prefix}{i}", ()):
                lo = [max(a, int(b0)) for a, (b0, _) in zip(starts, bounds)]
                hi = [min(b, int(b1)) for b, (_, b1) in zip(stops, bounds)]
                if any(l >= h for l, h in zip(lo, hi)):
                    continue
                src = np.load(path, mmap_mode="r")
                src_sl = tuple(slice(l - int(b0), h - int(b0))
                               for l, h, (b0, _) in zip(lo, hi, bounds))
                dst_sl = tuple(slice(l - a, h - a)
                               for l, h, a in zip(lo, hi, starts))
                out[dst_sl] = src[src_sl]
            return out

        return jax.make_array_from_callback(shape, sharding, cb)

    # Tiny-capacity template: only the TREE STRUCTURE and leaf ndims matter
    # (shapes come from the manifest) — never materialize capacity-sized
    # host arrays here.
    template = init_from_pcd(
        np.arange(12, dtype=np.float32).reshape(4, 3), np.zeros((4, 3), np.float32),
        sh_degree=cfg.sh_degree, capacity=8,
    )
    state_leaves, state_def = jax.tree.flatten(template)
    n_saved = int(man["meta/n_state"])
    if n_saved != len(state_leaves):
        raise ValueError(
            f"checkpoint state tree has {n_saved} leaves but this build "
            f"expects {len(state_leaves)} — incompatible versions/config")
    state = jax.tree.unflatten(
        state_def,
        [assemble("state", i, l) for i, l in enumerate(state_leaves)],
    )
    opt_state = None
    if bool(man["meta/has_opt"]):
        opt_template = init_opt_state(cfg, template)
        opt_leaves, opt_def = jax.tree.flatten(opt_template)
        n_opt_saved = int(man["meta/n_opt"])
        if n_opt_saved != len(opt_leaves):
            raise ValueError(
                f"checkpoint optimizer tree has {n_opt_saved} leaves but "
                f"this config builds {len(opt_leaves)} — optimizer "
                f"definition changed between save and restore")
        opt_state = jax.tree.unflatten(
            opt_def,
            [assemble("opt", i, l) for i, l in enumerate(opt_leaves)],
        )
    return state, opt_state, step, rng_key


def load_checkpoint_sharded_extras(ckpt_dir: str) -> dict:
    """The ``extras`` dict passed to save_checkpoint_sharded (may be {})."""
    man = np.load(os.path.join(ckpt_dir, "manifest.npz"))
    return {
        k.split("/", 1)[1]: np.asarray(man[k])
        for k in man.files
        if k.startswith("extra/")
    }


def load_checkpoint(
    path: str, cfg: Config
) -> Tuple[GaussianState, Any, int, Optional[jax.Array]]:
    """Full-resume load: (state, opt_state, step, rng_key)."""
    from ..train import init_opt_state

    with np.load(path) as z:
        files = set(z.files)
        step = int(z["meta/step"])
        # Rebuild the state pytree from a template with the right capacity.
        template = load_model(path, capacity=int(z["meta/capacity"]))
        _, state_def = jax.tree.flatten(template)
        n_state = len(jax.tree.leaves(template))
        state_leaves = [z[f"state/{i}"] for i in range(n_state)]
        state = jax.tree.unflatten(state_def, state_leaves)

        opt_state = None
        if "opt/0" in files:
            opt_template = init_opt_state(cfg, state)
            opt_tleaves, opt_def = jax.tree.flatten(opt_template)
            opt_leaves = [z[f"opt/{i}"] for i in range(len(opt_tleaves))]
            opt_leaves = [
                np.asarray(l, dtype=t.dtype) for l, t in zip(opt_leaves, opt_tleaves)
            ]
            opt_state = jax.tree.unflatten(opt_def, opt_leaves)

        rng_key = None
        if "meta/rng" in files:
            rng_key = jax.random.wrap_key_data(z["meta/rng"])
    return state, opt_state, step, rng_key


def load_checkpoint_extras(path: str) -> dict:
    """The ``extras`` dict passed to save_checkpoint (empty if none)."""
    with np.load(path) as z:
        return {
            k.split("/", 1)[1]: np.asarray(z[k])
            for k in z.files
            if k.startswith("extra/")
        }
