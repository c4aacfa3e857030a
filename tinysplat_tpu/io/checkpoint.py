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
) -> None:
    from ..models.gaussians import state_dict

    payload = {}
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
