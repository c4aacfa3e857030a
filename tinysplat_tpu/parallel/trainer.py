"""Multi-chip trainer: the host loop over the sharded train step.

Extends the single-device Trainer (train_loop.py) to a ('data', 'tile') mesh:
each step consumes a batch of `n_data` cameras (one per data group), images
are row-sharded over 'tile', splat/optimizer state stays FSDP-sharded between
steps, and densify/prune runs as plain jit on the sharded arrays (GSPMD
inserts the collectives). Multi-host entry: call `init_distributed()` before
building the mesh; the viewer/checkpoint IO runs on process 0.
"""
from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.gaussians import GaussianState
from ..scene import Scene
from ..train_loop import Trainer
from .sharding import make_mesh, shard_state
from .train_step import make_sharded_train_step

log = logging.getLogger(__name__)


def init_distributed(**kwargs) -> None:
    """Multi-host process-group init (jax.distributed.initialize wrapper).

    No-op when the process group is already initialized or when running
    single-host (the common case in tests)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # already initialized / 1 host
        log.debug("distributed init skipped: %s", e)


class MeshTrainer(Trainer):
    """Trainer over a ('data', 'tile') device mesh.

    Requires all cameras to share one image shape with H divisible by
    n_tile * tile_size (pad/resize images upstream if needed).
    """

    def __init__(
        self,
        cfg: Config,
        scene: Scene,
        state: GaussianState,
        opt_state=None,
        start_step: int = 0,
        rng_key: Optional[jax.Array] = None,
        mesh=None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh_splat if cfg.mesh_splat > 1 else 1, cfg.mesh_tile or 0
        )
        super().__init__(cfg, scene, state, opt_state, start_step, rng_key)
        self.n_data = int(self.mesh.shape["data"])
        self.n_tile = int(self.mesh.shape["tile"])
        shapes = {(c.height, c.width) for c in scene.cameras}
        assert len(shapes) == 1, (
            f"MeshTrainer needs a single camera image shape, got {shapes}"
        )
        self.h, self.w = shapes.pop()
        self.state = shard_state(self.mesh, self.state)
        self.opt_state = shard_state(self.mesh, self.opt_state)
        self._sharded_step = None
        self._sharded_density = None

    def _get_sharded_step(self):
        use_density = self.density_probe is not None
        if self._sharded_step is None or self._sharded_density != use_density:
            self._sharded_step = make_sharded_train_step(
                self.cfg, self.h, self.w, self.n_data, self.mesh,
                self.optimizer, use_depth=self.cfg.regularize_depth,
                use_density=use_density,
            )
            self._sharded_density = use_density
        return self._sharded_step

    def _maybe_refresh_density_probe(self) -> None:
        # Same cadence as the base class, but the sample count must divide
        # by the 'tile' axis (points are row-sharded in the step) and the
        # probe arrays are laid out with that sharding.
        refresh_step = (
            self.cfg.regularize_density
            and self.cfg.regularize_density_start <= self.step < self.cfg.regularize_density_end
        )
        super()._maybe_refresh_density_probe()
        if refresh_step and self.density_probe is not None:
            from jax.sharding import NamedSharding

            p = self.density_probe
            n = p.points.shape[0] // self.n_tile * self.n_tile
            p = jax.tree.map(lambda x: x[:n], p)
            self.density_probe = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(self.mesh, jax.sharding.PartitionSpec("tile"))
                ),
                p,
            )

    def train_step(self) -> None:
        cfg = self.cfg
        self.step += 1
        self._maybe_refresh_density_probe()

        cams: List = [self.scene.get_random_camera(self.step * self.n_data + i)
                      for i in range(self.n_data)]
        cam_batch = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[c.params() for c in cams]
        )
        gt = jnp.stack([jnp.asarray(c.get_original_image((self.w, self.h))) for c in cams])
        if cfg.regularize_depth and cams[0].estimated_depth is not None:
            est = jnp.stack([jnp.asarray(c.estimated_depth) for c in cams])
        else:
            est = jnp.zeros((self.n_data, self.h, self.w), jnp.float32)

        self.key, sub = jax.random.split(self.key)
        out = self._get_sharded_step()(
            self.state, self.opt_state, cam_batch, gt, est, self.step, sub,
            density_probe=self.density_probe,
        )
        self.state, self.opt_state = out.state, out.opt_state
        self.metrics.update(self.step, out.metrics)

        self._maybe_densify()
        num_live = int(jax.device_get(out.metrics["num_live"]))
        self.metrics.log(self.step, extra=f"N: {num_live}")

        if cfg.save_checkpoints and self.step % cfg.checkpoint_interval == 0:
            # Multi-host-aware: every process writes only its addressable
            # shards (no global materialization); process 0 adds the
            # manifest. Resume with restore_checkpoint_sharded(path, cfg,
            # mesh) into the same or a reshaped mesh.
            from ..io.checkpoint import save_checkpoint_sharded

            path = f"{cfg.checkpoint_dir}/{self._timestamp}-{self.step}.ckpt"
            save_checkpoint_sharded(path, self.state, self.opt_state,
                                    self.step, self.key)
            if jax.process_index() == 0:
                log.info("saved sharded checkpoint %s", path)

    def _maybe_densify(self) -> None:
        # Same cadence as the base class; resharding after capacity growth.
        before_cap = self.state.capacity
        super()._maybe_densify()
        if self.state.capacity != before_cap:
            self.state = shard_state(self.mesh, self.state)
            self.opt_state = shard_state(self.mesh, self.opt_state)
            self._sharded_step = None
