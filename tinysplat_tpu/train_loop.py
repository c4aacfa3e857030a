"""Host-side training orchestration (the reference's scripts/train.py:19-127
loop, redesigned around jitted device steps).

Responsibilities that stay on the host — everything else is inside the jitted
step (train.py / parallel/train_step.py):

- camera sampling per step (scene.get_random_camera);
- per-image-shape jit cache (cameras keep their native, possibly unequal,
  undistorted dimensions — one compiled step per distinct (H, W));
- densify/prune cadence gating (reference model_gaussian.py:139-147) +
  fixed-capacity growth when densification runs out of free slots (one
  recompile per doubling, SURVEY.md section 7);
- density-probe refresh cadence (reference train.py:79-83) and the
  density-start opacity prune (train.py:105-107);
- asynchronous metric fetch: device scalars are collected per step but only
  materialized at epoch logging boundaries (the reference `.item()`s every
  step — a per-step host sync, train.py:109-112);
- checkpoint saves (full training state, io/checkpoint.py).
"""
from __future__ import annotations

import dataclasses
import logging
import math
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cameras import Camera
from .config import Config
from .models.densify import densify_and_prune, prune_by_mask, reset_opacities
from .models.gaussians import GaussianState, grow_capacity
from .scene import Scene
from .train import init_opt_state, make_optimizer, make_train_step

log = logging.getLogger(__name__)


def grow_opt_state(opt_state, old_capacity: int, new_capacity: int):
    """Zero-pad every capacity-sized optimizer leaf (Adam moments)."""

    def pad(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == old_capacity:
            return jnp.pad(x, [(0, new_capacity - old_capacity)] + [(0, 0)] * (x.ndim - 1))
        return x

    return jax.tree.map(pad, opt_state)


class Metrics:
    """Per-camera epoch matrices, logged as epoch means.

    Semantics of the reference Metrics (scripts/train.py:130-149), with the
    values kept as device arrays until the epoch boundary (no per-step sync).
    """

    def __init__(self, num_cameras: int, csv_path: Optional[str] = None):
        self.num_cameras = max(num_cameras, 1)
        self._pending: Dict[str, list] = defaultdict(list)
        # Optional machine-readable sink (cfg.metrics_file): one CSV row per
        # epoch boundary, header grown from the first row's keys. The
        # reference's only observability is tqdm.write (train.py:130-149).
        self._csv_path = csv_path
        self._csv_keys: Optional[list] = None

    def update(self, step: int, values: Dict[str, jax.Array]) -> None:
        for k, v in values.items():
            self._pending[k].append(v)

    def log(self, step: int, extra: str = "") -> Optional[str]:
        if step % self.num_cameras != 0:
            return None
        parts = []
        means: Dict[str, float] = {}
        for key, vals in self._pending.items():
            arr = np.asarray(jax.device_get(vals[-self.num_cameras :]))
            means[key] = float(arr.mean())
            parts.append(f"{key}: {means[key]:<10.4f}")
        self._pending.clear()
        line = " | ".join(parts) + (f" | {extra}" if extra else "")
        log.info("step %d | %s", step, line)
        if self._csv_path and means:
            if self._csv_keys is None:
                self._csv_keys = sorted(means)
                header = ",".join(["step"] + self._csv_keys)
                if os.path.exists(self._csv_path):
                    # Resuming into an existing file: appending rows in a
                    # DIFFERENT key order would silently misalign columns.
                    # Adopt a matching header; rotate a mismatched file.
                    with open(self._csv_path) as f:
                        old = f.readline().strip()
                    if old != header:
                        bak = self._csv_path + ".old"
                        os.replace(self._csv_path, bak)
                        log.warning(
                            "metrics file key set changed; previous rows "
                            "moved to %s", bak)
                        with open(self._csv_path, "w") as f:
                            f.write(header + "\n")
                else:
                    with open(self._csv_path, "w") as f:
                        f.write(header + "\n")
            with open(self._csv_path, "a") as f:
                f.write(",".join([str(step)] + [
                    f"{means.get(k, float('nan')):.6g}" for k in self._csv_keys
                ]) + "\n")
        return line


class Trainer:
    """Single-host trainer over one device (multi-chip path: parallel/)."""

    def __init__(
        self,
        cfg: Config,
        scene: Scene,
        state: GaussianState,
        opt_state=None,
        start_step: int = 0,
        rng_key: Optional[jax.Array] = None,
    ):
        self.cfg = cfg
        self.scene = scene
        self.state = state
        self.optimizer = make_optimizer(cfg)
        self.opt_state = opt_state if opt_state is not None else init_opt_state(
            cfg, state, self.optimizer
        )
        self.step = start_step
        self.key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed)
        # CSV sink only on process 0 (multi-host: metrics are replicated).
        self.metrics = Metrics(
            len(scene.cameras),
            csv_path=(cfg.metrics_file
                      if cfg.metrics_file and jax.process_index() == 0
                      else None),
        )
        self.density_probe = None
        self._step_fns: Dict[tuple, object] = {}
        self._image_cache: Dict[tuple, jax.Array] = {}
        self._guard_snapshot = None
        self._rollbacks = 0
        self._rollbacks_at_progress = 0
        self._ckpt_thread = None  # in-flight --async-checkpoint writer
        self._ckpt_error = None  # failed writer's exception (re-raised)
        self._prefetched = False  # one-shot image-prefetch guard
        import threading

        # Per-camera decode locks (prefetch pool vs main thread; PIL's
        # lazy load() is not thread-safe).
        self._decode_lock = defaultdict(threading.Lock)
        # The reference overrides the densify interval to the camera count
        # at scripts/train.py:277.
        self.interval_densify = len(scene.cameras) or cfg.interval_densify
        self._timestamp = time.strftime("%Y_%m_%d-%H_%M_%S")
        self.last_rendered = None
        self.eval_cameras: List[Camera] = []
        self._last_diag = None  # (intersections, dup_dropped, tile_dropped)
        self._no_shrink_until = 0  # hysteresis after a budget grow
        # Number of independent binning invocations the diagnostics sum over
        # (1 here; MeshTrainer sets n_tile — each band bins with its own
        # dup_capacity, so the per-invocation budget compares against the
        # per-band share of the observed global intersection count).
        self._budget_bands = 1
        # --pose-opt: per-camera SE(3) deltas + Adam moments, updated on the
        # host from the step's pose_grad (6 floats/step — negligible
        # dispatch). Slots are bound to the INITIAL camera set by name;
        # cameras added later (e.g. diffusion synthetic views) train with
        # fixed poses.
        self.pose_deltas = None
        self.app_params = None
        if cfg.pose_opt or cfg.app_opt:
            n = max(len(scene.cameras), 1)
            self._pose_slots = {
                c.name or f"cam{i}": i for i, c in enumerate(scene.cameras)
            }
        if cfg.pose_opt:
            self.pose_deltas = jnp.zeros((n, 6), jnp.float32)
            self._pose_m = jnp.zeros((n, 6), jnp.float32)
            self._pose_v = jnp.zeros((n, 6), jnp.float32)
            self._pose_cnt = jnp.zeros((n,), jnp.int32)
        if cfg.app_opt:  # --app-opt: per-camera affine exposure (train.py)
            self.app_params = jnp.zeros((n, 12), jnp.float32)
            self._app_m = jnp.zeros((n, 12), jnp.float32)
            self._app_v = jnp.zeros((n, 12), jnp.float32)
            self._app_cnt = jnp.zeros((n,), jnp.int32)

    def restore_pose_state(self, extras: dict) -> None:
        """Resume the --pose-opt/--app-opt tables from
        load_checkpoint_extras(path)."""
        if self.pose_deltas is not None and "pose_deltas" in extras:
            self.pose_deltas = jnp.asarray(extras["pose_deltas"])
            self._pose_m = jnp.asarray(extras["pose_m"])
            self._pose_v = jnp.asarray(extras["pose_v"])
            self._pose_cnt = jnp.asarray(extras["pose_cnt"])
        if self.app_params is not None and "app_params" in extras:
            self.app_params = jnp.asarray(extras["app_params"])
            self._app_m = jnp.asarray(extras["app_m"])
            self._app_v = jnp.asarray(extras["app_v"])
            self._app_cnt = jnp.asarray(extras["app_cnt"])

    def _pose_slot(self, camera) -> Optional[int]:
        if self.pose_deltas is None and self.app_params is None:
            return None
        return self._pose_slots.get(
            camera.name or f"cam{self.scene.cameras.index(camera)}"
        )

    @staticmethod
    @jax.jit
    def _pose_adam(table, m, v, cnt, slot, g, lr):
        """One Adam step on a single camera's (6,) delta (torch defaults)."""
        b1, b2, eps = 0.9, 0.999, 1e-8
        c = cnt[slot] + 1
        m_s = b1 * m[slot] + (1 - b1) * g
        v_s = b2 * v[slot] + (1 - b2) * g * g
        mhat = m_s / (1 - b1 ** c.astype(jnp.float32))
        vhat = v_s / (1 - b2 ** c.astype(jnp.float32))
        upd = -lr * mhat / (jnp.sqrt(vhat) + eps)
        return (table.at[slot].add(upd), m.at[slot].set(m_s),
                v.at[slot].set(v_s), cnt.at[slot].set(c))

    # -- jit cache -------------------------------------------------------------

    def _device_image(self, camera, w: int, h: int) -> jax.Array:
        """Device-resident GT image cache. Re-uploading a 20 MB frame every
        step dominates the step time over a tunneled TPU (~2 s/step at
        1600x1066); training touches each camera hundreds of times, so the
        whole set is pinned in HBM once (36 full-res views ~= 0.7 GB of the
        16 GB)."""
        key = (camera.name, w, h)
        img = self._image_cache.get(key)
        if img is None:
            # Per-camera decode lock: the prefetch pool and the main thread
            # can miss the cache for the SAME camera concurrently, and
            # Camera's lazy PIL decode mutates shared state (PIL load() is
            # not thread-safe — interleaved reads corrupt the frame).
            with self._decode_lock[camera.name]:
                img = self._image_cache.get(key)
                if img is None:
                    img = jax.device_put(
                        jnp.asarray(camera.get_original_image((w, h)))
                    )
                    self._image_cache[key] = img
        return img

    def prefetch_images(self, workers: int = 4) -> None:
        """Warm the HBM image cache concurrently (cfg.prefetch_images).

        Without it the first epoch pays per-step PIL decode + resize +
        host->device upload for every camera; run() fires this once so the
        whole set decodes on a thread pool WHILE the first train-step
        compile runs (30s+ on TPU) — by the time step 1 dispatches, the
        uploads are done. The main thread can still request a camera the
        pool is warming; _device_image's per-camera decode lock serializes
        exactly those collisions."""
        from concurrent.futures import ThreadPoolExecutor

        cams = list(self.scene.cameras)
        if not cams or self._prefetched:
            return
        self._prefetched = True

        def warm(cam):
            ch, cw = self._c2f_dims(cam)
            self._device_image(cam, cw, ch)
            if (ch, cw) != (cam.height, cam.width):  # full res used later
                self._device_image(cam, cam.width, cam.height)

        pool = ThreadPoolExecutor(max_workers=workers,
                                  thread_name_prefix="img-prefetch")
        self._prefetch_futures = [pool.submit(warm, c) for c in cams]
        pool.shutdown(wait=False)

    # -- coarse-to-fine resolution schedule --------------------------------------

    def _c2f_height_quantum(self) -> int:
        """Height snap for reduced resolutions (MeshTrainer: n_tile bands
        of whole 16px tile rows)."""
        return self.cfg.tile_size

    def _c2f_scale(self) -> float:
        cfg = self.cfg
        if not cfg.coarse_to_fine:
            return 1.0
        end = cfg.c2f_end or max(cfg.max_iter // 2, 1)
        if self.step >= end:
            return 1.0
        n_stages = max(1, math.ceil(math.log2(1.0 / cfg.c2f_start_scale)))
        stage_len = max(1, end // n_stages)
        return min(1.0, cfg.c2f_start_scale * (2 ** (self.step // stage_len)))

    def _c2f_dims(self, camera) -> Tuple[int, int]:
        """(h, w) to train at this step — full res, or a tile-snapped
        fraction during the coarse stages."""
        s = self._c2f_scale()
        if s >= 1.0:
            return camera.height, camera.width
        qh, qw = self._c2f_height_quantum(), self.cfg.tile_size
        h = max(qh, int(camera.height * s) // qh * qh)
        w = max(qw, int(camera.width * s) // qw * qw)
        return h, w

    @staticmethod
    def _scale_cam_params(cam_params, camera, h: int, w: int):
        """Rescale pixel-space intrinsics to a reduced training resolution
        (the FOV-based projection matrix is resolution-independent)."""
        if (h, w) == (camera.height, camera.width):
            return cam_params
        return dataclasses.replace(
            cam_params,
            fx=cam_params.fx * (w / camera.width),
            fy=cam_params.fy * (h / camera.height),
            cx_off=cam_params.cx_off * (w / camera.width),
            cy_off=cam_params.cy_off * (h / camera.height),
        )

    def _step_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._step_fns:
            self._step_fns[key] = make_train_step(self.cfg, h, w, self.optimizer)
        return self._step_fns[key]

    # -- densification ----------------------------------------------------------

    def _maybe_densify(self) -> None:
        cfg, step = self.cfg, self.step
        if step < cfg.warmup_densify or step > cfg.densify_end:
            return
        if step % self.interval_densify != 0:
            return
        if cfg.densify_strategy == "mcmc":
            # 3DGS-MCMC: relocation instead of clone/split/prune; capacity
            # is the cap by design — no overflow/growth path.
            from .models.densify_mcmc import relocate_and_grow

            self.key, sub = jax.random.split(self.key)
            sub = self._stage_key(sub)
            self.state, self.opt_state, stats = relocate_and_grow(
                self.state, self.opt_state, sub, cfg
            )
            stats = jax.device_get(stats)
            log.debug(
                "mcmc refine step %d: relocated %d grown %d live %d",
                step, int(stats["relocated"]), int(stats["grown"]),
                int(stats["num_live"]),
            )
            return
        cam = self.scene.cameras[0]
        max_dim = max(cam.width, cam.height)
        self.key, sub = jax.random.split(self.key)
        sub = self._stage_key(sub)
        new_state, new_opt, stats = densify_and_prune(
            self.state, self.opt_state, sub, self.interval_densify, max_dim, cfg
        )
        stats = jax.device_get(stats)
        dropped = int(stats["dropped"])
        if dropped > 0:
            # Not enough free slots: grow capacity (recompile) and redo the
            # pass on the grown arrays so nothing is lost.
            old_cap = self.state.capacity
            new_cap = max(2 * old_cap, old_cap + 2 * dropped)
            log.info("densify overflow (%d dropped): growing capacity %d -> %d",
                     dropped, old_cap, new_cap)
            self.state = grow_capacity(self.state, new_cap)
            self.opt_state = grow_opt_state(self.opt_state, old_cap, new_cap)
            self._on_capacity_growth()
            self._invalidate_step_cache()
            new_state, new_opt, stats = densify_and_prune(
                self.state, self.opt_state, sub, self.interval_densify, max_dim, cfg
            )
            stats = jax.device_get(stats)
        self.state, self.opt_state = new_state, new_opt
        log.debug(
            "densify step %d: cloned %d split %d pruned %d live %d",
            step, int(stats["cloned"]), int(stats["split"]),
            int(stats["pruned"]), int(stats["num_live"]),
        )

    def _maybe_compact(self) -> None:
        """Periodic capacity reclamation (cfg.compact_interval; see
        models/gaussians.compact_state). Runs after densify so freshly
        freed slots are reclaimed in the same pass."""
        cfg = self.cfg
        if cfg.compact_interval <= 0 or self.step % cfg.compact_interval != 0:
            return
        if cfg.densify_strategy == "mcmc":
            # MCMC treats the (fixed) capacity as its growth ceiling and
            # never grows arrays back; compaction would permanently shrink
            # the splat budget. The strategies are mutually exclusive.
            return
        from .models.gaussians import compact_state

        old_cap = self.state.capacity
        self.state, self.opt_state, did = compact_state(
            self.state, self.opt_state, margin=cfg.compact_margin
        )
        if did:
            log.info("compacted capacity %d -> %d (%d live)", old_cap,
                     self.state.capacity, int(self.state.num_live()))
            self._on_capacity_growth()  # reshard (mesh) + invalidate cache
            self._invalidate_step_cache()
            # Compaction PERMUTES splat rows: a cached density probe's
            # knn_idx would gather the wrong (or out-of-range) neighbors.
            # Dropping it forces a rebuild at the next refresh check.
            self.density_probe = None

    def _on_capacity_growth(self) -> None:
        """Hook after grow_capacity/grow_opt_state or compact_state
        (MeshTrainer reshards)."""

    def _stage_key(self, k):
        """Hook: stage a freshly split RNG key for device code. MeshTrainer
        converts it to a global replicated array under multi-process
        execution (a locally-committed array cannot feed a computation that
        spans other processes' devices)."""
        return k

    def _maybe_refresh_density_probe(self) -> None:
        cfg, step = self.cfg, self.step
        if not cfg.regularize_density:
            return
        in_window = cfg.regularize_density_start <= step < cfg.regularize_density_end
        if not in_window:
            return
        if step == cfg.regularize_density_start:
            # Reference prunes sigmoid(opacity) < 0.5 at the window start
            # (train.py:105-107).
            mask = jax.nn.sigmoid(self.state.params.opacities[:, 0]) < 0.5
            self.state, self.opt_state = prune_by_mask(self.state, self.opt_state, mask)
        # Refresh cadence uses the RAW flag (reference train.py:79 gates on
        # args.interval_densify, default 100) — self.interval_densify is
        # overridden to the camera count for the densify pass itself.
        update = (step == cfg.regularize_density_start
                  or step % max(cfg.interval_densify, 1) == 1)
        if update or self.density_probe is None:
            from .regularizers.density import make_density_probe

            self.key, sub = jax.random.split(self.key)
            sub = self._stage_key(sub)
            self.density_probe = make_density_probe(
                self.state.params, self.state.alive, sub,
                num_samples=cfg.density_samples,
            )

    def _maybe_refresh_diffusion_views(self) -> None:
        """Diffusion-guided novel-view regularization (beyond the reference,
        whose diffusion module is never imported by training): on cadence,
        synthesize diffusion-refined novel views of the current model and
        swap them into the scene as weighted synthetic training cameras.
        See regularizers/diffusion_guidance.py for the design."""
        cfg, step = self.cfg, self.step
        if not cfg.regularize_diffusion:
            return
        if not (cfg.regularize_diffusion_start <= step < cfg.regularize_diffusion_end):
            # Window closed: the LAST refresh's synthetic views must not
            # keep training the (now better) model toward stale frames.
            if (step >= cfg.regularize_diffusion_end
                    and getattr(self, "_diffusion_real_cams", None) is not None
                    and len(self.scene.cameras) != len(self._diffusion_real_cams)):
                self.scene.cameras = self._diffusion_real_cams
                log.info("diffusion window ended: synthetic views removed")
            return
        first = step == cfg.regularize_diffusion_start or (
            getattr(self, "_diffusion_guidance", None) is None
        )
        if not first and step % cfg.interval_diffusion != 0:
            return
        from .regularizers.diffusion_guidance import DiffusionGuidance

        if getattr(self, "_diffusion_guidance", None) is None:
            self._diffusion_guidance = DiffusionGuidance(cfg, rng_seed=cfg.seed)
            self._diffusion_real_cams = list(self.scene.cameras)
        synth = self._diffusion_guidance.refresh(self, self._diffusion_real_cams)
        # Swap the synthetic set in-place; drop stale cached frames at
        # EVERY cached resolution (coarse-to-fine caches reduced dims too;
        # evicting only the full-res key left stale coarse frames live).
        stale_names = {c.name for c in self.scene.cameras
                       if c.name and c.name.startswith("diffusion_")}
        for k in [k for k in self._image_cache if set(k) & stale_names]:
            del self._image_cache[k]
        self.scene.cameras = self._diffusion_real_cams + synth
        log.info("diffusion guidance: %d synthetic views refreshed at step %d",
                 len(synth), step)

    # -- main loop ---------------------------------------------------------------

    def train_step(self) -> None:
        """One training iteration (reference steps 1-8, train.py:45-127)."""
        cfg = self.cfg
        self.step += 1
        self._maybe_refresh_density_probe()
        self._maybe_refresh_diffusion_views()

        # 0-based sample index (step was just incremented): without the -1
        # the first epoch would skip permutation position 0 — one camera
        # untrained for a whole epoch.
        camera = self.scene.get_random_camera(self.step - 1)
        h, w = self._c2f_dims(camera)
        gt = self._device_image(camera, w, h)
        est_depth = None
        if cfg.regularize_depth and camera.estimated_depth is not None:
            est_depth = jnp.asarray(camera.estimated_depth)
            if est_depth.shape != (h, w):  # coarse-to-fine stage
                est_depth = jax.image.resize(est_depth, (h, w), "linear")

        self.key, sub = jax.random.split(self.key)
        slot = self._pose_slot(camera)
        pose_delta = (self.pose_deltas[slot]
                      if cfg.pose_opt and slot is not None else None)
        app_param = (self.app_params[slot]
                     if cfg.app_opt and slot is not None else None)
        cam_params = self._scale_cam_params(camera.params(), camera, h, w)
        out = self._step_fn(h, w)(
            self.state, self.opt_state, cam_params, gt, est_depth,
            jnp.int32(self.step), sub, self.density_probe, pose_delta,
            app_param,
        )
        self.state, self.opt_state = out.state, out.opt_state
        self.last_rendered = out.rendered
        if slot is not None and "pose_grad" in out.metrics:
            g = out.metrics.pop("pose_grad")
            (self.pose_deltas, self._pose_m, self._pose_v,
             self._pose_cnt) = self._pose_adam(
                self.pose_deltas, self._pose_m, self._pose_v, self._pose_cnt,
                slot, g, cfg.lr_pose,
            )
        if slot is not None and "app_grad" in out.metrics:
            g = out.metrics.pop("app_grad")
            (self.app_params, self._app_m, self._app_v,
             self._app_cnt) = self._pose_adam(
                self.app_params, self._app_m, self._app_v, self._app_cnt,
                slot, g, cfg.lr_app,
            )
        self._post_step(out)

    def _post_step(self, out) -> None:
        """Shared post-step host logic. Every hook here runs identically on
        the single-device Trainer and the multi-chip MeshTrainer (which calls
        this from its own train_step): metrics, densify cadence, budget
        auto-tune, opacity reset, NaN-guard rollback, checkpointing. A pod
        slice must never be a *worse* trainer than a single chip.
        """
        cfg = self.cfg
        self.metrics.update(self.step, out.metrics)
        if "n_intersections" in out.metrics:
            self._last_diag = (out.metrics["n_intersections"],
                               out.metrics["n_dup_dropped"],
                               out.metrics["n_tile_dropped"])

        self._maybe_densify()
        self._maybe_compact()
        self._maybe_retune_budgets()
        if (
            cfg.interval_opacity_reset > 0
            and self.step % cfg.interval_opacity_reset == 0
            and self.step <= cfg.densify_end
            and cfg.densify_strategy != "mcmc"  # MCMC self-regulates opacity
        ):
            self.state, self.opt_state = reset_opacities(
                self.state, cfg.epsilon_alpha, opt_state=self.opt_state)

        # Host syncs are CADENCED, never per-step: a device_get blocks the
        # host until the just-dispatched step finishes, so per-step fetches
        # serialize host prep against device compute and add a full RTT per
        # step over a tunneled TPU (train_loop module docstring bullet 5).
        if self.step % self.metrics.num_cameras == 0:
            num_live = int(jax.device_get(out.metrics["num_live"]))
            self.metrics.log(self.step, extra=f"N: {num_live}")
        self._nan_guard(out.metrics["loss"])
        self._maybe_checkpoint()

    def _maybe_checkpoint(self) -> None:
        cfg = self.cfg
        if cfg.save_checkpoints and self.step % cfg.checkpoint_interval == 0:
            from .io.checkpoint import save_checkpoint

            path = f"{cfg.checkpoint_dir}/{self._timestamp}-{self.step}.npz"
            extras = {}
            if self.pose_deltas is not None:
                extras.update({"pose_deltas": self.pose_deltas,
                               "pose_m": self._pose_m, "pose_v": self._pose_v,
                               "pose_cnt": self._pose_cnt})
            if self.app_params is not None:
                extras.update({"app_params": self.app_params,
                               "app_m": self._app_m, "app_v": self._app_v,
                               "app_cnt": self._app_cnt})
            extras = extras or None
            if cfg.async_checkpoint:
                # Overlap the device fetch + file write with training: hand
                # a DEVICE COPY to a writer thread (the train step donates
                # its input buffers, so references to the live arrays would
                # be invalidated mid-fetch). At most ONE write is in flight:
                # joining the previous writer BEFORE taking a new snapshot
                # bounds HBM at one extra state copy and applies natural
                # backpressure when the disk is slower than the interval.
                import threading

                self.finish_checkpoints()  # join + surface writer errors
                snap = (jax.tree.map(jnp.copy, self.state),
                        jax.tree.map(jnp.copy, self.opt_state),
                        self.step, self.key)

                def work(snap=snap, path=path, extras=extras):
                    try:
                        save_checkpoint(path, snap[0], snap[1], snap[2],
                                        snap[3], extras=extras)
                        log.info("saved checkpoint %s (async)", path)
                    except BaseException as e:  # surfaced at the next join
                        self._ckpt_error = e

                t = threading.Thread(target=work, daemon=True,
                                     name=f"ckpt-{self.step}")
                t.start()
                self._ckpt_thread = t
            else:
                save_checkpoint(path, self.state, self.opt_state, self.step,
                                self.key, extras=extras)
                log.info("saved checkpoint %s", path)

    def finish_checkpoints(self) -> None:
        """Block until any in-flight async checkpoint write has landed.

        Re-raises a failed writer's exception (disk full, permissions) —
        silently "succeeding" without the .npz would defeat the feature."""
        t = self._ckpt_thread
        if t is not None:
            t.join()
            self._ckpt_thread = None
        err = self._ckpt_error
        if err is not None:
            self._ckpt_error = None
            raise RuntimeError("async checkpoint write failed") from err

    # -- failure detection / rollback ------------------------------------------

    def _nan_guard(self, loss) -> None:
        """Divergence detection + automatic rollback (a real failure-recovery
        subsystem; the reference has none — SURVEY section 5 'failure
        detection': its only resilience is a pinverse fallback).

        Keeps an in-memory device snapshot of (state, opt, step, key) every
        ``nan_guard_interval`` steps; when the fetched loss goes non-finite,
        restores the snapshot and advances the RNG so the replayed steps see
        different randomness (background, densify noise) instead of
        re-diverging identically. Costs one tree-copy every interval and no
        per-step host sync (the loss is read at the epoch-boundary fetch).
        """
        interval = self.cfg.nan_guard_interval
        if interval <= 0:
            return
        # The loss fetch is a blocking host sync; check on a cadence (and
        # ALWAYS on snapshot steps — a NaN state must never be snapshotted)
        # instead of every step. A divergence is caught within check_every
        # steps, well inside the rollback window.
        check_every = max(1, min(interval // 2, self.metrics.num_cameras))
        if self.step % check_every != 0 and self.step % interval != 0:
            return
        if not np.isfinite(float(jax.device_get(loss))):
            if self._guard_snapshot is None:
                raise FloatingPointError(
                    f"non-finite loss at step {self.step} with no snapshot"
                )
            snap_state, snap_opt, snap_step, snap_key = self._guard_snapshot
            # A persistent NaN source (corrupt GT frame, reliably-diverging
            # config) would otherwise re-roll back forever; cap consecutive
            # rollbacks that fail to make progress past the snapshot.
            if self._rollbacks - self._rollbacks_at_progress >= 3:
                raise FloatingPointError(
                    f"non-finite loss at step {self.step}: 3 consecutive "
                    f"rollbacks to step {snap_step} made no progress"
                )
            log.warning(
                "non-finite loss at step %d: rolling back to step %d",
                self.step, snap_step,
            )
            self.state = jax.tree.map(jnp.copy, snap_state)
            self.opt_state = jax.tree.map(jnp.copy, snap_opt)
            self.step = snap_step
            # Fold in fresh entropy so the replay takes a different path.
            self.key = jax.random.fold_in(snap_key, self.step + 1)
            self._rollbacks += 1
            return
        if self.step % interval == 0:
            # Reaching a NEW snapshot point with finite loss = progress past
            # the last rollback target; re-arm the consecutive-rollback cap.
            self._rollbacks_at_progress = self._rollbacks
            self._guard_snapshot = (
                jax.tree.map(jnp.copy, self.state),
                jax.tree.map(jnp.copy, self.opt_state),
                self.step,
                self.key,
            )

    def run(self, max_iter: Optional[int] = None) -> None:
        end = max_iter if max_iter is not None else self.cfg.max_iter
        if self.cfg.prefetch_images and jax.process_count() == 1:
            self.prefetch_images()
        try:
            while self.step < end:
                self._maybe_profile_window()
                self.train_step()
                self._maybe_eval()
        finally:
            # Land (or surface the failure of) any in-flight async
            # checkpoint even when training raises — the checkpoint you
            # need most is the one before a crash.
            self.finish_checkpoints()

    def _maybe_profile_window(self) -> None:
        """--profile-steps N: trace steps [profile_start, profile_start+N)
        and print the serialized per-op breakdown (utils/xplane). Wall
        timings over a tunneled TPU are unreliable; the trace's serialized
        TensorCore line is the ground truth (NOTES.md)."""
        cfg = self.cfg
        if cfg.profile_steps <= 0:
            return
        if self.step == cfg.profile_start and not getattr(self, "_prof_on", False):
            jax.profiler.start_trace(cfg.profile_dir)
            self._prof_on = True
        elif getattr(self, "_prof_on", False) and (
            self.step >= cfg.profile_start + cfg.profile_steps
        ):
            jax.block_until_ready(self.state.params.means)
            jax.profiler.stop_trace()
            self._prof_on = False
            try:
                from .utils.xplane import print_top_ops

                print_top_ops(cfg.profile_dir, top=25, iters=cfg.profile_steps)
            except Exception as e:  # CPU traces may lack the TensorCore line
                log.warning("trace captured at %s but per-op parse failed: %s",
                            cfg.profile_dir, e)

    async def run_async(self, max_iter: Optional[int] = None) -> None:
        """Cooperative variant interleaving with the viewer server.

        The reference yields to the event loop between steps
        (train.py:127); that is not enough under XLA, where a single
        compile can block for minutes and starve the viewer's sockets.
        Steps run in a worker thread (JAX releases the GIL during
        compilation and execution), so the loop stays responsive."""
        import asyncio

        loop = asyncio.get_running_loop()
        end = max_iter if max_iter is not None else self.cfg.max_iter
        if self.cfg.prefetch_images and jax.process_count() == 1:
            self.prefetch_images()
        try:
            while self.step < end:
                self._maybe_profile_window()
                await loop.run_in_executor(None, self.train_step)
                self._maybe_eval()
                await asyncio.sleep(0)
        finally:
            self.finish_checkpoints()

    def _maybe_eval(self) -> None:
        if (self.cfg.eval_interval and self.eval_cameras
                and self.step % self.cfg.eval_interval == 0):
            self.evaluate()

    # -- binning budget auto-tune --------------------------------------------------

    def _maybe_retune_budgets(self) -> None:
        """Adapt the static intersection budget to the observed workload.

        The binning/rasterization cost scales with the static dup_capacity
        (NOTES.md); the reference's CUDA backend allocates exactly per frame,
        which XLA cannot. Instead: once per epoch, fetch the step's
        intersection diagnostics and retune to ~2x the observed count —
        growing immediately when entries were dropped (quality), shrinking
        when under 25% utilized (speed). Each retune is one recompile.
        """
        if self._last_diag is None or self.step % self.interval_densify != 0:
            return
        import dataclasses as _dc

        inter, dup_dropped, tile_dropped = (
            int(jax.device_get(x)) for x in self._last_diag
        )
        self._last_diag = None
        bands = max(self._budget_bands, 1)
        # Worst-band bound: a single band can hold every intersection, so
        # growth uses the global count (safe); shrink uses the per-band mean
        # (a band 4x above the mean still fits after the 2x headroom).
        inter_band = -(-inter // bands)
        n = self.state.capacity
        current = self.cfg.dup_capacity or 8 * n
        changes = {}
        if dup_dropped > 0:
            changes["dup_capacity"] = max(2 * (inter + dup_dropped), current * 2)
        elif (inter > 0 and inter_band < current // 4 and current > 2 * n
              and self.step >= self._no_shrink_until):
            changes["dup_capacity"] = max(2 * inter_band, 2 * n)
        if tile_dropped > 0:
            # Deepest entries of crowded tiles were clipped: raise the
            # per-tile list budget (a separate knob from the total budget).
            cam = self.scene.cameras[0]
            num_tiles = max(
                ((cam.width + 15) // 16) * ((cam.height + 15) // 16), 1
            )
            eff = self.cfg.max_per_tile or min(
                4096, max((self.cfg.dup_capacity or 8 * n) // num_tiles, 256)
            )
            changes["max_per_tile"] = min(2 * eff, 16384)
        if not changes:
            return
        if "dup_capacity" in changes:
            # Quantize UP to ~12.5% relative granularity (a power-of-2 grid
            # one eighth of the value's magnitude): every distinct budget is
            # one compiled executable (~1-3 min over a tunneled TPU), and
            # coarse values RECUR — across retunes, stages, and whole runs —
            # so the persistent compilation cache absorbs them
            # (utils/cache.py). Relative, not absolute: a 64k floor would
            # turn small-scene shrinks into growths.
            v = int(changes["dup_capacity"])
            grid = max(128, 1 << max(v.bit_length() - 3, 7))
            changes["dup_capacity"] = -(-v // grid) * grid
        if changes.get("dup_capacity", current) > current or "max_per_tile" in changes:
            self._no_shrink_until = self.step + 3 * self.interval_densify
        log.info(
            "retuning budgets %s (intersections %d, dup_dropped %d, tile_dropped %d)",
            changes, inter, dup_dropped, tile_dropped,
        )
        self.cfg = _dc.replace(self.cfg, **changes)
        self._invalidate_step_cache()

    def _invalidate_step_cache(self) -> None:
        """Drop compiled steps after a config change (MeshTrainer extends)."""
        self._step_fns.clear()

    # -- held-out evaluation ---------------------------------------------------------

    def evaluate(self, cameras: Optional[List[Camera]] = None) -> Dict[str, float]:
        """Mean PSNR/SSIM over held-out cameras (black background, the 3DGS
        convention). The reference has no evaluation path at all."""
        from .ops.ssim import psnr as psnr_fn, ssim as ssim_fn

        cams = cameras if cameras is not None else self.eval_cameras
        if not cams:
            return {}
        from .train import fixed_background

        bg = fixed_background(self.cfg)  # match fixed-bg GT compositing
        psnrs, ssims = [], []
        for cam in cams:
            rgb, _ = self.render_camera(cam, background=bg)
            gt = jnp.asarray(cam.get_original_image((cam.width, cam.height)))
            psnrs.append(psnr_fn(rgb, gt))
            ssims.append(ssim_fn(rgb, gt))
        out = {
            "eval_psnr": float(np.mean(jax.device_get(psnrs))),
            "eval_ssim": float(np.mean(jax.device_get(ssims))),
            "num_eval_cameras": len(cams),
        }
        log.info("eval @ step %d: PSNR %.2f SSIM %.4f (%d cams)",
                 self.step, out["eval_psnr"], out["eval_ssim"], len(cams))
        return out

    # -- rendering for eval / viewer ---------------------------------------------

    def render_camera(self, camera: Camera, dims=None, background=None):
        """Jitted inference render (viewer / eval). One compiled executable
        per image shape — an unjitted render would dispatch hundreds of ops
        eagerly, which costs minutes per frame over a tunneled TPU."""
        w, h = dims if dims is not None else (camera.width, camera.height)
        bg = background if background is not None else jnp.zeros(3)
        # SNAPSHOT the state once: the viewer thread renders concurrently
        # with run_async's train_step executor thread, and reading
        # params/alive/active_sh_degree as separate attribute accesses can
        # tear across a densify capacity swap (params of 2N with alive of
        # N). Python attribute reads are atomic; one read = one consistent
        # state version (a frame may simply be one step stale).
        state = self.state
        key = ("render", h, w, self.cfg.rasterizer)
        fn = self._step_fns.get(key)
        if fn is None:
            from .render import render as _render

            cfg = self.cfg

            @jax.jit
            def render_fn(params, alive, cam_params, active_deg, bg):
                return _render(
                    params, alive, cam_params, h, w, active_deg, bg,
                    rasterizer=cfg.rasterizer, viewdirs_mode=cfg.viewdirs_mode,
                    tile_size=cfg.tile_size, dup_capacity=cfg.dup_capacity,
                    max_per_tile=cfg.max_per_tile,
                    span_capacity=cfg.span_capacity,
                    grad_reduce=cfg.grad_reduce,
                    tile_x=cfg.tile_x,
                    antialiased=cfg.antialiased,
                )

            fn = self._step_fns[key] = render_fn
        cam_params = camera.params()
        slot = self._pose_slot(camera)
        # --pose-opt: eval/viewer uses refined poses. (_pose_slot also
        # returns slots when only --app-opt is on; there is no delta then.)
        if slot is not None and self.pose_deltas is not None:
            from .cameras import apply_pose_delta

            cam_params = jax.jit(apply_pose_delta)(
                cam_params, self.pose_deltas[slot]
            )
        return fn(state.params, state.alive, cam_params,
                  state.active_sh_degree, bg)
