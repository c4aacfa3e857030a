"""Training CLI — flag parity with the reference trainer.

Usage mirrors /root/reference/scripts/train.py:162-294:

    python scripts/train.py --train --dataset-dir datasets/truck \
        --regularize-depth --viewer

plus TPU-framework extras (--rasterizer, --synthetic, --mesh-splat/--mesh-tile
for multi-chip; --mesh-splat maps to the mesh's 'data' axis — the FSDP splat
shard — and --mesh-tile to the image-band 'tile' axis). Flags are generated from the typed Config dataclass
(tinysplat_tpu/config.py), whose field names/defaults replicate the reference
argparse table one to one.
"""
import argparse
import asyncio
import dataclasses
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinysplat_tpu.config import Config


def arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="tinysplat-tpu trainer")
    for f in dataclasses.fields(Config):
        flag = "--" + f.name.replace("_", "-")
        if f.type in ("bool", bool):
            parser.add_argument(flag, default=f.default,
                                action=argparse.BooleanOptionalAction)
        else:
            ftype = {"int": int, "float": float, "str": str,
                     "Optional[str]": str, "Optional[int]": int}.get(str(f.type), str)
            parser.add_argument(flag, type=ftype, default=f.default)
    return parser


def build_scene(cfg: Config):
    """Dataset -> (scene, pcd, cfg). Synthetic path has no COLMAP dep; the
    returned cfg may carry dataset-driven defaults (e.g. a fixed white
    background for transforms.json scenes)."""
    import jax.numpy as jnp
    import numpy as np

    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.scene import Scene

    if cfg.synthetic:
        from tinysplat_tpu.data.synthetic import (
            orbit_cameras,
            random_gaussian_cloud,
            synthetic_pcd,
        )
        from tinysplat_tpu.render import render as _render

        # Ground-truth views come from a fixed random splat cloud rendered
        # with the oracle path — a self-contained optimization target.
        cams = orbit_cameras(10, width=128, height=128)
        means, log_scales, quats, colors, opac = random_gaussian_cloud(400, seed=7)
        gt_params_state = init_from_pcd(means, colors * 255, sh_degree=1, capacity=512)
        p = dataclasses.replace(
            gt_params_state.params,
            scales=jnp.asarray(np.pad(log_scales, ((0, 112), (0, 0)), constant_values=-10.0)),
            opacities=jnp.asarray(np.pad(opac, ((0, 112), (0, 0)), constant_values=-20.0)),
        )
        for cam in cams:
            rgb, _ = _render(p, gt_params_state.alive, cam.params(), 128, 128,
                             jnp.int32(1), jnp.zeros(3), rasterizer="tiled")
            cam._image = np.asarray(rgb)
        pcd = synthetic_pcd(500, seed=1)
        scene = Scene(cams, seed=cfg.seed)
        return scene, pcd, cfg

    # COLMAP first when a sparse reconstruction exists (nerfstudio exports
    # often ship BOTH transforms.json and colmap/ — SfM points beat a
    # random init cloud); otherwise auto-detect transforms*.json.
    tj = None
    for cand in ("transforms_train.json", "transforms.json"):
        p = os.path.join(cfg.dataset_dir, cand)
        if os.path.exists(p):
            tj = p
            break
    if os.path.isdir(cfg.colmap_path) or tj is None:
        from tinysplat_tpu.data.dataset import Dataset

        dataset = Dataset(cfg.colmap_path, cfg.images_path,
                          max_image_dimension=cfg.max_image_dimension or None)
    else:
        from tinysplat_tpu.data.blender import BlenderDataset

        if cfg.background == "random":
            # RGBA GT frames are composited onto a FIXED color at load; a
            # per-step random training background would force the model to
            # build an opaque backdrop shell. White is the NeRF-synthetic
            # convention; pass --background black to override.
            logging.getLogger(__name__).info(
                "transforms.json scene: training background set to 'white' "
                "to match GT compositing (--background overrides)")
            cfg = dataclasses.replace(cfg, background="white")
        bg = (0.0, 0.0, 0.0) if cfg.background == "black" else (1.0, 1.0, 1.0)
        dataset = BlenderDataset(
            tj, seed=cfg.seed, num_init_points=cfg.random_init_points,
            background=bg,
            max_image_dimension=cfg.max_image_dimension or None)
    scene = Scene(dataset.cameras, seed=cfg.seed)
    return scene, dataset.pcd, cfg


async def main() -> None:
    logging.basicConfig(
        level=getattr(logging, os.environ.get("LOG_LEVEL", "INFO")),
        format="%(asctime)s - %(levelname)s - %(message)s",
    )
    args = arg_parser().parse_args()
    cfg = Config(**vars(args))
    if cfg.distributed or cfg.coordinator_address:
        # Multi-controller init MUST precede any JAX backend use (the first
        # jax.devices()/jnp call pins the single-process topology). Every
        # host runs this same CLI; with no explicit flags the topology is
        # auto-detected (TPU pod metadata).
        from tinysplat_tpu.parallel import init_distributed

        kw = {}
        if cfg.coordinator_address:
            kw["coordinator_address"] = cfg.coordinator_address
        if cfg.num_processes > 0:
            kw["num_processes"] = cfg.num_processes
        if cfg.process_id >= 0:
            kw["process_id"] = cfg.process_id
        init_distributed(**kw)
    # Path joining as in reference main (scripts/train.py:254-257).
    cfg = dataclasses.replace(
        cfg,
        colmap_path=os.path.join(cfg.dataset_dir, cfg.colmap_path),
        images_path=os.path.join(cfg.dataset_dir, cfg.images_path),
        depths_path=os.path.join(cfg.dataset_dir, cfg.depths_path),
    )

    from tinysplat_tpu.models.gaussians import init_from_pcd
    from tinysplat_tpu.train_loop import Trainer

    scene, pcd, cfg = build_scene(cfg)

    eval_cameras = []
    if cfg.eval_holdout > 1:
        # Standard llff-style split: every k-th camera held out for eval.
        all_cams = scene.cameras
        eval_cameras = all_cams[:: cfg.eval_holdout]
        scene.cameras = [c for i, c in enumerate(all_cams)
                         if i % cfg.eval_holdout != 0]

    opt_state, start_step, rng_key = None, 0, None
    if cfg.load_checkpoint:
        from tinysplat_tpu.io.checkpoint import load_checkpoint

        state, opt_state, start_step, rng_key = load_checkpoint(cfg.load_checkpoint, cfg)
    else:
        state = init_from_pcd(
            pcd.xyz, pcd.colors, sh_degree=cfg.sh_degree, capacity=cfg.capacity,
            seed=cfg.seed,
        )

    if cfg.regularize_depth and not cfg.synthetic:
        from tinysplat_tpu.depthest import DepthEstimator

        DepthEstimator(scene, pcd=pcd, depths_path=cfg.depths_path,
                       model_name=cfg.depth_model)

    import jax

    from tinysplat_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    if len(jax.devices()) > 1 and (cfg.mesh_tile > 1 or cfg.mesh_splat > 1):
        from tinysplat_tpu.parallel import MeshTrainer, make_mesh

        mesh = make_mesh(max(cfg.mesh_splat, 1), cfg.mesh_tile or 0)
        trainer = MeshTrainer(cfg, scene, state, opt_state, start_step, rng_key,
                              mesh=mesh)
    else:
        trainer = Trainer(cfg, scene, state, opt_state, start_step, rng_key)
    if cfg.load_checkpoint and (cfg.pose_opt or cfg.app_opt):
        from tinysplat_tpu.io.checkpoint import load_checkpoint_extras

        trainer.restore_pose_state(load_checkpoint_extras(cfg.load_checkpoint))
    trainer.eval_cameras = eval_cameras
    scene.render_fn = lambda camera, dims=None: trainer.render_camera(camera, dims)

    if cfg.viewer and jax.process_count() > 1:
        # The live viewer renders from a worker thread on one host only; a
        # sharded render is a collective over every process, so a
        # process-0-only call would deadlock the pod. Render paths for
        # multi-host runs: --eval-interval (lockstep) or offline
        # scripts/render_path.py on a checkpoint.
        logging.getLogger(__name__).warning(
            "--viewer is unsupported under multi-host execution; disabling "
            "(use --eval-interval or offline rendering from checkpoints)")
        cfg = dataclasses.replace(cfg, viewer=False)

    coroutines = []
    if cfg.viewer:
        from tinysplat_tpu.viewer import Viewer

        viewer = Viewer(scene, cfg.viewer_ip, cfg.viewer_port)
        coroutines.append(viewer.run())
    if cfg.train:
        coroutines.append(trainer.run_async())
    if coroutines:
        await asyncio.gather(*coroutines)


if __name__ == "__main__":
    asyncio.run(main())
