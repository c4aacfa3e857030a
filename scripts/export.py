"""Checkpoint export CLI: PLY / SPLAT / OBJ mesh.

The reference's scripts/export.py is bit-rotted (imports a nonexistent
tinysplat.model, `args.file_type` vs `filetype`, `export_mash` typo —
SURVEY.md section 2.1). Same interface, working:

    python scripts/export.py --filetype PLY checkpoint.npz out.ply
    python scripts/export.py --filetype OBJ --mesh-extraction-algorithm \
        marching_cubes checkpoint.npz out.obj
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from tinysplat_tpu.utils.cache import enable_compile_cache


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    parser = argparse.ArgumentParser(description="Export a trained splat model")
    parser.add_argument("--filetype", type=str, default="PLY",
                        choices=["PLY", "SPLAT", "OBJ"])
    parser.add_argument("--mesh-extraction-algorithm", type=str,
                        default="marching_cubes",
                        choices=["marching_cubes", "poisson"])
    parser.add_argument("--resolution", type=int, default=256,
                        help="marching-cubes grid resolution")
    parser.add_argument("--poisson-depth", type=int, default=9,
                        help="poisson octree depth (grid = 2^depth, capped)")
    parser.add_argument("input_file", type=str, help=".npz checkpoint or .ply")
    parser.add_argument("output_file", type=str)
    args = parser.parse_args()

    from tinysplat_tpu.io.checkpoint import load_model
    from tinysplat_tpu.io.export import export_ply, export_splat, import_ply

    enable_compile_cache()
    if args.input_file.endswith(".ply"):
        state = import_ply(args.input_file)
    else:
        state = load_model(args.input_file)

    if args.filetype == "PLY":
        export_ply(state, args.output_file)
    elif args.filetype == "SPLAT":
        export_splat(state, args.output_file)
    elif args.filetype == "OBJ":
        from tinysplat_tpu.mesh import extract_mesh

        scene = None
        if args.mesh_extraction_algorithm == "poisson":
            # Poisson needs rendered depth; a bare checkpoint carries no
            # cameras, so synthesize an orbit around the model and bind a
            # render function over the loaded state.
            import jax.numpy as jnp
            import numpy as np

            from tinysplat_tpu.data.synthetic import orbit_cameras
            from tinysplat_tpu.render import render as _render
            from tinysplat_tpu.scene import Scene

            means = np.asarray(state.params.means)[np.asarray(state.alive)]
            center = means.mean(axis=0)
            radius = max(
                2.5 * float(np.linalg.norm(means - center, axis=1).max()),
                1e-2)
            cams = orbit_cameras(16, width=256, height=256, radius=radius,
                                 target=tuple(center))
            scene = Scene(cams)

            def render_fn(camera, dims=None):
                w, h = dims if dims is not None else (camera.width,
                                                      camera.height)
                rgb, extras = _render(
                    state.params, state.alive, camera.params(), h, w,
                    state.active_sh_degree, jnp.zeros(3), rasterizer="tiled")
                return rgb, extras

            scene.render_fn = render_fn

        verts, faces, normals = extract_mesh(
            state, algorithm=args.mesh_extraction_algorithm,
            resolution=args.resolution, scene=scene,
            poisson_depth=args.poisson_depth,
        )
        from tinysplat_tpu.io.export import export_mesh_obj

        export_mesh_obj(args.output_file, verts, faces, normals)
    logging.info("wrote %s", args.output_file)


if __name__ == "__main__":
    main()
