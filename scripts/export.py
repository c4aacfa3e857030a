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
    parser.add_argument("input_file", type=str, help=".npz checkpoint or .ply")
    parser.add_argument("output_file", type=str)
    args = parser.parse_args()

    from tinysplat_tpu.io.checkpoint import load_model
    from tinysplat_tpu.io.export import export_ply, export_splat, import_ply

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

        verts, faces, normals = extract_mesh(
            state, algorithm=args.mesh_extraction_algorithm,
            resolution=args.resolution,
        )
        from tinysplat_tpu.io.export import export_mesh_obj

        export_mesh_obj(args.output_file, verts, faces, normals)
    logging.info("wrote %s", args.output_file)


if __name__ == "__main__":
    main()
