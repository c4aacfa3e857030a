"""Model import/export: PLY, .splat, mesh formats, checkpoints."""
from .ply import write_ply, read_ply
from .export import export_ply, import_ply, export_splat, export_mesh_obj

__all__ = [
    "write_ply",
    "read_ply",
    "export_ply",
    "import_ply",
    "export_splat",
    "export_mesh_obj",
]
