from .synthetic import random_gaussian_cloud, orbit_cameras, synthetic_pcd
from .dataset import Dataset
from .blender import BlenderDataset
from .colmap import load_reconstruction

__all__ = [
    "random_gaussian_cloud",
    "orbit_cameras",
    "synthetic_pcd",
    "Dataset",
    "BlenderDataset",
    "load_reconstruction",
]
