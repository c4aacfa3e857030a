from .synthetic import random_gaussian_cloud, orbit_cameras, synthetic_pcd
from .dataset import Dataset
from .colmap import load_reconstruction

__all__ = [
    "random_gaussian_cloud",
    "orbit_cameras",
    "synthetic_pcd",
    "Dataset",
    "load_reconstruction",
]
