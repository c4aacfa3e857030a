from .synthetic import random_gaussian_cloud, orbit_cameras, synthetic_pcd

__all__ = ["random_gaussian_cloud", "orbit_cameras", "synthetic_pcd"]
