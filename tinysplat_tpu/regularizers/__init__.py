"""Regularizers: depth-guided (Chung et al. 2023) lives inline in the train
steps; SuGaR-style density/SDF (Guédon & Lepetit 2023) lives here."""
from .density import (
    covariance_inverse,
    DensityProbe,
    approximate_density,
    density_at_points,
    density_loss,
    knn_indices,
    make_density_probe,
    sample_points,
)

__all__ = [
    "covariance_inverse",
    "DensityProbe",
    "approximate_density",
    "density_at_points",
    "density_loss",
    "knn_indices",
    "make_density_probe",
    "sample_points",
]
