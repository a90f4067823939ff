from .gaussians import GaussianParams, GaussianScene

__all__ = ["GaussianParams", "GaussianScene"]
