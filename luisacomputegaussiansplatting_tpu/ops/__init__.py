from .projection import project_gaussians, ProjectedGaussians
from .sh_eval import compute_colors
from .render import render, render_aux

__all__ = [
    "project_gaussians",
    "ProjectedGaussians",
    "compute_colors",
    "render",
    "render_aux",
]
