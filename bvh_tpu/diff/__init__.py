"""Differentiable rendering layer (new capability; the reference has no autodiff)."""

from .camera import camera_rays
from .render import render_depth, render_hits

__all__ = ["render_hits", "render_depth", "camera_rays"]
