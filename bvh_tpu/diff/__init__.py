"""Differentiable rendering layer (new capability; the reference has no autodiff)."""

from .camera import camera_rays
from .render import render_depth, render_depth_fast, render_hits, render_hits_fast

__all__ = ["render_hits", "render_depth", "render_hits_fast", "render_depth_fast", "camera_rays"]
