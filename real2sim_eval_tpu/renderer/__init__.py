from .camera import Camera, setup_camera, orbit_camera_w2c, Rt_to_w2c
from .raster import rasterize, RasterConfig
from .renderer import GSRenderer


def rasterize_diff(*args, **kwargs):
    """Differentiable rasterization (renderer/diff.py); lazy import keeps
    the Pallas backward machinery off the production import path."""
    from .diff import rasterize_diff as _impl
    return _impl(*args, **kwargs)


def rasterize_diff_views(*args, **kwargs):
    """Multi-view differentiable rasterization (renderer/diff.py)."""
    from .diff import rasterize_diff_views as _impl
    return _impl(*args, **kwargs)


__all__ = [
    "Camera",
    "setup_camera",
    "orbit_camera_w2c",
    "Rt_to_w2c",
    "rasterize",
    "rasterize_diff",
    "rasterize_diff_views",
    "RasterConfig",
    "GSRenderer",
]
