from .camera import Camera, setup_camera, orbit_camera_w2c, Rt_to_w2c
from .raster import rasterize, RasterConfig
from .renderer import GSRenderer

__all__ = [
    "Camera",
    "setup_camera",
    "orbit_camera_w2c",
    "Rt_to_w2c",
    "rasterize",
    "RasterConfig",
    "GSRenderer",
]
