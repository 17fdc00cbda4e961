from .camera import Camera, setup_camera, orbit_camera_w2c, Rt_to_w2c
from .raster import rasterize, RasterConfig

__all__ = [
    "Camera",
    "setup_camera",
    "orbit_camera_w2c",
    "Rt_to_w2c",
    "rasterize",
    "RasterConfig",
]
