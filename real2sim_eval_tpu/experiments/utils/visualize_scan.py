"""Quick splat-scan viewer (parity: assets/scans/visualize_scan.py).

Renders orbit views of one or more scan PLYs to PNGs (the reference opens a
gradio splat viewer; headless environments get image grids instead) and/or
exports merged .splat files for any web viewer.

Usage:
  python -m real2sim_eval_tpu.experiments.utils.visualize_scan \\
      scan1.ply [scan2.ply ...] [--out dir] [--splat merged.splat]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def render_orbit_views(params, out_dir: Path, name: str, n_views: int = 4):
    import cv2
    import jax.numpy as jnp

    from ...renderer.camera import Camera, orbit_camera_w2c
    from ...renderer.raster import RasterConfig, rasterize
    from ...utils.gs_processor import activate_params
    from ...utils.ply import sh_colors_to_coeffs

    act = activate_params(dict(params,
                               sh_colors=sh_colors_to_coeffs(params["sh_colors"])
                               if np.asarray(params["sh_colors"]).ndim == 2
                               else params["sh_colors"]))
    center = act["means3D"].mean(0)
    radius = float(np.linalg.norm(act["means3D"] - center, axis=1).max()) * 1.8
    cam = Camera(width=640, height=480, fx=400.0, fy=400.0, cx=320.0, cy=240.0)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n_views):
        w2c = orbit_camera_w2c(tuple(center), max(radius, 0.3), 25,
                               360.0 * i / n_views)
        im, _ = rasterize(cam, jnp.asarray(w2c), jnp.asarray(act["means3D"]),
                          jnp.asarray(act["scales"]),
                          jnp.asarray(act["rotations"]),
                          jnp.asarray(act["opacities"]),
                          jnp.asarray(act["shs"][:, :1]), 0,
                          config=RasterConfig())
        img = (np.clip(np.asarray(im), 0, 1).transpose(1, 2, 0) * 255
               ).astype(np.uint8)
        cv2.imwrite(str(out_dir / f"{name}_view{i}.png"), img[:, :, ::-1])
    print(f"wrote {n_views} views of {name} to {out_dir}")


def main():
    from ...utils.gs_processor import GSProcessor

    parser = argparse.ArgumentParser()
    parser.add_argument("scans", nargs="+")
    parser.add_argument("--out", default="log/gs/scan_views")
    parser.add_argument("--splat", default=None,
                        help="also export a merged .splat for web viewers")
    parser.add_argument("--views", type=int, default=4)
    args = parser.parse_args()

    sp = GSProcessor()
    all_params = []
    for scan in args.scans:
        params = sp.load(scan)
        all_params.append(params)
        render_orbit_views(params, Path(args.out), Path(scan).stem, args.views)
    if args.splat:
        sp.save_to_splat(sp.merge(all_params), args.splat)
        print(f"wrote {args.splat}")


if __name__ == "__main__":
    main()
